"""RNN-T (transducer) loss, TPU-native.

Behavioral parity target: the reference's Numba-CUDA warp-transducer port
(`/root/reference/nemo/collections/asr/parts/numba/rnnt_loss/`): log-softmax
denominator, alpha/beta forward-backward over the [T, U+1] lattice, analytic
gradient w.r.t. the joint logits, FastEmit regularization
(https://arxiv.org/abs/2010.11148) and gradient clamping — the same math,
validated against a NumPy oracle (tests/test_rnnt_loss.py), as the reference
validates its kernels against `rnnt_numpy.py`.

TPU-first formulation: CUDA wavefront kernels (one block per sample, U
threads, syncthreads per anti-diagonal) become a `lax.scan` over the T+U
anti-diagonals with the whole [B, T] diagonal vectorized per step — the VPU
sweeps each diagonal, and there is no thread-level synchronization to manage.
The gradient is a closed-form posterior expression (custom_vjp), so backward
costs one extra beta scan instead of autodiff through the forward scan.
All lattice math in fp32 (bf16-unsafe; SURVEY.md §7 hard-parts #1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from conformer_nemo_tpu.utils.typecheck import typecheck

_NEG_INF = -1e30


def _lse2(a, b):
    """NaN-safe log-add-exp of two stacked lattices."""
    m = jnp.maximum(a, b)
    bad = m <= _NEG_INF * 0.5
    m_safe = jnp.where(bad, 0.0, m)
    ea = jnp.exp(jnp.where(bad, 0.0, a - m_safe))
    eb = jnp.exp(jnp.where(bad, 0.0, b - m_safe))
    return jnp.where(bad, _NEG_INF, m_safe + jnp.log(ea + eb))


def _skew(x: jnp.ndarray) -> jnp.ndarray:
    """[B, T, U1] -> skewed [B, T, W] with W = T + U1 where
    out[b, t, t + u] = x[b, t, u]; off-diagonal cells are _NEG_INF.

    One-time layout change so every anti-diagonal d of the lattice becomes a
    contiguous COLUMN out[:, :, d] — the wavefront scan then touches O(B*T)
    cells per step instead of re-gathering the whole lattice.

    Gather-free: shifting row t right by t == re-windowing the row-padded
    flat buffer at stride W-1 (pure pad + reshape + slice; TPU gathers on the
    lane axis are catastrophically slow). The overlap-read cells (d < t) land
    in the previous row's -inf padding, and the max valid diagonal is
    T+U1-2, so the dropped/refilled last column is never a real cell.
    """
    b, t_max, u1 = x.shape
    w = t_max + u1
    p = jnp.pad(x, ((0, 0), (0, 0), (0, t_max)), constant_values=_NEG_INF)
    f = p.reshape(b, t_max * w)
    q = f[:, : t_max * (w - 1)].reshape(b, t_max, w - 1)
    return jnp.pad(q, ((0, 0), (0, 0), (0, 1)), constant_values=_NEG_INF)


def _unskew(cols: jnp.ndarray, t_max: int, u1: int) -> jnp.ndarray:
    """cols [B, T, W] (skewed) -> lattice [B, T, U1] (inverse re-window)."""
    b = cols.shape[0]
    w = t_max + u1
    f = cols[:, :, : w - 1].reshape(b, t_max * (w - 1))
    f = jnp.pad(f, ((0, 0), (0, t_max)), constant_values=_NEG_INF)
    return f.reshape(b, t_max, w)[:, :, :u1]


def _valid_tu(blank_lp, t_lens, u_lens):
    b, t_max, u1 = blank_lp.shape
    return (
        (jnp.arange(t_max)[None, :, None] < t_lens[:, None, None])
        & (jnp.arange(u1)[None, None, :] <= u_lens[:, None, None])
    )


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


# The Pallas lattice kernels hold one batch tile's WHOLE skewed lattice
# ([bt, W, T], W = T+U1) in VMEM — 3 arrays x 2 buffering levels even at
# bt=1 must fit the 100 MB scoped cap. Beyond this cell budget (~4M cells
# ~= 16 MB/array; T=376 flagship is 0.18M) the column sweep falls back to
# the lax.scan implementation, which streams columns through HBM and has no
# size ceiling (long-form transducer training hits this at T ~ 3000).
_PALLAS_LATTICE_MAX_CELLS = 4_000_000


def _lattice_impl_for(t_max: int, u1: int, impl: str) -> str:
    if impl == "pallas" and (t_max + u1) * t_max > _PALLAS_LATTICE_MAX_CELLS:
        return "scan"
    return impl


def _compute_alphas(blank_lp, label_lp, t_lens, u_lens, impl: str = "scan"):
    """alpha lattice [B, T, U+1] via a column sweep over the skewed layout.

    blank_lp: [B, T, U+1] log p(blank | t, u); label_lp: [B, T, U+1] with
    label_lp[:, t, u] = log p(y_{u+1} | t, u) (last column invalid/-inf).

    Recurrence in skewed coordinates (d = t + u):
      col_d[t] = lse( col_{d-1}[t-1] + blank_skew[t-1, d-1],
                      col_{d-1}[t]   + label_skew[t, d-1] )
    — both parents live in the previous column; each step is a shift + two
    adds + one logaddexp over [B, T].

    impl: "scan" (lax.scan over columns) or "pallas" (whole sweep inside one
    VMEM-resident kernel, ops/pallas/rnnt_kernel.py).
    """
    b, t_max, u1 = blank_lp.shape
    w = t_max + u1
    impl = _lattice_impl_for(t_max, u1, impl)
    valid_tu = _valid_tu(blank_lp, t_lens, u_lens)

    bl = _skew(jnp.where(valid_tu, blank_lp, _NEG_INF))  # [B, T, W]
    lb = _skew(jnp.where(valid_tu, label_lp, _NEG_INF))

    if impl == "pallas":
        from conformer_nemo_tpu.ops.pallas.rnnt_kernel import alphas_skewed_pallas

        cols = alphas_skewed_pallas(bl, lb, interpret=_use_interpret())
        alpha = _unskew(cols, t_max, u1)
        return jnp.where(valid_tu, alpha, _NEG_INF)

    col0 = jnp.full((b, t_max), _NEG_INF).at[:, 0].set(0.0)

    def step(col, d):
        bl_prev = jax.lax.dynamic_index_in_dim(bl, d - 1, axis=2, keepdims=False)
        lb_prev = jax.lax.dynamic_index_in_dim(lb, d - 1, axis=2, keepdims=False)
        from_left = jnp.pad(col + bl_prev, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :t_max]
        from_below = col + lb_prev
        new = _lse2(from_left, from_below)
        return new, new

    ds = jnp.arange(1, t_max + u1 - 1)
    _, cols = jax.lax.scan(step, col0, ds, unroll=2)  # [D, B, T]
    all_cols = jnp.concatenate([col0[None], cols], axis=0)  # [w-1, B, T], d=0..w-2
    # pad to full width W and reorder to [B, T, W]
    all_cols = jnp.moveaxis(all_cols, 0, 2)  # [B, T, D+1]
    pad_w = w - all_cols.shape[2]
    if pad_w > 0:
        all_cols = jnp.pad(all_cols, ((0, 0), (0, 0), (0, pad_w)), constant_values=_NEG_INF)
    alpha = _unskew(all_cols, t_max, u1)
    return jnp.where(valid_tu, alpha, _NEG_INF)


def _compute_betas(blank_lp, label_lp, t_lens, u_lens, impl: str = "scan"):
    """beta lattice [B, T, U+1] via the reverse column sweep; beta[0,0] is the
    total log-likelihood.

    Recurrence: beta[t,u] = lse(blank_lp[t,u] + beta[t+1,u],
                                label_lp[t,u] + beta[t,u+1]); in skewed
    coordinates both children live in column d+1 (shift up for the blank
    child). The per-sample terminal cell (t_lens-1, u_lens) seeds its column.
    """
    b, t_max, u1 = blank_lp.shape
    w = t_max + u1
    impl = _lattice_impl_for(t_max, u1, impl)
    t_idx = jnp.arange(t_max)

    valid_tu = _valid_tu(blank_lp, t_lens, u_lens)
    is_terminal = (
        (t_idx[None, :, None] == (t_lens - 1)[:, None, None])
        & (jnp.arange(u1)[None, None, :] == u_lens[:, None, None])
    )

    bl = _skew(jnp.where(valid_tu, blank_lp, _NEG_INF))
    lb = _skew(jnp.where(valid_tu, label_lp, _NEG_INF))
    # terminal seed in skewed coords: column d* = t_lens-1 + u_lens, row t_lens-1
    term_skew = _skew(jnp.where(is_terminal, blank_lp, _NEG_INF))

    if impl == "pallas":
        from conformer_nemo_tpu.ops.pallas.rnnt_kernel import betas_skewed_pallas

        cols = betas_skewed_pallas(bl, lb, term_skew,
                                   interpret=_use_interpret())
        beta = _unskew(cols, t_max, u1)
        return jnp.where(valid_tu, beta, _NEG_INF)

    def step(col, d):
        # children in column d+1 of the running recursion = `col`
        bl_d = jax.lax.dynamic_index_in_dim(bl, d, axis=2, keepdims=False)
        lb_d = jax.lax.dynamic_index_in_dim(lb, d, axis=2, keepdims=False)
        # blank child (t+1, u): skew row t+1, col d+1 -> shift col up by one
        blank_child = jnp.pad(col, ((0, 0), (0, 1)), constant_values=_NEG_INF)[:, 1:]
        new = _lse2(bl_d + blank_child, lb_d + col)
        # seed/overwrite the terminal cell of this column
        seed = jax.lax.dynamic_index_in_dim(term_skew, d, axis=2, keepdims=False)
        new = jnp.maximum(new, seed)  # seed is -inf except at the terminal cell
        return new, new

    colW = jnp.full((b, t_max), _NEG_INF)
    ds = jnp.arange(w - 1, -1, -1)
    _, cols = jax.lax.scan(step, colW, ds, unroll=2)  # [W, B, T], order d=W-1..0
    all_cols = jnp.moveaxis(cols[::-1], 0, 2)  # [B, T, W] with d ascending
    beta = _unskew(all_cols, t_max, u1)
    return jnp.where(valid_tu, beta, _NEG_INF)


def _prep(logits, targets, blank_id):
    """Blank/label log-probs + the log-softmax denominator, WITHOUT
    materializing the full [B, T, U+1, V] fp32 log-softmax (the reference's
    reduce_max/reduce_exp denominator kernels, cuda_utils/reduce.py, fused
    with the selection):

    - lse: two fused reductions over V (never materialized at fp32);
    - blank: a slice;
    - label: one-hot MXU matmul — TPU lane-axis gathers are ~10x slower than
      contraction (same finding as the CTC prep; HIGHEST precision required
      for fp32 inputs or the MXU rounds them through bf16).

    logits: [B, T, U+1, V]; targets: [B, U].
    Returns (blank_lp, label_lp, lse) each [B, T, U+1].
    """
    x = logits.astype(jnp.float32)
    m = jax.lax.stop_gradient(jnp.max(x, axis=-1))
    lse = m + jnp.log(jnp.sum(jnp.exp(x - m[..., None]), axis=-1))
    blank_lp = x[..., blank_id] - lse
    b, t_max, u1, v = logits.shape
    # label at (t, u) is targets[u] (the next emitted label), u < U
    tgt = jnp.pad(targets.astype(jnp.int32), ((0, 0), (0, 1)))  # [B, U+1], last col dummy
    onehot = (jnp.arange(v)[None, None, :] == tgt[:, :, None]).astype(logits.dtype)
    precision = (
        jax.lax.Precision.HIGHEST
        if logits.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    label_logit = jnp.einsum(
        "btuv,buv->btu", logits, onehot,
        precision=precision, preferred_element_type=jnp.float32,
    )
    label_lp = label_logit - lse
    # invalidate the u = U column (no label to emit there)
    u_row = jnp.arange(u1)[None, None, :]
    label_lp = jnp.where(u_row >= (u1 - 1), _NEG_INF, label_lp)
    return blank_lp, label_lp, lse


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def rnnt_loss_from_logits(
    logits, targets, t_lens, u_lens, blank_id, fastemit_lambda=0.0, clamp=-1.0,
    impl="scan",
):
    """Per-sample RNN-T negative log-likelihood [B].

    logits: joint outputs [B, T, U+1, V] (V includes blank at `blank_id`);
    t_lens: valid encoder frames; u_lens: valid target lengths.
    FastEmit: total loss scaled as (1 + lambda) * loss on the emit path —
    implemented exactly as the reference kernel does (grad-side Eq. 9/10 plus
    lambda-scaled cost).
    """
    nll, _ = _rnnt_fwd(logits, targets, t_lens, u_lens, blank_id,
                       fastemit_lambda, clamp, impl)
    return nll


def _rnnt_fwd(logits, targets, t_lens, u_lens, blank_id, fastemit_lambda,
              clamp, impl="scan"):
    blank_lp, label_lp, lse = _prep(logits, targets, blank_id)
    # clamp joint activations' effect is applied on gradients only (reference
    # LogSoftmaxGradModification, cpu_rnnt.py:141); forward unchanged.
    alpha = _compute_alphas(blank_lp, label_lp, t_lens, u_lens, impl)
    # ll = alpha[T-1, U] + blank_lp[T-1, U]
    b = logits.shape[0]
    bi = jnp.arange(b)
    a_term = alpha[bi, t_lens - 1, u_lens]
    lp_term = blank_lp[bi, t_lens - 1, u_lens]
    ll = a_term + lp_term
    nll = -(1.0 + fastemit_lambda) * ll if fastemit_lambda > 0 else -ll
    # prep outputs + alpha ride along as residuals ([B,T,U+1] each — tiny
    # next to logits) so backward runs ONE lattice scan (beta) instead of
    # prep + alpha + beta.
    return nll, (logits, targets, t_lens, u_lens, blank_lp, label_lp, lse, alpha)


def _rnnt_bwd(blank_id, fastemit_lambda, clamp, impl, res, g):
    logits, targets, t_lens, u_lens, blank_lp, label_lp, lse, alpha = res
    beta = _compute_betas(blank_lp, label_lp, t_lens, u_lens, impl)
    b, t_max, u1, v = logits.shape
    bi = jnp.arange(b)
    ll = beta[bi, 0, 0]  # total log-likelihood

    # Occupancy-weighted posteriors:
    #   gb(t,u) = exp(alpha + blank_lp + beta[t+1,u] - ll)   (emit blank)
    #   gy(t,u) = exp(alpha + label_lp + beta[t,u+1] - ll)   (emit label)
    beta_tp1 = jnp.pad(beta, ((0, 0), (0, 1), (0, 0)), constant_values=_NEG_INF)[:, 1:]
    # terminal blank transition leaves the lattice with beta == 0
    is_terminal = (
        (jnp.arange(t_max)[None, :, None] == (t_lens - 1)[:, None, None])
        & (jnp.arange(u1)[None, None, :] == u_lens[:, None, None])
    )
    beta_tp1 = jnp.where(is_terminal, 0.0, beta_tp1)
    beta_up1 = jnp.pad(beta, ((0, 0), (0, 0), (0, 1)), constant_values=_NEG_INF)[:, :, 1:]

    def occ(x):
        return jnp.exp(jnp.clip(x, _NEG_INF, 0.0))

    gb = occ(alpha + blank_lp + beta_tp1 - ll[:, None, None])
    gy = occ(alpha + label_lp + beta_up1 - ll[:, None, None])
    if fastemit_lambda > 0:
        gy = gy * (1.0 + fastemit_lambda)
        gb_scale = 1.0 + fastemit_lambda  # total-prob row also scales
    else:
        gb_scale = 1.0

    total = gb * gb_scale + gy  # occupancy mass leaving each lattice cell
    # grad wrt logits: softmax(logits) * total - per-path one-hot posteriors
    # (softmax rebuilt from the saved lse — no log_softmax rematerialization)
    grad = jnp.exp(logits.astype(jnp.float32) - lse[..., None]) * total[..., None]
    grad = grad.at[..., blank_id].add(-gb * gb_scale)
    tgt = jnp.pad(targets.astype(jnp.int32), ((0, 0), (0, 1)))
    onehot_y = jnp.arange(v)[None, None, None, :] == tgt[:, None, :, None]
    grad = grad - jnp.where(onehot_y, gy[..., None], 0.0)

    # zero outside each sample's lattice
    in_lattice = (
        (jnp.arange(t_max)[None, :, None] < t_lens[:, None, None])
        & (jnp.arange(u1)[None, None, :] <= u_lens[:, None, None])
    )
    grad = jnp.where(in_lattice[..., None], grad, 0.0)

    if clamp > 0:
        grad = jnp.clip(grad, -clamp, clamp)

    grad = grad * g[:, None, None, None]
    return (grad.astype(logits.dtype), None, None, None)


rnnt_loss_from_logits.defvjp(
    lambda logits, targets, t_lens, u_lens, blank_id, fastemit_lambda=0.0,
    clamp=-1.0, impl="scan": _rnnt_fwd(
        logits, targets, t_lens, u_lens, blank_id, fastemit_lambda, clamp, impl
    ),
    _rnnt_bwd,
)


@typecheck(logits=("B", "T", "U1", "V"), targets=("B", "U"),
           t_lens=("B",), u_lens=("B",))
def rnnt_loss(
    logits,
    targets,
    t_lens,
    u_lens,
    *,
    blank_id: int,
    reduction: str = "mean_batch",
    fastemit_lambda: float = 0.0,
    clamp: float = -1.0,
    impl: str = "scan",
):
    nll = rnnt_loss_from_logits(
        logits, targets, t_lens, u_lens, blank_id, fastemit_lambda, clamp, impl
    )
    if reduction == "mean_batch":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(u_lens.astype(nll.dtype), 1.0))
    return nll
