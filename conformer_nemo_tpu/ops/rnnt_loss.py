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

_NEG_INF = -1e30


def _lse2(a, b):
    """NaN-safe log-add-exp of two stacked lattices."""
    m = jnp.maximum(a, b)
    bad = m <= _NEG_INF * 0.5
    m_safe = jnp.where(bad, 0.0, m)
    ea = jnp.exp(jnp.where(bad, 0.0, a - m_safe))
    eb = jnp.exp(jnp.where(bad, 0.0, b - m_safe))
    return jnp.where(bad, _NEG_INF, m_safe + jnp.log(ea + eb))


def _gather_diag(x: jnp.ndarray, d, t_idx: jnp.ndarray, u_shift: int) -> jnp.ndarray:
    """x: [B, T, U1]; returns x[:, t, d - t + u_shift] for each t, masked to
    _NEG_INF outside [0, U1). Shapes: t_idx [T] static iota, d scalar traced."""
    b, t_max, u1 = x.shape
    u_idx = d - t_idx + u_shift  # [T]
    valid = (u_idx >= 0) & (u_idx < u1)
    u_safe = jnp.clip(u_idx, 0, u1 - 1)
    vals = jnp.take_along_axis(x, u_safe[None, :, None].repeat(b, 0), axis=2)[..., 0]
    return jnp.where(valid[None, :], vals, _NEG_INF)


def _compute_alphas(blank_lp, label_lp, t_lens, u_lens):
    """alpha lattice [B, T, U+1] via scan over anti-diagonals d = t + u.

    blank_lp: [B, T, U+1] log p(blank | t, u); label_lp: [B, T, U+1] with
    label_lp[:, t, u] = log p(y_{u+1} | t, u) (last column invalid/-inf).
    """
    b, t_max, u1 = blank_lp.shape
    t_idx = jnp.arange(t_max)

    in_lattice = (
        (t_idx[None, :, None] < t_lens[:, None, None])
        & (jnp.arange(u1)[None, None, :] <= u_lens[:, None, None])
    )

    alpha0 = jnp.full((b, t_max, u1), _NEG_INF)
    alpha0 = alpha0.at[:, 0, 0].set(0.0)

    def step(alpha, d):
        # alpha[t, u] with t+u == d:
        #   from-left  (t-1, u): alpha[t-1, u] + blank_lp[t-1, u]
        #   from-below (t, u-1): alpha[t, u-1] + label_lp[t, u-1]
        a_tm1_u = jnp.pad(alpha, ((0, 0), (1, 0), (0, 0)), constant_values=_NEG_INF)[:, :t_max]
        b_tm1_u = jnp.pad(blank_lp, ((0, 0), (1, 0), (0, 0)), constant_values=_NEG_INF)[:, :t_max]
        from_left = _gather_diag(a_tm1_u + b_tm1_u, d, t_idx, 0)

        a_t_um1 = jnp.pad(alpha, ((0, 0), (0, 0), (1, 0)), constant_values=_NEG_INF)[:, :, :u1]
        y_t_um1 = jnp.pad(label_lp, ((0, 0), (0, 0), (1, 0)), constant_values=_NEG_INF)[:, :, :u1]
        from_below = _gather_diag(a_t_um1 + y_t_um1, d, t_idx, 0)

        new_diag = _lse2(from_left, from_below)  # [B, T] entries (t, d-t)

        # Scatter the diagonal back into the lattice.
        u_idx = d - t_idx
        valid = (u_idx >= 0) & (u_idx < u1)
        u_safe = jnp.clip(u_idx, 0, u1 - 1)
        onehot = (jnp.arange(u1)[None, :] == u_safe[:, None]) & valid[:, None]  # [T, U1]
        alpha = jnp.where(onehot[None, :, :], new_diag[:, :, None], alpha)
        alpha = jnp.where(in_lattice, alpha, _NEG_INF)
        return alpha, None

    alpha, _ = jax.lax.scan(
        step, jnp.where(in_lattice, alpha0, _NEG_INF),
        jnp.arange(1, t_max + u1 - 1), unroll=4,
    )
    return alpha


def _compute_betas(blank_lp, label_lp, t_lens, u_lens):
    """beta lattice [B, T, U+1]; beta[T-1, U] = blank_lp[T-1, U] (per-sample
    T = t_lens, U = u_lens). beta[0, 0] is the total log-likelihood."""
    b, t_max, u1 = blank_lp.shape
    t_idx = jnp.arange(t_max)
    u_row = jnp.arange(u1)[None, None, :]

    in_lattice = (
        (t_idx[None, :, None] < t_lens[:, None, None])
        & (u_row <= u_lens[:, None, None])
    )

    is_terminal = (
        (t_idx[None, :, None] == (t_lens - 1)[:, None, None])
        & (u_row == u_lens[:, None, None])
    )
    beta0 = jnp.where(is_terminal, blank_lp, _NEG_INF)
    beta0 = jnp.where(in_lattice, beta0, _NEG_INF)

    def step(beta, d):
        # beta[t, u] = lse(blank_lp[t,u] + beta[t+1,u], label_lp[t,u] + beta[t,u+1])
        b_tp1_u = jnp.pad(beta, ((0, 0), (0, 1), (0, 0)), constant_values=_NEG_INF)[:, 1:]
        go_right = blank_lp + b_tp1_u
        b_t_up1 = jnp.pad(beta, ((0, 0), (0, 0), (0, 1)), constant_values=_NEG_INF)[:, :, 1:]
        go_up = label_lp + b_t_up1
        new = _lse2(
            _gather_diag(go_right, d, t_idx, 0), _gather_diag(go_up, d, t_idx, 0)
        )

        u_idx = d - t_idx
        valid = (u_idx >= 0) & (u_idx < u1)
        u_safe = jnp.clip(u_idx, 0, u1 - 1)
        onehot = (jnp.arange(u1)[None, :] == u_safe[:, None]) & valid[:, None]
        # Keep the terminal-cell initialization (don't overwrite it).
        upd = jnp.where(onehot[None, :, :] & ~is_terminal, new[:, :, None], beta)
        return jnp.where(in_lattice, upd, _NEG_INF), None

    # sweep d from large to small
    ds = jnp.arange(t_max + u1 - 2, -1, -1)
    beta, _ = jax.lax.scan(step, beta0, ds, unroll=4)
    return beta


def _prep(logits, targets, blank_id):
    """log-softmax over V and gather blank/label log-probs.

    logits: [B, T, U+1, V]; targets: [B, U].
    Returns (blank_lp, label_lp, logp) each [B, T, U+1(, V)].
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank_lp = logp[..., blank_id]
    b, t_max, u1, _ = logp.shape
    # label at (t, u) is targets[u] (the next emitted label), u < U
    tgt = jnp.pad(targets.astype(jnp.int32), ((0, 0), (0, 1)))  # [B, U+1], last col dummy
    tgt_b = jnp.broadcast_to(tgt[:, None, :, None], (b, t_max, u1, 1))
    label_lp = jnp.take_along_axis(logp, tgt_b, axis=-1)[..., 0]
    # invalidate the u = U column (no label to emit there)
    u_row = jnp.arange(u1)[None, None, :]
    label_lp = jnp.where(u_row >= (u1 - 1), _NEG_INF, label_lp)
    return blank_lp, label_lp, logp


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def rnnt_loss_from_logits(
    logits, targets, t_lens, u_lens, blank_id, fastemit_lambda=0.0, clamp=-1.0
):
    """Per-sample RNN-T negative log-likelihood [B].

    logits: joint outputs [B, T, U+1, V] (V includes blank at `blank_id`);
    t_lens: valid encoder frames; u_lens: valid target lengths.
    FastEmit: total loss scaled as (1 + lambda) * loss on the emit path —
    implemented exactly as the reference kernel does (grad-side Eq. 9/10 plus
    lambda-scaled cost).
    """
    nll, _ = _rnnt_fwd(logits, targets, t_lens, u_lens, blank_id, fastemit_lambda, clamp)
    return nll


def _rnnt_fwd(logits, targets, t_lens, u_lens, blank_id, fastemit_lambda, clamp):
    blank_lp, label_lp, _ = _prep(logits, targets, blank_id)
    # clamp joint activations' effect is applied on gradients only (reference
    # LogSoftmaxGradModification, cpu_rnnt.py:141); forward unchanged.
    alpha = _compute_alphas(blank_lp, label_lp, t_lens, u_lens)
    # ll = alpha[T-1, U] + blank_lp[T-1, U]
    b = logits.shape[0]
    bi = jnp.arange(b)
    a_term = alpha[bi, t_lens - 1, u_lens]
    lp_term = blank_lp[bi, t_lens - 1, u_lens]
    ll = a_term + lp_term
    nll = -(1.0 + fastemit_lambda) * ll if fastemit_lambda > 0 else -ll
    return nll, (logits, targets, t_lens, u_lens)


def _rnnt_bwd(blank_id, fastemit_lambda, clamp, res, g):
    logits, targets, t_lens, u_lens = res
    blank_lp, label_lp, logp = _prep(logits, targets, blank_id)
    alpha = _compute_alphas(blank_lp, label_lp, t_lens, u_lens)
    beta = _compute_betas(blank_lp, label_lp, t_lens, u_lens)
    b, t_max, u1, v = logp.shape
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
    grad = jnp.exp(logp) * total[..., None]
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
    lambda logits, targets, t_lens, u_lens, blank_id, fastemit_lambda=0.0, clamp=-1.0: _rnnt_fwd(
        logits, targets, t_lens, u_lens, blank_id, fastemit_lambda, clamp
    ),
    _rnnt_bwd,
)


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
):
    nll = rnnt_loss_from_logits(
        logits, targets, t_lens, u_lens, blank_id, fastemit_lambda, clamp
    )
    if reduction == "mean_batch":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(u_lens.astype(nll.dtype), 1.0))
    return nll
