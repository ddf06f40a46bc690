"""CTC forward-backward as Pallas TPU kernels.

The lax.scan CTC (ops/ctc_loss.py) pays per-step dispatch overhead on its
T sequential steps (~17 ms forward at B16/T376). These kernels run the whole
alpha (and beta+gradient) recursion inside one program per batch tile with
the lattice resident in VMEM.

Division of labor:
  * XLA precomputes emits[b, t, s] = log_probs[b, t, ext[b, s]] (one gather)
    and later scatters d_emits back onto the V classes (one scatter-add via
    one-hot matmul) — both single fused ops XLA is good at.
  * The Pallas forward kernel scans t = 0..T-1 producing all alphas
    [B, T, S] (stored to HBM for the backward) with per-sample length
    freezing.
  * The backward kernel runs the beta recursion and emits the posterior
    gradient d(-ll)/d emit(t, s) = -exp(alpha_t(s) + beta_t(s) - ll) in the
    same sweep.

Semantics identical to ops/ctc_loss.py (tested in interpret mode and against
torch.nn.CTCLoss via the existing oracle tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# The whole-batch tile keeps in+out lattice blocks resident ([16,376,257] f32
# padded to lanes ~= 18.5 MB), above the default 16 MB scoped-vmem budget;
# v5e has 128 MB of VMEM, so raise the per-kernel limit instead of shrinking
# the tile (smaller tiles serialize the T-sweep across grid steps).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _lse(a, b):
    m = jnp.maximum(a, b)
    bad = m <= _NEG_INF * 0.5
    m_safe = jnp.where(bad, 0.0, m)
    out = m_safe + jnp.log(
        jnp.exp(jnp.where(bad, 0.0, a - m_safe)) + jnp.exp(jnp.where(bad, 0.0, b - m_safe))
    )
    return jnp.where(bad, _NEG_INF, out)


def _shift_right(x, k):
    """[B, S] -> shifted right along S by k, -inf fill."""
    return jnp.pad(x, ((0, 0), (k, 0)), constant_values=_NEG_INF)[:, : x.shape[1]]


def _fwd_kernel(lens_ref, emits_ref, skip_ref, init_ref, alphas_ref):
    """One batch tile. emits: [bt, T, S]; skip: [bt, S] (0/1); init: [bt, S]
    initial alpha_0 (already includes emits[:,0]); lens: [bt, 1] VMEM;
    alphas out: [bt, T, S]."""
    bt, t_max, s_max = emits_ref.shape
    lens_col = lens_ref[:, :]  # [bt, 1]

    alphas_ref[:, 0, :] = init_ref[:, :]
    skip = skip_ref[:, :]

    def body(t, alpha):
        emit_t = emits_ref[:, t, :]
        a1 = _shift_right(alpha, 1)
        a2 = jnp.where(skip > 0.5, _shift_right(alpha, 2), _NEG_INF)
        new = _lse(_lse(alpha, a1), a2) + emit_t
        # freeze samples whose length is exhausted
        active = t < lens_col  # [bt, 1] broadcast
        new = jnp.where(active, new, alpha)
        alphas_ref[:, t, :] = new
        return new

    jax.lax.fori_loop(1, t_max, body, init_ref[:, :])


def _bwd_kernel(lens_ref, lls_ref, emits_ref, skip_ref, final_ref, alphas_ref, dem_ref):
    """Beta recursion + posterior gradient in one reverse sweep.

    final: [bt, S] indicator (0 at terminal states s in {S-1, S-2}, else -inf)
    lls: [B_total] total log-likelihood per sample.
    dem out: [bt, T, S] = d(-ll)/d emit(t, s)  (caller scales by upstream g).
    """
    bt, t_max, s_max = emits_ref.shape
    lens_col = lens_ref[:, :]  # [bt, 1] VMEM
    lls_col = lls_ref[:, :]  # [bt, 1] VMEM
    skip = skip_ref[:, :]

    def shift_left(x, k):
        return jnp.pad(x, ((0, 0), (0, k)), constant_values=_NEG_INF)[:, k:]

    def body(i, beta):
        t = t_max - 1 - i
        # at t == len-1 the beta is the terminal indicator
        is_last = t == (lens_col - 1)  # [bt, 1]
        # recursion from t+1: stay / advance 1 / skip 2 (all consume emit at t+1)
        emit_n = emits_ref[:, jnp.minimum(t + 1, t_max - 1), :]
        be = beta + emit_n
        stay = be
        adv = shift_left(be, 1)
        # skip transition s -> s+2 requires can_skip at s+2
        skp = jnp.where(shift_left(skip, 2) > 0.5, shift_left(be, 2), _NEG_INF)
        rec = _lse(_lse(stay, adv), skp)
        beta_t = jnp.where(is_last, final_ref[:, :], rec)
        # beyond the valid length, no gradient and beta is the final indicator
        beyond = t >= lens_col  # [bt, 1]
        beta_t = jnp.where(beyond, final_ref[:, :], beta_t)
        alpha_t = alphas_ref[:, t, :]
        post = jnp.exp(jnp.clip(alpha_t + beta_t - lls_col, -60.0, 0.0))
        dem_ref[:, t, :] = jnp.where(beyond, 0.0, -post)
        return beta_t

    beta0 = jnp.full((bt, s_max), _NEG_INF)
    jax.lax.fori_loop(0, t_max, body, beta0)


def _pad_batch(x, bt):
    b = x.shape[0]
    pad = -b % bt
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _run_fwd(emits, skip, init, lens, bt, interpret):
    b, t_max, s_max = emits.shape
    grid = (b // bt,)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 1), lambda i: (i, 0)),
            pl.BlockSpec((bt, t_max, s_max), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, s_max), lambda i: (i, 0)),
            pl.BlockSpec((bt, s_max), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bt, t_max, s_max), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_max, s_max), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(lens[:, None], emits, skip, init)


def _run_bwd(emits, skip, final, alphas, lens, lls, bt, interpret):
    b, t_max, s_max = emits.shape
    grid = (b // bt,)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 1), lambda i: (i, 0)),
            pl.BlockSpec((bt, 1), lambda i: (i, 0)),
            pl.BlockSpec((bt, t_max, s_max), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, s_max), lambda i: (i, 0)),
            pl.BlockSpec((bt, s_max), lambda i: (i, 0)),
            pl.BlockSpec((bt, t_max, s_max), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, t_max, s_max), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_max, s_max), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(lens[:, None], lls[:, None], emits, skip, final, alphas)


def _prep(log_probs, targets, target_lengths, blank_id):
    """-> emits [B,T,S], ext [B,S], skip mask [B,S] f32, in_lattice [B,S]."""
    log_probs = log_probs.astype(jnp.float32)
    b, t_max, v = log_probs.shape
    u_max = targets.shape[1]
    s_max = 2 * u_max + 1
    ext = jnp.full((b, s_max), blank_id, jnp.int32).at[:, 1::2].set(targets.astype(jnp.int32))
    in_lattice = jnp.arange(s_max)[None, :] < (2 * target_lengths[:, None] + 1)
    ext_m2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s_max]
    skip = ((ext != blank_id) & (ext != ext_m2) & in_lattice).astype(jnp.float32)
    # emit gather as a one-hot MXU matmul: take_along_axis lowers to an XLA
    # gather that costs ~20 ms at B16/T376/S257 on v5e — 10x the whole
    # lattice kernel; the einsum runs in ~1.6 ms.
    onehot = (ext[:, :, None] == jnp.arange(v)[None, None, :]).astype(jnp.float32)
    # HIGHEST precision: the default 1-pass bf16 MXU dot rounds the selected
    # log-probs (~4e-3 rel), which measurably perturbs the lattice gradient;
    # multi-pass selection by a one-hot is bit-exact.
    emits = jnp.einsum("btv,bsv->bts", log_probs, onehot,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    emits = jnp.where(in_lattice[:, None, :], emits, _NEG_INF)
    return emits, ext, skip, in_lattice


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas(log_probs, targets, input_lengths, target_lengths, blank_id,
                    interpret: bool = False):
    """Per-sample CTC -log p via Pallas kernels. Same contract as
    ops.ctc_loss.ctc_forward_neg_log_likelihood."""
    nll, _ = _ctc_fwd(log_probs, targets, input_lengths, target_lengths, blank_id, interpret)
    return nll


def _terminal_indicator(s_max, target_lengths, b):
    s_idx = jnp.arange(s_max)[None, :]
    s_len = 2 * target_lengths[:, None] + 1
    is_term = (s_idx == s_len - 1) | ((s_idx == s_len - 2) & (target_lengths[:, None] > 0))
    return jnp.where(is_term, 0.0, _NEG_INF)


def _ctc_fwd(log_probs, targets, input_lengths, target_lengths, blank_id, interpret):
    emits, ext, skip, in_lattice = _prep(log_probs, targets, target_lengths, blank_id)
    b, t_max, s_max = emits.shape
    init = jnp.full((b, s_max), _NEG_INF)
    init = init.at[:, 0].set(emits[:, 0, 0])
    init = init.at[:, 1].set(jnp.where(target_lengths > 0, emits[:, 0, 1], _NEG_INF))

    bt = b  # one tile (batch is small); grid over tiles for big batches
    while bt > 8 and b % bt != 0:
        bt -= 1
    emits_p, skip_p, init_p = (_pad_batch(x, bt) for x in (emits, skip, init))
    lens_p = _pad_batch(input_lengths.astype(jnp.int32), bt)
    alphas = _run_fwd(emits_p, skip_p, init_p, lens_p, bt, interpret)[:b]

    # nll from the frozen final alphas (length-frozen at t = T-1)
    s_len = 2 * target_lengths[:, None] + 1
    a_last = alphas[:, -1, :]
    last = jnp.take_along_axis(a_last, (s_len - 1).astype(jnp.int32), axis=1)[:, 0]
    last2 = jnp.take_along_axis(a_last, jnp.maximum(s_len - 2, 0).astype(jnp.int32), axis=1)[:, 0]
    last2 = jnp.where(target_lengths > 0, last2, _NEG_INF)
    ll = jnp.logaddexp(last, last2)
    nll = -ll
    return nll, (log_probs, targets, input_lengths, target_lengths, alphas, ll)


def _ctc_bwd(blank_id, interpret, res, g):
    log_probs, targets, input_lengths, target_lengths, alphas, ll = res
    emits, ext, skip, in_lattice = _prep(log_probs, targets, target_lengths, blank_id)
    b, t_max, s_max = emits.shape
    v = log_probs.shape[-1]

    final = _terminal_indicator(s_max, target_lengths, b)
    bt = b
    while bt > 8 and b % bt != 0:
        bt -= 1
    d_emits = _run_bwd(
        _pad_batch(emits, bt), _pad_batch(skip, bt), _pad_batch(final, bt),
        _pad_batch(alphas, bt), _pad_batch(input_lengths.astype(jnp.int32), bt),
        _pad_batch(ll.astype(jnp.float32), bt), bt, interpret,
    )[:b]
    d_emits = jnp.where(in_lattice[:, None, :], d_emits, 0.0)
    # scatter S -> V classes: one-hot matmul (S, V small)
    onehot = (ext[:, :, None] == jnp.arange(v)[None, None, :]).astype(jnp.float32)
    grad = jnp.einsum("bts,bsv->btv", d_emits, onehot,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    grad = grad * g[:, None, None]
    return (grad.astype(log_probs.dtype), None, None, None)


ctc_loss_pallas.defvjp(
    lambda lp, t, il, tl, blank_id, interpret=False: _ctc_fwd(lp, t, il, tl, blank_id, interpret),
    _ctc_bwd,
)
