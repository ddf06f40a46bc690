"""RNN-T alpha/beta lattice recursions as Pallas TPU kernels.

The lax.scan implementation (ops/rnnt_loss.py `_compute_alphas/_compute_betas`)
pays per-step dispatch on its T+U sequential steps with every column bouncing
through HBM. These kernels keep a batch tile's whole skewed lattice resident
in VMEM and run the full diagonal sweep inside one program — the TPU
formulation of the reference's wavefront CUDA kernels
(`asr/parts/numba/rnnt_loss/utils/cuda_utils/gpu_rnnt_kernel.py:65,167`):
one grid cell per batch tile instead of one CUDA block per sample, the
anti-diagonal vectorized on the VPU instead of U threads + syncthreads.

Layout: skewed [B, W, T] with W = T + U1 columns (d = t + u); a column update
is a [bt, T] vector op; the t-shift of the blank parent is a lane-axis pad.
Inputs are pre-masked (-inf outside each sample's lattice) and pre-skewed by
XLA reshapes (ops/rnnt_loss.py `_skew` — zero gathers), so the kernels are
pure recursion.

Semantics identical to the scan path (tested in interpret mode and against
the NumPy oracle in tests/test_rnnt_loss.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _lse(a, b):
    m = jnp.maximum(a, b)
    bad = m <= _NEG_INF * 0.5
    m_safe = jnp.where(bad, 0.0, m)
    out = m_safe + jnp.log(
        jnp.exp(jnp.where(bad, 0.0, a - m_safe))
        + jnp.exp(jnp.where(bad, 0.0, b - m_safe))
    )
    return jnp.where(bad, _NEG_INF, out)


def _alpha_kernel(bl_ref, lb_ref, alpha_ref):
    """bl/lb: [bt, W, T] skewed log-probs; alpha out: [bt, W, T] skewed.

    col_d[t] = lse(col_{d-1}[t-1] + bl[t-1, d-1], col_{d-1}[t] + lb[t, d-1]).
    """
    bt, w, t_max = bl_ref.shape
    # no scatter in Mosaic: build the one-hot start column with an iota mask
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (bt, t_max), 1)
    col0 = jnp.where(t_ids == 0, 0.0, _NEG_INF)
    alpha_ref[:, 0, :] = col0

    def body(d, col):
        bl_prev = bl_ref[:, d - 1, :]
        lb_prev = lb_ref[:, d - 1, :]
        left = col + bl_prev
        from_left = jnp.pad(left, ((0, 0), (1, 0)),
                            constant_values=_NEG_INF)[:, :t_max]
        new = _lse(from_left, col + lb_prev)
        alpha_ref[:, d, :] = new
        return new

    jax.lax.fori_loop(1, w - 1, body, col0)
    # column W-1 is past every valid diagonal (max d = T+U1-2); mark -inf
    alpha_ref[:, w - 1, :] = jnp.full((bt, t_max), _NEG_INF)


def _beta_kernel(bl_ref, lb_ref, term_ref, beta_ref):
    """Reverse sweep: beta_d[t] = lse(bl[t,d] + beta_{d+1}[t+1],
    lb[t,d] + beta_{d+1}[t]), seeded at each sample's terminal cell
    (term holds blank_lp there, -inf elsewhere)."""
    bt, w, t_max = bl_ref.shape

    def body(i, col):
        d = w - 1 - i
        bl_d = bl_ref[:, d, :]
        lb_d = lb_ref[:, d, :]
        blank_child = jnp.pad(col, ((0, 0), (0, 1)),
                              constant_values=_NEG_INF)[:, 1:]
        new = _lse(bl_d + blank_child, lb_d + col)
        new = jnp.maximum(new, term_ref[:, d, :])
        beta_ref[:, d, :] = new
        return new

    colW = jnp.full((bt, t_max), _NEG_INF)
    jax.lax.fori_loop(0, w, body, colW)


def _tile_size(b: int, w: int, t_max: int, n_arrays: int,
               budget_bytes: int = 8 * 2 ** 20) -> int:
    per_sample = n_arrays * w * t_max * 4
    bt = max(1, budget_bytes // per_sample)
    while bt > 1 and b % bt != 0:
        bt -= 1
    return min(bt, b)


def _pad_batch(x, bt):
    pad = -x.shape[0] % bt
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)), constant_values=_NEG_INF)
    return x


def alphas_skewed_pallas(bl_skew, lb_skew, *, interpret: bool = False):
    """bl/lb: [B, T, W] skewed (as produced by rnnt_loss._skew) ->
    alpha [B, T, W] skewed."""
    b, t_max, w = bl_skew.shape
    bl = jnp.swapaxes(bl_skew, 1, 2)  # [B, W, T]
    lb = jnp.swapaxes(lb_skew, 1, 2)
    bt = _tile_size(b, w, t_max, n_arrays=3)
    bl, lb = _pad_batch(bl, bt), _pad_batch(lb, bt)
    bp = bl.shape[0]
    out = pl.pallas_call(
        _alpha_kernel,
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, w, t_max), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, w, t_max), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, w, t_max), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, w, t_max), jnp.float32),
        interpret=interpret,
    )(bl.astype(jnp.float32), lb.astype(jnp.float32))
    return jnp.swapaxes(out[:b], 1, 2)


def betas_skewed_pallas(bl_skew, lb_skew, term_skew, *, interpret: bool = False):
    """Skewed beta lattice [B, T, W] from skewed inputs + terminal seeds."""
    b, t_max, w = bl_skew.shape
    bl = jnp.swapaxes(bl_skew, 1, 2)
    lb = jnp.swapaxes(lb_skew, 1, 2)
    tm = jnp.swapaxes(term_skew, 1, 2)
    bt = _tile_size(b, w, t_max, n_arrays=4)
    bl, lb, tm = (_pad_batch(x, bt) for x in (bl, lb, tm))
    bp = bl.shape[0]
    out = pl.pallas_call(
        _beta_kernel,
        grid=(bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, w, t_max), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, w, t_max), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, w, t_max), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, w, t_max), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, w, t_max), jnp.float32),
        interpret=interpret,
    )(bl.astype(jnp.float32), lb.astype(jnp.float32), tm.astype(jnp.float32))
    return jnp.swapaxes(out[:b], 1, 2)
