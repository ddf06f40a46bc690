"""Flash attention (Pallas TPU kernel) for the Conformer's self-attention.

Replaces the XLA path that materializes [B, H, T, T] scores in HBM. Thanks to
the sinusoidal decomposition of the Transformer-XL bd term
(models/conformer.py RelPosMultiHeadAttention), rel-pos attention is exactly

    softmax( (Qs @ Ks^T) * scale + length_mask ) @ V

with score-query Qs = [q + u | modulated(q + v)] and score-key Ks = [k | cs]
— plain dot-product attention with an extended score depth D1 and value
depth dv. One kernel therefore serves both abs-pos and rel-pos attention.

Design (standard online-softmax flash):
  grid = (B*H, T/Bq); each program streams K/V tiles of size Bk from VMEM,
  carrying the running row-max, normalizer and output accumulator. Length
  masking folds into each score tile via broadcasted iota. The forward also
  emits the per-row logsumexp; the backward is FUSED Pallas too — a dQ
  kernel (query-tiled, streams K/V) and a dK/dV kernel (key-tiled, streams
  Q/dO), using the saved lse + delta = rowsum(dO * O), so no [T, T]
  probability matrix ever reaches HBM in either direction.

Banding (att_context_size): static (left, right) window limits fold into
the tile masks, and out-of-band K/V (resp. Q/dO) tiles are SKIPPED via
dynamic fori_loop bounds — banded attention runs in O(T*w) compute and
never materializes [T, T], which is exactly the streaming-consistent
long-form training configuration (conformer_encoder.py:263-267 banding +
SURVEY §5.7). left/right < 0 = unlimited (identical to the unbanded
kernel; the loop bounds collapse to static 0..n_tiles).

Interpret-mode tests (CPU) check parity vs the naive formulation
(tests/test_flash_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


# Full-T streaming blocks (K/V in fwd and dQ; Q/dO/lse/delta in dK/dV) put
# the kernels' scoped-VMEM stack over the 16 MB default once T >= 2048
# (measured on-chip: 17.33 MB at T=2048, B*H=64, d1=576). Budget scales
# linearly with T: ~9 MB/1k frames -> the 100 MB cap carries to T ~= 10k
# frames (~7 min of audio post-subsampling); past that the streamed side
# must be tiled too.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pick_tiles(t: int, bq: int, bk: int):
    bq = min(bq, t)
    bk = min(bk, t)
    while t % bq:
        bq //= 2
    while t % bk:
        bk //= 2
    return max(bq, 1), max(bk, 1)


def _band_tile_bounds(q_lo, q_hi, left, right, bk, n_tiles):
    """Key-tile index range [lo, hi) that can intersect the band for query
    rows [q_lo, q_hi). Static unlimited band -> static (0, n_tiles)."""
    if left < 0 and right < 0:
        return 0, n_tiles
    lo = 0
    hi = n_tiles
    if left >= 0:  # keys older than q - left are out of band
        lo = jnp.maximum((q_lo - left) // bk, 0)
    if right >= 0:  # keys newer than q + right are out of band
        hi = jnp.minimum((q_hi + right + bk - 1) // bk, n_tiles)
        hi = jnp.maximum(hi, lo)
    return lo, hi


def _band_mask(mask, q_idx, key_idx, left, right):
    """Fold the static (left, right) window into a tile mask.
    q_idx/key_idx broadcast to the mask's shape."""
    if left >= 0:   # query may look back at most `left`: i - j <= left
        mask = mask & (q_idx - key_idx <= left)
    if right >= 0:  # and ahead at most `right`: j - i <= right
        mask = mask & (key_idx - q_idx <= right)
    return mask


def _make_kernel(bk: int, scale: float, left: int, right: int):
    def kernel(lens_ref, qs_ref, ks_ref, v_ref, o_ref, lse_ref):
        b = pl.program_id(0)
        i_q = pl.program_id(1)
        valid_len = lens_ref[b]
        bq, d1 = qs_ref.shape[1], qs_ref.shape[2]
        tk, dv = v_ref.shape[1], v_ref.shape[2]

        q = qs_ref[0, :, :].astype(jnp.float32) * scale  # [bq, d1]
        q_idx = i_q * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

        def body(i, carry):
            m_prev, l_prev, acc = carry
            start = i * bk
            k_tile = ks_ref[0, pl.ds(start, bk), :]  # [bk, d1]
            v_tile = v_ref[0, pl.ds(start, bk), :]  # [bk, dv]
            s = jax.lax.dot_general(
                q, k_tile.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bq, bk]
            key_idx = start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            mask = _band_mask(key_idx < valid_len, q_idx, key_idx, left, right)
            s = jnp.where(mask, s, _NEG_INF)

            m_cur = jnp.max(s, axis=1)
            m_new = jnp.maximum(m_prev, m_cur)
            m_safe = jnp.where(m_new <= _NEG_INF * 0.5, 0.0, m_new)
            p = jnp.exp(jnp.where(mask, s - m_safe[:, None], _NEG_INF))
            alpha = jnp.where(
                m_prev <= _NEG_INF * 0.5, 0.0, jnp.exp(m_prev - m_safe)
            )
            l_new = l_prev * alpha + jnp.sum(p, axis=1)
            acc = acc * alpha[:, None] + jax.lax.dot_general(
                p, v_tile.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m0 = jnp.full((bq,), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq,), jnp.float32)
        acc0 = jnp.zeros((bq, dv), jnp.float32)
        lo, hi = _band_tile_bounds(i_q * bq, (i_q + 1) * bq, left, right,
                                   bk, tk // bk)
        m, l, acc = jax.lax.fori_loop(lo, hi, body, (m0, l0, acc0))
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, :, :] = (acc / l_safe[:, None]).astype(o_ref.dtype)
        # per-row logsumexp for the fused backward; fully-masked rows get 0
        # so bwd's exp(s - lse) underflows to 0 instead of overflowing.
        # Stored [bh, t, 1]: a (1, bq, 1) block satisfies the TPU tiling rule
        # (trailing dim equals the array dim) where (1, bq) would not.
        m_fin = jnp.where(m <= _NEG_INF * 0.5, 0.0, m)
        lse_ref[0, :, :] = (m_fin + jnp.log(l_safe))[:, None]

    return kernel


def _flash_fwd_entry(qs, ks, v, lens, bq, bk, scale, interpret,
                     with_lse=False, left=-1, right=-1):
    bh, t, d1 = qs.shape
    dv = v.shape[-1]
    bq, bk = _pick_tiles(t, bq, bk)
    o, lse = pl.pallas_call(
        _make_kernel(bk, scale, left, right),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d1), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, t, d1), lambda b, i, lens: (b, 0, 0)),
                pl.BlockSpec((1, t, dv), lambda b, i, lens: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, dv), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, bq, 1), lambda b, i, lens: (b, i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, dv), qs.dtype),
            jax.ShapeDtypeStruct((bh, t, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(lens.astype(jnp.int32), qs, ks, v)
    return (o, lse) if with_lse else o


def _make_dq_kernel(bk: int, scale: float, left: int, right: int):
    def kernel(lens_ref, qs_ref, ks_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref):
        b = pl.program_id(0)
        i_q = pl.program_id(1)
        valid_len = lens_ref[b]
        bq, d1 = qs_ref.shape[1], qs_ref.shape[2]
        tk, dv = v_ref.shape[1], v_ref.shape[2]

        q = qs_ref[0, :, :].astype(jnp.float32)
        do = do_ref[0, :, :].astype(jnp.float32)
        lse = lse_ref[0, :, :]  # [bq, 1]
        delta = delta_ref[0, :, :]  # [bq, 1]
        q_idx = i_q * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        q_valid = q_idx < valid_len  # [bq, 1]

        def body(i, acc):
            start = i * bk
            k_tile = ks_ref[0, pl.ds(start, bk), :].astype(jnp.float32)
            v_tile = v_ref[0, pl.ds(start, bk), :].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            key_idx = start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            mask = _band_mask((key_idx < valid_len) & q_valid,
                              q_idx, key_idx, left, right)
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)
            dp = jax.lax.dot_general(
                do, v_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bq, bk]
            ds = p * (dp - delta) * scale
            return acc + jax.lax.dot_general(
                ds, k_tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc0 = jnp.zeros((bq, d1), jnp.float32)
        lo, hi = _band_tile_bounds(i_q * bq, (i_q + 1) * bq, left, right,
                                   bk, tk // bk)
        acc = jax.lax.fori_loop(lo, hi, body, acc0)
        dq_ref[0, :, :] = acc.astype(dq_ref.dtype)

    return kernel


def _make_dkv_kernel(bq2: int, scale: float, left: int, right: int):
    def kernel(lens_ref, qs_ref, ks_ref, v_ref, do_ref, lse_ref, delta_ref,
               dk_ref, dv_ref):
        b = pl.program_id(0)
        i_k = pl.program_id(1)
        valid_len = lens_ref[b]
        tq, d1 = qs_ref.shape[1], qs_ref.shape[2]
        bk, dv = dv_ref.shape[1], dv_ref.shape[2]

        k_tile = ks_ref[0, :, :].astype(jnp.float32)  # [bk, d1]
        v_tile = v_ref[0, :, :].astype(jnp.float32)  # [bk, dv]
        key_idx = i_k * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        key_valid = key_idx < valid_len  # [1, bk]

        def body(i, carry):
            dk_acc, dv_acc = carry
            start = i * bq2
            q_tile = qs_ref[0, pl.ds(start, bq2), :].astype(jnp.float32)
            do_tile = do_ref[0, pl.ds(start, bq2), :].astype(jnp.float32)
            lse = lse_ref[0, pl.ds(start, bq2), :]  # [bq2, 1]
            delta = delta_ref[0, pl.ds(start, bq2), :]
            s = jax.lax.dot_general(
                q_tile, k_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [bq2, bk]
            q_idx = start + jax.lax.broadcasted_iota(jnp.int32, (bq2, 1), 0)
            mask = _band_mask(key_valid & (q_idx < valid_len),
                              q_idx, key_idx, left, right)
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)
            dv_acc = dv_acc + jax.lax.dot_general(
                p, do_tile, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bk, dv]
            dp = jax.lax.dot_general(
                do_tile, v_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bq2, bk]
            ds = p * (dp - delta) * scale
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, q_tile, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bk, d1]
            return dk_acc, dv_acc

        dk0 = jnp.zeros((bk, d1), jnp.float32)
        dv0 = jnp.zeros((bk, dv), jnp.float32)
        # the key block [i_k*bk, (i_k+1)*bk) is in-band for query rows
        # [i_k*bk - right, (i_k+1)*bk + left): the window inverts
        lo, hi = _band_tile_bounds(i_k * bk, (i_k + 1) * bk, right, left,
                                   bq2, tq // bq2)
        dk_acc, dv_acc = jax.lax.fori_loop(lo, hi, body, (dk0, dv0))
        dk_ref[0, :, :] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, :] = dv_acc.astype(dv_ref.dtype)

    return kernel


def _flash_bwd_entry(qs, ks, v, do, lse, delta, lens, bq, bk, scale, interpret,
                     left=-1, right=-1):
    bh, t, d1 = qs.shape
    dv_dim = v.shape[-1]
    bq, bk = _pick_tiles(t, bq, bk)
    lens = lens.astype(jnp.int32)

    dq = pl.pallas_call(
        _make_dq_kernel(bk, scale, left, right),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d1), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, t, d1), lambda b, i, lens: (b, 0, 0)),
                pl.BlockSpec((1, t, dv_dim), lambda b, i, lens: (b, 0, 0)),
                pl.BlockSpec((1, bq, dv_dim), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, bq, 1), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, bq, 1), lambda b, i, lens: (b, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, d1), lambda b, i, lens: (b, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t, d1), qs.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(lens, qs, ks, v, do, lse, delta)

    dk, dvv = pl.pallas_call(
        _make_dkv_kernel(bq, scale, left, right),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t // bk),
            in_specs=[
                pl.BlockSpec((1, t, d1), lambda b, i, lens: (b, 0, 0)),
                pl.BlockSpec((1, bk, d1), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, bk, dv_dim), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, t, dv_dim), lambda b, i, lens: (b, 0, 0)),
                pl.BlockSpec((1, t, 1), lambda b, i, lens: (b, 0, 0)),
                pl.BlockSpec((1, t, 1), lambda b, i, lens: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bk, d1), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, bk, dv_dim), lambda b, i, lens: (b, i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d1), ks.dtype),
            jax.ShapeDtypeStruct((bh, t, dv_dim), v.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(lens, qs, ks, v, do, lse, delta)
    return dq, dk, dvv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def flash_attention(
    qs, ks, v, lens, bq: int = 256, bk: int = 512, scale: float = 1.0,
    interpret: bool = False, left: int = -1, right: int = -1,
):
    """Masked softmax(Qs Ks^T * scale) V without [T, T] HBM materialization.

    qs/ks: [BH, T, D1]; v: [BH, T, dv]; lens: [BH] int32 valid key lengths.
    Query rows beyond lens produce normalized garbage the caller masks out.
    left/right: static att_context_size band (query i attends key j iff
    i - j <= left and j - i <= right; -1 = unlimited). Out-of-band tiles are
    skipped, so banded attention runs in O(T*w).
    """
    return _flash_fwd_entry(qs, ks, v, lens, bq, bk, scale, interpret,
                            left=left, right=right)


def _flash_vjp_fwd(qs, ks, v, lens, bq, bk, scale, interpret, left, right):
    o, lse = _flash_fwd_entry(qs, ks, v, lens, bq, bk, scale, interpret,
                              with_lse=True, left=left, right=right)
    return o, (qs, ks, v, lens, o, lse)


def _flash_vjp_bwd(bq, bk, scale, interpret, left, right, res, g):
    qs, ks, v, lens, o, lse = res
    # delta_i = sum_d dO_i O_i (the softmax-jacobian row term); tiny
    # elementwise+reduce, XLA fuses it — no kernel needed
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                    keepdims=True)  # [bh, t, 1], matching lse's layout
    dq, dk, dv = _flash_bwd_entry(
        qs, ks, v, g, lse, delta, lens, bq, bk, scale, interpret,
        left=left, right=right)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)
