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
the tile masks, and out-of-band tiles are skipped in the full-T kernels
via dynamic fori_loop bounds — banded compute is O(T*w) in BOTH kernel
families. Two-sided bands (left >= 0 AND right >= 0) whose full-T blocks
would exceed the scoped-VMEM budget (closed-form estimate
_fullt_vmem_estimate(T, d1, dv) vs the 100 MB cap; _STREAM_MIN_T stays as
the depth-less fallback) take the BLOCK-BANDED STREAMING kernels: the
streamed operand (K/V in fwd and dQ; Q/dO in dK/dV) stays in HBM
(BlockSpec(memory_space=ANY)) and each program manually DMAs ONLY the
tiles that can intersect its band slice into a double-buffered VMEM
scratch (pltpu.make_async_copy; prefetch j+1 while computing j), guided
by scalar-prefetched per-block `starts`/`nloc` tables — HBM traffic AND
the VMEM working set become O(T*w)/O(w), unbounded in T. While the full-T
blocks fit, the full-T banded kernel is simply faster (measured through
T~=12288). This is the streaming-consistent long-form training
configuration (conformer_encoder.py:263-267 banding + SURVEY §5.7).

Interpret-mode tests (CPU) check parity vs the naive formulation
(tests/test_flash_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


# Full-T streaming blocks (K/V in fwd and dQ; Q/dO/lse/delta in dK/dV) put
# the kernels' scoped-VMEM stack over the 16 MB default once T >= 2048
# (measured on-chip: 17.33 MB at T=2048, B*H=64, d1=576). Budget scales
# linearly with T (~9-11 MB/1k frames with aligned depths); T=12288
# compiled and ran under the 100 MB cap (round-4 matrix), so the practical
# full-T ceiling is somewhere past that — the banded streaming kernels
# (O(w) VMEM) take over at _STREAM_MIN_T regardless, and unbanded runs at
# such T are dominated by O(T^2) compute anyway.
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


# ---------------------------------------------------------------------------
# Block-banded STREAMING kernels (two-sided bands).
#
# Grid stays 2D — (BH, n_block_tiles), one program per query (resp. key)
# tile, exactly like the full-T kernels — but the streamed operand lives in
# HBM (BlockSpec(memory_space=ANY)) and the kernel DMAs ONLY the in-band
# tiles into a double-buffered VMEM scratch with pltpu.make_async_copy,
# prefetching tile j+1 while computing tile j. Scalar-prefetched `starts`
# and `nloc` tables give each block tile its first in-band streamed-tile
# index and exact in-band tile count (all static shapes/band, so computed
# host-side). HBM traffic and the VMEM working set are O(T*w), independent
# of T.
#
# Why not a third grid dimension over in-band tiles: measured on-chip
# (v5e, T=3072 band(128,128), bh=64): 3840 tiny grid steps cost ~12 ms fwd
# vs 7.8 ms for the full-T kernel — per-program overhead swamps the DMA
# saving. Manual double-buffered DMA keeps the program count at bh*n_q
# (768) with the same inner-loop structure the full-T kernels already
# pipeline well.
# ---------------------------------------------------------------------------

# Streaming tile sizes (overriding the caller's full-T-path tiles): larger
# tiles than the band resolution would suggest, because per-tile costs
# (DMA issue latency, loop overhead, narrow matmuls) dominate below
# ~256-wide tiles — measured on-chip in scripts/bench_banded_stream.py.
_STREAM_BQ = 512
_STREAM_BK = 256


def _stream_tiles(t, bq, bk):
    """Tile sizes for the streamed kernels: production callers (bq/bk >=
    256) get the measured-fast streaming tiles; smaller caller tiles
    (tests, tiny t) pass through."""
    if bq >= 256:
        bq = _STREAM_BQ
    if bk >= 256:
        bk = _STREAM_BK
    return _pick_tiles(t, bq, bk)


def _stream_table(t, b_block, b_stream, lookback, lookahead):
    """Exact in-band streamed-tile ranges: starts[i] (first in-band tile of
    size b_stream) and nloc[i] (count) for each block tile of size b_block,
    where block row r is in-band with streamed row s iff r - s <= lookback
    and s - r <= lookahead (both >= 0). int32 arrays of length
    t//b_block; always 1 <= nloc and starts+nloc <= t//b_stream."""
    n_block = t // b_block
    n_stream = t // b_stream
    starts, nloc = [], []
    for i in range(n_block):
        lo = max(0, (i * b_block - lookback) // b_stream)
        hi = min(n_stream, ((i + 1) * b_block - 1 + lookahead) // b_stream + 1)
        hi = max(hi, lo + 1)  # diagonal is always in band
        starts.append(lo)
        nloc.append(hi - lo)
    return np.asarray(starts, np.int32), np.asarray(nloc, np.int32)


def _tile_streamer(hbm_refs, scratches, sems, bk, b, lo):
    """DMA helpers for double-buffered streaming of the `lo+j`-th [bk, ...]
    tile of each [BH, T, ...] HBM ref into slot j%2 of its scratch."""
    def dmas(slot, j):
        return [
            pltpu.make_async_copy(
                ref.at[b, pl.ds((lo + j) * bk, bk), :],
                scr.at[slot], sem.at[slot])
            for ref, scr, sem in zip(hbm_refs, scratches, sems)
        ]

    def start(slot, j):
        for d in dmas(slot, j):
            d.start()

    def wait(slot, j):
        for d in dmas(slot, j):
            d.wait()

    return start, wait


def _stream_loop(n_loc, start, wait, tile_fn, init_carry):
    """Double-buffered dynamic-trip-count loop: prefetch j+1, wait j,
    apply tile_fn(j, slot, carry)."""
    start(0, 0)

    def body(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_loc)
        def _():
            start(jax.lax.rem(j + 1, 2), j + 1)

        wait(slot, j)
        return tile_fn(j, slot, carry)

    return jax.lax.fori_loop(0, n_loc, body, init_carry)


def _make_fwd_streamed_kernel(bk: int, scale: float, left: int, right: int):
    def kernel(lens_ref, starts_ref, nloc_ref, qs_ref, ks_hbm, v_hbm,
               o_ref, lse_ref, k_scr, v_scr, sem_k, sem_v):
        b = pl.program_id(0)
        i_q = pl.program_id(1)
        valid_len = lens_ref[b]
        bq = qs_ref.shape[1]
        dv = v_scr.shape[2]
        lo = starts_ref[i_q]
        n_loc = nloc_ref[i_q]
        start, wait = _tile_streamer((ks_hbm, v_hbm), (k_scr, v_scr),
                                     (sem_k, sem_v), bk, b, lo)

        q = qs_ref[0, :, :].astype(jnp.float32) * scale  # [bq, d1]
        q_idx = i_q * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

        def tile(j, slot, carry):
            m_prev, l_prev, acc = carry
            k_tile = k_scr[slot]  # [bk, d1]
            v_tile = v_scr[slot]  # [bk, dv]
            s = jax.lax.dot_general(
                q, k_tile.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bq, bk]
            key_idx = (lo + j) * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 1)
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
        m, l, acc = _stream_loop(n_loc, start, wait, tile, (m0, l0, acc0))
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, :, :] = (acc / l_safe[:, None]).astype(o_ref.dtype)
        m_fin = jnp.where(m <= _NEG_INF * 0.5, 0.0, m)
        lse_ref[0, :, :] = (m_fin + jnp.log(l_safe))[:, None]

    return kernel


def _pad_lane(x, mult=128):
    """Mosaic requires manual-DMA slices to be lane-tile (128) aligned in
    the trailing dim; zero-padding the contraction depth (d1) and value
    depth (dv) is numerically exact (extra zero columns contribute nothing
    to QK^T and produce output columns the entry slices away)."""
    p = -x.shape[-1] % mult
    if p:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, p)))
    return x


def _flash_fwd_streamed(qs, ks, v, lens, bq, bk, scale, interpret,
                        with_lse, left, right):
    dv_out = v.shape[-1]
    if not interpret:  # CPU interpret mode has no tiling constraint
        qs, ks, v = _pad_lane(qs), _pad_lane(ks), _pad_lane(v)
    bh, t, d1 = qs.shape
    dv = v.shape[-1]
    bq, bk = _stream_tiles(t, bq, bk)
    starts, nloc = _stream_table(t, bq, bk, left, right)
    o, lse = pl.pallas_call(
        _make_fwd_streamed_kernel(bk, scale, left, right),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(bh, t // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d1), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, dv), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, bq, 1), lambda b, i, *_: (b, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, bk, d1), ks.dtype),
                pltpu.VMEM((2, bk, dv), v.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, dv), qs.dtype),
            jax.ShapeDtypeStruct((bh, t, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(lens.astype(jnp.int32), jnp.asarray(starts), jnp.asarray(nloc),
      qs, ks, v)
    if dv != dv_out:
        o = o[..., :dv_out]
    return (o, lse) if with_lse else o


def _make_dq_streamed_kernel(bk: int, scale: float, left: int, right: int):
    def kernel(lens_ref, starts_ref, nloc_ref, qs_ref, ks_hbm, v_hbm, do_ref,
               lse_ref, delta_ref, dq_ref, k_scr, v_scr, sem_k, sem_v):
        b = pl.program_id(0)
        i_q = pl.program_id(1)
        valid_len = lens_ref[b]
        bq = qs_ref.shape[1]
        d1 = qs_ref.shape[2]
        lo = starts_ref[i_q]
        n_loc = nloc_ref[i_q]
        start, wait = _tile_streamer((ks_hbm, v_hbm), (k_scr, v_scr),
                                     (sem_k, sem_v), bk, b, lo)

        q = qs_ref[0, :, :].astype(jnp.float32)
        do = do_ref[0, :, :].astype(jnp.float32)
        lse = lse_ref[0, :, :]  # [bq, 1]
        delta = delta_ref[0, :, :]
        q_idx = i_q * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        q_valid = (i_q * bq + jax.lax.broadcasted_iota(
            jnp.int32, (bq, 1), 0)) < valid_len

        def tile(j, slot, acc):
            k_tile = k_scr[slot].astype(jnp.float32)
            v_tile = v_scr[slot].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            key_idx = (lo + j) * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 1)
            mask = _band_mask((key_idx < valid_len) & q_valid,
                              q_idx, key_idx, left, right)
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)
            dp = jax.lax.dot_general(
                do, v_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - delta) * scale
            return acc + jax.lax.dot_general(
                ds, k_tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc0 = jnp.zeros((bq, d1), jnp.float32)
        acc = _stream_loop(n_loc, start, wait, tile, acc0)
        dq_ref[0, :, :] = acc.astype(dq_ref.dtype)

    return kernel


def _make_dkv_streamed_kernel(bq2: int, scale: float, left: int, right: int):
    def kernel(lens_ref, starts_ref, nloc_ref, qs_hbm, ks_ref, v_ref, do_hbm,
               lse_ref, delta_ref, dk_ref, dv_ref,
               q_scr, do_scr, sem_q, sem_do):
        b = pl.program_id(0)
        i_k = pl.program_id(1)
        valid_len = lens_ref[b]
        bk, d1 = ks_ref.shape[1], ks_ref.shape[2]
        lo = starts_ref[i_k]
        n_loc = nloc_ref[i_k]
        start, wait = _tile_streamer((qs_hbm, do_hbm), (q_scr, do_scr),
                                     (sem_q, sem_do), bq2, b, lo)

        k_tile = ks_ref[0, :, :].astype(jnp.float32)  # [bk, d1]
        v_tile = v_ref[0, :, :].astype(jnp.float32)  # [bk, dv]
        key_idx = i_k * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        key_valid = key_idx < valid_len  # [1, bk]

        def tile(j, slot, carry):
            dk_acc, dv_acc = carry
            qstart = (lo + j) * bq2
            q_tile = q_scr[slot].astype(jnp.float32)  # [bq2, d1]
            do_tile = do_scr[slot].astype(jnp.float32)
            lse = lse_ref[0, pl.ds(qstart, bq2), :]  # [bq2, 1]
            delta = delta_ref[0, pl.ds(qstart, bq2), :]
            s = jax.lax.dot_general(
                q_tile, k_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [bq2, bk]
            q_idx = qstart + jax.lax.broadcasted_iota(jnp.int32, (bq2, 1), 0)
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
        dv0 = jnp.zeros((bk, v_ref.shape[2]), jnp.float32)
        dk_acc, dv_acc = _stream_loop(n_loc, start, wait, tile, (dk0, dv0))
        dk_ref[0, :, :] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, :] = dv_acc.astype(dv_ref.dtype)

    return kernel


def _flash_bwd_streamed(qs, ks, v, do, lse, delta, lens, bq, bk, scale,
                        interpret, left, right):
    d1_out, dv_out = qs.shape[-1], v.shape[-1]
    if not interpret:  # lane-tile alignment for manual DMA (see _pad_lane)
        qs, ks, v, do = (_pad_lane(a) for a in (qs, ks, v, do))
    bh, t, d1 = qs.shape
    dv_dim = v.shape[-1]
    bq, bk = _stream_tiles(t, bq, bk)
    lens = lens.astype(jnp.int32)

    starts_q, nloc_q = _stream_table(t, bq, bk, left, right)
    dq = pl.pallas_call(
        _make_dq_streamed_kernel(bk, scale, left, right),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(bh, t // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d1), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, bq, dv_dim), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, bq, 1), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, bq, 1), lambda b, i, *_: (b, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, d1), lambda b, i, *_: (b, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, bk, d1), ks.dtype),
                pltpu.VMEM((2, bk, dv_dim), v.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t, d1), qs.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(lens, jnp.asarray(starts_q), jnp.asarray(nloc_q),
      qs, ks, v, do, lse, delta)

    # key-tiled, streaming query-side tiles: the band inverts (a key block
    # is in-band for queries up to `right` behind and `left` ahead of it).
    # lse/delta are [T, 1] f32 — 4T bytes — so they ride along as plain
    # full-T VMEM blocks instead of DMA streams.
    starts_k, nloc_k = _stream_table(t, bk, bq, right, left)
    dk, dvv = pl.pallas_call(
        _make_dkv_streamed_kernel(bq, scale, left, right),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(bh, t // bk),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, bk, d1), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, bk, dv_dim), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, t, 1), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, t, 1), lambda b, i, *_: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bk, d1), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, bk, dv_dim), lambda b, i, *_: (b, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, bq, d1), qs.dtype),
                pltpu.VMEM((2, bq, dv_dim), do.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d1), ks.dtype),
            jax.ShapeDtypeStruct((bh, t, dv_dim), v.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(lens, jnp.asarray(starts_k), jnp.asarray(nloc_k),
      qs, ks, v, do, lse, delta)
    if d1 != d1_out:
        dq, dk = dq[..., :d1_out], dk[..., :d1_out]
    if dv_dim != dv_out:
        dvv = dvv[..., :dv_out]
    return dq, dk, dvv


# Banded dispatch: the full-T-block banded kernel wins while its scoped
# VMEM fits (its fori_loop already skips out-of-band tiles, so compute is
# O(T*w); a single shared full-T K/V block is fast, and the per-program
# fixed costs of manual DMA streaming are not yet amortized — measured at
# T=3072 band(128,128): fullT 3.8 ms vs streamed 5.2 ms fwd on aligned
# inputs, and the kernel table in docs/PERFORMANCE.md has fullT leading by
# 15-29% through T~=12288). Once the full-T blocks would blow the 100 MB
# scoped-VMEM cap, the streamed kernels take over with O(w) VMEM and
# O(T*w) DMA — unbounded T.
#
# The estimate below is calibrated against on-chip Mosaic scoped-vmem
# measurements: every full-T kernel family holds two full-T operands
# (fwd/dQ: K[T,d1]+V[T,dv]; dK/dV: Q[T,d1]+dO[T,dv]) which Mosaic stages
# fp32 and double-buffers across grid steps -> ~8 bytes per element, plus
# a fixed tile/accumulator term. Measured: 17.33 MB at T=2048, d1+dv=640
# (estimate 18.5 MB); T=12288 at d1+dv=768 compiled and ran under the cap
# (estimate 83.5 MB). Dispatch keeps a 0.9 safety factor so the edge of
# the estimate cannot produce a Mosaic scoped-vmem compile failure.
_VMEM_CAP_BYTES = 100 * 1024 * 1024  # == _COMPILER_PARAMS.vmem_limit_bytes
_VMEM_SAFETY = 0.9
# fallback threshold when the caller cannot supply depths (kept from the
# round-4 measured dispatch; conservative for flagship depths)
_STREAM_MIN_T = 8192


def _fullt_vmem_estimate(t: int, d1: int, dv: int) -> int:
    """Scoped-VMEM bytes the full-T banded kernels need at sequence length
    t with score depth d1 and value depth dv (calibration above)."""
    return t * (d1 + dv) * 8 + 8 * 1024 * 1024


def _is_streamed(left: int, right: int, t: int,
                 d1: int | None = None, dv: int | None = None) -> bool:
    if left < 0 or right < 0:
        return False  # one-sided/unlimited bands have no streamed kernels
    if d1 is None or dv is None:
        return t >= _STREAM_MIN_T
    return _fullt_vmem_estimate(t, d1, dv) > _VMEM_SAFETY * _VMEM_CAP_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def flash_attention(
    qs, ks, v, lens, bq: int = 256, bk: int = 512, scale: float = 1.0,
    interpret: bool = False, left: int = -1, right: int = -1,
):
    """Masked softmax(Qs Ks^T * scale) V without [T, T] HBM materialization.

    qs/ks: [BH, T, D1]; v: [BH, T, dv]; lens: [BH] int32 valid key lengths.
    Query rows beyond lens produce normalized garbage the caller masks out.
    left/right: static att_context_size band (query i attends key j iff
    i - j <= left and j - i <= right; -1 = unlimited). Two-sided bands take
    the block-banded streaming kernels (O(T*w) DMA traffic AND memory);
    one-sided/unlimited bands take the full-T-block kernels with fori_loop
    tile skipping (O(T*w) compute, O(T) DMA).
    """
    if _is_streamed(left, right, qs.shape[1], qs.shape[-1], v.shape[-1]):
        return _flash_fwd_streamed(qs, ks, v, lens, bq, bk, scale, interpret,
                                   False, left, right)
    return _flash_fwd_entry(qs, ks, v, lens, bq, bk, scale, interpret,
                            left=left, right=right)


def _flash_vjp_fwd(qs, ks, v, lens, bq, bk, scale, interpret, left, right):
    if _is_streamed(left, right, qs.shape[1], qs.shape[-1], v.shape[-1]):
        o, lse = _flash_fwd_streamed(qs, ks, v, lens, bq, bk, scale,
                                     interpret, True, left, right)
    else:
        o, lse = _flash_fwd_entry(qs, ks, v, lens, bq, bk, scale, interpret,
                                  with_lse=True, left=left, right=right)
    return o, (qs, ks, v, lens, o, lse)


def _flash_vjp_bwd(bq, bk, scale, interpret, left, right, res, g):
    qs, ks, v, lens, o, lse = res
    # delta_i = sum_d dO_i O_i (the softmax-jacobian row term); tiny
    # elementwise+reduce, XLA fuses it — no kernel needed
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                    keepdims=True)  # [bh, t, 1], matching lse's layout
    if _is_streamed(left, right, qs.shape[1], qs.shape[-1], v.shape[-1]):
        dq, dk, dv = _flash_bwd_streamed(
            qs, ks, v, g, lse, delta, lens, bq, bk, scale, interpret,
            left, right)
    else:
        dq, dk, dv = _flash_bwd_entry(
            qs, ks, v, g, lse, delta, lens, bq, bk, scale, interpret,
            left=left, right=right)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)
