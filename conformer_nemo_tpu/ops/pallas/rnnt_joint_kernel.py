"""Fused RNN-T joint + loss-prep Pallas TPU kernels ("flash joint").

Replaces the HBM-materialized joint of the whole-batch path (models/rnnt.py
``RNNTJoint.__call__`` -> ops/rnnt_loss.py ``_prep``/``_rnnt_bwd``) for
training. The reference frames the same problem as a *memory* problem and
answers with batch sub-chunking (`/root/reference/nemo/collections/asr/
modules/rnnt.py:792-949`, fused joint+loss over ``fused_batch_size`` slices);
on TPU the round-5 floor audit (docs/PERFORMANCE.md) showed chunking costs
14-21% and the real win is never writing the ``[B, T, U+1, V]`` logits (or
the broadcast-add ``[B, T, U+1, H]``) to HBM at all:

  forward   : per (b, t-tile) program, compute h = drop(act(e_t + p_u)) and
              the ``[bt*U1, H] @ [H, V]`` logits tile entirely in VMEM; reduce
              to the three ``[B, T, U+1]`` lattice streams the loss actually
              needs (blank log-prob, label log-prob, logsumexp).
  backward  : rematerialize the logits tile, form
              dlogits = softmax * total - gb * 1[blank] - gy * 1[label]
              in-tile, and contract immediately: de (per-tile), dp / dW /
              dbias (grid-accumulated f32). dlogits never exists in HBM.

HBM traffic drops from ~3.6 GB/step (B=8 flagship: logits fwd write + prep
reads + grad write + 2 matmul re-reads) to the ~30 MB of e/p/W plus the
[B,T,U+1] streams; the V-matmul count goes 3 -> 4 (one remat) — a trade the
floor table prices at ~6 ms of a 53 ms step in the kernel's favor.

Mosaic-shaped: everything inside the kernels is 2D with the (t, u) cell axis
collapsed to rows (r = t*U1 + u). Mosaic lowers leading-dim *collapses* but
not expands ("unsupported shape cast" on [bt*U1,V]->[bt,U1,V], found
on-chip), so the per-cell streams stay [bt*U1, 1] columns (reshaped to
[B, T, U+1] by XLA outside) and the sum-over-u / sum-over-t reductions of
the backward are one-hot selection matmuls on the MXU rather than 3D
reduces — the same contraction-over-gather/reshape idiom as the CTC one-hot
emit select.

Numerics mirror the unfused path op-for-op: the logits tile is rounded to
the compute dtype after the f32-accumulated MXU matmul (exactly what
``jnp.dot(bf16, bf16)`` emits), lse/selects run in f32 on that rounded tile,
and dlogits is cast to the compute dtype before the backward matmuls — so
the fused path is bit-comparable to the dense one in f32 and matches bf16
within rounding (tests/test_rnnt_fused.py).

Dropout inside a kernel that must agree between fwd and bwd (and with a CPU
interpret-mode oracle — ``pltpu.prng_*`` has no CPU lowering in this JAX)
uses a counter-based hash: murmur3's finalizer on (global element index ^
seed). ``hash_keep_mask_reference`` reproduces the mask outside the kernel
with the same formula, which is what makes the dropout path unit-testable
exactly rather than statistically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

# np scalars (not jnp arrays): inlined as literals instead of captured as
# pallas kernel constants.
_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)


def _hash_bits(idx: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """murmur3 fmix32 of (idx ^ seed) — uint32 in, uint32 out, elementwise."""
    x = idx ^ seed
    x = x ^ (x >> 16)
    x = x * _M1
    x = x ^ (x >> 13)
    x = x * _M2
    return x ^ (x >> 16)


def _keep_from_bits(bits: jnp.ndarray, drop_t: int) -> jnp.ndarray:
    """Top byte of the hash >= drop_t keeps the element (realized drop rate
    drop_t/256, the FastDropout convention from models/conformer.py)."""
    return (bits >> 24).astype(jnp.int32) >= drop_t


def hash_keep_mask_reference(shape, seed, drop_t: int) -> jnp.ndarray:
    """Keep mask the kernels generate for a [B, Tp, U1, H] tensor, computed
    with plain jnp for tests. ``seed`` is a length-1 int32 array."""
    n = 1
    for s in shape:
        n *= s
    idx = jnp.arange(n, dtype=jnp.uint32).reshape(shape)
    return _keep_from_bits(_hash_bits(idx, seed.astype(jnp.uint32)[0]), drop_t)


def _tile_keep(seed_ref, b, i, bt, u1, h, tp, drop_t):
    """In-kernel keep mask for this program's collapsed [bt*U1, H] tile,
    matching hash_keep_mask_reference on the padded [B, Tp, U1, H] global
    layout (row r = t_in_tile*U1 + u)."""
    seed = seed_ref[0].astype(jnp.uint32)
    # uint32 from the start: the global index may exceed int32 at large
    # B*T*U1*H and must wrap identically to hash_keep_mask_reference's
    # jnp.arange(n, dtype=uint32).
    base = (b * tp + i * bt).astype(jnp.uint32) * jnp.uint32((u1 * h) & 0xFFFFFFFF)
    # int32 iota + cast: Mosaic's iota lowering is int32-only
    rr = jax.lax.broadcasted_iota(jnp.int32, (bt * u1, h), 0).astype(jnp.uint32)
    hh = jax.lax.broadcasted_iota(jnp.int32, (bt * u1, h), 1).astype(jnp.uint32)
    idx = base + rr * jnp.uint32(h) + hh
    return _keep_from_bits(_hash_bits(idx, seed), drop_t)


def _act(x, activation: str):
    if activation == "relu":
        # compare in f32: Mosaic has no bf16 cmpf ("Target does not support
        # this comparison", found on-chip); max(x, 0) is exact either way
        return jnp.where(x.astype(jnp.float32) > 0.0, x, 0)
    if activation == "sigmoid":
        return jax.nn.sigmoid(x)
    return jnp.tanh(x)


def _act_grad(x, h, activation: str):
    """d act / d x from pre-activation x and activation output h."""
    if activation == "relu":
        return (x.astype(jnp.float32) > 0.0).astype(h.dtype)
    if activation == "sigmoid":
        return h * (1 - h)
    return 1 - h * h


def _joint_tile(e_ref, p_ref, wl_ref, wb_ref, bl_ref, bb_ref, seed_ref, bt,
                tp, activation, drop_t, inv_keep, dtype):
    """Shared fwd compute for this program's tile, all 2D with the (t, u)
    axis collapsed: (xf [bt*U1,H] pre-act, h_dropped [bt*U1,H],
    lab [bt*U1,V-1] f32 label logits, blank [bt*U1,1] f32, keep or None).

    The vocabulary is split blank-last: the label block of the output
    projection runs on the MXU at its exact width (V-1 = the BPE vocab is
    lane-aligned at flagship sizes; V = vocab+1 would pad 1025 -> 1152 lanes,
    +12.5% on every V-matmul), and the single blank column is a VPU
    multiply-reduce.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    u1, h_dim = p_ref.shape[1], p_ref.shape[2]
    e = e_ref[0]  # [bt, H]
    p = p_ref[0]  # [U1, H]
    x3 = e[:, None, :] + p[None, :, :]  # [bt, U1, H] compute dtype
    xf = x3.reshape(bt * u1, h_dim)  # leading-dim collapse: Mosaic-legal
    ha = _act(xf, activation)
    keep = None
    if drop_t > 0:
        keep = _tile_keep(seed_ref, b, i, bt, u1, h_dim, tp, drop_t)
        ha = jnp.where(keep, ha * float(inv_keep), 0)
    # f32 MXU accumulation rounded to the compute dtype + bias: op-for-op the
    # unfused jnp.dot(bf16, bf16) + bias of RNNTJoint.combine_fn.
    lab = jax.lax.dot_general(
        ha, wl_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    lab = (lab + bl_ref[...].astype(dtype)).astype(jnp.float32)
    blank = jnp.sum(ha.astype(jnp.float32) * wb_ref[...].astype(jnp.float32),
                    axis=1, keepdims=True)
    blank = (blank.astype(dtype) + bb_ref[...].astype(dtype)).astype(jnp.float32)
    return xf, ha, lab, blank, keep


def _make_fwd_kernel(bt, tp, activation, drop_t, inv_keep, dtype):
    def kernel(seed_ref, e_ref, p_ref, wl_ref, wb_ref, bl_ref, bb_ref,
               tgt_ref, blank_ref, label_ref, lse_ref):
        vl = wl_ref.shape[1]
        u1 = p_ref.shape[1]
        _, _, lab, blank, _ = _joint_tile(
            e_ref, p_ref, wl_ref, wb_ref, bl_ref, bb_ref, seed_ref, bt, tp,
            activation, drop_t, inv_keep, dtype)
        m = jnp.maximum(jnp.max(lab, axis=1, keepdims=True), blank)
        lse = m + jnp.log(
            jnp.sum(jnp.exp(lab - m), axis=1, keepdims=True)
            + jnp.exp(blank - m))
        # label select: one-hot by iota-compare against this tile's target
        # column (pre-tiled [bt*U1, 1] i32) — no broadcast-collapse reshape,
        # which Mosaic cannot lower (found on-chip)
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (bt * u1, vl), 1)
        sel = iota_v == tgt_ref[0]
        label = jnp.sum(jnp.where(sel, lab, 0.0), axis=1, keepdims=True)
        blank_ref[0] = blank - lse
        label_ref[0] = label - lse
        lse_ref[0] = lse

    return kernel


def _make_bwd_kernel(bt, tp, activation, drop_t, inv_keep, dtype, clamp):
    def kernel(seed_ref, g_ref, e_ref, p_ref, wl_ref, wb_ref, bl_ref, bb_ref,
               tgt_ref, usel_ref, lse_ref, total_ref, gb_ref, gy_ref,
               de_ref, dp_ref, dwl_ref, dwb_ref, dbl_ref, dbb_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)
        u1, h_dim = p_ref.shape[1], p_ref.shape[2]
        vl = wl_ref.shape[1]
        xf, ha, lab, blank, keep = _joint_tile(
            e_ref, p_ref, wl_ref, wb_ref, bl_ref, bb_ref, seed_ref, bt, tp,
            activation, drop_t, inv_keep, dtype)
        lse = lse_ref[0]
        dlab = jnp.exp(lab - lse) * total_ref[0]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (bt * u1, vl), 1)
        dlab = dlab - jnp.where(iota_v == tgt_ref[0], gy_ref[0], 0.0)
        dblank = jnp.exp(blank - lse) * total_ref[0] - gb_ref[0]
        if clamp > 0:
            dlab = jnp.clip(dlab, -clamp, clamp)
            dblank = jnp.clip(dblank, -clamp, clamp)
        dlab = dlab * g_ref[b]
        dblank = dblank * g_ref[b]
        dlabB = dlab.astype(dtype)

        # dh (through dropout + activation) -> dx [bt*U1, H]: label block via
        # MXU, blank column as a rank-1 update folded in before rounding
        dh = (jax.lax.dot_general(
            dlabB, wl_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + dblank * wb_ref[...].astype(jnp.float32)).astype(dtype)
        if keep is not None:
            dh = jnp.where(keep, dh * float(inv_keep), 0)
        hact = ha if drop_t == 0 else _act(xf, activation)
        # dx stays in the compute dtype: the selection contractions below
        # then run at bf16 MXU rate with f32 accumulation (a f32 matmul here
        # measured ~4x the cost for grads the dense path also reduces
        # through bf16 values)
        dx = dh * _act_grad(xf, hact, activation)

        # sum-over-u (de) and sum-over-t (dp) as one-hot selection matmuls:
        # rows of the tile are r = t*U1 + u, so t-membership is a range test
        # and u-membership a strided pattern — both built from iotas (no
        # expand-reshape, no scatter).
        r_t = jax.lax.broadcasted_iota(jnp.int32, (bt, bt * u1), 1)
        t_of = jax.lax.broadcasted_iota(jnp.int32, (bt, bt * u1), 0)
        tsel = ((r_t >= t_of * u1) & (r_t < (t_of + 1) * u1)).astype(dx.dtype)
        de_ref[0] = jax.lax.dot_general(
            tsel, dx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(de_ref.dtype)

        @pl.when(i == 0)
        def _zero_dp():
            dp_ref[0] = jnp.zeros((u1, h_dim), jnp.float32)

        dp_ref[0] += jax.lax.dot_general(
            usel_ref[...].astype(dx.dtype), dx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when((b == 0) & (i == 0))
        def _zero_dw():
            dwl_ref[...] = jnp.zeros((h_dim, vl), jnp.float32)
            dwb_ref[...] = jnp.zeros((1, h_dim), jnp.float32)
            dbl_ref[...] = jnp.zeros((1, vl), jnp.float32)
            dbb_ref[...] = jnp.zeros((1, 1), jnp.float32)

        dwl_ref[...] += jax.lax.dot_general(
            ha, dlabB, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwb_ref[...] += jnp.sum(ha.astype(jnp.float32) * dblank, axis=0,
                                keepdims=True)
        dbl_ref[...] += jnp.sum(dlab, axis=0, keepdims=True)
        dbb_ref[...] += jnp.sum(dblank, axis=0, keepdims=True)

    return kernel


def _pad_t(x, bt, value=0.0):
    pad = -x.shape[1] % bt
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2),
                    constant_values=value)
    return x


def _cells(x, bt, value=0.0):
    """[B, T, U1] per-cell stream -> padded collapsed [B, Tp*U1, 1] (the
    kernels' 2D cell layout)."""
    b, _, u1 = x.shape
    xp = _pad_t(x, bt, value)
    return xp.reshape(b, xp.shape[1] * u1, 1)


def _tgt_cells(targets, tp: int, u1: int):
    """[B,U] int targets -> [B, Tp*U1, 1] i32 label-id column in the kernels'
    collapsed cell layout (row r = t*U1 + u selects targets[u]; the dummy
    u = U1-1 cell selects 0, whose label_lp column the caller invalidates —
    ops/rnnt_loss._prep contract). Built by XLA outside the kernel: Mosaic
    cannot lower a broadcast-collapse reshape."""
    b = targets.shape[0]
    tgt = jnp.pad(targets.astype(jnp.int32), ((0, 0), (0, 1)))  # [B, U1]
    tiled = jnp.broadcast_to(tgt[:, None, :], (b, tp, u1))
    return tiled.reshape(b, tp * u1, 1)


def _usel(bt: int, u1: int):
    """[U1, bt*U1] f32 sum-over-t selection matrix (usel[u, t*U1 + u] = 1):
    the backward's dp reduction as an MXU contraction. Built outside the
    kernel (iota remainder tricks are Mosaic-risky; this is a tiny constant
    the compiler keeps resident in VMEM)."""
    r = jnp.arange(bt * u1)[None, :] % u1
    return (r == jnp.arange(u1)[:, None]).astype(jnp.float32)


def _pick_bt(t: int, bt: int) -> int:
    return max(1, min(bt, t))


def _split_blank(w, bias, blank_id: int):
    """[H,V]/[V] output projection -> (w_lab [H,V-1], wb_row [1,H],
    b_lab [1,V-1], b_b [1,1]). The fused kernels assume blank-last (the
    framework's invariant: blank_id == vocab_size == V-1)."""
    v = w.shape[1]
    if blank_id != v - 1:
        raise ValueError(
            f"flash joint requires blank-last (blank_id={blank_id}, V={v}); "
            "use joint_impl='dense' for other layouts")
    return (w[:, : v - 1], w[:, v - 1:].T, bias[None, : v - 1],
            bias[None, v - 1:])


@functools.partial(
    jax.jit,
    static_argnames=("blank_id", "activation", "drop_t", "bt", "interpret"))
def joint_flash_fwd(e, p, w, bias, targets, seed, *, blank_id: int,
                    activation: str = "relu", drop_t: int = 0, bt: int = 32,
                    interpret: bool = False):
    """e [B,T,H], p [B,U1,H], w [H,V], bias [V], targets [B,U] int,
    seed [1] i32 -> (blank_lp, label_lp, lse) each [B,T,U1] f32.

    label_lp's u = U1-1 column is the dummy select the caller invalidates
    (ops/rnnt_loss.py ``_prep`` contract).
    """
    b, t, h = e.shape
    u1, v = p.shape[1], w.shape[1]
    vl = v - 1
    w_lab, wb_row, b_lab, b_b = _split_blank(w, bias, blank_id)
    bt = _pick_bt(t, bt)
    ep = _pad_t(e, bt)
    tp = ep.shape[1]
    inv_keep = 1.0 / (1.0 - drop_t / 256.0) if drop_t > 0 else 1.0
    cell_spec = pl.BlockSpec((1, bt * u1, 1), lambda b, i, s: (b, i, 0))
    outs = pl.pallas_call(
        _make_fwd_kernel(bt, tp, activation, drop_t, inv_keep, e.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, tp // bt),
            in_specs=[
                pl.BlockSpec((1, bt, h), lambda b, i, s: (b, i, 0)),
                pl.BlockSpec((1, u1, h), lambda b, i, s: (b, 0, 0)),
                pl.BlockSpec((h, vl), lambda b, i, s: (0, 0)),
                pl.BlockSpec((1, h), lambda b, i, s: (0, 0)),
                pl.BlockSpec((1, vl), lambda b, i, s: (0, 0)),
                pl.BlockSpec((1, 1), lambda b, i, s: (0, 0)),
                cell_spec,
            ],
            out_specs=[cell_spec, cell_spec, cell_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, tp * u1, 1), jnp.float32)] * 3,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(seed.astype(jnp.int32), ep, p, w_lab, wb_row, b_lab, b_b,
      _tgt_cells(targets, tp, u1))
    return tuple(o.reshape(b, tp, u1)[:, :t] for o in outs)


@functools.partial(
    jax.jit,
    static_argnames=("blank_id", "activation", "drop_t", "bt", "clamp",
                     "interpret"))
def joint_flash_bwd(e, p, w, bias, targets, lse, total, gb, gy, g, seed, *,
                    blank_id: int, activation: str = "relu", drop_t: int = 0,
                    bt: int = 32, clamp: float = -1.0,
                    interpret: bool = False):
    """Backward of the fused joint+loss-prep.

    total/gb/gy [B,T,U1] f32 are the lattice posteriors of ops/rnnt_loss.py
    ``_rnnt_bwd`` (zero outside each sample's lattice — which also zeroes the
    padded t rows' contributions here); g [B] f32 is the upstream cotangent,
    applied after clamping exactly as the unfused path does.
    Returns (de [B,T,H] e.dtype, dp [B,U1,H] f32, dw [H,V] f32, db [V] f32).
    """
    b, t, h = e.shape
    u1, v = p.shape[1], w.shape[1]
    vl = v - 1
    w_lab, wb_row, b_lab, b_b = _split_blank(w, bias, blank_id)
    bt = _pick_bt(t, bt)
    ep = _pad_t(e, bt)
    tp = ep.shape[1]
    inv_keep = 1.0 / (1.0 - drop_t / 256.0) if drop_t > 0 else 1.0
    cell_spec = pl.BlockSpec((1, bt * u1, 1), lambda b, i, s, g: (b, i, 0))
    de, dp, dwl, dwb, dbl, dbb = pl.pallas_call(
        _make_bwd_kernel(bt, tp, activation, drop_t, inv_keep, e.dtype,
                         clamp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, tp // bt),
            in_specs=[
                pl.BlockSpec((1, bt, h), lambda b, i, s, g: (b, i, 0)),
                pl.BlockSpec((1, u1, h), lambda b, i, s, g: (b, 0, 0)),
                pl.BlockSpec((h, vl), lambda b, i, s, g: (0, 0)),
                pl.BlockSpec((1, h), lambda b, i, s, g: (0, 0)),
                pl.BlockSpec((1, vl), lambda b, i, s, g: (0, 0)),
                pl.BlockSpec((1, 1), lambda b, i, s, g: (0, 0)),
                cell_spec,
                pl.BlockSpec((u1, bt * u1), lambda b, i, s, g: (0, 0)),
                cell_spec, cell_spec, cell_spec, cell_spec,
            ],
            out_specs=[
                pl.BlockSpec((1, bt, h), lambda b, i, s, g: (b, i, 0)),
                pl.BlockSpec((1, u1, h), lambda b, i, s, g: (b, 0, 0)),
                pl.BlockSpec((h, vl), lambda b, i, s, g: (0, 0)),
                pl.BlockSpec((1, h), lambda b, i, s, g: (0, 0)),
                pl.BlockSpec((1, vl), lambda b, i, s, g: (0, 0)),
                pl.BlockSpec((1, 1), lambda b, i, s, g: (0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, tp, h), e.dtype),
            jax.ShapeDtypeStruct((b, u1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, vl), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, vl), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(seed.astype(jnp.int32), g.astype(jnp.float32),
      ep, p, w_lab, wb_row, b_lab, b_b, _tgt_cells(targets, tp, u1),
      _usel(bt, u1),
      # lse padded LARGE so the padded rows' exp(logits - lse) underflows to
      # 0 (finite) — their total/gb/gy are 0, but inf * 0 would be NaN and
      # the dp/dW accumulators sum over padded rows too.
      _cells(lse, bt, 1e30), _cells(total, bt), _cells(gb, bt),
      _cells(gy, bt))
    dw = jnp.concatenate([dwl, dwb.T], axis=1)
    db = jnp.concatenate([dbl[0], dbb[0]])
    return de[:, :t], dp, dw, db
