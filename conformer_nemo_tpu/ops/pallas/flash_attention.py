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
  masking folds into each score tile via broadcasted iota. The backward pass
  recomputes per-head attention under lax.map (memory-bounded); a fused
  Pallas backward is a further optimization.

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


def _pick_tiles(t: int, bq: int, bk: int):
    bq = min(bq, t)
    bk = min(bk, t)
    while t % bq:
        bq //= 2
    while t % bk:
        bk //= 2
    return max(bq, 1), max(bk, 1)


def _make_kernel(bk: int, scale: float):
    def kernel(lens_ref, qs_ref, ks_ref, v_ref, o_ref):
        b = pl.program_id(0)
        valid_len = lens_ref[b]
        bq, d1 = qs_ref.shape[1], qs_ref.shape[2]
        tk, dv = v_ref.shape[1], v_ref.shape[2]

        q = qs_ref[0, :, :].astype(jnp.float32) * scale  # [bq, d1]

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
            mask = key_idx < valid_len
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
        m, l, acc = jax.lax.fori_loop(0, tk // bk, body, (m0, l0, acc0))
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, :, :] = (acc / l_safe[:, None]).astype(o_ref.dtype)

    return kernel


def _flash_fwd_entry(qs, ks, v, lens, bq, bk, scale, interpret):
    bh, t, d1 = qs.shape
    dv = v.shape[-1]
    bq, bk = _pick_tiles(t, bq, bk)
    return pl.pallas_call(
        _make_kernel(bk, scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d1), lambda b, i, lens: (b, i, 0)),
                pl.BlockSpec((1, t, d1), lambda b, i, lens: (b, 0, 0)),
                pl.BlockSpec((1, t, dv), lambda b, i, lens: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, dv), lambda b, i, lens: (b, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t, dv), qs.dtype),
        interpret=interpret,
    )(lens.astype(jnp.int32), qs, ks, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention(
    qs, ks, v, lens, bq: int = 256, bk: int = 512, scale: float = 1.0,
    interpret: bool = False,
):
    """Masked softmax(Qs Ks^T * scale) V without [T, T] HBM materialization.

    qs/ks: [BH, T, D1]; v: [BH, T, dv]; lens: [BH] int32 valid key lengths.
    Query rows beyond lens produce normalized garbage the caller masks out.
    """
    return _flash_fwd_entry(qs, ks, v, lens, bq, bk, scale, interpret)


def _flash_vjp_fwd(qs, ks, v, lens, bq, bk, scale, interpret):
    o = _flash_fwd_entry(qs, ks, v, lens, bq, bk, scale, interpret)
    return o, (qs, ks, v, lens)


def _flash_vjp_bwd(bq, bk, scale, interpret, res, g):
    qs, ks, v, lens = res
    bh, t, d1 = qs.shape

    def per_head(args):
        qs_h, ks_h, v_h, len_h, g_h = args
        s = (qs_h.astype(jnp.float32) @ ks_h.astype(jnp.float32).T) * scale
        key_idx = jnp.arange(t)
        valid = key_idx[None, :] < len_h
        s = jnp.where(valid, s, _NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(valid, p, 0.0)
        dv_h = p.T @ g_h.astype(jnp.float32)
        dp = g_h.astype(jnp.float32) @ v_h.astype(jnp.float32).T
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dqs_h = (ds @ ks_h.astype(jnp.float32)) * scale
        dks_h = (ds.T @ qs_h.astype(jnp.float32)) * scale
        return dqs_h.astype(qs_h.dtype), dks_h.astype(ks_h.dtype), dv_h.astype(v_h.dtype)

    dqs, dks, dv = jax.lax.map(
        per_head, (qs, ks, v, lens, g), batch_size=max(1, min(bh, 8))
    )
    return dqs, dks, dv, None


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)
