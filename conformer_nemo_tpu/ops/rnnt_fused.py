"""RNN-T loss computed directly from the projected joint inputs ("flash
joint"): the [B,T,U+1,V] logits never exist in HBM.

Pairs ops/pallas/rnnt_joint_kernel.py (fused joint + loss-prep tiles) with
the existing lattice machinery from ops/rnnt_loss.py (skewed alpha/beta
sweeps, posterior math, FastEmit, clamping). Semantics are identical to
``rnnt_loss_from_logits(joint(e, p), ...)`` — the reference's fused
joint+loss sub-batching (`/root/reference/nemo/collections/asr/modules/
rnnt.py:792-949`) solved the same memory problem by chunking the batch; here
the fusion also removes the HBM logits traffic that the round-5 floor audit
(docs/PERFORMANCE.md) showed dominates the joint+loss segment.

Forward: flash fwd kernel -> (blank_lp, label_lp, lse) [B,T,U+1] streams ->
alpha sweep -> nll. Backward: beta sweep -> occupancy posteriors (total, gb,
gy) -> flash bwd kernel -> (de, dp, dW, dbias). Residuals are the projected
inputs plus the [B,T,U+1] streams — O(B*T*U) instead of O(B*T*U*V).

Joint dropout (reference jointnet dropout, rnnt.py:997) runs *inside* the
kernels via the counter-based hash mask (same realized-rate convention as
FastDropout); fwd and bwd regenerate the identical mask from (seed, element
index), so no [B,T,U+1,H] mask tensor exists either.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from conformer_nemo_tpu.ops.pallas.rnnt_joint_kernel import (
    joint_flash_bwd, joint_flash_fwd)
from conformer_nemo_tpu.ops.rnnt_loss import (
    _NEG_INF, _compute_alphas, _compute_betas)


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def rnnt_loss_fused(e, p, w, bias, targets, t_lens, u_lens, seed,
                    blank_id, fastemit_lambda=0.0, clamp=-1.0,
                    lattice_impl="scan", activation="relu", drop_t=0, bt=32):
    """Per-sample RNN-T nll [B] from projected joint inputs.

    e [B,T,H] enc projection, p [B,U+1,H] pred projection (compute dtype),
    w [H,V] / bias [V] output projection (compute dtype), seed [1] i32 for
    the in-kernel dropout stream (ignored when drop_t == 0).
    """
    nll, _ = _fused_fwd(e, p, w, bias, targets, t_lens, u_lens, seed,
                        blank_id, fastemit_lambda, clamp, lattice_impl,
                        activation, drop_t, bt)
    return nll


def _fused_fwd(e, p, w, bias, targets, t_lens, u_lens, seed,
               blank_id, fastemit_lambda, clamp, lattice_impl, activation,
               drop_t, bt):
    u1 = p.shape[1]
    blank_lp, label_lp, lse = joint_flash_fwd(
        e, p, w, bias, targets, seed, blank_id=blank_id,
        activation=activation, drop_t=drop_t, bt=bt,
        interpret=_use_interpret())
    # dummy-select column (no label to emit at u = U) — _prep contract
    u_row = jnp.arange(u1)[None, None, :]
    label_lp = jnp.where(u_row >= (u1 - 1), _NEG_INF, label_lp)

    alpha = _compute_alphas(blank_lp, label_lp, t_lens, u_lens, lattice_impl)
    b = e.shape[0]
    bi = jnp.arange(b)
    ll = alpha[bi, t_lens - 1, u_lens] + blank_lp[bi, t_lens - 1, u_lens]
    nll = -(1.0 + fastemit_lambda) * ll if fastemit_lambda > 0 else -ll
    res = (e, p, w, bias, targets, t_lens, u_lens, seed,
           blank_lp, label_lp, lse, alpha)
    return nll, res


def _fused_bwd(blank_id, fastemit_lambda, clamp, lattice_impl, activation,
               drop_t, bt, res, g):
    (e, p, w, bias, targets, t_lens, u_lens, seed,
     blank_lp, label_lp, lse, alpha) = res
    beta = _compute_betas(blank_lp, label_lp, t_lens, u_lens, lattice_impl)
    b, t_max, u1 = blank_lp.shape
    bi = jnp.arange(b)
    ll = beta[bi, 0, 0]

    # occupancy posteriors — same math as ops/rnnt_loss._rnnt_bwd
    beta_tp1 = jnp.pad(beta, ((0, 0), (0, 1), (0, 0)),
                       constant_values=_NEG_INF)[:, 1:]
    is_terminal = (
        (jnp.arange(t_max)[None, :, None] == (t_lens - 1)[:, None, None])
        & (jnp.arange(u1)[None, None, :] == u_lens[:, None, None])
    )
    beta_tp1 = jnp.where(is_terminal, 0.0, beta_tp1)
    beta_up1 = jnp.pad(beta, ((0, 0), (0, 0), (0, 1)),
                       constant_values=_NEG_INF)[:, :, 1:]

    def occ(x):
        return jnp.exp(jnp.clip(x, _NEG_INF, 0.0))

    gb = occ(alpha + blank_lp + beta_tp1 - ll[:, None, None])
    gy = occ(alpha + label_lp + beta_up1 - ll[:, None, None])
    if fastemit_lambda > 0:
        gy = gy * (1.0 + fastemit_lambda)
        gb = gb * (1.0 + fastemit_lambda)
    total = gb + gy
    in_lattice = (
        (jnp.arange(t_max)[None, :, None] < t_lens[:, None, None])
        & (jnp.arange(u1)[None, None, :] <= u_lens[:, None, None])
    )
    zero_out = lambda x: jnp.where(in_lattice, x, 0.0)
    de, dp, dw, db = joint_flash_bwd(
        e, p, w, bias, targets, lse, zero_out(total), zero_out(gb),
        zero_out(gy), g, seed, blank_id=blank_id, activation=activation,
        drop_t=drop_t, bt=bt, clamp=float(clamp),
        interpret=_use_interpret())
    return (de.astype(e.dtype), dp.astype(p.dtype), dw.astype(w.dtype),
            db.astype(bias.dtype), None, None, None, None)


rnnt_loss_fused.defvjp(_fused_fwd, _fused_bwd)
