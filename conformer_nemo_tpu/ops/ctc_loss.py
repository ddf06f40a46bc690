"""CTC loss as a log-semiring `lax.scan`, TPU-native.

Behavioral parity target: `torch.nn.CTCLoss` as wrapped by the reference
(`/root/reference/nemo/collections/asr/losses/ctc.py:25-71`): blank id = V
(last class), per-sample negative log-likelihood, 'mean_batch' = mean of the
per-sample losses, `zero_infinity` zeroes losses of infeasible alignments
(target longer than input).

TPU-first design: instead of a cuDNN kernel, the alpha recursion runs as one
`lax.scan` over time with the whole batch and the 2U+1 extended-label lattice
vectorized per step — each step is a few fused VPU ops over [B, S]. Gradients
come from autodiff through the scan (the scan transposes to the beta
recursion, so backward cost matches forward). fp32 throughout; inputs may be
bf16 log-probs and are upcast.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from conformer_nemo_tpu.utils.typecheck import typecheck

_NEG_INF = -1e30


def _logsumexp2(a, b):
    # Double-where keeps both branches NaN-free so autodiff through the scan
    # stays finite even where the lattice is -inf.
    m = jnp.maximum(a, b)
    bad = m <= _NEG_INF * 0.5
    m_safe = jnp.where(bad, 0.0, m)
    ea = jnp.exp(jnp.where(bad, 0.0, a - m_safe))
    eb = jnp.exp(jnp.where(bad, 0.0, b - m_safe))
    out = m_safe + jnp.log(ea + eb)
    return jnp.where(bad, _NEG_INF, out)


def _logsumexp3(a, b, c):
    return _logsumexp2(_logsumexp2(a, b), c)


@partial(jax.jit, static_argnames=("blank_id",))
def ctc_forward_neg_log_likelihood(
    log_probs: jnp.ndarray,  # [B, T, V] log-softmax outputs
    targets: jnp.ndarray,  # [B, U] int32 labels (padded arbitrarily)
    input_lengths: jnp.ndarray,  # [B]
    target_lengths: jnp.ndarray,  # [B]
    blank_id: int,
) -> jnp.ndarray:
    """Per-sample -log p(targets | log_probs). Shape [B]."""
    log_probs = log_probs.astype(jnp.float32)
    b, t_max, v = log_probs.shape
    u_max = targets.shape[1]
    s_max = 2 * u_max + 1

    # Extended label sequence: blank, y1, blank, y2, ..., blank  [B, S]
    ext = jnp.full((b, s_max), blank_id, dtype=jnp.int32)
    ext = ext.at[:, 1::2].set(targets.astype(jnp.int32))
    s_idx = jnp.arange(s_max)[None, :]
    s_len = 2 * target_lengths[:, None] + 1
    in_lattice = s_idx < s_len

    # Skip-transition allowed at s iff ext[s] is a label and differs from ext[s-2].
    ext_m2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s_max]
    can_skip = (ext != blank_id) & (ext != ext_m2)

    # alpha_0
    alpha0 = jnp.full((b, s_max), _NEG_INF)
    emit0 = jnp.take_along_axis(log_probs[:, 0, :], ext, axis=1)  # [B, S]
    alpha0 = alpha0.at[:, 0].set(emit0[:, 0])
    has_label = target_lengths > 0
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, emit0[:, 1], _NEG_INF))
    alpha0 = jnp.where(in_lattice, alpha0, _NEG_INF)

    def step(alpha, t):
        emit = jnp.take_along_axis(log_probs[:, t, :], ext, axis=1)  # [B, S]
        a_m1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :s_max]
        a_m2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=_NEG_INF)[:, :s_max]
        a_skip = jnp.where(can_skip, a_m2, _NEG_INF)
        new = _logsumexp3(alpha, a_m1, a_skip) + emit
        new = jnp.where(in_lattice, new, _NEG_INF)
        # Freeze once past this sample's input length.
        active = (t < input_lengths)[:, None]
        new = jnp.where(active, new, alpha)
        return new, None

    # unroll amortizes per-step scan overhead; each step is tiny VPU work
    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, t_max), unroll=4)

    # Final: logsumexp of alpha at s = S-1 and S-2 (S = 2U+1).
    last = jnp.take_along_axis(alpha, (s_len - 1).astype(jnp.int32), axis=1)[:, 0]
    last2_idx = jnp.maximum(s_len - 2, 0).astype(jnp.int32)
    last2 = jnp.take_along_axis(alpha, last2_idx, axis=1)[:, 0]
    last2 = jnp.where(target_lengths > 0, last2, _NEG_INF)
    ll = _logsumexp2(last, last2)
    return -ll


@typecheck(log_probs=("B", "T", "V"), targets=("B", "U"),
           input_lengths=("B",), target_lengths=("B",))
def ctc_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    *,
    blank_id: int,
    reduction: str = "mean_batch",
    zero_infinity: bool = False,
) -> jnp.ndarray:
    """CTC loss with the reference's reduction semantics (losses/ctc.py:45-71)."""
    nll = ctc_forward_neg_log_likelihood(
        log_probs, targets, input_lengths, target_lengths, blank_id
    )
    if zero_infinity:
        nll = jnp.where(nll >= -_NEG_INF * 0.5, 0.0, nll)
    if reduction == "mean_batch":
        return jnp.mean(nll)
    if reduction == "mean":
        # torch 'mean': per-sample loss / target_len, then batch mean
        return jnp.mean(nll / jnp.maximum(target_lengths.astype(nll.dtype), 1.0))
    if reduction == "sum":
        return jnp.sum(nll)
    return nll
