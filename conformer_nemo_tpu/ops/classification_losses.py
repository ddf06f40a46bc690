"""Classification-path losses and accuracy metrics.

Parity targets:
- `AngularSoftmaxLoss` — reference
  `/root/reference/nemo/collections/asr/losses/angularloss.py:26-69` (ArcFace:
  additive angular margin on the target cosine, scaled softmax CE).
- `CrossEntropyLoss` / smoothed CE — reference
  `nemo/collections/common/losses/cross_entropy.py` (mean reduction, optional
  per-sample weights).
- `TopKClassificationAccuracy` — reference
  `nemo/collections/common/metrics/classification_accuracy.py` (correct/total
  count states so multi-batch / multi-host aggregation is a plain sum).

All functions are pure and jittable; reductions are fp32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, label_smoothing: float = 0.0
) -> jnp.ndarray:
    """Mean softmax cross entropy. logits [B, V] (any float dtype), labels [B]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    v = logits.shape[-1]
    target = jax.nn.one_hot(labels, v, dtype=jnp.float32)
    if label_smoothing > 0.0:
        target = target * (1.0 - label_smoothing) + label_smoothing / v
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def angular_softmax_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    scale: float = 20.0,
    margin: float = 1.35,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """ArcFace angular-margin loss (angularloss.py:57-69).

    `logits` must be cosine similarities in [-1, 1] (SpeakerDecoder with
    angular=True). numerator = s*cos(acos(cos_y) + m); denominator adds the
    non-target classes at plain s*cos.
    """
    logits = logits.astype(jnp.float32)
    b, v = logits.shape
    cos_y = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    numerator = scale * jnp.cos(
        jnp.arccos(jnp.clip(cos_y, -1.0 + eps, 1.0 - eps)) + margin
    )
    onehot = jax.nn.one_hot(labels, v, dtype=bool)
    # sum over non-target classes of exp(s * cos); exclude target via -inf
    excl = jnp.where(onehot, -jnp.inf, scale * logits)
    denom = jnp.exp(numerator) + jnp.sum(jnp.exp(excl), axis=1)
    return -jnp.mean(numerator - jnp.log(denom))


def top_k_counts(
    logits: jnp.ndarray, labels: jnp.ndarray, top_k: Sequence[int] = (1,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-k (correct, total) counts — summable across batches/hosts like the
    reference's torchmetrics dist states."""
    max_k = max(top_k)
    _, pred = jax.lax.top_k(logits.astype(jnp.float32), max_k)  # [B, max_k]
    hit = pred == labels[:, None]
    correct = jnp.stack([jnp.sum(jnp.any(hit[:, :k], axis=1)) for k in top_k])
    total = jnp.full((len(top_k),), logits.shape[0], dtype=jnp.int32)
    return correct.astype(jnp.int32), total


def mse_loss(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Regression path (EncDecRegressionModel, classification_models.py:628)."""
    return jnp.mean(jnp.square(preds.astype(jnp.float32) - targets.astype(jnp.float32)))
