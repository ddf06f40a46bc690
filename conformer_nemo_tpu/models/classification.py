"""Classification / regression decoder heads over a conv encoder.

Parity target: reference `ConvASRDecoderClassification`
(`/root/reference/nemo/collections/asr/modules/conv_asr.py:586-650`): pool the
encoder output over time (avg or max) then one Linear to `num_classes`
(`return_logits` controls softmax). The regression model
(classification_models.py:628-755) uses the same head with num_classes=1.

Deviation (documented): the reference pools with AdaptiveAvgPool1d over the
FULL padded time axis; here the pool is length-masked (padded frames cannot
dilute the mean / win the max). With the repeat-collate (no padding) the two
are identical; with padded batches ours is strictly more correct.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClassificationDecoderConfig:
    feat_in: int = 256
    num_classes: int = 2
    pooling_type: str = "avg"  # avg | max
    return_logits: bool = True
    dtype: Any = jnp.bfloat16


class ClassificationDecoder(nn.Module):
    """[B, T, C] + lengths [B] -> logits [B, num_classes]."""

    cfg: ClassificationDecoderConfig

    @nn.compact
    def __call__(self, x, lengths):
        cfg = self.cfg
        t = x.shape[1]
        mask = (jnp.arange(t)[None, :] < lengths[:, None])[:, :, None]
        xf = x.astype(jnp.float32)
        if cfg.pooling_type == "avg":
            denom = jnp.maximum(lengths.astype(jnp.float32), 1.0)[:, None]
            pooled = jnp.sum(jnp.where(mask, xf, 0.0), axis=1) / denom
        elif cfg.pooling_type == "max":
            pooled = jnp.max(jnp.where(mask, xf, -jnp.inf), axis=1)
        else:
            raise ValueError("pooling_type must be 'avg' or 'max'")
        logits = nn.Dense(
            cfg.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
            name="fc",
        )(pooled)
        if cfg.return_logits:
            return logits
        return jax.nn.softmax(logits, axis=-1)
