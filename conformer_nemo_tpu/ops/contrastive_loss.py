"""Wav2vec-style contrastive loss over masked spectrogram steps.

Parity target: reference `ContrastiveLoss`
(`/root/reference/nemo/collections/asr/losses/pt_losses/contrastive.py:26-261`):
combine `combine_time_steps` spectrogram frames into one target step, mark a
step "masked" when > `mask_threshold` of its channels were zeroed by the
augmentation, build targets by quantizing (GumbelVectorQuantizer) or linearly
projecting the CLEAN spectrogram, sample `num_negatives` distractor steps from
the same utterance's masked steps, and cross-entropy the cosine similarities
(temperature `logit_temp`) of the model outputs against [positive, negatives].
Adds `prob_ppl_weight * ppl_loss * sample_size` when quantizing.

TPU-first redesign (the reference boolean-gathers masked steps into a ragged
tensor — dynamic shapes): here every step keeps a [B, T'] mask weight, the CE
is computed densely for all steps and reduced with the mask, and negatives are
drawn per (sample, step) by Gumbel-top-k over that sample's masked-step set —
exact uniform sampling WITHOUT replacement, matching torch.multinomial
semantics, with static shapes throughout. Equivalent math when every sample
has the same masked count (which MaskedPatchAugmentation guarantees), and
well-defined (per-sample) when counts differ.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from conformer_nemo_tpu.models.ssl import (
    GumbelVectorQuantizer,
    GumbelVQConfig,
    gumbel_temperature,
)


@dataclasses.dataclass(frozen=True)
class ContrastiveLossConfig:
    in_dim: int = 80  # spectrogram channels
    proj_dim: int = 128
    combine_time_steps: int = 4
    num_negatives: int = 100
    quantized_targets: bool = False
    codebook_size: int = 320
    num_groups: int = 2
    prob_ppl_weight: float = 0.1
    logit_temp: float = 0.1
    reduce: str = "sum"  # sum | mean
    mask_threshold: float = 0.8
    quantizer_temp_start: float = 2.0
    quantizer_temp_min: float = 0.5
    quantizer_temp_decay: float = 0.999995
    dtype: Any = jnp.float32


class ContrastiveLoss(nn.Module):
    """Callable module (owns the target projection / quantizer params).

    Inputs: spectrograms [B, D, T] (clean), spec_masks [B, D, T] (1 where the
    augmentation zeroed), decoder_outputs [B, T', proj_dim] with
    T' = T // combine_time_steps, step (for quantizer temperature), rng.
    Returns scalar loss.
    """

    cfg: ContrastiveLossConfig

    @nn.compact
    def __call__(self, spectrograms, spec_masks, decoder_outputs, *,
                 step, rng, train: bool = True):
        cfg = self.cfg
        b, d, t = spectrograms.shape
        k = cfg.combine_time_steps
        tp = t // k

        # [B, T', k*D] combined target steps of the clean spectrogram
        targets = jnp.swapaxes(spectrograms[:, :, : tp * k], 1, 2)
        targets = targets.reshape(b, tp, k * d).astype(jnp.float32)
        masks = jnp.swapaxes(spec_masks[:, :, : tp * k], 1, 2)
        masks = masks.reshape(b, tp, k * d)
        masked = jnp.mean(masks, axis=-1) > cfg.mask_threshold  # [B, T']

        q_rng, neg_rng = (jax.random.split(rng) if rng is not None
                          else (None, None))
        ppl = 0.0
        if cfg.quantized_targets:
            vq_cfg = GumbelVQConfig(
                dim=k * d, num_vars=cfg.codebook_size, groups=cfg.num_groups,
                combine_groups=True, vq_dim=cfg.proj_dim,
                temp_start=cfg.quantizer_temp_start,
                temp_min=cfg.quantizer_temp_min,
                temp_decay=cfg.quantizer_temp_decay)
            temp = gumbel_temperature(vq_cfg, step)
            targets, ppl = GumbelVectorQuantizer(vq_cfg, name="quantizer")(
                targets, temp, train=train, rng=q_rng)
        else:
            targets = nn.Dense(cfg.proj_dim, dtype=jnp.float32,
                               param_dtype=jnp.float32, name="target_proj")(targets)

        outputs = decoder_outputs[:, :tp].astype(jnp.float32)

        # negatives: per (b, t') draw num_negatives distinct masked steps of
        # sample b (gumbel-top-k = uniform without replacement)
        n = cfg.num_negatives
        masked_logits = jnp.where(masked, 0.0, -jnp.inf)[:, None, :]  # [B,1,T']
        gumbel = jax.random.gumbel(neg_rng, (b, tp, tp), dtype=jnp.float32)
        _, neg_idx = jax.lax.top_k(masked_logits + gumbel, min(n, tp))  # [B,T',n]
        if n > tp:
            # fewer candidates than requested: reuse (wrap) — reference would
            # sample a smaller support set anyway
            reps = -(-n // tp)
            neg_idx = jnp.tile(neg_idx, (1, 1, reps))[:, :, :n]
        negs = jnp.take_along_axis(
            targets[:, None, :, :], neg_idx[:, :, :, None], axis=2)  # [B,T',n,C]

        def cos(a, b_, axis=-1, eps=1e-8):
            # eps inside the sqrt keeps the gradient finite at exact-zero
            # vectors (jnp.linalg.norm has a NaN grad at 0 even behind a
            # maximum() guard — the NaN*0 chain-rule trap)
            num = jnp.sum(a * b_, axis=axis)
            den = jnp.sqrt(
                (jnp.sum(a * a, axis=axis) + eps)
                * (jnp.sum(b_ * b_, axis=axis) + eps))
            return num / den

        pos_sim = cos(outputs, targets)  # [B, T']
        neg_sim = cos(outputs[:, :, None, :], negs)  # [B, T', n]
        # a negative that IS the positive (same vector) is excluded (-inf)
        neg_is_pos = jnp.all(
            jnp.isclose(targets[:, :, None, :], negs, atol=1e-6), axis=-1)
        neg_sim = jnp.where(neg_is_pos, -jnp.inf, neg_sim)

        logits = jnp.concatenate(
            [pos_sim[:, :, None], neg_sim], axis=-1) / cfg.logit_temp
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -logp[:, :, 0]  # target class is index 0
        w = masked.astype(jnp.float32)
        loss = jnp.sum(ce * w)
        sample_size = jnp.sum(w)
        if cfg.reduce == "mean":
            loss = loss / jnp.maximum(sample_size, 1.0)
        if cfg.quantized_targets and cfg.prob_ppl_weight != 0:
            loss = loss + cfg.prob_ppl_weight * ppl * sample_size
        return loss
