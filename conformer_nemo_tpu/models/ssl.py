"""SSL pretraining modules: reconstruction decoder and Gumbel vector quantizer.

Parity targets:
- `ConvASRDecoderReconstruction` — reference
  `/root/reference/nemo/collections/asr/modules/conv_asr.py:474-584`:
  1x1 conv -> [stride layers: act -> depthwise ConvTranspose s=2 -> 1x1 conv
  -> BN] -> [non-stride layers: act -> depthwise conv -> 1x1 conv -> BN] ->
  act -> 1x1 conv to feat_out. Upsamples encoder frames back toward
  spectrogram frames when stride_layers > 0.
- `GumbelVectorQuantizer` — reference
  `asr/parts/submodules/ssl_quantizers.py:30-199` (wav2vec 2.0 quantizer:
  per-group logits -> gumbel-softmax straight-through codeword selection,
  codebook perplexity regularizer, exp-decayed temperature).

TPU-first: NTC layout (convs lower to MXU), straight-through estimator via
`one_hot(argmax) + softmax - stop_gradient(softmax)`, temperature passed in as
a traced scalar (host computes the decay from the step counter, no Python
state on the module).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ReconstructionDecoderConfig:
    feat_in: int = 256
    feat_out: int = 80
    feat_hidden: int = 128
    stride_layers: int = 2
    non_stride_layers: int = 0
    kernel_size: int = 11
    activation: str = "relu"
    dtype: Any = jnp.bfloat16


class ReconstructionDecoder(nn.Module):
    """[B, T_enc, feat_in] -> [B, T_enc * 2^stride_layers, feat_out]."""

    cfg: ReconstructionDecoderConfig

    @nn.compact
    def __call__(self, x, *, train: bool):
        cfg = self.cfg
        if (cfg.stride_layers + cfg.non_stride_layers) > 0 and (
            cfg.kernel_size < 3 or cfg.kernel_size % 2 == 0
        ):
            raise ValueError("kernel_size must be >= 3 and odd with conv layers")
        act = getattr(nn, cfg.activation)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            dtype=jnp.float32, name=name)

        h = nn.Dense(cfg.feat_hidden, dtype=cfg.dtype, param_dtype=jnp.float32,
                     name="in_proj")(x.astype(cfg.dtype))
        for i in range(cfg.stride_layers):
            h = act(h)
            h = nn.ConvTranspose(
                cfg.feat_hidden, kernel_size=(cfg.kernel_size,), strides=(2,),
                padding="SAME", dtype=cfg.dtype, param_dtype=jnp.float32,
                name=f"up{i}",
            )(h.astype(cfg.dtype))
            h = nn.Dense(cfg.feat_hidden, dtype=cfg.dtype,
                         param_dtype=jnp.float32, name=f"up{i}_proj")(h)
            h = bn(f"up{i}_bn")(h.astype(jnp.float32)).astype(cfg.dtype)
        for i in range(cfg.non_stride_layers):
            h = act(h)
            c = h.shape[-1]
            h = nn.Conv(
                cfg.feat_hidden, kernel_size=(cfg.kernel_size,),
                padding="SAME", feature_group_count=c, dtype=cfg.dtype,
                param_dtype=jnp.float32, name=f"conv{i}",
            )(h.astype(cfg.dtype))
            h = nn.Dense(cfg.feat_hidden, dtype=cfg.dtype,
                         param_dtype=jnp.float32, name=f"conv{i}_proj")(h)
            h = bn(f"conv{i}_bn")(h.astype(jnp.float32)).astype(cfg.dtype)
        h = act(h)
        out = nn.Dense(cfg.feat_out, dtype=jnp.float32, param_dtype=jnp.float32,
                       name="out_proj")(h.astype(jnp.float32))
        return out


@dataclasses.dataclass(frozen=True)
class ConvFeatureEncoderConfig:
    """Schema mirror of reference `ConvFeatureEncoder.__init__`
    (`asr/modules/wav2vec_modules.py:97-160`): wav2vec 2.0 base defaults —
    7 strided conv blocks over raw waveform, total stride 320."""

    # (dim, kernel, stride) per block
    conv_layers: tuple = (
        (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
        (512, 2, 2), (512, 2, 2))
    extractor_mode: str = "layer_norm"  # layer_norm | group_norm
    conv_bias: bool = False
    normalize_audio: bool = True
    dtype: Any = jnp.bfloat16


class ConvFeatureEncoder(nn.Module):
    """Raw waveform [B, T] -> features [B, C, T'] + lengths (wav2vec 2.0
    feature extractor, wav2vec_modules.py:58-214). `layer_norm` mode norms
    every block; `group_norm` norms only block 0 (group==channels)."""

    cfg: ConvFeatureEncoderConfig

    @nn.compact
    def __call__(self, waveform, lengths, *, train: bool = False):
        cfg = self.cfg
        x = waveform.astype(jnp.float32)
        out_lens = lengths.astype(jnp.int32)
        if cfg.normalize_audio:
            mask = (jnp.arange(x.shape[1])[None, :] < out_lens[:, None])
            denom = jnp.maximum(out_lens.astype(jnp.float32), 1.0)[:, None]
            mean = jnp.sum(jnp.where(mask, x, 0.0), 1, keepdims=True) / denom
            var = jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0), 1,
                          keepdims=True) / denom
            x = jnp.where(mask, (x - mean) / jnp.sqrt(var + 1e-5), 0.0)
        h = x[:, :, None]  # [B, T, 1]
        for i, (dim, k, stride) in enumerate(cfg.conv_layers):
            h = nn.Conv(
                dim, kernel_size=(k,), strides=(stride,), padding="VALID",
                use_bias=cfg.conv_bias, dtype=cfg.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.kaiming_normal(),
                name=f"conv{i}",
            )(h.astype(cfg.dtype)).astype(jnp.float32)
            if cfg.extractor_mode == "layer_norm":
                h = nn.LayerNorm(dtype=jnp.float32, name=f"ln{i}")(h)
            elif cfg.extractor_mode == "group_norm" and i == 0:
                h = nn.GroupNorm(num_groups=dim, dtype=jnp.float32,
                                 name="gn0")(h)
            h = nn.gelu(h)
            out_lens = (out_lens - k) // stride + 1
        return jnp.swapaxes(h, 1, 2), jnp.maximum(out_lens, 0)


@dataclasses.dataclass(frozen=True)
class GumbelVQConfig:
    dim: int = 320  # input channels
    num_vars: int = 320  # codewords per group
    groups: int = 2
    combine_groups: bool = True
    vq_dim: int = 128  # output dim
    temp_start: float = 2.0
    temp_min: float = 0.5
    temp_decay: float = 0.999995


def gumbel_temperature(cfg: GumbelVQConfig, step) -> jnp.ndarray:
    """curr_temp = max(start * decay^step, min) (ssl_quantizers.py:108-109)."""
    return jnp.maximum(cfg.temp_start * cfg.temp_decay ** step, cfg.temp_min)


class GumbelVectorQuantizer(nn.Module):
    """x [B, T, dim] -> (quantized [B, T, vq_dim], prob_ppl scalar).

    prob_ppl = (G*V - sum_g exp(H(avg_probs_g))) / (G*V) — the diversity
    regularizer of wav2vec 2.0 (ssl_quantizers.py:170-175).
    """

    cfg: GumbelVQConfig

    @nn.compact
    def __call__(self, x, temp, *, train: bool, rng=None):
        cfg = self.cfg
        assert cfg.vq_dim % cfg.groups == 0
        var_dim = cfg.vq_dim // cfg.groups
        num_groups = 1 if cfg.combine_groups else cfg.groups
        codebook = self.param(
            "vars", nn.initializers.uniform(scale=1.0),
            (num_groups * cfg.num_vars, var_dim), jnp.float32)

        b, t, _ = x.shape
        logits = nn.Dense(
            cfg.groups * cfg.num_vars, dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(stddev=1.0),
            name="weight_proj",
        )(x.astype(jnp.float32))
        logits = logits.reshape(b, t, cfg.groups, cfg.num_vars)

        probs = jax.nn.softmax(logits, axis=-1)
        avg_probs = jnp.mean(probs.reshape(b * t, cfg.groups, cfg.num_vars), axis=0)
        ppl = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1))
        num_vars_total = cfg.num_vars * cfg.groups
        prob_ppl = (num_vars_total - jnp.sum(ppl)) / num_vars_total

        if train:
            if rng is None:
                raise ValueError("train=True requires an rng for gumbel noise")
            g = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
            y_soft = jax.nn.softmax((logits + g) / temp, axis=-1)
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, cfg.num_vars, dtype=jnp.float32)
            sel = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
        else:
            idx = jnp.argmax(logits, axis=-1)
            sel = jax.nn.one_hot(idx, cfg.num_vars, dtype=jnp.float32)

        # sel [B, T, G, V] x codebook rows per group -> [B, T, G, var_dim]
        cb = codebook.reshape(num_groups, cfg.num_vars, var_dim)
        if cfg.combine_groups:
            cb = jnp.broadcast_to(cb, (cfg.groups, cfg.num_vars, var_dim))
        quant = jnp.einsum("btgv,gvd->btgd", sel, cb)
        return quant.reshape(b, t, cfg.vq_dim), prob_ppl
