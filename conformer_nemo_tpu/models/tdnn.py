"""TDNN / ECAPA speaker-embedding stack: encoder, pooling layers, decoder.

Behavioral parity targets:
- `TDNNModule`, `MaskedSEModule`, `TDNNSEModule`, `StatsPoolLayer`,
  `AttentivePoolLayer` — reference
  `/root/reference/nemo/collections/asr/parts/submodules/tdnn_attention.py:25-279`.
- `ECAPAEncoder` — reference `asr/modules/conv_asr.py:653-745` (modified
  ECAPA without Res2Net: TDNN stem, SE-TDNN blocks, concat of block outputs,
  TDNN aggregation).
- `SpeakerDecoder` — reference `asr/modules/conv_asr.py:748-860` (stats or
  attentive pooling -> embedding layers -> final affine; `angular=True`
  switches to cosine logits for ArcFace loss).

TPU-first: NTC layout so 1-D convs lower to MXU matmuls, fp32 statistics,
masked reductions instead of per-sample loops. Everything jits with static
shapes; `lengths` is a traced [B] vector.

Deviation (documented): the reference's angular branch normalizes the final
weight inside a `for W in parameters(): W = F.normalize(W)` loop, which
rebinds the loop variable and never touches the parameter — a no-op. Here we
implement the intended ArcFace behavior (unit-norm rows AND unit-norm
embeddings -> logits are exact cosines).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _time_mask(lengths: jnp.ndarray, t: int) -> jnp.ndarray:
    """[B, T] bool validity mask."""
    return jnp.arange(t)[None, :] < lengths[:, None]


def masked_stats(x: jnp.ndarray, weights: jnp.ndarray, eps: float = 1e-10):
    """Weighted mean/std over time. x [B, T, C], weights [B, T, C] or [B, T, 1]
    summing to 1 over T (tdnn_attention.py:77-89)."""
    mean = jnp.sum(weights * x, axis=1)
    var = jnp.sum(weights * jnp.square(x - mean[:, None, :]), axis=1)
    return mean, jnp.sqrt(jnp.clip(var, eps, None))


class TDNNModule(nn.Module):
    """Conv1d (same pad) -> ReLU -> BatchNorm (tdnn_attention.py:92-133)."""

    features: int
    kernel: int = 1
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, train: bool):
        pad = (self.dilation * (self.kernel - 1)) // 2
        x = nn.Conv(
            self.features, kernel_size=(self.kernel,), padding=[(pad, pad)],
            kernel_dilation=(self.dilation,), dtype=self.dtype,
            param_dtype=jnp.float32, name="conv",
        )(x.astype(self.dtype))
        x = nn.relu(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(x.astype(jnp.float32))


class MaskedSEModule(nn.Module):
    """Squeeze-excite with length-masked global average
    (tdnn_attention.py:136-169)."""

    se_channels: int
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, lengths, *, train: bool):
        b, t, c = x.shape
        mask = _time_mask(lengths, t).astype(jnp.float32)[:, :, None]
        pooled = jnp.sum(x.astype(jnp.float32) * mask, axis=1, keepdims=True)
        pooled = pooled / jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        y = nn.Dense(self.se_channels, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(pooled.astype(self.dtype))
        y = nn.relu(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(
            y.astype(jnp.float32))
        y = nn.Dense(self.out_channels, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(y.astype(self.dtype))
        gate = jax.nn.sigmoid(y.astype(jnp.float32))
        return x * gate.astype(x.dtype)


class TDNNSEModule(nn.Module):
    """SE-TDNN residual block (tdnn_attention.py:172-222): 1x1 TDNN ->
    grouped dilated conv -> ReLU -> BN -> 1x1 TDNN -> masked SE -> +input."""

    filters: int
    group_scale: int = 8
    se_channels: int = 128
    kernel: int = 1
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, lengths, *, train: bool):
        res = x
        y = TDNNModule(self.filters, 1, 1, self.dtype, name="tdnn_in")(x, train=train)
        pad = (self.dilation * (self.kernel - 1)) // 2
        y = nn.Conv(
            self.filters, kernel_size=(self.kernel,), padding=[(pad, pad)],
            kernel_dilation=(self.dilation,), feature_group_count=self.group_scale,
            dtype=self.dtype, param_dtype=jnp.float32, name="group_conv",
        )(y.astype(self.dtype))
        y = nn.relu(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(
            y.astype(jnp.float32))
        y = TDNNModule(self.filters, 1, 1, self.dtype, name="tdnn_out")(y, train=train)
        y = MaskedSEModule(self.se_channels, self.filters, self.dtype, name="se")(
            y, lengths, train=train)
        return y + res


@dataclasses.dataclass(frozen=True)
class ECAPAEncoderConfig:
    """Config surface of reference `ECAPAEncoder.__init__`
    (conv_asr.py:694-719)."""

    feat_in: int = 80
    filters: Sequence[int] = (512, 512, 512, 512, 1536)
    kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1)
    dilations: Sequence[int] = (1, 2, 3, 4, 1)
    scale: int = 8
    dtype: Any = jnp.bfloat16


class ECAPAEncoder(nn.Module):
    """[B, T, feat_in] -> [B, T, filters[-1]]; lengths pass through
    (stride-1 same-pad convs, conv_asr.py:721-745)."""

    cfg: ECAPAEncoderConfig

    @nn.compact
    def __call__(self, x, lengths, *, train: bool):
        cfg = self.cfg
        x = TDNNModule(cfg.filters[0], cfg.kernel_sizes[0], cfg.dilations[0],
                       cfg.dtype, name="stem")(x, train=train)
        block_outs = []
        for i in range(len(cfg.filters) - 2):
            x = TDNNSEModule(
                cfg.filters[i + 1], cfg.scale, 128, cfg.kernel_sizes[i + 1],
                cfg.dilations[i + 1], cfg.dtype, name=f"block{i}",
            )(x, lengths, train=train)
            block_outs.append(x)
        x = jnp.concatenate(block_outs, axis=-1)
        x = TDNNModule(cfg.filters[-1], cfg.kernel_sizes[-1], cfg.dilations[-1],
                       cfg.dtype, name="agg")(x, train=train)
        return x, lengths


class StatsPool(nn.Module):
    """Unmasked mean(/std) pooling over time (tdnn_attention.py:25-56).
    The reference leaves this unmasked because the speaker collate repeats
    short signals to a fixed length (audio_to_label.py:112-152); same contract
    here."""

    pool_mode: str = "xvector"  # xvector = mean+std, tap = mean

    @nn.compact
    def __call__(self, x, lengths=None):
        mean = jnp.mean(x.astype(jnp.float32), axis=1)
        if self.pool_mode == "tap":
            return mean
        std = jnp.std(x.astype(jnp.float32), axis=1, ddof=1)
        return jnp.concatenate([mean, std], axis=-1)


class AttentivePool(nn.Module):
    """Attentive statistics pooling (tdnn_attention.py:225-278):
    attn over [x, masked-mean, masked-std] -> softmax over valid frames ->
    weighted mean/std. Returns [B, 2C]."""

    attention_channels: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, lengths, *, train: bool):
        b, t, c = x.shape
        xf = x.astype(jnp.float32)
        mask = _time_mask(lengths, t).astype(jnp.float32)[:, :, None]  # [B,T,1]
        w = mask / jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        mean, std = masked_stats(xf, w)
        attn_in = jnp.concatenate(
            [xf, jnp.broadcast_to(mean[:, None, :], xf.shape),
             jnp.broadcast_to(std[:, None, :], xf.shape)], axis=-1)
        a = TDNNModule(self.attention_channels, 1, 1, self.dtype, name="attn_tdnn")(
            attn_in, train=train)
        a = jnp.tanh(a)
        a = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="attn_proj")(
            a.astype(self.dtype)).astype(jnp.float32)
        a = jnp.where(mask > 0, a, -jnp.inf)
        alpha = jax.nn.softmax(a, axis=1)
        mu, sg = masked_stats(xf, alpha)
        return jnp.concatenate([mu, sg], axis=-1)


@dataclasses.dataclass(frozen=True)
class SpeakerDecoderConfig:
    """Config surface of reference `SpeakerDecoder.__init__`
    (conv_asr.py:780-820)."""

    feat_in: int = 1536
    num_classes: int = 2
    emb_sizes: Sequence[int] = (192,)
    pool_mode: str = "attention"  # xvector | tap | attention
    angular: bool = False
    attention_channels: int = 128
    dtype: Any = jnp.bfloat16


class SpeakerDecoder(nn.Module):
    """Pooling -> embedding layers -> class logits. Returns (logits [B, V],
    emb [B, emb_sizes[-1]]). The returned embedding is the LAST emb layer's
    pre-activation output (reference emb_id slicing, conv_asr.py:843-855)."""

    cfg: SpeakerDecoderConfig

    @nn.compact
    def __call__(self, x, lengths, *, train: bool):
        cfg = self.cfg
        if cfg.pool_mode in ("xvector", "tap"):
            pooled = StatsPool(cfg.pool_mode, name="pool")(x, lengths)
        elif cfg.pool_mode == "attention":
            pooled = AttentivePool(cfg.attention_channels, cfg.dtype, name="pool")(
                x, lengths, train=train)
        else:
            raise ValueError(f"unknown pool_mode {cfg.pool_mode!r}")

        emb = pooled
        h = pooled
        for i, size in enumerate(cfg.emb_sizes):
            if cfg.pool_mode == "attention":
                # conv-type affine: BN -> 1x1 conv (== dense on pooled vector)
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 name=f"emb{i}_bn")(h.astype(jnp.float32))
                h = nn.Dense(int(size), dtype=cfg.dtype, param_dtype=jnp.float32,
                             name=f"emb{i}_fc")(h.astype(cfg.dtype))
                h = h.astype(jnp.float32)
                emb = h
            else:
                # linear-type affine: Dense -> BN (emb taps here) -> ReLU
                h = nn.Dense(int(size), dtype=cfg.dtype, param_dtype=jnp.float32,
                             name=f"emb{i}_fc")(h.astype(cfg.dtype))
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, use_scale=False, use_bias=False,
                                 dtype=jnp.float32, name=f"emb{i}_bn")(
                    h.astype(jnp.float32))
                emb = h
                h = nn.relu(h)

        w = self.param(
            "final_kernel",
            nn.initializers.xavier_uniform(),
            (h.shape[-1], cfg.num_classes), jnp.float32,
        )
        if cfg.angular:
            hn = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
            wn = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
            logits = hn @ wn
        else:
            b = self.param("final_bias", nn.initializers.zeros,
                           (cfg.num_classes,), jnp.float32)
            logits = h @ w + b
        return logits, emb
