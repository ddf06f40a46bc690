"""RNN (LSTM) encoder alternative.

Behavioral parity target: reference `RNNEncoder`
(`/root/reference/nemo/collections/asr/modules/rnn_encoder.py:30-`): conv/
stacking subsampling pre-encode -> N x [(bi)LSTM -> per-layer projection ->
LayerNorm -> dropout]; lengths follow the subsampling formula.

LSTM runs as a lax.scan over time (bidirectional = forward + reversed scans
concatenated), matmuls on the MXU with fused 4H gates.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from conformer_nemo_tpu.models.conformer import (
    ConformerEncoderConfig,
    ConvSubsampling,
    StackingSubsampling,
    subsampled_lengths,
)


@dataclasses.dataclass(frozen=True)
class RNNEncoderConfig:
    feat_in: int = 80
    n_layers: int = 4
    d_model: int = 512
    proj_size: int = -1  # -1 -> d_model
    rnn_type: str = "lstm"
    bidirectional: bool = True
    subsampling: str = "striding"
    subsampling_factor: int = 4
    subsampling_conv_channels: int = -1
    dropout: float = 0.2
    dtype: Any = jnp.bfloat16

    @property
    def proj(self) -> int:
        return self.proj_size if self.proj_size > 0 else self.d_model


class _LSTMLayer(nn.Module):
    hidden: int
    dtype: Any

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        """x [B, T, D] -> [B, T, H] via lax.scan."""
        b, t, d = x.shape
        h4 = 4 * self.hidden
        wx = self.param("wx", nn.initializers.xavier_uniform(), (d, h4), jnp.float32)
        wh = self.param("wh", nn.initializers.orthogonal(), (self.hidden, h4), jnp.float32)
        bias = self.param("b", nn.initializers.zeros, (h4,), jnp.float32)
        dt = self.dtype

        xs = jnp.swapaxes(x, 0, 1)  # [T, B, D]
        if reverse:
            xs = xs[::-1]

        def step(carry, x_t):
            h, c = carry
            z = (
                jnp.dot(x_t.astype(dt), wx.astype(dt))
                + jnp.dot(h.astype(dt), wh.astype(dt))
            ).astype(jnp.float32) + bias
            i, f, g, o = jnp.split(z, 4, axis=-1)
            c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((b, self.hidden), jnp.float32)
        _, ys = jax.lax.scan(step, (h0, h0), xs)
        if reverse:
            ys = ys[::-1]
        return jnp.swapaxes(ys, 0, 1)


class RNNEncoder(nn.Module):
    cfg: RNNEncoderConfig

    @nn.compact
    def __call__(self, features, lengths, *, train: bool = False):
        """[B, D_feat, T] + lengths -> [B, d_model, T'] + lengths'."""
        cfg = self.cfg
        x = jnp.swapaxes(features, 1, 2)  # [B, T, F]
        enc_cfg = ConformerEncoderConfig(
            feat_in=cfg.feat_in, d_model=cfg.proj,
            subsampling=cfg.subsampling, subsampling_factor=cfg.subsampling_factor,
            subsampling_conv_channels=cfg.subsampling_conv_channels, dtype=cfg.dtype,
        )
        if cfg.subsampling == "stacking" and cfg.subsampling_factor > 1:
            x = StackingSubsampling(enc_cfg, name="pre_encode")(x)
            f = cfg.subsampling_factor
            t_in = features.shape[-1]
            pad = f - (t_in % f) if t_in % f else f
            out_lengths = (lengths + pad) // f
        elif cfg.subsampling_factor > 1:
            x = ConvSubsampling(enc_cfg, name="pre_encode")(x, train=train)
            out_lengths = subsampled_lengths(lengths, cfg.subsampling_factor, cfg.subsampling)
        else:
            x = nn.Dense(cfg.proj, dtype=cfg.dtype, param_dtype=jnp.float32, name="pre_encode")(x)
            out_lengths = lengths

        x = x.astype(jnp.float32)
        for i in range(cfg.n_layers):
            fwd = _LSTMLayer(cfg.d_model, cfg.dtype, name=f"lstm{i}_fwd")(x)
            if cfg.bidirectional:
                bwd = _LSTMLayer(cfg.d_model, cfg.dtype, name=f"lstm{i}_bwd")(x, reverse=True)
                y = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                y = fwd
            y = nn.Dense(cfg.proj, dtype=cfg.dtype, param_dtype=jnp.float32, name=f"proj{i}")(y)
            y = nn.LayerNorm(dtype=jnp.float32, name=f"norm{i}")(y.astype(jnp.float32))
            y = nn.Dropout(cfg.dropout)(y, deterministic=not train)
            x = y
        return jnp.swapaxes(x, 1, 2), out_lengths


@dataclasses.dataclass(frozen=True)
class LSTMDecoderConfig:
    """Schema mirror of reference `LSTMDecoder.__init__`
    (`asr/modules/lstm_decoder.py:28-76`)."""

    feat_in: int = 512
    num_classes: int = 28  # without blank; +1 added like the reference
    lstm_hidden_size: int = 256
    bidirectional: bool = False
    num_layers: int = 1
    dtype: Any = jnp.bfloat16


class LSTMDecoder(nn.Module):
    """CTC head variant: [B, D, T] -> log-probs [B, T, V+1]
    (LSTM stack -> linear -> log_softmax; lstm_decoder.py:72-76)."""

    cfg: LSTMDecoderConfig

    @nn.compact
    def __call__(self, encoder_output, *, train: bool = False):
        cfg = self.cfg
        x = jnp.swapaxes(encoder_output, 1, 2)  # [B, T, D]
        for i in range(cfg.num_layers):
            fwd = _LSTMLayer(cfg.lstm_hidden_size, cfg.dtype,
                             name=f"lstm{i}_fwd")(x)
            if cfg.bidirectional:
                bwd = _LSTMLayer(cfg.lstm_hidden_size, cfg.dtype,
                                 name=f"lstm{i}_bwd")(x, reverse=True)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        logits = nn.Dense(cfg.num_classes + 1, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32))
        return jax.nn.log_softmax(logits, axis=-1)
