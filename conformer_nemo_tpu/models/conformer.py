"""Conformer encoder, TPU-native (flax.linen, static shapes, bf16-friendly).

Behavioral parity target: the reference ConformerEncoder
(`/root/reference/nemo/collections/asr/modules/conformer_encoder.py`) and its
submodules (`conformer_modules.py`, `multi_head_attention.py`,
`subsampling.py`):

  conv-subsampling (striding: log2(f) stacked Conv2d k=3 s=2 p=1 + ReLU,
  then Linear over C*F') -> xscale * x + rel-pos encoding (2L-1 sinusoids)
  -> N x [ half-FF -> rel-pos MHSA -> conv module (pointwise->GLU->depthwise
  k=31 -> norm -> swish -> pointwise) -> half-FF -> LayerNorm ].

TPU-first choices vs the reference:
  * Everything is a pure function of (params, batch) under jit; masks are
    computed from lengths with broadcasted iota — no dynamic shapes, no
    cross-rank max-length all-reduce (bucketed static shapes make the PE
    cache sync at conformer_encoder.py:283-294 unnecessary).
  * The depthwise conv is expressed as `lax.conv_general_dilated` with
    feature_group_count=d_model, which XLA fuses with the flanking pointwise
    matmuls; conv_norm_type='layer_norm' avoids cross-replica batch-norm
    (the reference supports the same switch, conformer_modules.py:150).
  * Matmuls run in bf16 with fp32 accumulation (MXU native); layernorm,
    softmax and residual adds stay fp32.
  * The rel-pos attention keeps the Transformer-XL (q+u)k^T + rel_shift((q+v)p^T)
    formulation (multi_head_attention.py:132-232) as plain batched matmuls —
    large, MXU-shaped; a Pallas flash-attention path can slot in behind the
    same interface.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class FastDropout(nn.Module):
    """Dropout drawing uint8 random bits: 4x less RNG HBM traffic.

    `nn.Dropout` samples 32 random bits per element; on the [B,H,T,T]
    attention probabilities across 18 layers that is ~1.3 GB/step of u32
    RngBitGenerator output written+read through HBM (~7 ms measured on one
    v5e chip). One byte per element is plenty for a Bernoulli draw: keep iff
    bits >= t with t = round(rate*256). The realized drop rate t/256 (e.g.
    0.1016 for rate=0.1) is what the rescale uses, so E[out] == x exactly.
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        t = int(round(self.rate * 256))
        if deterministic or t <= 0:
            return x
        keep = 1.0 - t / 256.0
        bits = jax.random.bits(self.make_rng("dropout"), x.shape, dtype=jnp.uint8)
        return jnp.where(bits >= t, x / keep, 0).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class ConformerEncoderConfig:
    """Schema mirror of the reference encoder config
    (configs/conformer_ctc_bpe.yaml:105-140)."""

    feat_in: int = 80
    n_layers: int = 18
    d_model: int = 512
    feat_out: int = -1
    subsampling: str = "striding"  # striding | vggnet | resnet | subencoder | stacking | none
    subsampling_factor: int = 4
    subsampling_conv_channels: int = -1
    ff_expansion_factor: int = 4
    self_attention_model: str = "rel_pos"  # rel_pos | abs_pos
    n_heads: int = 8
    att_context_size: tuple[int, int] = (-1, -1)
    xscaling: bool = True
    untie_biases: bool = True
    pos_emb_max_len: int = 5000
    conv_kernel_size: int = 31
    conv_norm_type: str = "batch_norm"  # batch_norm | layer_norm
    dropout: float = 0.1
    dropout_emb: float = 0.0
    dropout_att: float = 0.1
    dtype: Any = jnp.bfloat16  # compute dtype; params always fp32
    # Pallas flash kernel (no att-dropout/banding only). Measured on one
    # v5e chip, 17L d512 encoder fwd: T=376 dense 27 ms vs flash 37 ms;
    # T=1500 dense 87 ms vs flash 46 ms. "auto" (default) picks flash when
    # the static T reaches flash_attention_min_t — long-form inference gets
    # the kernel, LibriSpeech-length training keeps the dense decomposition.
    use_flash_attention: Any = "auto"  # True | False | "auto"
    flash_attention_min_t: int = 1024
    # rematerialize each layer in backward (jax.checkpoint): trades ~30% more
    # FLOPs for O(layers) less activation HBM — enables bigger batches
    remat: bool = False

    @property
    def d_ff(self) -> int:
        return self.d_model * self.ff_expansion_factor

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_heads


_SUBSAMPLING_GEOM = {
    # mode -> (padding, kernel, stride, ceil_mode) of the length-determining op
    # (reference subsampling.py:73-149: striding conv, vggnet/resnet pools,
    # subencoder k4s2p1 conv)
    "striding": (1, 3, 2, False),
    "vggnet": (0, 2, 2, True),
    "resnet": (0, 2, 2, True),
    "subencoder": (1, 4, 2, False),
}


def calc_sub_length(lengths, mode: str, reps: int):
    """Output length after `reps` applications of the mode's length op.
    Parity with reference calc_length (subsampling.py:272-282)."""
    pad, k, s, ceil = _SUBSAMPLING_GEOM[mode]
    out = jnp.asarray(lengths, jnp.float32)
    for _ in range(reps):
        out = (out + 2 * pad - k) / s + 1.0
        out = jnp.ceil(out) if ceil else jnp.floor(out)
    return out.astype(jnp.int32)


def subsampled_lengths(lengths: jnp.ndarray, factor: int, mode: str = "striding") -> jnp.ndarray:
    return calc_sub_length(lengths, mode, int(math.log2(factor)))


def sinusoidal_rel_pos_emb(length: int, d_model: int) -> np.ndarray:
    """Relative sinusoidal PE for positions (length-1) .. -(length-1), [2L-1, D].

    Matches reference RelPositionalEncoding.extend_pe/create_pe
    (multi_head_attention.py:235-316): even dims sin(pos*w), odd dims cos(pos*w).
    """
    positions = np.arange(length - 1, -length, -1, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe = np.zeros((2 * length - 1, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(positions * div)
    pe[:, 1::2] = np.cos(positions * div)
    return pe.astype(np.float32)


def sinusoidal_abs_pos_emb(length: int, d_model: int) -> np.ndarray:
    positions = np.arange(0, length, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe = np.zeros((length, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(positions * div)
    pe[:, 1::2] = np.cos(positions * div)
    return pe.astype(np.float32)


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift: [B, H, T, 2T-1] -> [B, H, T, 2T-1] where
    out[..., i, j] = x[..., i, j + i + 1 - T]-aligned scores. Pad-left one
    column, fold, drop first row (multi_head_attention.py:159-170)."""
    b, h, qlen, pos_len = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, pos_len + 1, qlen)
    x = x[:, :, 1:, :].reshape(b, h, qlen, pos_len)
    return x


class RelPosMultiHeadAttention(nn.Module):
    """Multi-head self-attention with Transformer-XL relative positional terms.

    TPU-native bd computation: the reference materializes (q+v)p^T as
    [B, H, T, 2T-1] and applies the pad/reshape rel_shift
    (multi_head_attention.py:159-232) — on TPU that intermediate plus its
    reshuffle costs more than the attention matmuls themselves (measured:
    over half the encoder-forward time). Because the positional embeddings
    are pure sinusoids, bd[i,j] = qw[i] . pe(i-j) decomposes exactly by the
    angle-addition identities into

        bd = [qs*sinI + qc*cosI | -qs*cosI + qc*sinI] @ [cosJ | sinJ]^T

    — one dense [B,H,T,D] x [D,T] matmul, no 2T-1 intermediate, no shift,
    bit-equivalent to the reference formulation (tested). The rel_shift path
    is kept for pos-emb dropout (dropout_emb > 0), which the decomposition
    cannot express.
    """

    cfg: ConformerEncoderConfig

    @nn.compact
    def __call__(self, x, pos_emb, att_mask, *, deterministic: bool, lengths=None,
                 shared_biases=None):
        cfg = self.cfg
        h, dk = cfg.n_heads, cfg.d_head
        d_model = cfg.d_model
        dense = lambda name, feats, use_bias=True: nn.Dense(
            feats, use_bias=use_bias, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
        )
        b, t, _ = x.shape
        q = dense("linear_q", h * dk)(x).reshape(b, t, h, dk)
        k = dense("linear_k", h * dk)(x).reshape(b, t, h, dk)
        v = dense("linear_v", h * dk)(x).reshape(b, t, h, dk)
        w_pos = self.param(
            "linear_pos_kernel", nn.initializers.lecun_normal(), (d_model, h * dk), jnp.float32
        )

        if shared_biases is not None:
            # untie_biases=False: one (u, v) pair shared by every layer
            # (reference conformer_encoder.py:165-173)
            pos_bias_u, pos_bias_v = shared_biases
        else:
            pos_bias_u = self.param("pos_bias_u", nn.initializers.zeros, (h, dk), jnp.float32)
            pos_bias_v = self.param("pos_bias_v", nn.initializers.zeros, (h, dk), jnp.float32)

        q = q.astype(jnp.float32)
        qu = (q + pos_bias_u).astype(cfg.dtype)
        qv = (q + pos_bias_v).astype(cfg.dtype)

        use_decomposition = cfg.dropout_emb == 0.0
        mod_a = mod_b = sin_t = cos_t = None
        if use_decomposition:
            # qw[b,i,h,e] = sum_d qv[b,i,h,d] * W_pos[e,h,d]; we need its
            # even/odd interleaved halves qs/qc — slice the SMALL weight
            # (rows of [D,H,dk]) instead of the big activation: interleaved
            # lane-strided slices of [B,T,H,D] lowered to per-layer gather
            # copies (~0.25 ms/layer fwd+bwd on v5e).
            w = w_pos.astype(cfg.dtype).reshape(d_model, h, dk)
            inv_freq = np.exp(
                np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model)
            )
            pos = np.arange(t, dtype=np.float64)[:, None] * inv_freq[None, :]
            sin_t = jnp.asarray(np.sin(pos), cfg.dtype)  # [T, D/2]
            cos_t = jnp.asarray(np.cos(pos), cfg.dtype)
            # [B, H, T, D/2] orientation: the bd matmul and its backward then
            # consume/produce [B, H, T, T] directly (no transpose of the big
            # score-sized gradient).
            # one full-width matmul (the two half-width versions ran ~4x
            # below MXU peak); the 256-boundary output slices are tile-aligned
            w_cat = jnp.concatenate([w[0::2], w[1::2]], axis=0)  # [D, H, dk]
            qsc = jnp.einsum("bihd,ehd->bhie", qv, w_cat)  # [B, H, T, D]
            qs, qc = qsc[..., : d_model // 2], qsc[..., d_model // 2 :]
            mod_a = qs * sin_t[None, None] + qc * cos_t[None, None]
            mod_b = -qs * cos_t[None, None] + qc * sin_t[None, None]

        want_flash = (
            cfg.use_flash_attention is True
            or (cfg.use_flash_attention == "auto"
                and t >= cfg.flash_attention_min_t)
        )
        flash_ok = (
            want_flash
            and use_decomposition
            and lengths is not None
            and (deterministic or cfg.dropout_att == 0.0)
        )
        if flash_ok:
            # Fold content + positional terms into one extended-depth QK^T:
            # Qs = [q+u | ab], Ks = [k | cs] -> Pallas flash kernel, no [T,T]
            # HBM materialization.
            from conformer_nemo_tpu.ops.pallas.flash_attention import flash_attention

            ab = jnp.concatenate([mod_a, mod_b], axis=-1).transpose(0, 2, 1, 3)  # [B, T, H, D]
            cs = jnp.concatenate([cos_t, sin_t], axis=-1)  # [T, D]
            # LANE ALIGNMENT: pad the score depth (dk+D = 576) and value
            # depth (dk = 64) to multiples of the 128-lane tile INSIDE these
            # concats (zero depth contributes nothing to QK^T / output
            # columns sliced away). Measured on-chip at T=3072: the aligned
            # kernels run ~1.5x faster (banded fullT 6.0 -> 3.8 ms fwd) and
            # the manual-DMA streamed kernels REQUIRE aligned slices; doing
            # it here fuses the pad into the concat instead of paying a
            # separate ~4.5 ms materialization per call.
            d1_pad = -(dk + d_model) % 128
            dv_pad = -dk % 128
            zpad = lambda p: jnp.zeros((b, t, h, p), cfg.dtype)
            qs_full = jnp.concatenate([qu, ab, zpad(d1_pad)], axis=-1)
            cs_b = jnp.broadcast_to(
                cs[None, :, None, :], (b, t, h, d_model)
            ).astype(cfg.dtype)
            ks_full = jnp.concatenate([k, cs_b, zpad(d1_pad)], axis=-1)
            v_pad = jnp.concatenate([v.astype(cfg.dtype), zpad(dv_pad)], axis=-1)
            # pad T to a tile boundary (padded keys are masked by lens; padded
            # query rows are sliced away)
            t_pad = -t % 128
            to_bh = lambda a: jnp.pad(
                jnp.transpose(a, (0, 2, 1, 3)).reshape(b * h, t, a.shape[-1]),
                ((0, 0), (0, t_pad), (0, 0)),
            )
            lens_rep = jnp.repeat(lengths.astype(jnp.int32), h)
            interpret = jax.default_backend() == "cpu"
            # att_context_size banding folds into the kernel as a static
            # window; out-of-band tiles are skipped (O(T*w) compute)
            band_l, band_r = (int(x) for x in cfg.att_context_size)
            o = flash_attention(
                to_bh(qs_full), to_bh(ks_full), to_bh(v_pad), lens_rep,
                256, 512, 1.0 / math.sqrt(dk), interpret, band_l, band_r,
            )[:, :t, :dk]
            out = o.reshape(b, h, t, dk).transpose(0, 2, 1, 3).reshape(b, t, h * dk)
            out = jnp.where(
                jnp.arange(t)[None, :, None] < lengths[:, None, None], out, 0.0
            )
            return dense("linear_out", cfg.d_model)(out)

        # dense-score path
        matrix_ac = jnp.einsum("bthd,bshd->bhts", qu, k)
        if use_decomposition:
            # bd = mod_a @ cos^T + mod_b @ sin^T ([B, H, T, T]); two K=D/2
            # matmuls summed — equal FLOPs to the concatenated form, no
            # [B,T,H,D] concat materialization.
            matrix_bd = jnp.einsum("bhik,jk->bhij", mod_a, cos_t) + jnp.einsum(
                "bhik,jk->bhij", mod_b, sin_t
            )
        else:
            p = (pos_emb.astype(cfg.dtype) @ w_pos.astype(cfg.dtype)).reshape(-1, h, dk)
            matrix_bd = jnp.einsum("bthd,phd->bhtp", qv, p)
            matrix_bd = _rel_shift(matrix_bd)[..., :t]

        scores = (matrix_ac.astype(jnp.float32) + matrix_bd.astype(jnp.float32)) / math.sqrt(dk)
        scores = jnp.where(att_mask[:, None, :, :], -10000.0, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(att_mask[:, None, :, :], 0.0, attn)
        # dropout on the compute-dtype tensor: halves HBM traffic on the
        # [B, H, T, T] attention probabilities
        attn = FastDropout(cfg.dropout_att)(attn.astype(cfg.dtype), deterministic=deterministic)

        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(b, t, h * dk)
        return dense("linear_out", cfg.d_model)(out)


class AbsPosMultiHeadAttention(nn.Module):
    cfg: ConformerEncoderConfig

    @nn.compact
    def __call__(self, x, att_mask, *, deterministic: bool):
        cfg = self.cfg
        h, dk = cfg.n_heads, cfg.d_head
        dense = lambda name, feats: nn.Dense(
            feats, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
        )
        b, t, _ = x.shape
        q = dense("linear_q", h * dk)(x).reshape(b, t, h, dk)
        k = dense("linear_k", h * dk)(x).reshape(b, t, h, dk)
        v = dense("linear_v", h * dk)(x).reshape(b, t, h, dk)
        scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) / math.sqrt(dk)
        scores = jnp.where(att_mask[:, None, :, :], -10000.0, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(att_mask[:, None, :, :], 0.0, attn)
        attn = FastDropout(cfg.dropout_att)(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bshd->bthd", attn.astype(cfg.dtype), v).reshape(b, t, h * dk)
        return dense("linear_out", cfg.d_model)(out)


class ConformerFeedForward(nn.Module):
    cfg: ConformerEncoderConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        cfg = self.cfg
        x = nn.Dense(cfg.d_ff, dtype=cfg.dtype, param_dtype=jnp.float32, name="linear1")(x)
        x = nn.silu(x)  # Swish
        x = FastDropout(cfg.dropout)(x, deterministic=deterministic)
        x = nn.Dense(cfg.d_model, dtype=cfg.dtype, param_dtype=jnp.float32, name="linear2")(x)
        return x


class ConformerConvolution(nn.Module):
    """pointwise(2d) -> GLU -> pad-masked depthwise(k) -> norm -> swish -> pointwise."""

    cfg: ConformerEncoderConfig

    @nn.compact
    def __call__(self, x, pad_mask, *, deterministic: bool, train: bool):
        cfg = self.cfg
        d = cfg.d_model
        x = nn.Dense(2 * d, dtype=cfg.dtype, param_dtype=jnp.float32, name="pointwise_conv1")(x)
        a, b_ = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b_)  # GLU

        # zero padded positions before the depthwise conv so no padding leaks
        # into valid frames (conformer_modules.py:168-170)
        x = jnp.where(pad_mask[:, :, None], 0.0, x)

        kernel = self.param(
            "depthwise_kernel",
            nn.initializers.lecun_normal(),
            (cfg.conv_kernel_size, 1, d),
            jnp.float32,
        )
        bias = self.param("depthwise_bias", nn.initializers.zeros, (d,), jnp.float32)
        pad = (cfg.conv_kernel_size - 1) // 2
        x = jax.lax.conv_general_dilated(
            x.astype(cfg.dtype),
            kernel.astype(cfg.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=d,
        ) + bias.astype(cfg.dtype)

        if cfg.conv_norm_type == "layer_norm":
            x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x.astype(jnp.float32))
        else:
            # Batch norm over (batch, time) per channel. With data-parallel
            # training, cross-replica stats ride the mesh via nn.BatchNorm
            # axis_name when inside shard_map/pjit-psum context; here we use
            # batch stats are GLOBAL under pjit data sharding (the mean over
            # the sharded batch axis lowers to a cross-replica reduction) —
            # sync_batchnorm parity for free; see
            # test_tp_sharding.py::test_batchnorm_is_sync_under_data_sharding.
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="norm",
            )(x.astype(jnp.float32))
        x = nn.silu(x)
        x = nn.Dense(d, dtype=cfg.dtype, param_dtype=jnp.float32, name="pointwise_conv2")(x)
        return x


class ConformerLayer(nn.Module):
    """half-FF -> MHSA -> conv -> half-FF -> LayerNorm (macaron, fc_factor=0.5)."""

    cfg: ConformerEncoderConfig

    @nn.compact
    def __call__(
        self, x, pos_emb, att_mask, pad_mask, deterministic: bool = True,
        train: bool = False, lengths=None, shared_biases=None,
    ):
        cfg = self.cfg
        fc = 0.5
        # dropout acts on compute-dtype tensors; residual accumulates fp32
        drop = lambda y: FastDropout(cfg.dropout)(
            y.astype(cfg.dtype), deterministic=deterministic
        ).astype(jnp.float32)
        ln = lambda name: nn.LayerNorm(dtype=jnp.float32, name=name)

        residual = x
        y = ln("norm_feed_forward1")(x)
        y = ConformerFeedForward(cfg, name="feed_forward1")(y, deterministic=deterministic)
        residual = residual + drop(y) * fc

        y = ln("norm_self_att")(residual)
        if cfg.self_attention_model == "rel_pos":
            y = RelPosMultiHeadAttention(cfg, name="self_attn")(
                y, pos_emb, att_mask, deterministic=deterministic, lengths=lengths,
                shared_biases=shared_biases,
            )
        else:
            y = AbsPosMultiHeadAttention(cfg, name="self_attn")(
                y, att_mask, deterministic=deterministic
            )
        residual = residual + drop(y)

        y = ln("norm_conv")(residual)
        y = ConformerConvolution(cfg, name="conv")(
            y, pad_mask, deterministic=deterministic, train=train
        )
        residual = residual + drop(y)

        y = ln("norm_feed_forward2")(residual)
        y = ConformerFeedForward(cfg, name="feed_forward2")(y, deterministic=deterministic)
        residual = residual + drop(y) * fc

        return ln("norm_out")(residual)


def _max_pool_2x2_ceil(y):
    """2x2 stride-2 max pool with ceil_mode=True (torch MaxPool2d parity):
    right/bottom -inf padding to even size, then pool."""
    b, t, f, c = y.shape
    pad_t, pad_f = t % 2, f % 2
    if pad_t or pad_f:
        y = jnp.pad(
            y, ((0, 0), (0, pad_t), (0, pad_f), (0, 0)), constant_values=-jnp.inf
        )
    return nn.max_pool(y, window_shape=(2, 2), strides=(2, 2))


class ConvSubsampling(nn.Module):
    """Conv subsampling front-end: striding / vggnet / resnet / subencoder.

    Parity targets (subsampling.py:44-269):
      striding:   log2(f) x [Conv2d(C, k3 s2 p1) + ReLU]
      vggnet:     log2(f) x [Conv k3s1p1 + ReLU, Conv k3s1p1 + ReLU,
                  MaxPool k2 s2 ceil]
      resnet:     log2(f) x [ResNetBlock (broadcast-residual convs + BN) +
                  MaxPool k2 s2 ceil]   (fork addition)
      subencoder: log2(f) x SEEncoderLayer (Conv k4s2p1 + BN + ReLU, two
                  residual k3s1p1 conv+BN+ReLU)   (fork addition)
    then Linear over flattened (C * F')."""

    cfg: ConformerEncoderConfig

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cfg = self.cfg
        channels = (
            cfg.subsampling_conv_channels if cfg.subsampling_conv_channels > 0 else cfg.d_model
        )
        reps = int(math.log2(cfg.subsampling_factor))
        mode = cfg.subsampling
        conv = lambda name, feats, k, s, p: nn.Conv(
            feats, kernel_size=(k, k), strides=(s, s), padding=[(p, p), (p, p)],
            dtype=cfg.dtype, param_dtype=jnp.float32, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )
        # x: [B, T, F] -> [B, T, F, 1] (NHWC)
        y = x[..., None].astype(cfg.dtype)
        for i in range(reps):
            if mode == "striding":
                y = nn.relu(conv(f"conv{i}", channels, 3, 2, 1)(y))
            elif mode == "vggnet":
                y = nn.relu(conv(f"conv{i}a", channels, 3, 1, 1)(y))
                y = nn.relu(conv(f"conv{i}b", channels, 3, 1, 1)(y))
                y = _max_pool_2x2_ceil(y)
            elif mode == "resnet":
                # ResNetBlock (subsampling.py:179): broadcast residual adds
                y = y + conv(f"res{i}a", channels, 3, 1, 1)(y)
                y = nn.relu(bn(f"res{i}a_bn")(y.astype(jnp.float32))).astype(cfg.dtype)
                y = y + conv(f"res{i}b", channels, 3, 1, 1)(y)
                y = nn.relu(bn(f"res{i}b_bn")(y.astype(jnp.float32))).astype(cfg.dtype)
                y = _max_pool_2x2_ceil(y)
            elif mode == "subencoder":
                # SEEncoderLayer (subsampling.py:232-269)
                y = conv(f"se{i}a", channels, 4, 2, 1)(y)
                y = nn.relu(bn(f"se{i}a_bn")(y.astype(jnp.float32))).astype(cfg.dtype)
                y = y + conv(f"se{i}b", channels, 3, 1, 1)(y)
                y = nn.relu(bn(f"se{i}b_bn")(y.astype(jnp.float32))).astype(cfg.dtype)
                y = y + conv(f"se{i}c", channels, 3, 1, 1)(y)
                y = nn.relu(bn(f"se{i}c_bn")(y.astype(jnp.float32))).astype(cfg.dtype)
            else:
                raise ValueError(f"unknown subsampling mode: {mode}")
        b, t, f, c = y.shape
        y = y.reshape(b, t, f * c)
        return nn.Dense(cfg.d_model, dtype=cfg.dtype, param_dtype=jnp.float32, name="out")(y)


class StackingSubsampling(nn.Module):
    cfg: ConformerEncoderConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        f = cfg.subsampling_factor
        b, t, d = x.shape
        pad = f - (t % f) if t % f else f  # reference always pads (subsampling.py:35)
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = x.reshape(b, (t + pad) // f, d * f)
        return nn.Dense(cfg.d_model, dtype=cfg.dtype, param_dtype=jnp.float32, name="proj_out")(x)


def make_masks(cfg: ConformerEncoderConfig, t: int, lengths: jnp.ndarray):
    """(pad_mask [B,T] True=PAD, att_mask [B,T,T] True=MASKED) from lengths.

    Mirrors make_pad_mask + att-context banding (conformer_encoder.py:263-296):
    att[i,j] allowed iff both valid and -left <= j - i <= right.
    """
    idx = jnp.arange(t)
    valid = idx[None, :] < lengths[:, None]  # [B, T]
    att_ok = valid[:, :, None] & valid[:, None, :]
    left, right = cfg.att_context_size
    rel = idx[None, :, None] - idx[None, None, :]  # i - j
    if left >= 0:
        att_ok = att_ok & (rel <= left)
    if right >= 0:
        att_ok = att_ok & (-rel <= right)
    return ~valid, ~att_ok


class ConformerEncoder(nn.Module):
    """Full encoder: [B, D_feat, T] + lengths -> [B, d_model, T'] + lengths'."""

    cfg: ConformerEncoderConfig

    @nn.compact
    def __call__(self, features, lengths, *, train: bool = False):
        cfg = self.cfg
        x = jnp.swapaxes(features, 1, 2)  # [B, T, F]
        deterministic = not train

        if cfg.subsampling in _SUBSAMPLING_GEOM and cfg.subsampling_factor > 1:
            x = ConvSubsampling(cfg, name="pre_encode")(x, train=train)
            out_lengths = subsampled_lengths(lengths, cfg.subsampling_factor, cfg.subsampling)
        elif cfg.subsampling == "stacking" and cfg.subsampling_factor > 1:
            x = StackingSubsampling(cfg, name="pre_encode")(x)
            f = cfg.subsampling_factor
            t_in = features.shape[-1]
            pad = f - (t_in % f) if t_in % f else f
            out_lengths = (lengths + pad) // f
        else:
            x = nn.Dense(cfg.d_model, dtype=cfg.dtype, param_dtype=jnp.float32, name="pre_encode")(x)
            out_lengths = lengths

        t = x.shape[1]
        x = x.astype(jnp.float32)
        if cfg.xscaling:
            x = x * math.sqrt(cfg.d_model)

        if cfg.self_attention_model == "rel_pos":
            pos_emb = jnp.asarray(sinusoidal_rel_pos_emb(t, cfg.d_model))
            pos_emb = FastDropout(cfg.dropout_emb)(pos_emb, deterministic=deterministic)
        else:
            pe = jnp.asarray(sinusoidal_abs_pos_emb(t, cfg.d_model))
            x = x + pe[None]
            pos_emb = None
        x = FastDropout(cfg.dropout)(x, deterministic=deterministic)

        pad_mask, att_mask = make_masks(cfg, t, out_lengths)

        shared_biases = None
        if not cfg.untie_biases and cfg.self_attention_model == "rel_pos":
            # one (u, v) bias pair shared across layers
            # (reference conformer_encoder.py:165-173)
            shared_biases = (
                self.param("pos_bias_u", nn.initializers.zeros,
                           (cfg.n_heads, cfg.d_head), jnp.float32),
                self.param("pos_bias_v", nn.initializers.zeros,
                           (cfg.n_heads, cfg.d_head), jnp.float32),
            )

        layer_cls = ConformerLayer
        if cfg.remat:
            # bools are static (arg 0 is the module instance in lifted remat).
            # prevent_cse MUST stay True here: the layers sit in a plain
            # Python loop under jit, and with prevent_cse=False XLA's CSE
            # merges the recomputed forward back with the original, undoing
            # rematerialization entirely (verified on-chip: identical
            # 22.89 GB HBM demand with and without remat; prevent_cse=False
            # is only safe under scan, which has its own barrier).
            layer_cls = nn.remat(ConformerLayer, static_argnums=(5, 6))
        for i in range(cfg.n_layers):
            x = layer_cls(cfg, name=f"layers_{i}")(
                x, pos_emb, att_mask, pad_mask, deterministic, train, out_lengths,
                shared_biases,
            )

        if cfg.feat_out > 0 and cfg.feat_out != cfg.d_model:
            x = nn.Dense(cfg.feat_out, dtype=cfg.dtype, param_dtype=jnp.float32, name="out_proj")(x)

        return jnp.swapaxes(x.astype(jnp.float32), 1, 2), out_lengths
