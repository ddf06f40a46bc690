"""Jasper / QuartzNet / CitriNet convolutional ASR encoder.

Behavioral parity target: reference `ConvASREncoder` + `JasperBlock`
(`/root/reference/nemo/collections/asr/modules/conv_asr.py:54-230`,
`asr/parts/submodules/jasper.py`): a sequence of blocks, each `repeat` x
[masked Conv1d (optionally depthwise-separable, strided/dilated) -> BN ->
ReLU -> dropout] with optional residual projections (add / stride_add) and
optional Squeeze-Excite; lengths follow the conv arithmetic; convolution
inputs are zero-masked past each sample's valid length (MaskedConv1d,
jasper.py:244-390).

TPU-first: convs map to `lax.conv_general_dilated` (NTC layout), masking is
a where(), and everything jits with static shapes. The quantization/export
scaffolding of the reference is out of scope.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def compute_new_kernel_size(kernel: int, factor: float) -> int:
    """Scale a kernel size and round up to odd (jasper.py:123-129)."""
    new = max(int(kernel * factor), 1)
    return new + 1 if new % 2 == 0 else new


@dataclasses.dataclass(frozen=True)
class JasperBlockConfig:
    """One entry of the encoder's `jasper` block list (config surface of the
    reference QuartzNet/Jasper/CitriNet/CarneliNet YAMLs).

    `kernel` may be a tuple of several sizes: the block is then a
    ParallelBlock (reference jasper.py:1041-1161 / ParallelConvASREncoder,
    conv_asr.py:232) — one JasperBlock per kernel size, outputs aggregated."""

    filters: int = 256
    repeat: int = 1
    kernel: Any = 11  # int, or tuple of ints -> parallel block
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0
    residual: bool = True
    separable: bool = False
    groups: int = 1
    se: bool = False
    se_reduction_ratio: int = 8
    se_context_window: int = -1  # <1 = global context (jasper.py:416)
    residual_mode: str = "add"  # add | stride_add | max (jasper.py:1024-1030)
    kernel_size_factor: float = 1.0  # jasper.py:715-719
    stride_last: bool = False  # stride only on the last repeat (jasper.py:735-739)
    residual_dense: bool = False  # Jasper-DR panes (conv_asr.py:130, jasper.py:794)
    # ParallelBlock knobs (jasper.py:1063-1097; used when kernel is a tuple)
    aggregation_mode: str = "sum"  # sum | dropout (tower dropout)
    block_dropout: float = 0.0
    parallel_residual_mode: str = "sum"  # sum | conv


@dataclasses.dataclass(frozen=True)
class ConvASREncoderConfig:
    feat_in: int = 80
    blocks: Sequence[JasperBlockConfig] = ()
    dtype: Any = jnp.bfloat16


def _same_pad(kernel: int, dilation: int) -> int:
    return (dilation * (kernel - 1)) // 2


def conv_out_length(lengths, kernel: int, stride: int, dilation: int):
    pad = _same_pad(kernel, dilation)
    return jnp.floor(
        (lengths.astype(jnp.float32) + 2 * pad - dilation * (kernel - 1) - 1) / stride + 1
    ).astype(jnp.int32)


class _MaskedConv(nn.Module):
    """Conv1d with pre-masking of padded positions (MaskedConv1d parity)."""

    features: int
    kernel: int
    stride: int
    dilation: int
    separable: bool
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x, lengths):
        """x [B, T, C]; returns ([B, T', F], lengths')."""
        t = x.shape[1]
        mask = jnp.arange(t)[None, :] < lengths[:, None]
        x = jnp.where(mask[:, :, None], x, 0.0)
        pad = _same_pad(self.kernel, self.dilation)
        conv = lambda name, feats, k, groups: nn.Conv(
            feats, kernel_size=(k,), strides=(self.stride if k > 1 else 1,),
            padding=[(pad if k > 1 else 0,) * 2],
            kernel_dilation=(self.dilation if k > 1 else 1,),
            feature_group_count=groups, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        if self.separable:
            c_in = x.shape[-1]
            x = conv("depthwise", c_in, self.kernel, c_in)(x.astype(self.dtype))
            x = conv("pointwise", self.features, 1, 1)(x)
        else:
            x = conv("conv", self.features, self.kernel, self.groups)(x.astype(self.dtype))
        return x, conv_out_length(lengths, self.kernel, self.stride, self.dilation)


class _SqueezeExcite(nn.Module):
    """Masked-mean squeeze-excite with optional limited context
    (jasper.py:411-515): context_window < 1 pools globally; otherwise the
    pool covers a `context_window`-frame slice — a RANDOM start in training
    (`_se_pool_step_script_train`, jasper.py:203) and the FIRST chunk at
    inference (`_se_pool_step_script_infer`), enabling streaming-consistent
    training."""

    channels: int
    reduction_ratio: int
    dtype: Any
    context_window: int = -1

    @nn.compact
    def __call__(self, x, lengths, *, train: bool = False):
        t = x.shape[1]
        mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)
        xm = x * mask[:, :, None]
        cw = self.context_window
        if cw > 0 and t >= cw:
            if train:
                start = jax.random.randint(
                    self.make_rng("dropout"), (), 0, max(t - cw, 1))
            else:
                start = 0
            x_sl = jax.lax.dynamic_slice_in_dim(xm, start, cw, axis=1)
            m_sl = jax.lax.dynamic_slice_in_dim(mask, start, cw, axis=1)
            denom = jnp.sum(m_sl, axis=1)[:, None] + 1e-8
            pooled = jnp.sum(x_sl, axis=1) / denom
        else:
            denom = jnp.maximum(lengths.astype(x.dtype), 1.0)[:, None]
            pooled = jnp.sum(xm, axis=1) / denom  # [B, C]
        h = max(1, self.channels // self.reduction_ratio)
        y = nn.Dense(h, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(pooled)
        y = nn.relu(y)
        y = nn.Dense(self.channels, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(y)
        gate = jax.nn.sigmoid(y.astype(jnp.float32))
        return x * gate[:, None, :].astype(x.dtype)


class JasperBlock(nn.Module):
    """One (possibly repeated) conv-BN-ReLU-dropout block with residual.

    Consumes and returns a *list* of tensors (the Jasper-DR "panes",
    jasper.py:989-1038): the conv tower runs on the last entry; residual
    projections are applied to every pane when `residual_dense`, and the
    output is appended to the pane list in that case."""

    cfg: JasperBlockConfig
    dtype: Any

    @nn.compact
    def __call__(self, xs, lengths, *, train: bool):
        cfg = self.cfg
        kernel = compute_new_kernel_size(int(cfg.kernel), cfg.kernel_size_factor)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            dtype=jnp.float32, name=name,
        )
        dense = cfg.residual and cfg.residual_dense and len(xs) > 1
        res_inputs = list(xs) if dense else [xs[-1]]
        x, res_lengths = xs[-1], lengths
        for r in range(cfg.repeat):
            last = r == cfg.repeat - 1
            # default: every repeat strides (jasper.py:735-739 — stride_val =
            # stride unless stride_last); stride_last: only the final conv.
            stride = 1 if (cfg.stride_last and not last) else cfg.stride
            x, lengths = _MaskedConv(
                cfg.filters, kernel, stride, cfg.dilation,
                cfg.separable, cfg.groups, self.dtype, name=f"conv{r}",
            )(x, lengths)
            x = bn(f"bn{r}")(x.astype(jnp.float32))
            if last and cfg.residual:
                for i, res_in in enumerate(res_inputs):
                    suffix = "" if i == 0 else str(i)
                    res, _ = _MaskedConv(
                        cfg.filters, 1,
                        cfg.stride if cfg.residual_mode == "stride_add" else 1,
                        1, False, 1, self.dtype, name=f"res_conv{suffix}",
                    )(res_in, res_lengths)
                    res = bn(f"res_bn{suffix}")(res.astype(jnp.float32))
                    if res.shape[1] != x.shape[1]:
                        res = res[:, : x.shape[1]]
                    # add / stride_add accumulate; max takes elementwise max
                    # (jasper.py:1020-1030)
                    x = jnp.maximum(x, res) if cfg.residual_mode == "max" else x + res
            x = nn.relu(x)
            x = nn.Dropout(cfg.dropout)(x.astype(self.dtype), deterministic=not train)
            x = x.astype(jnp.float32)
        if cfg.se:
            x = _SqueezeExcite(
                cfg.filters, cfg.se_reduction_ratio, self.dtype,
                cfg.se_context_window, name="se",
            )(x, lengths, train=train)
        out = list(xs) + [x] if cfg.residual and cfg.residual_dense else [x]
        return out, lengths


class ParallelBlock(nn.Module):
    """Several JasperBlocks (one per kernel size) computed on the same input
    and aggregated — the CarneliNet building block (reference `ParallelBlock`,
    jasper.py:1041-1161, used by `ParallelConvASREncoder`, conv_asr.py:232).

    aggregation_mode 'sum' adds tower outputs; 'dropout' scales each tower by
    an inverted-dropout keep weight during training (tower dropout), redrawn
    until at least one tower survives (jasper.py:1098-1103). The block input
    is then added back, either directly ('sum') or through a pointwise conv
    ('conv')."""

    cfg: JasperBlockConfig
    dtype: Any

    @nn.compact
    def __call__(self, xs, lengths, *, train: bool):
        cfg = self.cfg
        kernels = tuple(cfg.kernel)
        outs, out_lengths = [], None
        for j, k in enumerate(kernels):
            sub = dataclasses.replace(cfg, kernel=int(k))
            sub_out, sub_len = JasperBlock(sub, self.dtype, name=f"tower{j}")(
                xs, lengths, train=train
            )
            outs.append(sub_out[-1])
            out_lengths = sub_len if out_lengths is None else jnp.maximum(out_lengths, sub_len)
        if cfg.aggregation_mode == "dropout" and train and cfg.block_dropout > 0.0:
            rng = self.make_rng("dropout")
            p = cfg.block_dropout

            def draw(key):
                key, sub_key = jax.random.split(key)
                keep = jax.random.bernoulli(sub_key, 1.0 - p, (len(kernels),))
                return key, keep.astype(jnp.float32) / (1.0 - p)

            def cond(carry):
                _, w = carry
                return jnp.sum(w) == 0.0

            def body(carry):
                key, _ = carry
                return draw(key)

            _, weights = jax.lax.while_loop(cond, body, draw(rng))
            result = sum(w * o for w, o in zip(weights, outs))
        else:
            result = sum(outs)
        if cfg.parallel_residual_mode == "conv":
            res, _ = _MaskedConv(
                cfg.filters, 1, 1, 1, False, 1, self.dtype, name="res_conv",
            )(xs[-1], lengths)
            result = result + res
        else:  # 'sum' (jasper.py:1144-1145) — requires matching channels
            result = result + xs[-1]
        return [result], out_lengths


class ConvASREncoder(nn.Module):
    cfg: ConvASREncoderConfig

    @nn.compact
    def __call__(self, features, lengths, *, train: bool = False):
        """[B, D_feat, T] + lengths -> [B, C_last, T'] + lengths'."""
        x = jnp.swapaxes(features, 1, 2).astype(jnp.float32)  # [B, T, C]
        xs = [x]
        for i, bcfg in enumerate(self.cfg.blocks):
            is_parallel = isinstance(bcfg.kernel, (tuple, list))
            block_cls = ParallelBlock if is_parallel else JasperBlock
            xs, lengths = block_cls(bcfg, self.cfg.dtype, name=f"block{i}")(
                xs, lengths, train=train
            )
        return jnp.swapaxes(xs[-1], 1, 2), lengths


def quartznet_15x5_blocks(feat_out: int = 1024) -> List[JasperBlockConfig]:
    """The QuartzNet15x5 topology (reference quartznet config family)."""
    blocks = [JasperBlockConfig(filters=256, repeat=1, kernel=33, stride=2,
                                residual=False, separable=True, dropout=0.0)]
    for k, f in [(33, 256), (39, 256), (51, 512), (63, 512), (75, 512)]:
        for _ in range(3):
            blocks.append(JasperBlockConfig(filters=f, repeat=5, kernel=k,
                                            residual=True, separable=True))
    blocks.append(JasperBlockConfig(filters=512, repeat=1, kernel=87,
                                    dilation=2, residual=False, separable=True))
    blocks.append(JasperBlockConfig(filters=feat_out, repeat=1, kernel=1,
                                    residual=False, separable=False))
    return blocks


def change_se_context_window(
    blocks: Sequence[JasperBlockConfig], context_window: int
) -> List[JasperBlockConfig]:
    """Swap the SE context window across an encoder's blocks for streaming
    inference (reference `change_conv_asr_se_context_window`,
    asr_module_utils.py:24). The parameter structure is unchanged, so
    existing trained params apply as-is."""
    return [
        dataclasses.replace(b, se_context_window=context_window) if b.se else b
        for b in blocks
    ]
