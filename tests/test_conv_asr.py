"""Jasper/QuartzNet conv encoder: shapes, lengths, masking, QuartzNet size."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.models.conv_asr import (
    ConvASREncoder,
    ConvASREncoderConfig,
    JasperBlockConfig,
    conv_out_length,
    quartznet_15x5_blocks,
)


def small_cfg():
    return ConvASREncoderConfig(
        feat_in=16,
        blocks=(
            JasperBlockConfig(filters=16, repeat=1, kernel=11, stride=2, residual=False, separable=True),
            JasperBlockConfig(filters=16, repeat=2, kernel=11, residual=True, separable=True, dropout=0.0),
            JasperBlockConfig(filters=24, repeat=1, kernel=1, residual=False),
        ),
        dtype=jnp.float32,
    )


def test_shapes_and_lengths():
    cfg = small_cfg()
    enc = ConvASREncoder(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
    lengths = jnp.array([64, 40])
    variables = enc.init(jax.random.PRNGKey(0), feats, lengths, train=False)
    out, out_len = enc.apply(variables, feats, lengths, train=False)
    assert out.shape == (2, 24, 32)  # stride 2 in first block
    np.testing.assert_array_equal(np.asarray(out_len), [32, 20])


def test_masking_isolates_padding():
    cfg = small_cfg()
    enc = ConvASREncoder(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64))
    lengths = jnp.array([64, 40])
    variables = enc.init(jax.random.PRNGKey(0), feats, lengths, train=False)
    out, out_len = enc.apply(variables, feats, lengths, train=False)
    feats2 = feats.at[1, :, 40:].set(99.0)
    out2, _ = enc.apply(variables, feats2, lengths, train=False)
    valid = int(out_len[1])
    # receptive field bleeds at the boundary; check well inside the valid region
    np.testing.assert_allclose(
        np.asarray(out[1, :, : valid - 8]), np.asarray(out2[1, :, : valid - 8]),
        rtol=1e-4, atol=1e-4,
    )


def test_conv_out_length_formula():
    lens = jnp.array([100, 101])
    # k=33 s=2 d=1: pad=16 -> floor((L+32-32-1)/2+1)
    np.testing.assert_array_equal(
        np.asarray(conv_out_length(lens, 33, 2, 1)), [(100 - 1) // 2 + 1, (101 - 1) // 2 + 1]
    )


def test_quartznet_15x5_param_count():
    # QuartzNet15x5 is ~18.9M params encoder-side (docs: 18.9M total with head)
    blocks = quartznet_15x5_blocks()
    cfg = ConvASREncoderConfig(feat_in=64, blocks=tuple(blocks), dtype=jnp.float32)
    enc = ConvASREncoder(cfg)
    feats = jnp.zeros((1, 64, 128))
    variables = enc.init(jax.random.PRNGKey(0), feats, jnp.array([128]), train=False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert 15e6 < n < 22e6, n / 1e6


def test_se_block_runs():
    cfg = ConvASREncoderConfig(
        feat_in=8,
        blocks=(JasperBlockConfig(filters=8, repeat=1, kernel=5, residual=True, se=True),),
        dtype=jnp.float32,
    )
    enc = ConvASREncoder(cfg)
    feats = jnp.ones((1, 8, 16))
    variables = enc.init(jax.random.PRNGKey(0), feats, jnp.array([16]), train=False)
    out, _ = enc.apply(variables, feats, jnp.array([16]), train=False)
    assert out.shape == (1, 8, 16)


def test_se_limited_context_window():
    """Limited-context SE (jasper.py:203-229,500-515): inference pools the
    FIRST context_window frames; params carry over when the window changes
    (change_conv_asr_se_context_window parity)."""
    from conformer_nemo_tpu.models.conv_asr import change_se_context_window

    def enc_for(blocks):
        return ConvASREncoder(ConvASREncoderConfig(
            feat_in=8, blocks=tuple(blocks), dtype=jnp.float32))

    blocks = [JasperBlockConfig(filters=8, repeat=1, kernel=5,
                                residual=False, se=True)]
    enc = enc_for(blocks)
    rng = np.random.RandomState(0)
    # time-growing signal: first-8-frame mean differs from global mean
    feats = jnp.asarray(
        (rng.rand(1, 8, 24) + np.arange(24)[None, None, :]).astype(np.float32))
    lens = jnp.array([24])
    variables = enc.init(jax.random.PRNGKey(0), feats, lens, train=False)

    out_global, _ = enc.apply(variables, feats, lens, train=False)

    blocks_cw = change_se_context_window(blocks, 8)
    assert blocks_cw[0].se_context_window == 8
    enc_cw = enc_for(blocks_cw)
    # SAME params apply (structure unchanged)
    out_cw, _ = enc_cw.apply(variables, feats, lens, train=False)
    assert out_cw.shape == out_global.shape
    assert not np.allclose(np.asarray(out_cw), np.asarray(out_global))

    # training mode draws a random window start -> differs across rng keys
    (o1, _), _ = enc_cw.apply(variables, feats, lens, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)},
                              mutable=["batch_stats"])
    (o2, _), _ = enc_cw.apply(variables, feats, lens, train=True,
                              rngs={"dropout": jax.random.PRNGKey(4)},
                              mutable=["batch_stats"])
    assert not np.allclose(np.asarray(o1), np.asarray(o2))

    # non-SE blocks untouched by the swap
    mixed = change_se_context_window(
        [JasperBlockConfig(se=False), JasperBlockConfig(se=True)], 16)
    assert mixed[0].se_context_window == -1 and mixed[1].se_context_window == 16


def test_stride_last_vs_default_stride_semantics():
    # default (stride_last=False): EVERY repeat strides (jasper.py:735-739);
    # stride_last=True: only the last conv strides.
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 64))
    lengths = jnp.array([64])

    def run(stride_last):
        cfg = ConvASREncoderConfig(
            feat_in=8,
            blocks=(JasperBlockConfig(filters=8, repeat=2, kernel=5, stride=2,
                                      residual=False, stride_last=stride_last),),
            dtype=jnp.float32,
        )
        enc = ConvASREncoder(cfg)
        v = enc.init(jax.random.PRNGKey(0), feats, lengths, train=False)
        out, out_len = enc.apply(v, feats, lengths, train=False)
        return out.shape[-1], int(out_len[0])

    t_default, l_default = run(False)
    t_last, l_last = run(True)
    assert (t_default, l_default) == (16, 16)  # stride 2 applied twice
    assert (t_last, l_last) == (32, 32)  # stride 2 applied once


def test_kernel_size_factor_scales_and_rounds_odd():
    from conformer_nemo_tpu.models.conv_asr import compute_new_kernel_size

    assert compute_new_kernel_size(11, 1.0) == 11
    assert compute_new_kernel_size(11, 0.5) == 5
    assert compute_new_kernel_size(12, 0.5) == 7  # 6 -> rounded up to odd
    assert compute_new_kernel_size(3, 0.1) == 1
    cfg = ConvASREncoderConfig(
        feat_in=8,
        blocks=(JasperBlockConfig(filters=8, repeat=1, kernel=11, residual=False,
                                  kernel_size_factor=0.5),),
        dtype=jnp.float32,
    )
    enc = ConvASREncoder(cfg)
    feats = jnp.zeros((1, 8, 32))
    v = enc.init(jax.random.PRNGKey(0), feats, jnp.array([32]), train=False)
    k = v["params"]["block0"]["conv0"]["conv"]["kernel"]
    assert k.shape[0] == 5


def test_max_residual_mode():
    cfg = ConvASREncoderConfig(
        feat_in=8,
        blocks=(JasperBlockConfig(filters=8, repeat=1, kernel=5, residual=True,
                                  residual_mode="max"),),
        dtype=jnp.float32,
    )
    enc = ConvASREncoder(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 32))
    lengths = jnp.array([32, 20])
    v = enc.init(jax.random.PRNGKey(0), feats, lengths, train=False)
    out, _ = enc.apply(v, feats, lengths, train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_dense_residual_panes():
    # Jasper-DR: each dense block gets a residual projection per prior pane
    cfg = ConvASREncoderConfig(
        feat_in=8,
        blocks=(
            JasperBlockConfig(filters=8, repeat=1, kernel=5, residual=True, residual_dense=True),
            JasperBlockConfig(filters=8, repeat=1, kernel=5, residual=True, residual_dense=True),
            JasperBlockConfig(filters=8, repeat=1, kernel=5, residual=True, residual_dense=True),
        ),
        dtype=jnp.float32,
    )
    enc = ConvASREncoder(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 32))
    lengths = jnp.array([32, 24])
    v = enc.init(jax.random.PRNGKey(0), feats, lengths, train=False)
    p = v["params"]
    assert "res_conv" in p["block0"] and "res_conv1" not in p["block0"]
    assert "res_conv1" in p["block1"]  # two panes: input + block0 out
    assert "res_conv2" in p["block2"]  # three panes
    out, _ = enc.apply(v, feats, lengths, train=False)
    assert out.shape == (2, 8, 32)


def test_parallel_block_carnelinet():
    # kernel given as a tuple -> ParallelBlock (ParallelConvASREncoder parity)
    cfg = ConvASREncoderConfig(
        feat_in=8,
        blocks=(JasperBlockConfig(filters=8, repeat=1, kernel=(5, 9, 13),
                                  residual=True, separable=True,
                                  parallel_residual_mode="conv"),),
        dtype=jnp.float32,
    )
    enc = ConvASREncoder(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 32))
    lengths = jnp.array([32, 16])
    v = enc.init(jax.random.PRNGKey(0), feats, lengths, train=False)
    p = v["params"]["block0"]
    assert {"tower0", "tower1", "tower2", "res_conv"} <= set(p.keys())
    out, out_len = enc.apply(v, feats, lengths, train=False)
    assert out.shape == (2, 8, 32)
    np.testing.assert_array_equal(np.asarray(out_len), [32, 16])

    # eval output == sum of towers + conv residual (sum aggregation)
    # tower dropout: train mode with block_dropout keeps output finite and
    # scales surviving towers by 1/(1-p)
    cfg_d = ConvASREncoderConfig(
        feat_in=8,
        blocks=(JasperBlockConfig(filters=8, repeat=1, kernel=(5, 9), residual=True,
                                  separable=True, aggregation_mode="dropout",
                                  block_dropout=0.5, parallel_residual_mode="conv"),),
        dtype=jnp.float32,
    )
    enc_d = ConvASREncoder(cfg_d)
    v_d = enc_d.init(jax.random.PRNGKey(0), feats, lengths, train=False)
    (out_d, _), _ = enc_d.apply(
        v_d, feats, lengths, train=True,
        rngs={"dropout": jax.random.PRNGKey(7)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(out_d)).all()
