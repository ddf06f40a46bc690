"""Parity tests for the fused flash-joint RNN-T loss
(ops/pallas/rnnt_joint_kernel.py + ops/rnnt_fused.py) against the dense
joint + rnnt_loss_from_logits path it replaces.

The kernels run in interpret mode on the CPU mesh (conftest), so every test
here is exact-math parity, not a statistical check — including the dropout
path, whose in-kernel hash mask is reproduced outside the kernel by
``hash_keep_mask_reference`` and applied to a dense clone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_nemo_tpu.ops.pallas.rnnt_joint_kernel import (
    hash_keep_mask_reference)
from conformer_nemo_tpu.ops.rnnt_fused import rnnt_loss_fused
from conformer_nemo_tpu.ops.rnnt_loss import rnnt_loss_from_logits


def _mk(b=3, t=11, u=4, h=16, v=13, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    e = jnp.asarray(rng.randn(b, t, h), dtype) * 0.5
    p = jnp.asarray(rng.randn(b, u + 1, h), dtype) * 0.5
    w = jnp.asarray(rng.randn(h, v), dtype) * 0.3
    bias = jnp.asarray(rng.randn(v), dtype) * 0.1
    tgt = jnp.asarray(rng.randint(0, v - 1, (b, u)), jnp.int32)
    t_lens = jnp.asarray(rng.randint(max(1, t - 4), t + 1, (b,)), jnp.int32)
    u_lens = jnp.asarray(rng.randint(1, u + 1, (b,)), jnp.int32)
    return e, p, w, bias, tgt, t_lens, u_lens


def _dense_nll(e, p, w, bias, tgt, t_lens, u_lens, *, blank_id,
               activation="relu", fastemit=0.0, clamp=-1.0, keep=None,
               inv_keep=1.0):
    x = e[:, :, None, :] + p[:, None, :, :]
    if activation == "relu":
        h = jax.nn.relu(x)
    elif activation == "sigmoid":
        h = jax.nn.sigmoid(x)
    else:
        h = jnp.tanh(x)
    if keep is not None:
        h = jnp.where(keep, h * jnp.asarray(inv_keep, h.dtype), 0)
    logits = jnp.dot(h, w) + bias
    return rnnt_loss_from_logits(logits, tgt, t_lens, u_lens, blank_id,
                                 fastemit, clamp, "scan")


@pytest.mark.parametrize("bt", [4, 32])
@pytest.mark.parametrize("activation", ["relu", "tanh", "sigmoid"])
def test_fused_matches_dense_f32(bt, activation):
    e, p, w, bias, tgt, t_lens, u_lens = _mk()
    seed = jnp.zeros((1,), jnp.int32)
    blank = w.shape[1] - 1
    cot = jnp.asarray([1.0, 2.0, 0.5])

    def dense(e, p, w, bias):
        return jnp.sum(cot * _dense_nll(e, p, w, bias, tgt, t_lens, u_lens,
                                        blank_id=blank, activation=activation))

    def fused(e, p, w, bias):
        return jnp.sum(cot * rnnt_loss_fused(
            e, p, w, bias, tgt, t_lens, u_lens, seed, blank, 0.0, -1.0,
            "scan", activation, 0, bt))

    nd, gd = jax.value_and_grad(dense, argnums=(0, 1, 2, 3))(e, p, w, bias)
    nf, gf = jax.value_and_grad(fused, argnums=(0, 1, 2, 3))(e, p, w, bias)
    np.testing.assert_allclose(nd, nf, rtol=1e-6)
    for a, b in zip(gd, gf):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fused_fastemit_and_clamp():
    e, p, w, bias, tgt, t_lens, u_lens = _mk(seed=1)
    seed = jnp.zeros((1,), jnp.int32)
    blank = w.shape[1] - 1
    for fastemit, clamp in [(0.01, -1.0), (0.0, 0.05), (0.001, 0.1)]:
        def dense(e, p, w, bias):
            return jnp.sum(_dense_nll(e, p, w, bias, tgt, t_lens, u_lens,
                                      blank_id=blank, fastemit=fastemit,
                                      clamp=clamp))

        def fused(e, p, w, bias):
            return jnp.sum(rnnt_loss_fused(
                e, p, w, bias, tgt, t_lens, u_lens, seed, blank, fastemit,
                clamp, "scan", "relu", 0, 4))

        nd, gd = jax.value_and_grad(dense, argnums=(0, 2))(e, p, w, bias)
        nf, gf = jax.value_and_grad(fused, argnums=(0, 2))(e, p, w, bias)
        np.testing.assert_allclose(nd, nf, rtol=1e-6)
        for a, b in zip(gd, gf):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fused_dropout_matches_dense_with_replicated_mask():
    """The in-kernel hash dropout is exactly reproducible outside the kernel:
    a dense path given the same keep mask must agree on loss AND grads."""
    bt = 4
    e, p, w, bias, tgt, t_lens, u_lens = _mk(t=10, seed=2)
    b, t, h = e.shape
    u1 = p.shape[1]
    tp = t + (-t % bt)
    drop_t = int(round(0.25 * 256))
    inv_keep = 1.0 / (1.0 - drop_t / 256.0)
    seed = jnp.asarray([12345], jnp.int32)
    keep = hash_keep_mask_reference((b, tp, u1, h), seed, drop_t)[:, :t]
    blank = w.shape[1] - 1

    def dense(e, p, w, bias):
        return jnp.sum(_dense_nll(e, p, w, bias, tgt, t_lens, u_lens,
                                  blank_id=blank, keep=keep,
                                  inv_keep=inv_keep))

    def fused(e, p, w, bias):
        return jnp.sum(rnnt_loss_fused(
            e, p, w, bias, tgt, t_lens, u_lens, seed, blank, 0.0, -1.0,
            "scan", "relu", drop_t, bt))

    nd, gd = jax.value_and_grad(dense, argnums=(0, 1, 2, 3))(e, p, w, bias)
    nf, gf = jax.value_and_grad(fused, argnums=(0, 1, 2, 3))(e, p, w, bias)
    np.testing.assert_allclose(nd, nf, rtol=1e-6)
    for a, b in zip(gd, gf):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    # the mask actually drops something and keeps something
    assert 0.5 < float(jnp.mean(keep)) < 0.9


def test_fused_dropout_mask_rate_and_determinism():
    seed = jnp.asarray([7], jnp.int32)
    m1 = hash_keep_mask_reference((2, 8, 5, 64), seed, 64)
    m2 = hash_keep_mask_reference((2, 8, 5, 64), seed, 64)
    m3 = hash_keep_mask_reference((2, 8, 5, 64), jnp.asarray([8], jnp.int32), 64)
    assert bool(jnp.all(m1 == m2))
    assert not bool(jnp.all(m1 == m3))
    rate = 1.0 - float(jnp.mean(m1))
    assert abs(rate - 64 / 256) < 0.03


def test_fused_bf16_close_to_dense_bf16():
    e, p, w, bias, tgt, t_lens, u_lens = _mk(dtype=jnp.bfloat16, seed=3)
    seed = jnp.zeros((1,), jnp.int32)
    blank = w.shape[1] - 1

    nd = _dense_nll(e, p, w, bias, tgt, t_lens, u_lens, blank_id=blank)
    nf = rnnt_loss_fused(e, p, w, bias, tgt, t_lens, u_lens, seed, blank,
                         0.0, -1.0, "scan", "relu", 0, 4)
    # both paths round the logits tile to bf16 the same way; lattice fp32
    np.testing.assert_allclose(np.asarray(nd, np.float32),
                               np.asarray(nf, np.float32), rtol=1e-3)


def test_model_flash_matches_dense_end_to_end():
    """RNNTModel(joint_impl='flash') == joint_impl='dense' (f32, no dropout):
    loss and full parameter grads through encoder/prednet/joint."""
    from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
    from conformer_nemo_tpu.models.rnnt import (
        RNNTDecoderConfig, RNNTJointConfig, RNNTModel, RNNTModelConfig)

    enc_cfg = ConformerEncoderConfig(
        feat_in=24, n_layers=1, d_model=32, n_heads=2, ff_expansion_factor=2,
        subsampling_factor=2, conv_kernel_size=9, dtype=jnp.float32,
        conv_norm_type="layer_norm", dropout=0.0, dropout_att=0.0)

    def build(joint_impl):
        return RNNTModel(RNNTModelConfig(
            encoder=enc_cfg,
            decoder=RNNTDecoderConfig(vocab_size=11, pred_hidden=16,
                                      dropout=0.0, dtype=jnp.float32),
            joint=RNNTJointConfig(joint_hidden=16, dropout=0.0,
                                  fuse_loss_wer=False, dtype=jnp.float32),
            lattice_impl="scan", joint_impl=joint_impl, joint_flash_bt=8))

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 24, 20), jnp.float32)
    lens = jnp.asarray([20, 16], jnp.int32)
    tgt = jnp.asarray(rng.randint(0, 11, (2, 5)), jnp.int32)
    tl = jnp.asarray([5, 3], jnp.int32)

    md, mf = build("dense"), build("flash")
    params = md.init(jax.random.PRNGKey(0), feats, lens, tgt, tl)["params"]

    def loss(model, params):
        return jnp.mean(model.apply({"params": params}, feats, lens, tgt, tl,
                                    train=False))

    ld, gd = jax.value_and_grad(lambda p: loss(md, p))(params)
    lf, gf = jax.value_and_grad(lambda p: loss(mf, p))(params)
    np.testing.assert_allclose(ld, lf, rtol=1e-6)
    flat_d = jax.tree.flatten_with_path(gd)[0]
    flat_f = dict(jax.tree.flatten_with_path(gf)[0])
    assert len(flat_d) > 10
    for path, a in flat_d:
        np.testing.assert_allclose(
            a, flat_f[path], rtol=2e-4, atol=1e-5,
            err_msg=str(jax.tree_util.keystr(path)))


def test_model_flash_train_mode_with_dropout_runs_and_is_finite():
    """Training mode with joint dropout > 0 exercises the in-kernel mask via
    the model path (seed drawn from the dropout rng)."""
    from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
    from conformer_nemo_tpu.models.rnnt import (
        RNNTDecoderConfig, RNNTJointConfig, RNNTModel, RNNTModelConfig)

    enc_cfg = ConformerEncoderConfig(
        feat_in=24, n_layers=1, d_model=32, n_heads=2, ff_expansion_factor=2,
        subsampling_factor=2, conv_kernel_size=9, dtype=jnp.float32,
        conv_norm_type="layer_norm")
    model = RNNTModel(RNNTModelConfig(
        encoder=enc_cfg,
        decoder=RNNTDecoderConfig(vocab_size=11, pred_hidden=16,
                                  dtype=jnp.float32),
        joint=RNNTJointConfig(joint_hidden=16, dropout=0.25,
                              fuse_loss_wer=False, dtype=jnp.float32),
        lattice_impl="scan", joint_impl="flash", joint_flash_bt=8))
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, 24, 20), jnp.float32)
    lens = jnp.asarray([20, 16], jnp.int32)
    tgt = jnp.asarray(rng.randint(0, 11, (2, 5)), jnp.int32)
    tl = jnp.asarray([5, 3], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, lens, tgt, tl)

    def loss(params, key):
        return jnp.mean(model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k == "batch_stats"}},
            feats, lens, tgt, tl, train=True,
            rngs={"dropout": key}, mutable=["batch_stats"])[0])

    l1, g = jax.value_and_grad(loss)(variables["params"], jax.random.PRNGKey(1))
    l2 = loss(variables["params"], jax.random.PRNGKey(1))
    l3 = loss(variables["params"], jax.random.PRNGKey(2))
    assert np.isfinite(float(l1))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    assert abs(float(l1) - float(l3)) > 1e-9  # different seed, different mask
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_fused_odd_shapes():
    """T not a multiple of bt, tiny U, V not lane-aligned."""
    for (b, t, u, h, v, bt) in [(1, 5, 1, 8, 7, 4), (2, 33, 6, 24, 17, 8),
                                (4, 16, 3, 16, 129, 16)]:
        e, p, w, bias, tgt, t_lens, u_lens = _mk(b, t, u, h, v, seed=t)
        seed = jnp.zeros((1,), jnp.int32)
        blank = v - 1
        nd = _dense_nll(e, p, w, bias, tgt, t_lens, u_lens, blank_id=blank)
        nf = rnnt_loss_fused(e, p, w, bias, tgt, t_lens, u_lens, seed, blank,
                             0.0, -1.0, "scan", "relu", 0, bt)
        np.testing.assert_allclose(nd, nf, rtol=1e-5)


def test_auto_joint_impl_dispatch(monkeypatch):
    """auto resolves by backend + a dense-transient memory estimate: dense on
    CPU always; on TPU dense below joint_flash_hbm_threshold, flash above
    (the measured B=16/B=32 crossover on one v5e)."""
    import dataclasses

    from conformer_nemo_tpu.models import rnnt as rnnt_mod
    from conformer_nemo_tpu.models.rnnt import (RNNTDecoderConfig,
                                                RNNTModelConfig)

    cfg = RNNTModelConfig(decoder=RNNTDecoderConfig(vocab_size=1024))
    assert cfg.resolve_joint_impl(32, 376, 97) == "dense"  # cpu backend
    assert dataclasses.replace(cfg, joint_impl="flash").resolve_joint_impl(
        1, 8, 2) == "flash"
    monkeypatch.setattr(rnnt_mod.jax, "default_backend", lambda: "tpu")
    assert cfg.resolve_joint_impl(16, 376, 97) == "dense"  # 3.6 GB < 5 GB
    assert cfg.resolve_joint_impl(32, 376, 97) == "flash"  # 7.2 GB > 5 GB
    # long-form: modest batch, long T crosses the threshold too
    assert cfg.resolve_joint_impl(4, 3072, 301) == "flash"


def test_pallas_lattice_size_fallback():
    """impl='pallas' silently falls back to the scan column sweep when the
    whole skewed lattice cannot fit VMEM (long-form shapes) — and the
    dispatch helper is the single source of that decision."""
    from conformer_nemo_tpu.ops.rnnt_loss import (_PALLAS_LATTICE_MAX_CELLS,
                                                  _lattice_impl_for,
                                                  rnnt_loss_from_logits)

    assert _lattice_impl_for(376, 97, "pallas") == "pallas"  # flagship
    assert _lattice_impl_for(3001, 385, "pallas") == "scan"  # 120 s longform
    assert _lattice_impl_for(3001, 385, "scan") == "scan"
    t_edge = int(_PALLAS_LATTICE_MAX_CELLS ** 0.5)
    assert _lattice_impl_for(t_edge + 200, 1, "pallas") == "scan"

    # a shape routed to the fallback still computes the right loss
    rng = np.random.RandomState(0)
    b, t, u, v = 1, 2100, 3, 8  # (t+u1)*t > 4M -> scan
    logits = jnp.asarray(rng.randn(b, t, u + 1, v), jnp.float32)
    tgt = jnp.asarray(rng.randint(1, v, (b, u)), jnp.int32)
    tl = jnp.asarray([t], jnp.int32)
    ul = jnp.asarray([u], jnp.int32)
    n_pal = rnnt_loss_from_logits(logits, tgt, tl, ul, 0, impl="pallas")
    n_scan = rnnt_loss_from_logits(logits, tgt, tl, ul, 0, impl="scan")
    np.testing.assert_allclose(np.asarray(n_pal), np.asarray(n_scan))
