"""Tensor-parallel sharding: dp x tp train step must match the dp-only step
numerically (XLA SPMD partitioning is semantics-preserving)."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.parallel.mesh import make_mesh, shard_batch
from conformer_nemo_tpu.parallel.sharding import params_shardings, shard_state
from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule
from conformer_nemo_tpu.train.optim import make_optimizer
from conformer_nemo_tpu.train.trainer import init_ctc_state, make_ctc_train_step

from test_train_e2e import synth_batch, tiny_cfg


def _mk(mesh, state_template=None):
    cfg = tiny_cfg()
    sched = make_lr_schedule({"name": "NoamAnnealing", "d_model": 32, "warmup_steps": 10}, 0.1)
    opt = make_optimizer("adamw", sched, weight_decay=1e-3, grad_clip=1.0)
    state = init_ctc_state(cfg, opt, jax.random.PRNGKey(0), (1, 32, 64))
    step = make_ctc_train_step(cfg, opt, mesh=mesh, state_template=state_template or state)
    return cfg, state, step


def test_tp_matches_dp():
    batch = synth_batch(b=4)

    mesh_dp = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    _, state_dp, step_dp = _mk(mesh_dp)
    state_dp, m_dp = step_dp(state_dp, shard_batch(mesh_dp, batch))

    mesh_tp = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    cfg, state_tp, step_tp = _mk(mesh_tp)
    with mesh_tp:
        state_tp = shard_state(mesh_tp, state_tp)
    state_tp, m_tp = step_tp(state_tp, shard_batch(mesh_tp, batch))

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_dp["grad_norm"]), float(m_tp["grad_norm"]), rtol=1e-4
    )
    # params after one update match (atol covers Adam's sign-sensitivity to
    # reduction-order noise on near-zero grads; update scale is ~6e-4)
    p_dp = jax.tree.leaves(jax.device_get(state_dp.params))
    p_tp = jax.tree.leaves(jax.device_get(state_tp.params))
    for a, b in zip(p_dp, p_tp):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-3)

    # and a second step's loss agrees (functional equivalence)
    batch2 = synth_batch(seed=1, b=4)
    _, m_dp2 = step_dp(state_dp, shard_batch(mesh_dp, batch2))
    _, m_tp2 = step_tp(state_tp, shard_batch(mesh_tp, batch2))
    np.testing.assert_allclose(float(m_dp2["loss"]), float(m_tp2["loss"]), rtol=1e-4)


def test_param_sharding_specs():
    cfg, state, _ = _mk(make_mesh(data=4, model=2, devices=jax.devices()[:8]))
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    sh = params_shardings(mesh, state.params)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    specs = {"/".join(str(getattr(p, "key", p)) for p in path): s.spec for path, s in flat}
    col = [k for k in specs if "linear1/kernel" in k]
    assert col and all(specs[k] == jax.sharding.PartitionSpec(None, "model") for k in col)
    row = [k for k in specs if "linear2/kernel" in k]
    assert row and all(specs[k] == jax.sharding.PartitionSpec("model", None) for k in row)


def test_rnnt_tp_matches_dp():
    """RNN-T train step under dp x tp == dp-only (encoder params sharded over
    'model'; prednet/joint replicated)."""
    from conformer_nemo_tpu.audio.features import MelFeatureConfig
    from conformer_nemo_tpu.audio.spec_augment import SpecAugmentConfig
    from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
    from conformer_nemo_tpu.models.rnnt import (
        RNNTDecoderConfig, RNNTJointConfig, RNNTModelConfig,
    )
    from conformer_nemo_tpu.train.rnnt_trainer import (
        RNNTTrainConfig, init_rnnt_state, make_rnnt_train_step,
    )

    cfg = RNNTTrainConfig(
        preprocessor=MelFeatureConfig(features=32, dither=0.0),
        spec_augment=SpecAugmentConfig(),
        model=RNNTModelConfig(
            encoder=ConformerEncoderConfig(
                feat_in=32, n_layers=1, d_model=32, n_heads=2,
                ff_expansion_factor=2, conv_kernel_size=7,
                conv_norm_type="layer_norm", dropout=0.0, dropout_att=0.0,
                dtype=jnp.float32),
            decoder=RNNTDecoderConfig(vocab_size=4, pred_hidden=16,
                                      dropout=0.0, dtype=jnp.float32),
            joint=RNNTJointConfig(joint_hidden=16, dropout=0.0,
                                  fuse_loss_wer=False, dtype=jnp.float32),
        ),
    )
    sched = make_lr_schedule({"name": "NoamAnnealing", "d_model": 32,
                              "warmup_steps": 10}, 0.1)
    opt = make_optimizer("adamw", sched, weight_decay=1e-3, grad_clip=1.0)
    batch = synth_batch(b=4)

    mesh_dp = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    state_dp = init_rnnt_state(cfg, opt, jax.random.PRNGKey(0), (1, 32, 64))
    step_dp = make_rnnt_train_step(cfg, opt, mesh=mesh_dp, state_template=state_dp)
    state_dp, m_dp = step_dp(state_dp, shard_batch(mesh_dp, batch))

    mesh_tp = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    state_tp = init_rnnt_state(cfg, opt, jax.random.PRNGKey(0), (1, 32, 64))
    step_tp = make_rnnt_train_step(cfg, opt, mesh=mesh_tp, state_template=state_tp)
    with mesh_tp:
        state_tp = shard_state(mesh_tp, state_tp)
    state_tp, m_tp = step_tp(state_tp, shard_batch(mesh_tp, batch))

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]), rtol=1e-5)
    p_dp = jax.tree.leaves(jax.device_get(state_dp.params))
    p_tp = jax.tree.leaves(jax.device_get(state_tp.params))
    for a, b in zip(p_dp, p_tp):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-3)


def test_batchnorm_is_sync_under_data_sharding():
    """reference sync_batchnorm=true (configs/conformer_ctc_bpe.yaml:175,
    torch SyncBatchNorm): under pjit, BatchNorm's batch-mean over the
    data-sharded axis is a GLOBAL reduction (XLA inserts the psum), so batch
    stats match the single-device computation exactly — sync-BN by
    construction, no wrapper module needed."""
    import flax.linen as nn
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name="bn")(x)

    m = M()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, True)

    def step(v, x):
        y, upd = m.apply(v, x, True, mutable=["batch_stats"])
        return y, upd["batch_stats"]

    y1, bs1 = jax.jit(step)(v, x)

    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    vs = jax.device_put(v, NamedSharding(mesh, P()))
    y2, bs2 = jax.jit(step)(vs, xs)

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(bs1), jax.tree.leaves(bs2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_banded_flash_encoder_tp_matches_dp(monkeypatch):
    """The streaming recipe at scale: a BANDED FLASH encoder (Pallas
    kernels, incl. the manual-DMA streamed family) under a dp x tp mesh
    must match the dp-only step — Pallas calls partition correctly across
    the batch*heads dimension under XLA SPMD. Guards the
    conformer_ctc_bpe_streaming.yaml configuration's multi-chip path."""
    import dataclasses

    from conformer_nemo_tpu.ops.pallas import flash_attention as fa

    def flash_cfg():
        cfg = tiny_cfg()
        return dataclasses.replace(
            cfg,
            encoder=dataclasses.replace(
                cfg.encoder, use_flash_attention=True,
                flash_attention_min_t=8, att_context_size=(12, 4)),
        )

    def mk(mesh, family):
        sched = make_lr_schedule(
            {"name": "NoamAnnealing", "d_model": 32, "warmup_steps": 10}, 0.1)
        opt = make_optimizer("adamw", sched, weight_decay=1e-3, grad_clip=1.0)
        cfg = flash_cfg()
        state = init_ctc_state(cfg, opt, jax.random.PRNGKey(0), (1, 32, 64))
        step = make_ctc_train_step(cfg, opt, mesh=mesh, state_template=state)
        return cfg, state, step

    batch = synth_batch(b=4)
    for family, cap in (("fullT", 10**15), ("stream", 0)):
        monkeypatch.setattr(fa, "_VMEM_CAP_BYTES", cap)

        mesh_dp = make_mesh(data=4, model=1, devices=jax.devices()[:4])
        _, state_dp, step_dp = mk(mesh_dp, family)
        state_dp, m_dp = step_dp(state_dp, shard_batch(mesh_dp, batch))

        mesh_tp = make_mesh(data=2, model=2, devices=jax.devices()[:4])
        _, state_tp, step_tp = mk(mesh_tp, family)
        with mesh_tp:
            state_tp = shard_state(mesh_tp, state_tp)
        state_tp, m_tp = step_tp(state_tp, shard_batch(mesh_tp, batch))

        np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                                   rtol=1e-5, err_msg=family)
        np.testing.assert_allclose(float(m_dp["grad_norm"]),
                                   float(m_tp["grad_norm"]), rtol=1e-4,
                                   err_msg=family)
