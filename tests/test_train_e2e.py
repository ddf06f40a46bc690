"""End-to-end vertical slice: tiny Conformer-CTC trains on synthetic audio and
the loss goes down; eval WER machinery runs. This is the fast_dev_run
analogue of the reference CI (Jenkinsfile:307-325)."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.audio.features import MelFeatureConfig
from conformer_nemo_tpu.audio.spec_augment import SpecAugmentConfig
from conformer_nemo_tpu.data.tokenizers import CharTokenizer
from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
from conformer_nemo_tpu.models.ctc_model import CTCModelConfig
from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule
from conformer_nemo_tpu.train.optim import make_optimizer
from conformer_nemo_tpu.train.trainer import (
    init_ctc_state,
    make_ctc_eval_step,
    make_ctc_train_step,
)

LABELS = [" ", "a", "b"]


def tiny_cfg():
    return CTCModelConfig(
        preprocessor=MelFeatureConfig(features=32, dither=0.0),
        spec_augment=SpecAugmentConfig(),  # disabled
        encoder=ConformerEncoderConfig(
            feat_in=32, n_layers=2, d_model=32, n_heads=2, ff_expansion_factor=2,
            conv_kernel_size=7, conv_norm_type="layer_norm", dropout=0.0,
            dropout_att=0.0, dtype=jnp.float32,
        ),
        num_classes=len(LABELS),
    )


def synth_batch(seed=0, b=4, t_samples=6400, u=3):
    rng = np.random.RandomState(seed)
    audio = (rng.randn(b, t_samples) * 0.1).astype(np.float32)
    audio_lens = np.full((b,), t_samples, dtype=np.int32)
    tokens = rng.randint(0, len(LABELS), size=(b, u)).astype(np.int32)
    token_lens = np.full((b,), u, dtype=np.int32)
    return {
        "audio": audio, "audio_lens": audio_lens,
        "tokens": tokens, "token_lens": token_lens,
    }


def test_ctc_overfit_single_batch():
    cfg = tiny_cfg()
    sched = make_lr_schedule({"name": "NoamAnnealing", "d_model": 32, "warmup_steps": 10}, 0.5)
    opt = make_optimizer("adamw", sched, weight_decay=0.0, grad_clip=1.0)
    state = init_ctc_state(cfg, opt, jax.random.PRNGKey(0), example_feat_shape=(1, 32, 64))
    step = make_ctc_train_step(cfg, opt)
    batch = synth_batch()
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[::5]


def test_eval_step_and_greedy():
    cfg = tiny_cfg()
    sched = make_lr_schedule({"name": "NoamAnnealing", "d_model": 32, "warmup_steps": 10}, 0.1)
    opt = make_optimizer("adamw", sched)
    state = init_ctc_state(cfg, opt, jax.random.PRNGKey(0), example_feat_shape=(1, 32, 64))
    eval_step = make_ctc_eval_step(cfg)
    batch = synth_batch(seed=1)
    loss, preds, enc_lens = eval_step(state, batch)
    assert np.isfinite(float(loss))
    assert preds.shape[0] == 4
    assert (np.asarray(preds) <= cfg.blank_id).all()


def test_train_step_on_mesh():
    # DP over the 8 virtual CPU devices: same step function under a mesh.
    from conformer_nemo_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = tiny_cfg()
    mesh = make_mesh()  # all 8 devices on 'data'
    sched = make_lr_schedule({"name": "NoamAnnealing", "d_model": 32, "warmup_steps": 10}, 0.1)
    opt = make_optimizer("adamw", sched)
    state = init_ctc_state(cfg, opt, jax.random.PRNGKey(0), example_feat_shape=(1, 32, 64))
    step = make_ctc_train_step(cfg, opt, mesh=mesh)
    batch = synth_batch(b=8)
    batch = shard_batch(mesh, batch)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_remat_encoder_matches():
    import dataclasses
    cfg = tiny_cfg()
    cfg_remat = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, remat=True)
    )
    sched = make_lr_schedule({"name": "NoamAnnealing", "d_model": 32, "warmup_steps": 10}, 0.5)
    opt = make_optimizer("adamw", sched, weight_decay=0.0, grad_clip=1.0)
    state = init_ctc_state(cfg, opt, jax.random.PRNGKey(0), example_feat_shape=(1, 32, 64))
    batch = synth_batch()
    s1, m1 = make_ctc_train_step(cfg, opt)(state, batch)
    state2 = init_ctc_state(cfg_remat, opt, jax.random.PRNGKey(0), example_feat_shape=(1, 32, 64))
    s2, m2 = make_ctc_train_step(cfg_remat, opt)(state2, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4)
