"""RNN-T train/eval step smoke: loss decreases on a fixed batch; eval decodes."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.audio.features import MelFeatureConfig
from conformer_nemo_tpu.audio.spec_augment import SpecAugmentConfig
from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
from conformer_nemo_tpu.models.rnnt import (
    RNNTDecoderConfig,
    RNNTJointConfig,
    RNNTModelConfig,
)
from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule
from conformer_nemo_tpu.train.optim import make_optimizer
from conformer_nemo_tpu.train.rnnt_trainer import (
    RNNTTrainConfig,
    init_rnnt_state,
    make_rnnt_eval_step,
    make_rnnt_train_step,
)

V = 4


def tiny_cfg():
    return RNNTTrainConfig(
        preprocessor=MelFeatureConfig(features=16, dither=0.0),
        spec_augment=SpecAugmentConfig(),
        model=RNNTModelConfig(
            encoder=ConformerEncoderConfig(
                feat_in=16, n_layers=1, d_model=24, n_heads=2, ff_expansion_factor=2,
                conv_kernel_size=7, conv_norm_type="layer_norm", dropout=0.0,
                dropout_att=0.0, dtype=jnp.float32,
            ),
            decoder=RNNTDecoderConfig(vocab_size=V, pred_hidden=16, dropout=0.0, dtype=jnp.float32),
            joint=RNNTJointConfig(joint_hidden=16, dropout=0.0, dtype=jnp.float32),
        ),
        variational_noise_std=0.0,
    )


def batch(seed=0, b=2, t_samples=4800, u=3):
    rng = np.random.RandomState(seed)
    return {
        "audio": (rng.randn(b, t_samples) * 0.1).astype(np.float32),
        "audio_lens": np.full((b,), t_samples, np.int32),
        "tokens": rng.randint(0, V, size=(b, u)).astype(np.int32),
        "token_lens": np.full((b,), u, np.int32),
    }


def test_rnnt_train_step_decreases_loss():
    cfg = tiny_cfg()
    sched = make_lr_schedule({"name": "NoamAnnealing", "d_model": 24, "warmup_steps": 20}, 1.0)
    opt = make_optimizer("adamw", sched, grad_clip=1.0)
    state = init_rnnt_state(cfg, opt, jax.random.PRNGKey(0), (1, 16, 64))
    step = make_rnnt_train_step(cfg, opt)
    b = batch()
    losses = []
    for _ in range(40):
        state, m = step(state, b)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[::10]


def test_rnnt_eval_step_runs():
    cfg = tiny_cfg()
    sched = make_lr_schedule({"name": "NoamAnnealing", "d_model": 24, "warmup_steps": 20}, 0.5)
    opt = make_optimizer("adamw", sched)
    state = init_rnnt_state(cfg, opt, jax.random.PRNGKey(0), (1, 16, 64))
    ev = make_rnnt_eval_step(cfg, max_symbols=3)
    tokens, lens, enc_lens = ev(state, batch(seed=1))
    assert tokens.shape[0] == 2
    assert (np.asarray(lens) >= 0).all()


def test_compute_eval_loss_flag():
    """compute_eval_loss=True adds a deterministic transducer val loss
    (reference conformer_transducer_bpe.yaml:27 / rnnt_models.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
    from conformer_nemo_tpu.models.rnnt import (
        RNNTDecoderConfig, RNNTJointConfig, RNNTModelConfig)
    from conformer_nemo_tpu.train.rnnt_trainer import (
        RNNTTrainConfig, init_rnnt_state, make_rnnt_loss_eval_step)
    from conformer_nemo_tpu.train.optim import make_optimizer
    from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule

    cfg = RNNTTrainConfig(model=RNNTModelConfig(
        encoder=ConformerEncoderConfig(
            feat_in=80, n_layers=1, d_model=32, n_heads=2,
            subsampling_conv_channels=32, dtype=jnp.float32),
        decoder=RNNTDecoderConfig(vocab_size=5, pred_hidden=16, dtype=jnp.float32),
        joint=RNNTJointConfig(joint_hidden=16, fused_batch_size=2, dtype=jnp.float32),
    ))
    sched = make_lr_schedule({"name": "NoamAnnealing", "d_model": 32, "warmup_steps": 10}, 1.0)
    state = init_rnnt_state(cfg, make_optimizer("adamw", sched), jax.random.PRNGKey(0))
    loss_step = make_rnnt_loss_eval_step(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "audio": jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.1),
        "audio_lens": jnp.asarray([8000, 6000], np.int32),
        "tokens": jnp.asarray(rng.randint(0, 5, (2, 6)).astype(np.int32)),
        "token_lens": jnp.asarray([6, 4], np.int32),
    }
    l1 = float(loss_step(state, batch))
    l2 = float(loss_step(state, batch))
    assert np.isfinite(l1) and l1 > 0 and l1 == l2  # deterministic
