"""Checkpoint save/restore, top-k pruning, portable artifact, exp manager."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.train.checkpoint import (
    list_checkpoints,
    load_portable,
    prune_checkpoints,
    restore_train_state,
    save_portable,
    save_train_state,
)
from conformer_nemo_tpu.train.exp_manager import ExpManagerConfig, ExperimentManager


def make_state(seed=0):
    from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
    from conformer_nemo_tpu.models.ctc_model import CTCModelConfig
    from conformer_nemo_tpu.audio.features import MelFeatureConfig
    from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule
    from conformer_nemo_tpu.train.optim import make_optimizer
    from conformer_nemo_tpu.train.trainer import init_ctc_state

    cfg = CTCModelConfig(
        preprocessor=MelFeatureConfig(features=16),
        encoder=ConformerEncoderConfig(
            feat_in=16, n_layers=1, d_model=16, n_heads=2, conv_kernel_size=7,
            conv_norm_type="layer_norm", dtype=jnp.float32,
        ),
        num_classes=4,
    )
    sched = make_lr_schedule({"name": "NoamAnnealing", "d_model": 16, "warmup_steps": 10}, 0.1)
    opt = make_optimizer("adamw", sched)
    return cfg, opt, init_ctc_state(cfg, opt, jax.random.PRNGKey(seed), (1, 16, 32))


def test_save_restore_roundtrip(tmp_path):
    cfg, opt, state = make_state()
    d = str(tmp_path / "ckpts")
    save_train_state(d, state, 10, {"val_wer": 0.5})
    cfg2, opt2, template = make_state(seed=1)
    restored, meta = restore_train_state(d, template)
    assert meta["step"] == 10
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_topk_pruning(tmp_path):
    cfg, opt, state = make_state()
    d = str(tmp_path / "ckpts")
    for step, wer in [(1, 0.9), (2, 0.5), (3, 0.7), (4, 0.4), (5, 0.8)]:
        save_train_state(d, state, step, {"val_wer": wer})
    prune_checkpoints(d, save_top_k=2, monitor="val_wer", mode="min")
    names = [n for n, _ in list_checkpoints(d)]
    # top-2 by wer: step_4 (0.4), step_2 (0.5); plus last (step_5)
    assert set(names) == {"step_2", "step_4", "step_5"}


def test_portable_artifact_roundtrip(tmp_path):
    cfg, opt, state = make_state()
    art = str(tmp_path / "tokenizer.json")
    with open(art, "w") as f:
        f.write("{}")
    out = str(tmp_path / "model.cntpu")
    save_portable(out, {"name": "test", "d_model": 16}, state.params, {"tokenizer": art})
    config, params, artifacts = load_portable(out, state.params)
    assert config["d_model"] == 16
    assert os.path.exists(artifacts["tokenizer"])
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_exp_manager_resume(tmp_path):
    cfg, opt, state = make_state()
    mcfg = ExpManagerConfig(exp_dir=str(tmp_path / "exp"), name="run", save_top_k=2)
    em = ExperimentManager(mcfg)
    em.logger.log(1, loss=2.0)
    em.save(state, 1, {"val_wer": 0.3})
    assert os.path.exists(os.path.join(em.run_dir, "metrics.jsonl"))

    mcfg2 = ExpManagerConfig(
        exp_dir=str(tmp_path / "exp"), name="run", resume_if_exists=True
    )
    em2 = ExperimentManager(mcfg2)
    assert em2.run_dir == em.run_dir
    _, _, template = make_state(seed=2)
    restored, meta = em2.maybe_resume(template)
    assert meta["step"] == 1


def test_async_save_matches_sync(tmp_path):
    """save_train_state_async writes the same bytes as the sync path and
    resolves before restore (device_get happens at submit time, so donated/
    mutated buffers can't corrupt the snapshot)."""
    import jax
    import jax.numpy as jnp

    from conformer_nemo_tpu.train import checkpoint as ckpt
    from conformer_nemo_tpu.train.trainer import TrainState

    state = TrainState.create(
        {"w": jnp.arange(4.0)}, {}, {"m": jnp.zeros(4)}, jax.random.PRNGKey(0))
    d_sync, d_async = str(tmp_path / "s"), str(tmp_path / "a")
    ckpt.save_train_state(d_sync, state, 3, {"val_wer": 0.5})
    fut = ckpt.save_train_state_async(d_async, state, 3, {"val_wer": 0.5})
    # mutate AFTER submit: the snapshot must not see it
    state = state.replace(params={"w": jnp.full(4, 9.0)})
    path = fut.result()
    assert path.endswith("step_3")
    b1 = open(f"{d_sync}/step_3/state.msgpack", "rb").read()
    b2 = open(f"{d_async}/step_3/state.msgpack", "rb").read()
    assert b1 == b2
    restored, meta = ckpt.restore_train_state(
        d_async, TrainState.create({"w": jnp.zeros(4)}, {}, {"m": jnp.zeros(4)},
                                   jax.random.PRNGKey(0)))
    assert meta["metrics"]["val_wer"] == 0.5
    import numpy as np
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(4.0))


def test_trainer_resume_from_checkpoint(tmp_path):
    """trainer.resume_from_checkpoint points at a checkpoint dir and resumes
    fit from it (reference trainer key, conformer_ctc_bpe.yaml)."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from conformer_nemo_tpu.api import ConformerCTC
    from conformer_nemo_tpu.data.audio_io import write_wav
    from conformer_nemo_tpu.data.tokenizers import CharTokenizer
    from conformer_nemo_tpu.train.checkpoint import save_train_state

    man = tmp_path / "m.json"
    rng = np.random.RandomState(0)
    with open(man, "w") as f:
        p = tmp_path / "u.wav"
        write_wav(str(p), (0.1 * rng.randn(8000)).astype(np.float32), 16000)
        f.write(json.dumps({"audio_filepath": str(p), "duration": 0.5, "text": "ab"}) + "\n")

    def make(resume=None):
        return ConformerCTC(
            {"model": {"labels": list("ab "), "preprocessor": {"features": 32},
                       "encoder": {"feat_in": 32, "n_layers": 1, "d_model": 32,
                                   "n_heads": 2, "subsampling_conv_channels": 32},
                       "decoder": {},
                       "train_ds": {"manifest_filepath": str(man), "batch_size": 1}},
             "trainer": {"max_steps": 1,
                         **({"resume_from_checkpoint": resume} if resume else {})}},
            CharTokenizer(list("ab ")), dtype=jnp.float32)

    m1 = make()
    m1.fit()
    ckdir = str(tmp_path / "ck")
    save_train_state(ckdir, m1.state, int(m1.state.step))

    m2 = make(resume=ckdir)
    m2.fit(max_steps=int(m1.state.step) + 1)
    assert int(m2.state.step) > int(m1.state.step)

    import pytest
    m3 = make(resume=str(tmp_path / "nonexistent"))
    with pytest.raises(FileNotFoundError):
        m3.fit()
