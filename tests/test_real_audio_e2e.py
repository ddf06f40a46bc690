"""Full user journey on the committed on-disk speech fixtures.

manifest -> tokenizer -> fit() (exp_manager, checkpoint, resume) -> WER -> 0
-> transcribe (WAV and FLAC decode paths) -> CLI fast_dev_run. The committed
corpus (tests/fixtures/speech/, see scripts/make_speech_fixture.py) is
formant-synthesized speech — real audio files with a learnable
acoustic-to-text correspondence — standing in for the reference CI's AN4
recordings (`/root/reference/Jenkinsfile:307-325`; no network egress here).
"""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(ROOT, "tests", "fixtures", "speech")
LABELS = [" ", "a", "e", "i", "o", "s", "u"]


def _manifest_abs(tmp_path):
    """Copy of the fixture manifest with absolute audio paths."""
    out = str(tmp_path / "manifest.json")
    with open(os.path.join(FIXTURES, "manifest.json")) as f, open(out, "w") as g:
        for line in f:
            e = json.loads(line)
            e["audio_filepath"] = os.path.join(FIXTURES, e["audio_filepath"])
            g.write(json.dumps(e) + "\n")
    return out


def _config(tmp_path, manifest):
    cfg = {
        "model": {
            "sample_rate": 16000,
            "labels": LABELS,
            "train_ds": {"manifest_filepath": manifest, "batch_size": 6,
                         "num_workers": 2},
            "validation_ds": {"manifest_filepath": manifest, "batch_size": 6},
            "preprocessor": {"features": 32, "dither": 0.0},
            "spec_augment": {"freq_masks": 0, "time_masks": 0},
            "encoder": {"feat_in": 32, "n_layers": 2, "d_model": 32,
                        "n_heads": 2, "ff_expansion_factor": 2,
                        "conv_kernel_size": 7, "conv_norm_type": "layer_norm",
                        "dropout": 0.0, "dropout_att": 0.0,
                        "subsampling_factor": 4},
            "optim": {"name": "adamw", "lr": 3e-3, "weight_decay": 0.0,
                      "sched": {"name": "CosineAnnealing", "warmup_steps": 20,
                                "max_steps": 400, "min_lr": 1e-4}},
        },
        "trainer": {"max_epochs": 1, "log_every_n_steps": 50,
                    "gradient_clip_val": 1.0},
    }
    path = str(tmp_path / "cfg.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def test_fixture_files_decode(tmp_path):
    from conformer_nemo_tpu.data.audio_io import load_audio

    with open(os.path.join(FIXTURES, "manifest.json")) as f:
        entries = [json.loads(l) for l in f]
    assert len(entries) == 6
    formats = set()
    for e in entries:
        p = os.path.join(FIXTURES, e["audio_filepath"])
        wav = load_audio(p, target_sr=16000)
        formats.add(os.path.splitext(p)[1])
        assert abs(len(wav) / 16000 - e["duration"]) < 0.01
        assert np.abs(wav).max() > 0.05  # non-silent
    assert formats == {".wav", ".flac"}


def test_full_user_journey_wer_to_zero(tmp_path):
    from conformer_nemo_tpu.api import ConformerCTC
    from conformer_nemo_tpu.train.exp_manager import (
        ExperimentManager, ExpManagerConfig)

    manifest = _manifest_abs(tmp_path)
    cfg_path = _config(tmp_path, manifest)
    exp_dir = str(tmp_path / "exp")

    model = ConformerCTC.from_config_file(cfg_path, dtype=jnp.float32)
    em = ExperimentManager(ExpManagerConfig(exp_dir=exp_dir, name="fixture_run"))
    model.fit(max_epochs=150, exp_manager=em, log_every_n_steps=50)
    em.wait_for_saves()

    # resume from the checkpoint into a FRESH model (restart journey)
    model2 = ConformerCTC.from_config_file(cfg_path, dtype=jnp.float32)
    em2 = ExperimentManager(ExpManagerConfig(
        exp_dir=exp_dir, name="fixture_run", resume_if_exists=True))
    res = model2.fit(max_epochs=180, exp_manager=em2, log_every_n_steps=50)
    assert res["steps"] > 150  # continued, not restarted

    val = model2._eval_wer(model2._loader(manifest,
                                          {"batch_size": 6}, shuffle=False))
    assert val["wer"] <= 0.2, f"WER did not converge: {val}"

    # transcription through both container formats
    with open(manifest) as f:
        entries = [json.loads(l) for l in f]
    out = model2.transcribe([e["audio_filepath"] for e in entries])
    exact = sum(o == e["text"] for o, e in zip(out, entries))
    assert exact >= 4, list(zip(out, [e["text"] for e in entries]))


def test_cli_fast_dev_run(tmp_path):
    manifest = _manifest_abs(tmp_path)
    cfg_path = _config(tmp_path, manifest)
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "speech_to_text_ctc.py"),
         "--config", cfg_path, "trainer.max_steps=2",
         f"exp_manager.exp_dir={tmp_path}/cli_exp"],
        capture_output=True, text=True, timeout=560, env=env, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
