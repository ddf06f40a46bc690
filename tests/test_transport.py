"""Host->device wire-format transports (f32 / pcm16 / mulaw8).

The tunnel-attached benches measured H2D at 45-107 MB/s while pcm16 feeding
needs ~109 MB/s (docs/PERFORMANCE.md): e2e training there is transport-
bound. transport="mulaw8" halves pcm16's wire bytes (8-bit mu-law, device
expands in the mel frontend). These tests pin (a) codec correctness, (b)
feature-level neutrality, (c) recognition (WER) neutrality on the committed
speech corpus — the evidence the opt-in rests on. Default stays f32.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_nemo_tpu.audio.features import MelFeatureConfig, log_mel_spectrogram
from conformer_nemo_tpu.data.audio_io import mulaw8_encode

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(ROOT, "tests", "fixtures", "speech")


def _device_decode(q: np.ndarray) -> np.ndarray:
    """The mel frontend's int8 branch, isolated (features.py)."""
    y = q.astype(np.float32) / 127.0
    return np.sign(y) * (np.exp2(8.0 * np.abs(y)) - 1.0) / 255.0


def test_mulaw_roundtrip_snr_and_edges():
    rng = np.random.RandomState(0)
    # speech-like: mixture of tones + noise at realistic level
    t = np.arange(16000) / 16000.0
    x = (0.3 * np.sin(2 * np.pi * 220 * t) * np.exp(-t)
         + 0.1 * np.sin(2 * np.pi * 800 * t)
         + 0.02 * rng.randn(16000)).astype(np.float32)
    q = mulaw8_encode(x)
    assert q.dtype == np.int8
    xr = _device_decode(q)
    snr = 10 * np.log10(np.sum(x ** 2) / np.sum((x - xr) ** 2))
    assert snr > 30.0, snr
    # edges: zero -> exactly zero; full scale survives; sign preserved;
    # int16 input accepted
    assert _device_decode(mulaw8_encode(np.zeros(4, np.float32)))[0] == 0.0
    fs = _device_decode(mulaw8_encode(np.asarray([1.0, -1.0], np.float32)))
    np.testing.assert_allclose(fs, [1.0, -1.0], atol=0.02)
    q16 = mulaw8_encode((x * 32768).astype(np.int16))
    assert np.abs(q16.astype(int) - q.astype(int)).max() <= 1


def _fixture_loader(transport, batch_size=6):
    from conformer_nemo_tpu.data.dataset import (BucketedAudioTextDataset,
                                                 BucketedLoader)
    from conformer_nemo_tpu.data.manifest import read_manifest
    from conformer_nemo_tpu.data.tokenizers import CharTokenizer

    entries = []
    with open(os.path.join(FIXTURES, "manifest.json")) as f:
        for line in f:
            e = json.loads(line)
            e["audio_filepath"] = os.path.join(FIXTURES, e["audio_filepath"])
            entries.append(e)
    import tempfile

    mf = os.path.join(tempfile.mkdtemp(), "m.json")
    with open(mf, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    samples = read_manifest(mf)
    tok = CharTokenizer([" ", "a", "e", "i", "o", "s", "u"])
    ds = BucketedAudioTextDataset(samples, tok, sample_rate=16000, n_buckets=1)
    return BucketedLoader(ds, batch_size, shuffle=False, transport=transport)


def test_mulaw_collate_dtype_and_feature_neutrality():
    """mulaw8 batches ship int8 and produce log-mel features within noise
    of the f32 path on real fixture speech."""
    b32 = next(iter(_fixture_loader("f32")))
    b8 = next(iter(_fixture_loader("mulaw8")))
    assert b8.audio.dtype == np.int8 and b32.audio.dtype == np.float32
    np.testing.assert_array_equal(b8.audio_lens, b32.audio_lens)

    cfg = MelFeatureConfig(features=32, dither=0.0)
    f32, l32 = log_mel_spectrogram(cfg, jnp.asarray(b32.audio),
                                   jnp.asarray(b32.audio_lens))
    f8, l8 = log_mel_spectrogram(cfg, jnp.asarray(b8.audio),
                                 jnp.asarray(b8.audio_lens))
    np.testing.assert_array_equal(np.asarray(l8), np.asarray(l32))
    # compare valid frames only (mel zero-fills padded frames). Features
    # are per-feature normalized, so the unit is one feature-std: measured
    # mu-law perturbation on this corpus is ~0.07-0.15 sigma mean / ~1 sigma
    # worst bin — bounded here so a codec regression is caught; the
    # operative acceptance criterion is WER neutrality (test below).
    for i in range(f32.shape[0]):
        L = int(l32[i])
        a = np.asarray(f32[i, :, :L])
        b = np.asarray(f8[i, :, :L])
        assert np.abs(a - b).mean() < 0.25, np.abs(a - b).mean()
        assert np.abs(a - b).max() < 2.0


def test_unknown_transport_rejected():
    with pytest.raises(ValueError, match="transport"):
        _fixture_loader("int4")


def test_mulaw_wer_neutrality(tmp_path):
    """Train briefly on the fixture corpus (f32), then evaluate the SAME
    model through f32 and mulaw8 loaders: recognition results must match.
    This is the decode-side WER-neutrality evidence; feature-level
    closeness above covers the train side."""
    import yaml

    from conformer_nemo_tpu.api import ConformerCTC

    entries = []
    with open(os.path.join(FIXTURES, "manifest.json")) as f:
        for line in f:
            e = json.loads(line)
            e["audio_filepath"] = os.path.join(FIXTURES, e["audio_filepath"])
            entries.append(e)
    manifest = str(tmp_path / "m.json")
    with open(manifest, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    cfg = {
        "model": {
            "sample_rate": 16000,
            "labels": [" ", "a", "e", "i", "o", "s", "u"],
            "train_ds": {"manifest_filepath": manifest, "batch_size": 6},
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
        "trainer": {"max_epochs": 1, "log_every_n_steps": 100},
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    model = ConformerCTC.from_config_file(cfg_path, dtype=jnp.float32)
    model.fit(max_epochs=150, log_every_n_steps=100)

    wer_f32 = model._eval_wer(model._loader(manifest, {"batch_size": 6},
                                            shuffle=False))["wer"]
    wer_mu8 = model._eval_wer(model._loader(
        manifest, {"batch_size": 6, "transport": "mulaw8"},
        shuffle=False))["wer"]
    # the corpus has 12 words; neutrality = identical error counts
    assert wer_mu8 == pytest.approx(wer_f32, abs=1e-6), (wer_f32, wer_mu8)
