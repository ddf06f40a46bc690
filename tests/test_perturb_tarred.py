"""Waveform perturbations + tarred-shard ingestion."""

import json
import os
import random
import tarfile

import numpy as np
import pytest

from conformer_nemo_tpu.audio.perturb import (
    AudioAugmentor,
    GainPerturbation,
    NoisePerturbation,
    ShiftPerturbation,
    SpeedPerturbation,
    WhiteNoisePerturbation,
    process_augmentations,
)
from conformer_nemo_tpu.data.audio_io import write_wav
from conformer_nemo_tpu.data.tarred import (
    TarredAudioTextDataset,
    expand_sharded_filepaths,
)
from conformer_nemo_tpu.data.tokenizers import CharTokenizer


def test_speed_changes_length():
    rng = random.Random(0)
    x = np.random.RandomState(0).randn(16000).astype(np.float32)
    p = SpeedPerturbation(min_speed_rate=0.9, max_speed_rate=0.9, num_rates=1)
    y = p.perturb(x, 16000, rng)
    # librosa convention: resample to rate*sr then play at sr -> longer for rate<1
    assert abs(len(y) - 16000 / 0.9) < 50 or abs(len(y) - 16000 * 0.9) < 50


def test_gain():
    rng = random.Random(0)
    x = np.ones(100, np.float32)
    p = GainPerturbation(min_gain_dbfs=6.02, max_gain_dbfs=6.02)
    y = p.perturb(x, 16000, rng)
    np.testing.assert_allclose(y, 2.0, rtol=1e-2)


def test_shift_zero_fills():
    rng = random.Random(1)
    x = np.arange(100, dtype=np.float32) + 1
    p = ShiftPerturbation(min_shift_ms=2.0, max_shift_ms=2.0)
    y = p.perturb(x, 16000, rng)  # 32-sample shift
    assert (y[:32] == 0).all()
    assert y[32] == x[0]


def test_white_noise_and_augmentor():
    aug = AudioAugmentor([(1.0, WhiteNoisePerturbation(-50, -50))], seed=0)
    x = np.zeros(1000, np.float32)
    y = aug.perturb(x, 16000)
    assert y.std() > 0
    assert abs(20 * np.log10(y.std() + 1e-12) - (-50)) < 2.0


def test_noise_perturbation_snr(tmp_path):
    sr = 16000
    noise = np.random.RandomState(0).randn(sr).astype(np.float32) * 0.5
    npath = str(tmp_path / "noise.wav")
    write_wav(npath, noise, sr)
    man = str(tmp_path / "noise.json")
    with open(man, "w") as f:
        f.write(json.dumps({"audio_filepath": npath, "duration": 1.0, "text": ""}) + "\n")
    p = NoisePerturbation(man, min_snr_db=10, max_snr_db=10)
    x = np.random.RandomState(1).randn(sr).astype(np.float32) * 0.1
    y = p.perturb(x.copy(), sr, random.Random(0))
    added = y - x
    snr = 10 * np.log10((x ** 2).mean() / ((added ** 2).mean() + 1e-12))
    assert abs(snr - 10) < 2.0


def test_process_augmentations_registry():
    aug = process_augmentations({"gain": {"prob": 1.0, "min_gain_dbfs": 0, "max_gain_dbfs": 0}})
    x = np.ones(10, np.float32)
    np.testing.assert_allclose(aug.perturb(x, 16000), x)
    with pytest.raises(ValueError):
        process_augmentations({"nope": {}})


def test_expand_sharded_filepaths():
    out = expand_sharded_filepaths("shard_{0..3}.tar", "replicate")
    assert out == [f"shard_{i}.tar" for i in range(4)]
    out = expand_sharded_filepaths("shard__OP_0..3_CL_.tar", "scatter", world_size=2, global_rank=1)
    assert out == ["shard_2.tar", "shard_3.tar"]
    with pytest.raises(ValueError):
        expand_sharded_filepaths("shard_{0..2}.tar", "scatter", world_size=2)


@pytest.fixture
def tar_corpus(tmp_path):
    sr = 16000
    rng = np.random.RandomState(0)
    entries = []
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for shard in range(2):
        with tarfile.open(str(tmp_path / f"audio_{shard}.tar"), "w") as tf:
            for i in range(3):
                name = f"utt{shard}_{i}.wav"
                p = str(wav_dir / name)
                write_wav(p, (rng.randn(8000) * 0.05).astype(np.float32), sr)
                tf.add(p, arcname=name)
                entries.append({"audio_filepath": name, "duration": 0.5, "text": "a b"})
    man = str(tmp_path / "manifest.json")
    with open(man, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return str(tmp_path / "audio_{0..1}.tar"), man


def test_tarred_dataset_iterates(tar_corpus):
    tars, man = tar_corpus
    tok = CharTokenizer([" ", "a", "b"])
    ds = TarredAudioTextDataset(tars, man, tok, shuffle_n=2, shard_strategy="replicate")
    items = list(ds)
    assert len(items) == 6
    wav, tokens, text = items[0]
    assert wav.dtype == np.float32
    assert text == "a b"
    assert tokens == [1, 0, 2]


def test_tarred_scatter_partitions(tar_corpus):
    tars, man = tar_corpus
    tok = CharTokenizer([" ", "a", "b"])
    seen = []
    for rank in range(2):
        ds = TarredAudioTextDataset(
            tars, man, tok, shard_strategy="scatter", world_size=2, global_rank=rank
        )
        seen.append(len(list(ds)))
    assert seen == [3, 3]


def test_time_stretch_preserves_pitch():
    """Phase-vocoder time stretch: duration scales by 1/rate while the
    dominant frequency stays put (the old resampling approximation shifted
    pitch by the rate; reference perturb.py:170 preserves it)."""
    import numpy as np
    from conformer_nemo_tpu.audio.perturb import TimeStretchPerturbation

    sr = 16000
    f0 = 440.0
    t = np.arange(sr * 2) / sr
    tone = np.sin(2 * np.pi * f0 * t).astype(np.float32)

    class FixedRng:
        def __init__(self, r): self.r = r
        def randrange(self, n): return 0
        def uniform(self, a, b): return self.r

    for rate in (0.85, 1.25):
        p = TimeStretchPerturbation(min_speed_rate=rate, max_speed_rate=rate, num_rates=-1)
        out = p.perturb(tone, sr, FixedRng(rate))
        assert abs(len(out) - round(len(tone) / rate)) <= 1
        # dominant frequency of the middle chunk
        mid = out[len(out)//4 : len(out)//4 + sr//2]
        spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
        freq = np.fft.rfftfreq(len(mid), 1.0/sr)[np.argmax(spec)]
        assert abs(freq - f0) < 15.0, (rate, freq)


def test_phase_vocoder_identity_rate():
    import numpy as np
    from conformer_nemo_tpu.audio.perturb import TimeStretchPerturbation

    class FixedRng:
        def randrange(self, n): return 0
        def uniform(self, a, b): return 1.0

    x = np.random.RandomState(0).randn(8000).astype(np.float32)
    p = TimeStretchPerturbation(min_speed_rate=1.0, max_speed_rate=1.0, num_rates=-1)
    out = p.perturb(x, 16000, FixedRng())
    np.testing.assert_array_equal(out, x)  # rate == 1 is a no-op


def test_fit_with_tarred_dataset(tmp_path):
    """is_tarred/tarred_audio_filepaths wired through ConformerCTC.fit
    (reference get_tarred_dataset, audio_to_text_dataset.py:135)."""
    import json
    import tarfile

    import jax.numpy as jnp
    import numpy as np

    from conformer_nemo_tpu.api import ConformerCTC
    from conformer_nemo_tpu.data.audio_io import write_wav

    rng = np.random.RandomState(0)
    man = tmp_path / "train.json"
    tar = tmp_path / "audio_0.tar"
    wavs = []
    with open(man, "w") as f:
        for i, text in enumerate(["ab", "ba", "aab", "bba"]):
            p = tmp_path / f"u{i}.wav"
            write_wav(str(p), (0.1 * rng.randn(8000)).astype(np.float32), 16000)
            wavs.append(p)
            f.write(json.dumps({"audio_filepath": f"u{i}.wav", "duration": 0.5,
                                "text": text}) + "\n")
    with tarfile.open(tar, "w") as tf:
        for p in wavs:
            tf.add(str(p), arcname=p.name)

    model = ConformerCTC(
        {"model": {
            "labels": list("ab "),
            "preprocessor": {"features": 32},
            "encoder": {"feat_in": 32, "n_layers": 1, "d_model": 32, "n_heads": 2,
                        "subsampling_conv_channels": 32},
            "decoder": {},
            "train_ds": {"manifest_filepath": str(man), "is_tarred": True,
                         "tarred_audio_filepaths": str(tar), "batch_size": 2,
                         "shuffle_n": 2, "max_duration": 1.0},
        },
         "trainer": {"max_steps": 2}},
        __import__("conformer_nemo_tpu.data.tokenizers", fromlist=["x"]).CharTokenizer(list("ab ")),
        dtype=jnp.float32)
    out = model.fit()
    assert out["steps"] >= 2


def _write_manifest(tmp_path, name, wav, sr=16000):
    p = str(tmp_path / f"{name}.wav")
    write_wav(p, wav, sr)
    man = str(tmp_path / f"{name}.json")
    with open(man, "w") as f:
        f.write(json.dumps({"audio_filepath": p, "duration": len(wav) / sr, "text": ""}) + "\n")
    return man


def test_impulse_shift_removes_onset_delay(tmp_path):
    """shift_impulse mode convolves with the impulse tail from its peak
    (reference perturb.py:334-344), so a delayed unit impulse leaves the
    signal nearly unshifted."""
    sr = 16000
    rir = np.zeros(800, np.float32)
    rir[500] = 1.0  # 31 ms onset delay
    man = _write_manifest(tmp_path, "rir", rir, sr)
    x = np.zeros(sr, np.float32)
    x[1000] = 1.0

    from conformer_nemo_tpu.audio.perturb import ImpulsePerturbation

    shifted = ImpulsePerturbation(man, shift_impulse=True).perturb(x, sr, random.Random(0))
    # min-max normalization maps the zero floor to 0 and the peak to 1; peak
    # stays at the original sample position (delay removed)
    assert abs(int(np.argmax(np.abs(shifted))) - 1000) <= 1

    plain = ImpulsePerturbation(man, shift_impulse=False).perturb(x, sr, random.Random(0))
    assert len(plain) == len(x)  # 'same' mode


def test_rir_and_noise_perturbation(tmp_path):
    sr = 16000
    rir = np.zeros(64, np.float32)
    rir[0] = 1.0
    rir_man = _write_manifest(tmp_path, "rir2", rir, sr)
    noise = (np.random.RandomState(0).randn(sr) * 0.5).astype(np.float32)
    fg_man = _write_manifest(tmp_path, "fg", noise, sr)
    bg_man = _write_manifest(tmp_path, "bg", noise, sr)

    from conformer_nemo_tpu.audio.perturb import RirAndNoisePerturbation

    p = RirAndNoisePerturbation(
        rir_manifest_path=rir_man, rir_prob=1.0,
        noise_manifest_paths=[fg_man], min_snr_db=[0], max_snr_db=[0],
        max_additions=3, max_duration=0.5,
        bg_noise_manifest_paths=[bg_man], bg_min_snr_db=[10], bg_max_snr_db=[10],
    )
    x = (np.random.RandomState(1).randn(sr) * 0.1).astype(np.float32)
    y = p.perturb(x.copy(), sr, random.Random(0))
    assert y.shape[0] > 0 and np.isfinite(y).all()
    assert not np.allclose(y[: len(x) - 1], x[: len(y)][: len(x) - 1])  # noise actually added

    # registry reachable (reference perturbation_types, perturb.py:687-697)
    aug = process_augmentations({
        "rir_noise_aug": {"prob": 1.0, "rir_manifest_path": rir_man, "rir_prob": 0.0,
                          "bg_noise_manifest_paths": [bg_man],
                          "bg_min_snr_db": [20], "bg_max_snr_db": [20]},
    })
    z = aug.perturb(x.copy(), sr)
    assert np.isfinite(z).all()


def test_transcode_g711_bandlimits(tmp_path):
    """g711 simulation band-limits to 300-3400 Hz: a 6 kHz tone mostly
    disappears, a 1 kHz tone mostly survives."""
    from conformer_nemo_tpu.audio.perturb import TranscodePerturbation

    sr = 16000
    t = np.arange(sr) / sr
    rng = random.Random(0)
    p = TranscodePerturbation()

    tone_1k = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    out_1k = p.perturb(tone_1k, sr, rng)
    assert len(out_1k) == len(tone_1k)
    assert (out_1k ** 2).mean() > 0.25 * (tone_1k ** 2).mean()

    tone_6k = (0.5 * np.sin(2 * np.pi * 6000 * t)).astype(np.float32)
    out_6k = p.perturb(tone_6k, sr, rng)
    assert (out_6k ** 2).mean() < 0.02 * (tone_6k ** 2).mean()

    with pytest.raises(ValueError):
        TranscodePerturbation(codecs=["amr-nb"])
