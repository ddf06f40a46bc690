"""Worker-parallel BucketedLoader: determinism, augmentor wiring, errors.

Parity target: the reference's torch DataLoader `num_workers` decode
parallelism (`/root/reference/configs/conformer_ctc_bpe.yaml:12`, consumed
by audio_to_text_dataset.py). Contract asserted here: batch ORDER and
CONTENT (including augmented waveforms) are bit-identical for any
num_workers, because the epoch plan and per-item augmentation RNG depend
only on (seed, epoch, index).
"""

import json

import numpy as np
import pytest

from conformer_nemo_tpu.audio.perturb import process_augmentations
from conformer_nemo_tpu.data.audio_io import write_wav
from conformer_nemo_tpu.data.dataset import BucketedAudioTextDataset, BucketedLoader
from conformer_nemo_tpu.data.manifest import read_manifest
from conformer_nemo_tpu.data.tokenizers import CharTokenizer


@pytest.fixture
def corpus(tmp_path):
    sr = 16000
    rng = np.random.RandomState(7)
    texts = ["ab", "ba", "ab ba", "b a", "a b ab", "bb", "aa b", "ab ab a"]
    mpath = str(tmp_path / "manifest.json")
    with open(mpath, "w") as f:
        for i, text in enumerate(texts):
            dur = 0.4 + 0.2 * i
            n = int(dur * sr)
            p = str(tmp_path / f"{i}.wav")
            write_wav(p, (rng.randn(n) * 0.05).astype(np.float32), sr)
            f.write(json.dumps({"audio_filepath": p, "duration": dur, "text": text}) + "\n")
    return mpath


def _epoch(loader, n_epochs=1):
    out = []
    for _ in range(n_epochs):
        for b in loader:
            out.append(b)
    return out


def _make(corpus, num_workers, augmentor=None, seed=3):
    tok = CharTokenizer([" ", "a", "b"])
    ds = BucketedAudioTextDataset(
        read_manifest(corpus), tok, n_buckets=2, augmentor=augmentor
    )
    return BucketedLoader(
        ds, batch_size=2, shuffle=True, seed=seed,
        bucketing_strategy="fully_randomized", num_workers=num_workers,
    )


def test_worker_loader_bit_identical(corpus):
    ref = _epoch(_make(corpus, num_workers=0), n_epochs=2)
    par = _epoch(_make(corpus, num_workers=4), n_epochs=2)
    assert len(ref) == len(par)
    for a, b in zip(ref, par):
        assert a.texts == b.texts  # same order, same plan
        np.testing.assert_array_equal(a.audio, b.audio)
        np.testing.assert_array_equal(a.audio_lens, b.audio_lens)
        np.testing.assert_array_equal(a.tokens, b.tokens)
        np.testing.assert_array_equal(a.token_lens, b.token_lens)


def test_worker_loader_augmentation_deterministic(corpus):
    # gain + white noise exercise the per-item RNG stream on every sample
    def aug():
        return process_augmentations(
            {"gain": {"prob": 1.0}, "white_noise": {"prob": 0.5}}, seed=11
        )

    ref = _epoch(_make(corpus, num_workers=0, augmentor=aug()))
    par = _epoch(_make(corpus, num_workers=3, augmentor=aug()))
    changed = False
    for a, b in zip(ref, par):
        np.testing.assert_array_equal(a.audio, b.audio)
        changed = True
    assert changed


def test_worker_loader_error_propagates(corpus):
    loader = _make(corpus, num_workers=2)
    loader.ds.samples[0] = loader.ds.samples[0].__class__(
        **{**loader.ds.samples[0].__dict__, "audio_file": "/nonexistent.wav"}
    )
    with pytest.raises(Exception):
        _epoch(loader)


def test_worker_loader_early_break_shuts_down(corpus):
    loader = _make(corpus, num_workers=2)
    it = iter(loader)
    next(it)
    it.close()  # consumer breaks out (max_steps); builder must not deadlock
    import threading

    names = [t.name for t in threading.enumerate()]
    # builder threads should drain promptly after close
    import time

    for _ in range(50):
        if not any(n == "bucketed-loader" for n in [t.name for t in threading.enumerate()]):
            break
        time.sleep(0.1)
    assert not any(
        t.name == "bucketed-loader" for t in threading.enumerate()
    ), names


def test_pcm16_fast_path_bit_exact(corpus, tmp_path):
    """pcm16 loader output must be IDENTICAL whether audio takes the direct
    int16 decode path (mono PCM16 WAV at target sr) or the float fallback."""
    import numpy as np

    from conformer_nemo_tpu.data.audio_io import load_audio, load_audio_pcm16
    from conformer_nemo_tpu.data.flac_encode import write_flac

    # WAV fast path == float path quantized
    from conformer_nemo_tpu.data.manifest import read_manifest

    s = read_manifest(corpus)[0]
    fast = load_audio_pcm16(s.audio_file, 16000)
    slow = np.clip(load_audio(s.audio_file, 16000) * 32768.0, -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(fast, slow)

    # FLAC fast path
    rng = np.random.RandomState(5)
    wav = (rng.randn(16000) * 0.05).astype(np.float32)
    p = str(tmp_path / "a.flac")
    write_flac(p, wav, 16000)
    fast = load_audio_pcm16(p, 16000)
    slow = np.clip(load_audio(p, 16000) * 32768.0, -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(fast, slow)

    # resample fallback path still works (target_sr != file sr)
    out = load_audio_pcm16(s.audio_file, 8000)
    assert out.dtype == np.int16 and abs(len(out) - len(fast) // 2) < 8000


def test_pcm16_loader_end_to_end(corpus):
    import numpy as np

    ref = _epoch(_make(corpus, num_workers=0))
    loader = _make(corpus, num_workers=2)
    loader.pcm16 = True
    par = _epoch(loader)
    for a, b in zip(ref, par):
        assert b.audio.dtype == np.int16
        np.testing.assert_array_equal(
            b.audio, np.clip(a.audio * 32768.0, -32768, 32767).astype(np.int16))


def test_pcm16_setter_does_not_downgrade_mulaw8(corpus):
    """`loader.pcm16 = True` on a mulaw8-configured loader is a no-op — the
    boolean back-compat spelling must not silently rewrite an int8 transport
    to int16. Setting False always restores f32."""
    loader = _make(corpus, num_workers=0)
    loader.transport = "mulaw8"
    loader.pcm16 = True
    assert loader.transport == "mulaw8" and loader.pcm16
    loader.pcm16 = False
    assert loader.transport == "f32" and not loader.pcm16
    loader.pcm16 = True
    assert loader.transport == "pcm16"
