"""Tokenizers, WER, manifest/bucketing pipeline tests."""

import json
import os

import numpy as np
import pytest

from conformer_nemo_tpu.data.audio_io import load_audio, write_wav
from conformer_nemo_tpu.data.dataset import (
    BucketedAudioTextDataset,
    BucketedLoader,
    make_bucket_boundaries,
)
from conformer_nemo_tpu.data.manifest import read_manifest
from conformer_nemo_tpu.data.tokenizers import (
    AggregateTokenizer,
    CharTokenizer,
    train_bpe_tokenizer,
)
from conformer_nemo_tpu.decode.wer import edit_distance, word_error_rate

EN_LABELS = [" "] + list("abcdefghijklmnopqrstuvwxyz") + ["'"]


def test_char_tokenizer_roundtrip():
    tok = CharTokenizer(EN_LABELS)
    ids = tok.text_to_ids("Hello World")
    assert tok.ids_to_text(ids) == "hello world"
    # parser semantics: index of 'a' is 1 (space is 0)
    assert tok.text_to_ids("a") == [1]


def test_char_tokenizer_unk_filtering():
    # Defaults: unk_id == blank_id == -1 -> OOV chars are silently dropped
    # (CharParser semantics, parsers.py:104-106).
    tok = CharTokenizer(EN_LABELS)
    assert tok.text_to_ids("a#b") == [1, 2]
    # With distinct unk id, OOV is preserved as that id.
    tok2 = CharTokenizer(EN_LABELS, unk_id=-5, blank_id=-1)
    assert -5 in tok2.text_to_ids("a#b")


def test_wer():
    assert word_error_rate(["a b c"], ["a b c"]) == 0.0
    assert word_error_rate(["a x c"], ["a b c"]) == pytest.approx(1 / 3)
    assert edit_distance("kitten", "sitting") == 3
    assert word_error_rate(["ab"], ["ab"], use_cer=True) == 0.0


def test_bpe_train_and_roundtrip(tmp_path):
    texts = ["the cat sat on the mat", "the dog ate the food", "a cat and a dog"] * 50
    tok = train_bpe_tokenizer(texts, vocab_size=64, out_path=str(tmp_path / "tok.json"))
    ids = tok.text_to_ids("the cat")
    assert len(ids) > 0
    assert tok.ids_to_text(ids).strip() == "the cat"


def test_aggregate_tokenizer_offsets():
    en = CharTokenizer(["a", "b"])
    de = CharTokenizer(["x", "y"])
    agg = AggregateTokenizer({"en": en, "de": de})
    assert agg.vocab_size == 4
    assert agg.text_to_ids("ab", "en") == [0, 1]
    assert agg.text_to_ids("xy", "de") == [2, 3]
    assert agg.ids_to_text([0, 1]) == "ab"
    assert agg.ids_to_text([2, 3]) == "xy"


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.linspace(0, 1, sr, endpoint=False)
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, wav, sr)
    loaded = load_audio(p, target_sr=sr)
    assert loaded.shape == (sr,)
    np.testing.assert_allclose(loaded, wav, atol=1e-3)


def test_resample(tmp_path):
    sr = 8000
    wav = np.random.RandomState(0).randn(sr).astype(np.float32) * 0.1
    p = str(tmp_path / "b.wav")
    write_wav(p, wav, sr)
    loaded = load_audio(p, target_sr=16000)
    assert abs(loaded.shape[0] - 16000) <= 2


@pytest.fixture
def tiny_corpus(tmp_path):
    sr = 16000
    rng = np.random.RandomState(0)
    entries = []
    for i, (dur, text) in enumerate(
        [(0.5, "ab"), (0.6, "ba"), (1.2, "ab ba"), (1.3, "b a"), (2.5, "a b ab")]
    ):
        n = int(dur * sr)
        wav = (rng.randn(n) * 0.05).astype(np.float32)
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, wav, sr)
        entries.append({"audio_filepath": p, "duration": dur, "text": text})
    mpath = str(tmp_path / "manifest.json")
    with open(mpath, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return mpath


def test_manifest_filtering(tiny_corpus):
    samples = read_manifest(tiny_corpus)
    assert len(samples) == 5
    samples = read_manifest(tiny_corpus, min_duration=0.55, max_duration=2.0)
    assert len(samples) == 3


def test_bucketing_static_shapes(tiny_corpus):
    tok = CharTokenizer([" ", "a", "b"])
    samples = read_manifest(tiny_corpus)
    ds = BucketedAudioTextDataset(samples, tok, n_buckets=2)
    loader = BucketedLoader(ds, batch_size=2, shuffle=True, seed=0)
    shapes = set()
    total = 0
    for batch in loader:
        assert batch.audio.shape[0] == 2  # batch dim padded to static size
        assert batch.audio.dtype == np.float32
        assert (batch.audio_lens <= batch.audio.shape[1]).all()
        shapes.add(batch.audio.shape)
        total += int((batch.audio_lens > 0).sum())
    assert total == 5
    assert len(shapes) <= 2  # bounded compile count


def test_host_sharding(tiny_corpus):
    tok = CharTokenizer([" ", "a", "b"])
    samples = read_manifest(tiny_corpus)
    ds = BucketedAudioTextDataset(samples, tok, n_buckets=1)
    seen = []
    for pi in range(2):
        loader = BucketedLoader(
            ds, batch_size=2, shuffle=False, process_index=pi, process_count=2
        )
        for b in loader:
            seen.extend([t for t in b.texts if t])
    assert sorted(seen) == sorted(s.text for s in samples)


def test_bucket_boundaries_monotone():
    bounds = make_bucket_boundaries([0.5, 1.0, 2.0, 4.0, 8.0, 16.0], 4)
    assert bounds == sorted(set(bounds))
    assert all(b % 1600 == 0 for b in bounds)


def test_bucketing_batch_size_scaling(tiny_corpus):
    tok = CharTokenizer([" ", "a", "b"])
    samples = read_manifest(tiny_corpus)
    ds = BucketedAudioTextDataset(samples, tok, n_buckets=2)
    loader = BucketedLoader(ds, batch_size=2, shuffle=False, bucketing_batch_size=2)
    # longest bucket gets batch 2; shorter buckets get proportionally more
    assert loader.bucket_batch[-1] == 2
    assert loader.bucket_batch[0] >= 2
    total = sum(int((b.audio_lens > 0).sum()) for b in loader)
    assert total == len(samples)


def test_native_edit_distance_matches_python():
    """C++ edit distance == pure-Python DP on random token sequences."""
    import numpy as np

    from conformer_nemo_tpu.decode import wer as wer_mod

    rng = np.random.RandomState(0)
    for _ in range(50):
        a = [f"w{int(x)}" for x in rng.randint(0, 12, size=rng.randint(0, 30))]
        b = [f"w{int(x)}" for x in rng.randint(0, 12, size=rng.randint(0, 30))]
        assert wer_mod.edit_distance(a, b) == wer_mod._edit_distance_py(a, b)
    # classic sanity values
    assert wer_mod.edit_distance("kitten", "sitting") == 3
    assert wer_mod.edit_distance([], ["a", "b"]) == 2
    # the native library actually loaded on this box (g++ is baked in)
    assert wer_mod._load() is not None


def test_en_parser_cleaning():
    """ENCharParser pipeline (reference parsers.py:128 + cleaners.py:145):
    numbers, ordinals, times, currency, abbreviations, punctuation."""
    from conformer_nemo_tpu.data.tokenizers import CharTokenizer
    from conformer_nemo_tpu.data.cleaners import number_to_words

    labels = [" "] + [chr(c) for c in range(ord("a"), ord("z") + 1)] + ["'"]
    tok = CharTokenizer(labels, parser="en")

    def roundtrip(text):
        return tok.ids_to_text(tok.text_to_ids(text))

    assert number_to_words(5) == "five"
    assert number_to_words(21) == "twenty-one"
    assert number_to_words(1234) == "one thousand, two hundred and thirty-four"
    assert number_to_words("21st") == "twenty-first"
    assert number_to_words("3.5") == "three point five"

    assert roundtrip("I have 2 cats") == "i have two cats"
    assert roundtrip("Mr. Smith & Dr. Jones") == "mister smith and doctor jones"
    assert roundtrip("100% sure") == "one hundred percent sure"
    assert roundtrip("$5 bill") == "five dollars bill"
    assert roundtrip("the 3rd time") == "the third time"
    assert roundtrip("at 5:30pm") == "at five thirty pm"
    assert roundtrip("café résumé") == "cafe resume"
    # base parser keeps diacritic labels intact (Vietnamese recipe)
    vtok = CharTokenizer([" ", "a", "à"])
    assert vtok.ids_to_text(vtok.text_to_ids("à a")) == "à a"


def test_trim_silence():
    """librosa.effects.trim semantics: drop lead/tail frames > top_db below
    the loudest frame (segment.py trim / dataset trim_silence knob)."""
    import numpy as np
    from conformer_nemo_tpu.data.audio_io import trim_silence

    sr = 16000
    sig = np.concatenate([
        np.zeros(sr // 2, np.float32),
        0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32),
        np.zeros(sr // 2, np.float32),
    ])
    out = trim_silence(sig)
    assert len(out) < len(sig)
    # the tone survives; trimmed region is within a frame of the tone bounds
    assert abs(len(out) - sr) < 4096
    assert np.abs(out).max() > 0.4
    # all-silence input stays put (no max frame above threshold)
    assert len(trim_silence(np.zeros(1000, np.float32))) == 1000


def test_word_tokenizer(tmp_path):
    """Word-level tokenizer parity (reference word_tokenizer.py:30): split on
    whitespace, OOV -> unk."""
    from conformer_nemo_tpu.data.tokenizers import WordTokenizer, build_tokenizer

    tok = WordTokenizer(["hello", "world"])
    ids = tok.text_to_ids("hello strange world")
    assert tok.ids_to_text(ids) == "hello <unk> world"
    assert tok.vocab_size == 3

    d = tmp_path / "wtok"
    d.mkdir()
    (d / "vocab.txt").write_text("hello\nworld\n")
    tok2 = build_tokenizer({"type": "word", "dir": str(d)})
    assert tok2.text_to_ids("world hello") == [1, 0]
