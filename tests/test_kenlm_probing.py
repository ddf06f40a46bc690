"""KenLM PROBING-binary reader: hermetic validation.

This image has neither the kenlm wheel nor build_binary, so ground-truth
parity runs in tests/test_kenlm_differential.py (importorskip-gated, lights
up wherever the library exists). Here we validate the reader end-to-end
against a LAYOUT-EXACT fixture writer: `write_probing_binary` emits the
probing format exactly as documented in native/ctc_beam/kenlm_probing.h
(murmur64a vocab hashing, CombineWordHash n-gram keys, linear-probing
tables, packed entry widths, trailing word strings), built from the same
ARPA the native Katz scorer loads — so per-word scores through the .bin
path must equal the ARPA path bit-for-float32-rounding.

What this does and does not prove: it proves the reader implements the
documented layout correctly (hash chains, probing, packing resolution,
section offsets, backoff accumulation); whether that layout matches real
build_binary output byte-for-byte is exactly what the gated differential
test asserts where it can run.
"""

import os
import struct

import numpy as np
import pytest

from conformer_nemo_tpu.decode.ctc_beam import BeamSearchDecoderWithLM

ARPA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures",
                    "lm_edge.arpa")

SENTENCES = [
    "the cat sat",
    "the cat sat the mat",
    "cat mat sat",
    "the zebra sat",          # OOV -> <unk>
    "mat",
    "sat sat sat",
]

MASK64 = (1 << 64) - 1


def murmur64a(data: bytes, seed: int = 0) -> int:
    m = 0xC6A4A7935BD1E995
    r = 47
    h = (seed ^ (len(data) * m)) & MASK64
    n8 = len(data) // 8
    for i in range(n8):
        (k,) = struct.unpack_from("<Q", data, i * 8)
        k = (k * m) & MASK64
        k ^= k >> r
        k = (k * m) & MASK64
        h = ((h ^ k) * m) & MASK64
    tail = data[n8 * 8:]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        h = ((h ^ k) * m) & MASK64
    h ^= h >> r
    h = (h * m) & MASK64
    h ^= h >> r
    return h


def combine_word_hash(current: int, next_id: int) -> int:
    return ((current * 8978948897894561157) ^
            ((1 + next_id) * 17894857484156487943)) & MASK64


def parse_arpa(path):
    """-> (order, {order: [(words_tuple, logp, backoff_or_None)]})."""
    grams = {}
    cur = 0
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith("\\"):
                if "-grams:" in line:
                    cur = int(line[1:line.index("-")])
                    grams[cur] = []
                elif line.startswith("\\end\\"):
                    break
                else:
                    cur = 0
                continue
            if not cur:
                continue
            parts = line.split("\t")
            logp = float(parts[0])
            words = tuple(parts[1].split())
            backoff = float(parts[2]) if len(parts) > 2 else None
            grams[cur].append((words, logp, backoff))
    return max(grams), grams


def _probing_insert(table, buckets, esz, key, value_bytes):
    i = key % buckets
    for _ in range(buckets):
        off = i * esz
        (k,) = struct.unpack_from("<Q", table, off)
        if k == 0:
            struct.pack_into("<Q", table, off, key)
            table[off + 8: off + 8 + len(value_bytes)] = value_bytes
            return
        i = (i + 1) % buckets
    raise AssertionError("probing table full")


def write_probing_binary(arpa_path: str, out_path: str,
                         multiplier: float = 1.5,
                         include_words: bool = True) -> dict:
    """Emit `arpa_path` in the KenLM probing binary layout documented in
    native/ctc_beam/kenlm_probing.h. Returns the id map for assertions."""
    order, grams = parse_arpa(arpa_path)
    unigrams = grams[1]
    ids = {}
    next_id = 1
    for (w,), _, _ in unigrams:
        if w in ("<unk>", "<UNK>"):
            ids[w] = 0
        else:
            ids[w] = next_id
            next_id += 1
    c0 = len(unigrams)
    counts = [len(grams.get(o, [])) for o in range(1, order + 1)]

    def buckets_of(n):
        return max(n + 1, int(multiplier * n))

    # --- header ---
    magic = b"mmap lm http://kheafield.com/code format version 5\n\0"
    magic += b"\0" * (-len(magic) % 8)
    sanity = struct.pack("<fffIIQ", 0.0, 1.0, -0.5, 1, 0xFFFFFFFF, 1)
    params = struct.pack("<B3xfIB3xI", order, multiplier, 0,
                         1 if include_words else 0, 0)
    counts_blob = b"".join(struct.pack("<Q", c) for c in counts)
    header = magic + sanity + params + counts_blob
    header += b"\0" * (-len(header) % 8)

    # --- vocab: {u64 version; u64 bound} + 12-byte-entry probing table ---
    bound = next_id
    vb = buckets_of(c0)
    vocab_table = bytearray(vb * 12)
    for w, wid in ids.items():
        if wid == 0:
            continue  # <unk> is never inserted; lookup miss => 0
        _probing_insert(vocab_table, vb, 12, murmur64a(w.encode()),
                        struct.pack("<I", wid))
    vocab = struct.pack("<QQ", 0, bound) + bytes(vocab_table)

    # --- unigram: (c0+1) x {f32 prob; f32 backoff} by id ---
    uni = bytearray((c0 + 1) * 8)
    for (w,), logp, bo in unigrams:
        struct.pack_into("<ff", uni, ids[w] * 8, logp, bo or 0.0)

    # --- middle orders 2..N-1: 16-byte entries {u64 key; f32 p; f32 bo} ---
    def ngram_key(words):
        node = ids[words[-1]]
        for w in reversed(words[:-1]):
            node = combine_word_hash(node, ids[w])
        return node

    middles = b""
    for o in range(2, order):
        mb = buckets_of(counts[o - 1])
        tab = bytearray(mb * 16)
        for words, logp, bo in grams[o]:
            _probing_insert(tab, mb, 16, ngram_key(words),
                            struct.pack("<ff", logp, bo or 0.0))
        middles += bytes(tab)

    # --- longest order N: 12-byte entries {u64 key; f32 p} ---
    lb = buckets_of(counts[order - 1])
    longest = bytearray(lb * 12)
    for words, logp, _ in grams[order]:
        _probing_insert(longest, lb, 12, ngram_key(words),
                        struct.pack("<f", logp))

    words_blob = b""
    if include_words:
        by_id = sorted(ids.items(), key=lambda kv: kv[1])
        words_blob = b"".join(w.encode() + b"\0" for w, _ in by_id)

    with open(out_path, "wb") as f:
        f.write(header + vocab + bytes(uni) + middles + bytes(longest)
                + words_blob)
    return ids


@pytest.fixture(scope="module")
def probing_bin(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kenlm") / "lm_probing.bin")
    write_probing_binary(ARPA, out)
    return out


@pytest.fixture(scope="module")
def arpa_lm():
    return BeamSearchDecoderWithLM(["a", "b", " "], beam_width=4, alpha=1.0,
                                   beta=0.0, lm_path=ARPA,
                                   lm_binary_cache=False)


@pytest.fixture(scope="module")
def bin_lm(probing_bin):
    return BeamSearchDecoderWithLM(["a", "b", " "], beam_width=4, alpha=1.0,
                                   beta=0.0, lm_path=probing_bin,
                                   kenlm_probing=True)


def test_header_parse_of_fixture(probing_bin):
    from conformer_nemo_tpu.decode.kenlm_binary import (is_kenlm_binary,
                                                        parse_header)
    assert is_kenlm_binary(probing_bin)
    hdr = parse_header(probing_bin)
    assert hdr.model_type == "probing" and hdr.order == 3
    assert hdr.counts == (7, 6, 3)


def test_probing_scores_match_arpa_scorer(arpa_lm, bin_lm):
    """Per-word Katz scores through the .bin reader == the ARPA scorer
    (same model content, independent storage + lookup paths), including
    backoff chains, OOV -> <unk>, BOS context and EOS."""
    for sent in SENTENCES:
        words = sent.split()
        ctx = ["<s>"]
        for w in words + ["</s>"]:
            a = arpa_lm.lm_score(ctx, w)
            b = bin_lm.lm_score(ctx, w)
            assert b == pytest.approx(a, abs=2e-6), (sent, w, a, b)
            ctx.append(w)


def test_probing_beam_decode_matches_arpa(arpa_lm, bin_lm):
    """End-to-end beam decode with LM fusion: identical hypotheses + scores
    through either LM backend."""
    rng = np.random.RandomState(0)
    logits = rng.randn(1, 40, 4).astype(np.float32) * 2.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ra = arpa_lm(lp, nbest=3)
    rb = bin_lm(lp, nbest=3)
    assert [h[0] for h in ra[0]] == [h[0] for h in rb[0]]
    for (_, sa), (_, sb) in zip(ra[0], rb[0]):
        assert sb == pytest.approx(sa, abs=1e-4)


def test_probing_without_optin_names_the_flag(probing_bin):
    with pytest.raises(ValueError, match="kenlm_probing=True"):
        BeamSearchDecoderWithLM(["a", " "], lm_path=probing_bin)


def test_probing_word_strings_surface(bin_lm):
    buf = __import__("ctypes").create_string_buffer(64)
    n = bin_lm._lib.ctc_lm_kenlm_word(bin_lm._lm, 0, buf, len(buf))
    assert n == 5 and buf.value == b"<unk>"
    n = bin_lm._lib.ctc_lm_kenlm_word(bin_lm._lm, 1, buf, len(buf))
    assert buf.value == b"<s>"


def test_truncated_probing_binary_rejected(probing_bin, tmp_path):
    """A truncated payload must fail the size equation loudly, not load."""
    with open(probing_bin, "rb") as f:
        blob = f.read()
    bad = str(tmp_path / "trunc.bin")
    with open(bad, "wb") as f:
        f.write(blob[: len(blob) - 40])
    with pytest.raises(ValueError, match="layout|truncated|validation"):
        BeamSearchDecoderWithLM(["a", " "], lm_path=bad, kenlm_probing=True)


def test_ctc_api_strategy_accepts_probing_bin(tmp_path, probing_bin):
    """change_decoding_strategy beam.kenlm_probing plumbs through to the
    native reader (the evaluate.py --kenlm-probing surface)."""
    import jax.numpy as jnp
    import numpy as np

    from conformer_nemo_tpu.api import ConformerCTC
    from conformer_nemo_tpu.data.audio_io import write_wav
    from conformer_nemo_tpu.data.tokenizers import CharTokenizer

    p = str(tmp_path / "u.wav")
    write_wav(p, (0.1 * np.random.RandomState(0).randn(8000)).astype(
        np.float32), 16000)
    model = ConformerCTC(
        {"model": {"labels": list("ab "), "sample_rate": 16000,
                   "preprocessor": {},
                   "encoder": {"n_layers": 1, "d_model": 32, "n_heads": 2,
                               "subsampling_conv_channels": 32},
                   "decoder": {}}},
        CharTokenizer(list("ab ")), dtype=jnp.float32)
    model.state = model._init_state(model._make_optimizer())
    model.change_decoding_strategy({
        "strategy": "beamsearch_ngram",
        "beam": {"beam_width": 4, "lm_path": probing_bin,
                 "kenlm_probing": True}})
    out = model.transcribe([p], batch_size=1)
    assert isinstance(out[0], str) and set(out[0]) <= set("ab ")
    # without the opt-in the same config rejects at decoder construction
    model.change_decoding_strategy({
        "strategy": "beamsearch_ngram",
        "beam": {"beam_width": 4, "lm_path": probing_bin}})
    with pytest.raises(ValueError, match="kenlm_probing=True"):
        model.transcribe([p], batch_size=1)


def test_vocab_self_check_catches_hash_mismatch(tmp_path):
    """Load-time self-validation: when word strings are present, every word
    must hash+probe to its own id. Corrupting one vocab-table value makes
    the load fail with a precise error instead of silently mis-scoring."""
    out = str(tmp_path / "corrupt.bin")
    write_probing_binary(ARPA, out)
    with open(out, "rb") as f:
        blob = bytearray(f.read())
    # find the vocab entry for 'the' (id 3) and break its stored id
    key = murmur64a(b"the")
    pos = blob.find(struct.pack("<Q", key))
    assert pos > 0
    struct.pack_into("<I", blob, pos + 8, 5)  # wrong id
    with open(out, "wb") as f:
        f.write(bytes(blob))
    with pytest.raises(ValueError, match="self-check failed"):
        BeamSearchDecoderWithLM(["a", " "], lm_path=out, kenlm_probing=True)


def test_unknown_format_version_rejected(tmp_path):
    """The payload reader implements the version-5 layouts; a binary with a
    different version digit must be rejected BY VERSION, not left to the
    structural checks (which a layout-compatible future version would pass)."""
    out = str(tmp_path / "v6.bin")
    write_probing_binary(ARPA, out)
    with open(out, "rb") as f:
        blob = bytearray(f.read())
    i = blob.find(b"format version 5")
    assert i >= 0
    blob[i + len(b"format version ")] = ord("6")
    with open(out, "wb") as f:
        f.write(bytes(blob))
    with pytest.raises(ValueError, match="version 6"):
        BeamSearchDecoderWithLM(["a", " "], lm_path=out, kenlm_probing=True)


def test_probing_binary_without_word_strings(tmp_path, arpa_lm):
    """include_vocab=False binaries (no trailing strings) resolve the layout
    via the exact-size equation and still score identically."""
    out = str(tmp_path / "nowords.bin")
    write_probing_binary(ARPA, out, include_words=False)
    lm = BeamSearchDecoderWithLM(["a", " "], lm_path=out, kenlm_probing=True)
    ctx = ["<s>", "the"]
    assert lm.lm_score(ctx, "cat") == pytest.approx(
        arpa_lm.lm_score(ctx, "cat"), abs=2e-6)
    import ctypes
    buf = ctypes.create_string_buffer(16)
    assert lm._lib.ctc_lm_kenlm_word(lm._lm, 0, buf, len(buf)) == -1
