"""KenLM TRIE / QUANT_TRIE binary reader: hermetic validation.

Same evidence structure as tests/test_kenlm_probing.py: this image has
neither the kenlm wheel nor build_binary, so ground-truth parity runs in
tests/test_kenlm_differential.py (importorskip-gated). Here we validate the
reader end-to-end against a LAYOUT-EXACT fixture writer: `write_trie_binary`
emits the trie format exactly as documented in native/ctc_beam/kenlm_trie.h
(sorted murmur64a vocabulary, reversed-trie bit-packed levels, RequiredBits
field widths, non-positive-float31 probs, separately-quantized tables for
model_type 3, suffix-closure blank entries for pruned ARPAs, trailing word
strings) from the same ARPA the native Katz scorer loads — so per-word
scores through the .bin path must equal the ARPA path to f32 rounding.

Blank semantics: a pruned ARPA can contain an n-gram whose proper suffixes
are missing; the trie needs those internal nodes. KenLM stores in each blank
the fully backed-off Katz probability of the missing n-gram (basis prob of
the longest real suffix plus the intermediate context-suffix backoffs, all
determined by the blank's own words) — the only storage consistent with its
sentinel-free read path (model.cc ResumeScore takes the deepest found
entry's prob unconditionally) that preserves the trie==probing scoring
invariant. The pruned-ARPA test below asserts exactly that invariant: trie
scores == the ARPA Katz scorer even through blanks.
"""

import os
import struct

import numpy as np
import pytest

from conformer_nemo_tpu.decode.ctc_beam import BeamSearchDecoderWithLM

from test_kenlm_probing import ARPA, SENTENCES, murmur64a, parse_arpa

MASK64 = (1 << 64) - 1


def required_bits(max_value: int) -> int:
    if not max_value:
        return 0
    ret = 1
    while max_value >> 1:
        max_value >>= 1
        ret += 1
    return ret


def f32(x: float) -> float:
    return struct.unpack("<f", struct.pack("<f", x))[0]


class _BitArray:
    """Little-endian bit packing (util/bit_packing.hh WriteInt57 semantics:
    OR the value into the u64 at byte bit_off/8 shifted by bit_off%8)."""

    def __init__(self, entries: int, total_bits: int):
        # (1+entries) slots + 8 slack bytes so 8-byte loads stay in bounds
        self.buf = bytearray(((1 + entries) * total_bits + 7) // 8 + 8)

    def write(self, bit_off: int, length: int, value: int):
        assert 0 <= value < (1 << length), (value, length)
        byte = bit_off >> 3
        cur = int.from_bytes(self.buf[byte:byte + 8], "little")
        cur |= value << (bit_off & 7)
        self.buf[byte:byte + 8] = (cur & MASK64).to_bytes(8, "little")

    def write_prob31(self, bit_off: int, prob: float):
        (bits,) = struct.unpack("<I", struct.pack("<f", prob))
        self.write(bit_off, 31, bits & 0x7FFFFFFF)

    def write_f32(self, bit_off: int, value: float):
        (bits,) = struct.unpack("<I", struct.pack("<f", value))
        self.write(bit_off, 32, bits)


def _katz_score(grams_by_words, order, ctx_words, w):
    """log10 P(w | ctx) from parsed-ARPA tables (float32-rounded like the
    binary). Used to fold backoffs into blank probabilities."""
    ctx = list(ctx_words)[-(order - 1):] if order > 1 else []
    for start in range(len(ctx) + 1):
        ng = tuple(ctx[start:]) + (w,)
        hit = grams_by_words.get(ng)
        if hit is not None:
            total = f32(hit[0])
            for s2 in range(start):
                bo = grams_by_words.get(tuple(ctx[s2:]))
                if bo is not None and bo[1] is not None:
                    total += f32(bo[1])
            return total
    raise AssertionError(f"unigram {w!r} missing")


def chop_bits(max_offset: int, max_next: int, configured: int) -> int:
    """lm/bhiksha.cc ChopBits: size-minimizing count of high next-pointer
    bits moved into the bucket array (strict < keeps the smallest chop)."""
    required = required_bits(max_next)
    best_chop, lowest = 0, None
    for chop in range(min(required, configured) + 1):
        change = (max_next >> (required - chop)) * 64 - max_offset * chop
        if lowest is None or change < lowest:
            lowest, best_chop = change, chop
    return best_chop


def write_trie_binary(arpa_path: str, out_path: str, quantized: bool = False,
                      include_words: bool = True,
                      prob_bits: int = 8, backoff_bits: int = 8,
                      bhiksha_bits: int = None) -> dict:
    """Emit `arpa_path` in the KenLM trie (model_type 2) or quant_trie (3)
    binary layout documented in native/ctc_beam/kenlm_trie.h — or, with
    `bhiksha_bits` set (`build_binary -a` analogue), the array_trie (4) /
    quant_array_trie (5) layout: per middle level an 8-byte section header
    {version 0; configured bits} plus the u64 bucket array written with
    WriteNext semantics (bucket h = first next-slot index whose pointer's
    high part reaches h; the end sentinel writes its buckets with the entry
    count), and only the low inline bits of each pointer in the bit-packed
    entries. Quantization tables hold the exact distinct values (lossless
    while they fit), so scores through any model_type equal the ARPA's to
    f32 rounding. Returns the word->id map for assertions."""
    order, grams = parse_arpa(arpa_path)
    assert order >= 2, "kenlm requires at least a bigram model"
    unigrams = grams[1]
    assert any(w in ("<unk>", "<UNK>") for (w,), _, _ in unigrams), \
        "fixture writer assumes <unk> in the ARPA (kenlm inserts it otherwise)"

    # SortedVocabulary: ids by ascending murmur hash; <unk> = 0, not stored
    hashes = {w: murmur64a(w.encode()) for (w,), _, _ in unigrams
              if w not in ("<unk>", "<UNK>")}
    sorted_words = sorted(hashes, key=lambda w: hashes[w])
    ids = {w: i + 1 for i, w in enumerate(sorted_words)}
    for (w,), _, _ in unigrams:
        if w in ("<unk>", "<UNK>"):
            ids[w] = 0
    c0 = len(unigrams)

    grams_by_words = {}
    for o in range(1, order + 1):
        for ws, logp, bo in grams.get(o, []):
            grams_by_words[tuple(ws)] = (logp, bo)

    # Reversed-trie nodes: path = (newest word id, ..., oldest word id).
    # nodes[o]: path -> [prob, backoff_or_None]; blanks get the fully
    # backed-off Katz prob of the n-gram they stand for (see module doc).
    nodes = {o: {} for o in range(2, order + 1)}
    path_words = {}  # path -> words tuple (oldest first), for blank scoring
    for o in range(2, order + 1):
        for ws, logp, bo in grams.get(o, []):
            path = tuple(ids[w] for w in reversed(ws))
            nodes[o][path] = [f32(logp), bo]
            path_words[path] = tuple(ws)
    for o in range(order, 2, -1):  # insert missing parents top-down
        for path in list(nodes[o]):
            par = path[:-1]
            if par not in nodes[o - 1]:
                ws = path_words[path][-(o - 1):]  # suffix the parent encodes
                blank_prob = _katz_score(grams_by_words, order,
                                         ws[:-1], ws[-1])
                nodes[o - 1][par] = [f32(blank_prob), None]
                path_words[par] = ws

    counts = [c0] + [len(nodes[o]) for o in range(2, order + 1)]
    sorted_nodes = {o: sorted(nodes[o]) for o in range(2, order + 1)}

    # children counts (for next pointers and the extension-backoff sign)
    child_count = {o: {} for o in range(1, order)}
    for o in range(2, order + 1):
        for path in sorted_nodes[o]:
            key = path[:-1] if o > 2 else path[0]
            child_count[o - 1][key] = child_count[o - 1].get(key, 0) + 1

    def backoff_value(explicit, has_children):
        if explicit is not None and explicit != 0.0:
            return explicit
        # 0/absent backoff: kenlm stores +0.0 when the n-gram extends (has
        # children in the reverse trie), -0.0 when it does not
        return 0.0 if has_children else -0.0

    # --- header ---
    magic = b"mmap lm http://kheafield.com/code format version 5\n\0"
    magic += b"\0" * (-len(magic) % 8)
    sanity = struct.pack("<fffIIQ", 0.0, 1.0, -0.5, 1, 0xFFFFFFFF, 1)
    model_type = (3 if quantized else 2) + (2 if bhiksha_bits is not None
                                            else 0)
    params = struct.pack("<B3xfIB3xI", order, 1.5, model_type,
                         1 if include_words else 0, 0)
    counts_blob = b"".join(struct.pack("<Q", c) for c in counts)
    header = magic + sanity + params + counts_blob
    header += b"\0" * (-len(header) % 8)

    # --- vocab: u64 stored count + sorted hashes; region holds c0 slots ---
    vocab = struct.pack("<Q", len(sorted_words))
    vocab += b"".join(struct.pack("<Q", hashes[w]) for w in sorted_words)
    vocab += b"\0" * (8 * c0 - 8 * len(sorted_words))

    # --- quant tables (model_type 3): exact distinct values, lossless ---
    quant = b""
    quant_index = {}  # (level, 'prob'|'backoff') -> {f32 bits -> index}
    if quantized:
        def table(values, reserved=()):
            """4-byte packed f32 bins: reserved slots first, then the
            distinct values ascending (lossless while they fit)."""
            res = [struct.pack("<f", r) for r in reserved]
            rest = sorted({struct.pack("<f", f32(v)) for v in values}
                          - set(res),
                          key=lambda b: struct.unpack("<f", b)[0])
            return res + rest

        quant = struct.pack("<BB6x", prob_bits, backoff_bits)
        for o in range(2, order):
            probs = [nodes[o][p][0] for p in sorted_nodes[o]]
            bos = [backoff_value(nodes[o][p][1],
                                 child_count[o].get(p, 0) > 0)
                   for p in sorted_nodes[o]]
            pt = table(probs)
            # slots 0/1 are kenlm's reserved no-extension/extension zeros
            bt = table([b for b in bos if b != 0.0], reserved=(-0.0, 0.0))
            assert len(pt) <= (1 << prob_bits), "prob table overflow"
            assert len(bt) <= (1 << backoff_bits), "backoff table overflow"
            quant_index[(o, "prob")] = {v: i for i, v in enumerate(pt)}
            quant_index[(o, "backoff")] = {v: i for i, v in enumerate(bt)}
            quant += b"".join(pt) + b"\0" * 4 * ((1 << prob_bits) - len(pt))
            quant += b"".join(bt) + b"\0" * 4 * ((1 << backoff_bits) - len(bt))
        lp = table([nodes[order][p][0] for p in sorted_nodes[order]])
        assert len(lp) <= (1 << prob_bits)
        quant_index[(order, "prob")] = {v: i for i, v in enumerate(lp)}
        quant += b"".join(lp) + b"\0" * 4 * ((1 << prob_bits) - len(lp))

    # --- unigram: (c0+2) x {f32 prob; f32 backoff; u64 next} ---
    word_bits = required_bits(c0)
    uni_info = {}
    for (w,), logp, bo in unigrams:
        uni_info[ids[w]] = (f32(logp),
                            backoff_value(bo, child_count[1].get(ids[w], 0) > 0))
    running = 0
    uni = bytearray()
    for wid in range(c0):
        prob, bo = uni_info.get(wid, (0.0, 0.0))
        begin = running
        running += child_count[1].get(wid, 0)
        uni += struct.pack("<ffQ", prob, bo, begin)
    uni += struct.pack("<ffQ", 0.0, 0.0, running)
    uni += struct.pack("<ffQ", 0.0, 0.0, running)
    assert running == counts[1]

    # --- middles (orders 2..N-1) and longest (order N), bit-packed ---
    def pack_middle(o):
        entries = sorted_nodes[o]
        next_count = counts[o]  # next level's entry count
        next_bits = required_bits(next_count)
        bh_section = b""
        bh_write = None
        if bhiksha_bits is not None:
            chopped = chop_bits(len(entries) + 1, next_count, bhiksha_bits)
            next_bits -= chopped
            count = (next_count >> next_bits) + 1  # ArrayCount
            buckets = [0] * count
            write_ptr = [1]

            def bh_write(slot_index, value):
                encode = value >> next_bits
                while write_ptr[0] <= encode:
                    buckets[write_ptr[0]] = slot_index
                    write_ptr[0] += 1

        qb = (prob_bits + backoff_bits) if quantized else 63
        tb = word_bits + qb + next_bits
        arr = _BitArray(len(entries), tb)
        running = 0
        for i, path in enumerate(entries):
            prob, explicit_bo = nodes[o][path]
            bo = backoff_value(explicit_bo, child_count[o].get(path, 0) > 0)
            off = i * tb
            arr.write(off, word_bits, path[-1])
            off += word_bits
            if quantized:
                pi = quant_index[(o, "prob")][struct.pack("<f", f32(prob))]
                bi = quant_index[(o, "backoff")][struct.pack("<f", f32(bo))]
                # kenlm packs (prob_index << backoff_bits) | backoff_index:
                # backoff in the LOW bits
                arr.write(off, backoff_bits, bi)
                arr.write(off + backoff_bits, prob_bits, pi)
            else:
                arr.write_prob31(off, prob)
                arr.write_f32(off + 31, bo)
            if bh_write is not None:
                bh_write(i, running)
            arr.write(off + qb, next_bits,
                      running & ((1 << next_bits) - 1) if next_bits else 0)
            running += child_count[o].get(path, 0)
        # end sentinel in the final slot's next field (the sentinel's
        # buckets are written with the entry count as slot index)
        if bh_write is not None:
            bh_write(len(entries), running)
            assert write_ptr[0] == count, (write_ptr[0], count)
            bh_section = struct.pack("<BB6x", 0, bhiksha_bits)
            bh_section += b"".join(struct.pack("<Q", b) for b in buckets)
        arr.write(len(entries) * tb + word_bits + qb, next_bits,
                  running & ((1 << next_bits) - 1) if next_bits else 0)
        assert running == next_count
        return bh_section + bytes(arr.buf)

    def pack_longest():
        entries = sorted_nodes[order]
        qb = prob_bits if quantized else 31
        tb = word_bits + qb
        arr = _BitArray(len(entries), tb)
        for i, path in enumerate(entries):
            prob = nodes[order][path][0]
            arr.write(i * tb, word_bits, path[-1])
            if quantized:
                arr.write(i * tb + word_bits, prob_bits,
                          quant_index[(order, "prob")][
                              struct.pack("<f", f32(prob))])
            else:
                arr.write_prob31(i * tb + word_bits, prob)
        return bytes(arr.buf)

    middles = b"".join(pack_middle(o) for o in range(2, order))
    longest = pack_longest()

    words_blob = b""
    if include_words:
        by_id = sorted(ids.items(), key=lambda kv: kv[1])
        words_blob = b"".join(w.encode() + b"\0" for w, _ in by_id)

    with open(out_path, "wb") as f:
        f.write(header + vocab + quant + bytes(uni) + middles + longest
                + words_blob)
    return ids


@pytest.fixture(scope="module")
def trie_bin(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kenlm_trie") / "lm_trie.bin")
    write_trie_binary(ARPA, out)
    return out


@pytest.fixture(scope="module")
def quant_trie_bin(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kenlm_trie") / "lm_qtrie.bin")
    write_trie_binary(ARPA, out, quantized=True)
    return out


@pytest.fixture(scope="module")
def arpa_lm():
    return BeamSearchDecoderWithLM(["a", "b", " "], beam_width=4, alpha=1.0,
                                   beta=0.0, lm_path=ARPA,
                                   lm_binary_cache=False)


@pytest.fixture(scope="module")
def trie_lm(trie_bin):
    return BeamSearchDecoderWithLM(["a", "b", " "], beam_width=4, alpha=1.0,
                                   beta=0.0, lm_path=trie_bin, kenlm_bin=True)


@pytest.fixture(scope="module")
def quant_lm(quant_trie_bin):
    return BeamSearchDecoderWithLM(["a", "b", " "], beam_width=4, alpha=1.0,
                                   beta=0.0, lm_path=quant_trie_bin,
                                   kenlm_bin=True)


def test_header_parse_of_trie_fixtures(trie_bin, quant_trie_bin):
    from conformer_nemo_tpu.decode.kenlm_binary import (is_kenlm_binary,
                                                        parse_header)
    assert is_kenlm_binary(trie_bin)
    hdr = parse_header(trie_bin)
    assert hdr.model_type == "trie" and hdr.order == 3
    assert hdr.counts == (7, 6, 3)
    hdr = parse_header(quant_trie_bin)
    assert hdr.model_type == "quant_trie" and hdr.order == 3


@pytest.mark.parametrize("which", ["trie", "quant"])
def test_trie_scores_match_arpa_scorer(which, arpa_lm, trie_lm, quant_lm):
    """Per-word Katz scores through the trie readers == the ARPA scorer
    (same model content, independent storage + lookup paths), including
    backoff chains, OOV -> <unk>, BOS context and EOS. The quantized
    fixture's tables are lossless, so the same tolerance applies."""
    lm = trie_lm if which == "trie" else quant_lm
    for sent in SENTENCES:
        words = sent.split()
        ctx = ["<s>"]
        for w in words + ["</s>"]:
            a = arpa_lm.lm_score(ctx, w)
            b = lm.lm_score(ctx, w)
            assert b == pytest.approx(a, abs=2e-6), (sent, w, a, b)
            ctx.append(w)


def test_trie_beam_decode_matches_arpa(arpa_lm, trie_lm):
    rng = np.random.RandomState(0)
    logits = rng.randn(1, 40, 4).astype(np.float32) * 2.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ra = arpa_lm(lp, nbest=3)
    rb = trie_lm(lp, nbest=3)
    assert [h[0] for h in ra[0]] == [h[0] for h in rb[0]]
    for (_, sa), (_, sb) in zip(ra[0], rb[0]):
        assert sb == pytest.approx(sa, abs=1e-4)


def test_trie_without_optin_names_the_flag(trie_bin):
    with pytest.raises(ValueError, match="kenlm_bin=True"):
        BeamSearchDecoderWithLM(["a", " "], lm_path=trie_bin)


def test_trie_word_strings_surface(trie_lm):
    import ctypes
    buf = ctypes.create_string_buffer(64)
    n = trie_lm._lib.ctc_lm_kenlm_word(trie_lm._lm, 0, buf, len(buf))
    assert n == 5 and buf.value == b"<unk>"
    n = trie_lm._lib.ctc_lm_kenlm_word(trie_lm._lm, 1, buf, len(buf))
    assert n > 0  # id 1 = smallest-hash word


def test_trie_binary_without_word_strings(tmp_path, arpa_lm):
    """include_vocab=False: the layout resolves via the exact-size equation
    and still scores identically."""
    out = str(tmp_path / "nowords.bin")
    write_trie_binary(ARPA, out, include_words=False)
    lm = BeamSearchDecoderWithLM(["a", " "], lm_path=out, kenlm_bin=True)
    ctx = ["<s>", "the"]
    assert lm.lm_score(ctx, "cat") == pytest.approx(
        arpa_lm.lm_score(ctx, "cat"), abs=2e-6)


def test_truncated_trie_binary_rejected(trie_bin, tmp_path):
    with open(trie_bin, "rb") as f:
        blob = f.read()
    bad = str(tmp_path / "trunc.bin")
    with open(bad, "wb") as f:
        f.write(blob[: len(blob) - 40])
    with pytest.raises(ValueError, match="layout|truncated|validation"):
        BeamSearchDecoderWithLM(["a", " "], lm_path=bad, kenlm_bin=True)


def test_unsorted_vocab_rejected(tmp_path):
    """Corrupting the sorted-hash invariant must fail the load-time
    self-check loudly (a mis-sorted array would silently mis-score)."""
    out = str(tmp_path / "unsorted.bin")
    write_trie_binary(ARPA, out)
    with open(out, "rb") as f:
        blob = bytearray(f.read())
    # swap the first two stored hashes (model_base is 8-aligned after the
    # header; find it via the stored-count u64 == 6)
    from conformer_nemo_tpu.decode.kenlm_binary import parse_header
    hdr = parse_header(out)
    assert hdr.counts[0] == 7
    pos = blob.find(struct.pack("<Q", 6))  # stored = 7-1 vocab entries
    assert pos > 0
    h0 = blob[pos + 8: pos + 16]
    blob[pos + 8: pos + 16] = blob[pos + 16: pos + 24]
    blob[pos + 16: pos + 24] = h0
    with open(out, "wb") as f:
        f.write(bytes(blob))
    with pytest.raises(ValueError, match="sorted|self-check"):
        BeamSearchDecoderWithLM(["a", " "], lm_path=out, kenlm_bin=True)


def test_pruned_arpa_blanks_score_like_katz(tmp_path):
    """A pruned ARPA (trigram whose bigram suffix is missing) forces blank
    entries. KenLM folds the backed-off Katz prob into the blank, so trie
    scoring stays identical to the ARPA scorer — including when the walk
    TERMINATES at the blank. Header counts include the blank."""
    arpa = str(tmp_path / "pruned.arpa")
    with open(arpa, "w") as f:
        f.write("""\\data\\
ngram 1=5
ngram 2=2
ngram 3=2

\\1-grams:
-1.2\t<unk>
-0.8\t<s>\t-0.5
-1.0\t</s>
-0.6\tfoo\t-0.4
-0.9\tbar\t-0.3

\\2-grams:
-0.30\t<s> foo\t-0.20
-0.40\tfoo bar\t-0.15

\\3-grams:
-0.20\t<s> foo bar
-0.50\tfoo bar bar

\\end\\
""")
    out = str(tmp_path / "pruned.bin")
    write_trie_binary(arpa, out)
    from conformer_nemo_tpu.decode.kenlm_binary import parse_header
    hdr = parse_header(out)
    assert hdr.counts == (5, 3, 2)  # the (bar, bar) blank joins level 2

    arpa_lm = BeamSearchDecoderWithLM(["a", " "], beam_width=4,
                                      lm_path=arpa, lm_binary_cache=False)
    trie_lm = BeamSearchDecoderWithLM(["a", " "], beam_width=4,
                                      lm_path=out, kenlm_bin=True)
    cases = [
        ([], "bar"),
        (["foo"], "bar"),
        (["foo", "bar"], "bar"),   # full match THROUGH the blank
        (["bar", "bar"], "bar"),   # walk terminates AT the blank
        (["bar"], "bar"),          # bigram miss below the blank
        (["<s>", "foo"], "bar"),
        (["bar", "bar"], "</s>"),
    ]
    for ctx, w in cases:
        a = arpa_lm.lm_score(ctx, w)
        b = trie_lm.lm_score(ctx, w)
        assert b == pytest.approx(a, abs=2e-6), (ctx, w, a, b)


def test_bigram_only_trie(tmp_path):
    """order=2: no middle arrays — unigram ranges index the longest array
    directly."""
    arpa = str(tmp_path / "bigram.arpa")
    with open(arpa, "w") as f:
        f.write("""\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-1.2\t<unk>
-0.8\t<s>\t-0.5
-1.0\t</s>
-0.6\tfoo\t-0.4

\\2-grams:
-0.30\t<s> foo
-0.45\tfoo </s>

\\end\\
""")
    out = str(tmp_path / "bigram.bin")
    write_trie_binary(arpa, out)
    arpa_lm = BeamSearchDecoderWithLM(["a", " "], beam_width=4,
                                      lm_path=arpa, lm_binary_cache=False)
    lm = BeamSearchDecoderWithLM(["a", " "], beam_width=4, lm_path=out,
                                 kenlm_bin=True)
    for ctx, w in [([], "foo"), (["<s>"], "foo"), (["foo"], "</s>"),
                   (["<s>"], "qux"), (["foo"], "foo")]:
        assert lm.lm_score(ctx, w) == pytest.approx(
            arpa_lm.lm_score(ctx, w), abs=2e-6), (ctx, w)


# --- array_trie / quant_array_trie (Bhiksha-coded next pointers) ----------


def _write_big_arpa(path: str):
    """Deterministic ~40-word trigram ARPA large enough that ChopBits picks
    a nonzero chop at level 2 (real bucket compression, not the degenerate
    chop=0 layout the tiny fixture produces)."""
    rng = np.random.RandomState(1)
    words = [f"w{i:02d}" for i in range(40)]
    bigrams = sorted({(words[i], words[(i + d) % 40])
                      for i in range(40) for d in (1, 3, 7)})
    trigrams = sorted({(words[i], words[(i + 1) % 40], words[(i + 4) % 40])
                       for i in range(40)} |
                      {(words[i], words[(i + 3) % 40], words[(i + 6) % 40])
                       for i in range(40)})
    with open(path, "w") as f:
        f.write("\\data\\\n")
        f.write(f"ngram 1={len(words) + 3}\n")
        f.write(f"ngram 2={len(bigrams)}\n")
        f.write(f"ngram 3={len(trigrams)}\n\n\\1-grams:\n")
        f.write("-2.0\t<unk>\n-1.5\t<s>\t-0.4\n-1.8\t</s>\n")
        for w in words:
            f.write(f"-{1.0 + rng.rand():.4f}\t{w}\t-{0.2 + 0.3 * rng.rand():.4f}\n")
        f.write("\n\\2-grams:\n")
        for a, b in bigrams:
            f.write(f"-{0.3 + rng.rand():.4f}\t{a} {b}\t-{0.1 + 0.2 * rng.rand():.4f}\n")
        f.write("\n\\3-grams:\n")
        for a, b, c in trigrams:
            f.write(f"-{0.2 + rng.rand():.4f}\t{a} {b} {c}\n")
        f.write("\n\\end\\\n")
    return words


@pytest.fixture(scope="module")
def big_arpa(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kenlm_array") / "big.arpa")
    words = _write_big_arpa(path)
    return path, words


@pytest.mark.parametrize("quantized", [False, True])
def test_array_trie_scores_match_arpa(tmp_path, big_arpa, quantized):
    """build_binary -a analogue: array_trie (4) / quant_array_trie (5) score
    exactly like the ARPA scorer on a model big enough for real Bhiksha
    chopping (nonzero high bits in the bucket arrays)."""
    arpa, words = big_arpa
    out = str(tmp_path / ("qarr.bin" if quantized else "arr.bin"))
    write_trie_binary(arpa, out, quantized=quantized, bhiksha_bits=22,
                      prob_bits=10, backoff_bits=10)
    from conformer_nemo_tpu.decode.kenlm_binary import parse_header
    hdr = parse_header(out)
    assert hdr.model_type == ("quant_array_trie" if quantized
                              else "array_trie")

    # the fixture is only meaningful if chopping actually happened
    n2 = len(parse_arpa(arpa)[1][2])
    assert chop_bits(n2 + 1, hdr.counts[2], 22) >= 1

    arpa_lm = BeamSearchDecoderWithLM(["a", " "], beam_width=4, lm_path=arpa,
                                      lm_binary_cache=False)
    lm = BeamSearchDecoderWithLM(["a", " "], beam_width=4, lm_path=out,
                                 kenlm_bin=True)
    for i, w in enumerate(words):
        cases = [([], w),
                 ([words[(i - 1) % 40]], w),
                 ([words[(i - 4) % 40], words[(i - 3) % 40]], w),
                 ([words[(i - 2) % 40], words[(i - 1) % 40]], w),
                 (["<s>", words[(i - 7) % 40]], w)]
        for ctx, word in cases:
            a = arpa_lm.lm_score(ctx, word)
            b = lm.lm_score(ctx, word)
            assert b == pytest.approx(a, abs=2e-6), (ctx, word, a, b)


def test_array_trie_bits_cap_and_inline_zero(tmp_path, big_arpa):
    """configured bits cap the chop (bhiksha_bits=1 -> chop <= 1), and an
    inline_bits=0 level (all pointer information in the buckets) still
    scores exactly: many bigrams but a single trigram makes chopping the
    full required width optimal."""
    arpa, words = big_arpa
    capped = str(tmp_path / "capped.bin")
    write_trie_binary(arpa, capped, bhiksha_bits=1)
    arpa_lm = BeamSearchDecoderWithLM(["a", " "], beam_width=4, lm_path=arpa,
                                      lm_binary_cache=False)
    lm = BeamSearchDecoderWithLM(["a", " "], beam_width=4, lm_path=capped,
                                 kenlm_bin=True)
    for ctx, w in [([], words[0]), ([words[0]], words[1]),
                   ([words[36], words[37]], words[0]),
                   ([words[0], words[1]], words[4])]:
        assert lm.lm_score(ctx, w) == pytest.approx(
            arpa_lm.lm_score(ctx, w), abs=2e-6), (ctx, w)

    # single-trigram model: required_bits(1) == 1 and > 64 bigram slots make
    # chop == required optimal -> inline width 0
    one = str(tmp_path / "one3.arpa")
    rng = np.random.RandomState(2)
    ws = [f"v{i:02d}" for i in range(30)]
    bgs = sorted({(ws[i], ws[(i + d) % 30]) for i in range(30)
                  for d in (1, 2, 5)})
    with open(one, "w") as f:
        f.write("\\data\\\nngram 1=%d\nngram 2=%d\nngram 3=1\n\n\\1-grams:\n"
                % (len(ws) + 1, len(bgs)))
        f.write("-2.0\t<unk>\n")
        for w in ws:
            f.write(f"-{1.0 + rng.rand():.4f}\t{w}\t-0.3\n")
        f.write("\n\\2-grams:\n")
        for a, b in bgs:
            f.write(f"-{0.4 + rng.rand():.4f}\t{a} {b}\t-0.2\n")
        f.write(f"\n\\3-grams:\n-0.25\t{ws[0]} {ws[1]} {ws[2]}\n\n\\end\\\n")
    out = str(tmp_path / "one3.bin")
    write_trie_binary(one, out, bhiksha_bits=22)
    n2 = len(parse_arpa(one)[1][2])
    assert chop_bits(n2 + 1, 1, 22) == required_bits(1)  # inline == 0
    arpa_lm1 = BeamSearchDecoderWithLM(["a", " "], beam_width=4, lm_path=one,
                                       lm_binary_cache=False)
    lm1 = BeamSearchDecoderWithLM(["a", " "], beam_width=4, lm_path=out,
                                  kenlm_bin=True)
    for ctx, w in [([ws[0], ws[1]], ws[2]),   # the lone trigram
                   ([ws[5], ws[0]], ws[1]),
                   ([ws[1]], ws[2]), ([], ws[9])]:
        assert lm1.lm_score(ctx, w) == pytest.approx(
            arpa_lm1.lm_score(ctx, w), abs=2e-6), (ctx, w)


def test_array_trie_bigram_only_has_no_bhiksha_sections(tmp_path):
    """order=2 array_trie: no middle levels -> no bucket arrays; the layout
    degenerates to the plain trie's and must still load and score."""
    arpa = str(tmp_path / "bg.arpa")
    with open(arpa, "w") as f:
        f.write("\\data\\\nngram 1=4\nngram 2=2\n\n\\1-grams:\n"
                "-1.2\t<unk>\n-0.8\t<s>\t-0.5\n-1.0\t</s>\n-0.6\tfoo\t-0.4\n"
                "\n\\2-grams:\n-0.30\t<s> foo\n-0.45\tfoo </s>\n\n\\end\\\n")
    out = str(tmp_path / "bg_arr.bin")
    write_trie_binary(arpa, out, bhiksha_bits=22)
    arpa_lm = BeamSearchDecoderWithLM(["a", " "], beam_width=4, lm_path=arpa,
                                      lm_binary_cache=False)
    lm = BeamSearchDecoderWithLM(["a", " "], beam_width=4, lm_path=out,
                                 kenlm_bin=True)
    for ctx, w in [([], "foo"), (["<s>"], "foo"), (["foo"], "</s>")]:
        assert lm.lm_score(ctx, w) == pytest.approx(
            arpa_lm.lm_score(ctx, w), abs=2e-6), (ctx, w)


def test_array_trie_bad_version_byte_rejected(tmp_path, big_arpa):
    """An unknown Bhiksha section version must fail the layout resolution
    loudly (kenlm would reject it too), not read garbage buckets."""
    arpa, _ = big_arpa
    out = str(tmp_path / "badver.bin")
    write_trie_binary(arpa, out, bhiksha_bits=22)
    from conformer_nemo_tpu.decode.kenlm_binary import parse_header
    hdr = parse_header(out)
    # locate the level-2 bhiksha header: it starts right after the unigram
    # records; its second byte is the configured bits (22)
    with open(out, "rb") as f:
        blob = bytearray(f.read())
    probe = struct.pack("<BB6x", 0, 22)
    pos = blob.find(probe)
    assert pos > 0 and hdr is not None
    blob[pos] = 7  # unsupported version
    with open(out, "wb") as f:
        f.write(bytes(blob))
    with pytest.raises(ValueError, match="layout"):
        BeamSearchDecoderWithLM(["a", " "], lm_path=out, kenlm_bin=True)


def test_array_trie_corrupt_bucket_array_rejected(tmp_path, big_arpa):
    """A non-monotone bucket array fails the load-time self-check."""
    arpa, _ = big_arpa
    out = str(tmp_path / "badbucket.bin")
    write_trie_binary(arpa, out, bhiksha_bits=22)
    with open(out, "rb") as f:
        blob = bytearray(f.read())
    probe = struct.pack("<BB6x", 0, 22)
    pos = blob.find(probe)
    assert pos > 0
    # bucket[1] lives 16 bytes after the section start; make it huge
    blob[pos + 16: pos + 24] = struct.pack("<Q", (1 << 40))
    with open(out, "wb") as f:
        f.write(bytes(blob))
    with pytest.raises(ValueError, match="Bhiksha|layout"):
        BeamSearchDecoderWithLM(["a", " "], lm_path=out, kenlm_bin=True)


def test_ctc_api_strategy_accepts_trie_bin(tmp_path, trie_bin):
    """change_decoding_strategy beam.kenlm_bin plumbs through to the native
    trie reader (the evaluate.py --kenlm-bin surface)."""
    import jax.numpy as jnp

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
        "beam": {"beam_width": 4, "lm_path": trie_bin, "kenlm_bin": True}})
    out = model.transcribe([p], batch_size=1)
    assert isinstance(out[0], str) and set(out[0]) <= set("ab ")
