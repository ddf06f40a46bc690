"""Deterministic generator for the committed SentencePiece differential
fixtures (run from repo root: `python tests/fixtures/gen_sp_fixtures.py`).

Produces:
  * sp_bpe_bytefallback.model — BPE model, identity normalization (no
    precompiled charsmap, so the REAL library applies no char mapping
    either — the fixtures must normalize identically on both sides),
    dummy prefix + whitespace escape on, full 256-piece byte fallback,
    merge ranks covering remerge chains and tie-break cases.
  * sp_unigram.model — unigram model, same normalizer, log-prob scores
    with Viterbi-relevant ambiguity (word pieces vs char paths).

`test_sentencepiece_differential.py` feeds these plus sp_corpus.txt to the
real `sentencepiece` wheel wherever it exists and asserts id-exact parity
with our dependency-free implementation.
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

from sp_proto import SP, make_model  # noqa: E402


def byte_pieces():
    return [(f"<0x{i:02X}>", 0.0, 6) for i in range(256)]


def bpe_model() -> bytes:
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    pieces += byte_pieces()
    chars = [SP] + list("abcdehlorstw")
    pieces += [(c, -50.0 - i, 1) for i, c in enumerate(chars)]
    merges = [
        "ab", "bc", "abc",            # remerge chain + ambiguous 'abc'
        "or", "wo", "wor", "ld", "world", SP + "world",
        "he", "el", "lo", "hel", "hello", SP + "hello",
        SP + "t", "th", "the", SP + "the",
        "st", "at", "cat", SP + "cat",
    ]
    pieces += [(m, -1.0 * (i + 1), 1) for i, m in enumerate(merges)]
    return make_model(pieces, model_type=2, byte_fallback=True,
                      add_dummy_prefix=True, norm_name="identity",
                      remove_extra_whitespaces=True, escape_whitespaces=True)


def unigram_model() -> bytes:
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    pieces += byte_pieces()
    chars = [SP] + list("abcdehlorstw")
    pieces += [(c, -8.0 - 0.1 * i, 1) for i, c in enumerate(chars)]
    words = [
        (SP + "hello", -5.0), ("hello", -6.0), (SP + "hel", -7.5),
        ("lo", -4.5), ("he", -4.8), ("ll", -5.5),
        (SP + "world", -5.1), ("world", -6.2), ("wor", -5.9), ("ld", -4.9),
        (SP + "the", -4.2), ("the", -5.4), (SP + "cat", -5.3),
        ("ab", -4.0), ("abc", -6.5), ("bc", -4.1),
    ]
    pieces += [(w, s, 1) for w, s in words]
    return make_model(pieces, model_type=1, byte_fallback=True,
                      add_dummy_prefix=True, norm_name="identity",
                      remove_extra_whitespaces=True, escape_whitespaces=True)


def main():
    with open(os.path.join(HERE, "sp_bpe_bytefallback.model"), "wb") as f:
        f.write(bpe_model())
    with open(os.path.join(HERE, "sp_unigram.model"), "wb") as f:
        f.write(unigram_model())
    print("wrote sp_bpe_bytefallback.model, sp_unigram.model")


if __name__ == "__main__":
    main()
