"""Differential validation against REAL KenLM (library-gated).

This image ships neither the `kenlm` wheel nor `build_binary`, so these
tests skip here — but they validate automatically in any environment that
has the library (same pattern as the SentencePiece differential tests):

  * our native ARPA scorer (Katz backoff, `native/ctc_beam/ctc_beam.cpp`)
    must match kenlm's per-word log10 scores on `tests/fixtures/lm_edge.arpa`
    — backoff chains, OOV -> <unk>, BOS context, EOS;
  * the KenLM binary header parser (`decode/kenlm_binary.py`) must report
    the right model type / order / counts for a real `build_binary` output,
    and the beam decoder must reject it with the actionable error.

A hand-computed Katz oracle for the same fixture lives in
`tests/test_ctc_beam.py` (runs everywhere), so the scorer itself is never
untested — this file upgrades that to full library parity when possible.
"""

import os
import shutil
import subprocess

import pytest

kenlm = pytest.importorskip("kenlm")

from conformer_nemo_tpu.decode.ctc_beam import BeamSearchDecoderWithLM

ARPA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "lm_edge.arpa")

SENTENCES = [
    "the cat sat",            # all n-gram orders hit
    "the cat sat the mat",    # mid-sentence backoff chains
    "cat mat sat",            # bigram-only paths
    "the zebra sat",          # OOV -> <unk> in context and as word
    "mat",                    # unigram with no backoff weight
    "sat sat sat",            # unseen bigram -> backoff through unigram
]


@pytest.fixture(scope="module")
def ours():
    return BeamSearchDecoderWithLM(
        ["a", "b", " "], beam_width=4, alpha=1.0, beta=0.0, lm_path=ARPA,
        lm_binary_cache=False)


@pytest.fixture(scope="module")
def theirs():
    return kenlm.Model(ARPA)


def test_per_word_scores_match_kenlm(ours, theirs):
    for sent in SENTENCES:
        words = sent.split()
        # kenlm full_scores yields (log10 prob, ngram_len, oov) per word,
        # then the </s> entry; context starts at <s>
        km = list(theirs.full_scores(sent, bos=True, eos=True))
        assert len(km) == len(words) + 1
        ctx = ["<s>"]
        for w, (lp, _, _) in zip(words, km[:-1]):
            mine = ours.lm_score(ctx, w)
            assert mine == pytest.approx(lp, abs=1e-4), (sent, w, mine, lp)
            ctx.append(w)
        eos_lp = km[-1][0]
        assert ours.lm_score(ctx, "</s>") == pytest.approx(eos_lp, abs=1e-4), sent


def test_probing_binary_reader_matches_real_kenlm(tmp_path, theirs):
    """THE ground-truth case for the probing payload reader
    (native/ctc_beam/kenlm_probing.h): load a real `build_binary probing`
    output directly and match kenlm's own per-word log10 scores — backoff
    chains, OOV -> <unk>, BOS context, EOS. Where this test can run, the
    reader is fully validated; elsewhere it stays opt-in
    (kenlm_probing=True) with structural validation only."""
    bb = shutil.which("build_binary")
    if bb is None:
        pytest.skip("kenlm build_binary not on PATH")
    out = str(tmp_path / "lm_probing_reader.bin")
    subprocess.run([bb, "probing", ARPA, out], check=True, capture_output=True)

    ours_bin = BeamSearchDecoderWithLM(
        ["a", "b", " "], beam_width=4, alpha=1.0, beta=0.0, lm_path=out,
        kenlm_probing=True)
    for sent in SENTENCES:
        words = sent.split()
        km = list(theirs.full_scores(sent, bos=True, eos=True))
        ctx = ["<s>"]
        for w, (lp, _, _) in zip(words, km[:-1]):
            mine = ours_bin.lm_score(ctx, w)
            assert mine == pytest.approx(lp, abs=1e-4), (sent, w, mine, lp)
            ctx.append(w)
        assert ours_bin.lm_score(ctx, "</s>") == pytest.approx(
            km[-1][0], abs=1e-4), sent


@pytest.mark.parametrize(
    "flavor", ["trie", "trie_q8", "array", "array_q8", "array_a2"])
def test_trie_binary_reader_matches_real_kenlm(tmp_path, theirs, flavor):
    """THE ground-truth case for the trie payload reader
    (native/ctc_beam/kenlm_trie.h): load a real `build_binary trie` output
    — plain, `-q 8` quant_trie, and `-a` Bhiksha array variants — directly
    and match kenlm's own per-word log10 scores. Where this test can run,
    the reader is fully validated; elsewhere it stays opt-in
    (kenlm_bin=True) with structural validation plus the layout-exact
    fixture tests in test_kenlm_trie.py."""
    bb = shutil.which("build_binary")
    if bb is None:
        pytest.skip("kenlm build_binary not on PATH")
    out = str(tmp_path / f"lm_{flavor}.bin")
    extra = {"trie": [], "trie_q8": ["-q", "8", "-b", "8"],
             "array": ["-a", "22"], "array_q8": ["-a", "22", "-q", "8", "-b", "8"],
             "array_a2": ["-a", "2"]}[flavor]
    args = [bb] + extra + ["trie", ARPA, out]
    subprocess.run(args, check=True, capture_output=True)
    # quantized tries lose precision by design; bound the tolerance at the
    # bin width kenlm itself reports back through its own scorer
    their_bin = kenlm.Model(out)
    ours_bin = BeamSearchDecoderWithLM(
        ["a", "b", " "], beam_width=4, alpha=1.0, beta=0.0, lm_path=out,
        kenlm_bin=True)
    for sent in SENTENCES:
        words = sent.split()
        km = list(their_bin.full_scores(sent, bos=True, eos=True))
        ctx = ["<s>"]
        for w, (lp, _, _) in zip(words, km[:-1]):
            mine = ours_bin.lm_score(ctx, w)
            assert mine == pytest.approx(lp, abs=1e-4), (sent, w, mine, lp)
            ctx.append(w)
        assert ours_bin.lm_score(ctx, "</s>") == pytest.approx(
            km[-1][0], abs=1e-4), sent


def test_binary_header_parse_matches_real_build_binary(tmp_path, theirs):
    bb = shutil.which("build_binary")
    if bb is None:
        pytest.skip("kenlm build_binary not on PATH")
    from conformer_nemo_tpu.decode.kenlm_binary import is_kenlm_binary, parse_header

    for flavor, expect_type in (("probing", "probing"), ("trie", "trie"),
                                ("array", "array_trie")):
        out = str(tmp_path / f"lm_{flavor}.bin")
        extra = ["-a", "22", "trie"] if flavor == "array" else [flavor]
        subprocess.run([bb] + extra + [ARPA, out], check=True,
                       capture_output=True)
        assert is_kenlm_binary(out)
        hdr = parse_header(out)
        assert hdr is not None and hdr.version is not None
        assert hdr.order == 3, hdr
        assert hdr.model_type == expect_type, hdr
        assert hdr.counts == (7, 6, 3), hdr

        with pytest.raises(ValueError, match="KenLM binary"):
            BeamSearchDecoderWithLM(["a", " "], lm_path=out)
