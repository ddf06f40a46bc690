"""DER scoring + RTTM I/O (speaker_utils.py score_labels/rttm parity)."""

import numpy as np
import pytest

from conformer_nemo_tpu.decode.der import (
    der_score,
    optimal_speaker_mapping,
    rttm_to_segments,
    score_rttm_files,
    segments_to_rttm,
    write_rttm,
)

REF = [(0.0, 10.0, "A"), (10.0, 20.0, "B")]


def test_perfect_match_zero_der():
    hyp = [(0.0, 10.0, "spk1"), (10.0, 20.0, "spk2")]
    r = der_score(REF, hyp, collar=0.0)
    assert r["DER"] == pytest.approx(0.0)
    assert r["mapping"] == {"spk1": "A", "spk2": "B"}


def test_miss_fa_confusion_components():
    # hyp covers [0,8] as spk1 (A), [8,20] as spk2 (B):
    #   [8,10]: ref A, hyp B -> confusion 2s; rest correct
    hyp = [(0.0, 8.0, "spk1"), (8.0, 20.0, "spk2")]
    r = der_score(REF, hyp, collar=0.0)
    assert r["CER"] == pytest.approx(2.0 / 20.0)
    assert r["DER"] == pytest.approx(2.0 / 20.0)

    # hyp silent in [0,5] -> miss 5s; speaks [20,25] -> fa 5s
    hyp2 = [(5.0, 10.0, "x"), (10.0, 25.0, "y")]
    r2 = der_score(REF, hyp2, collar=0.0)
    assert r2["MISS"] == pytest.approx(5.0 / 20.0)
    assert r2["FA"] == pytest.approx(5.0 / 20.0)
    assert r2["DER"] == pytest.approx(10.0 / 20.0)


def test_label_permutation_resolved_by_mapping():
    # swapped names must map optimally -> zero error
    hyp = [(0.0, 10.0, "B"), (10.0, 20.0, "A")]
    assert der_score(REF, hyp, collar=0.0)["DER"] == pytest.approx(0.0)
    assert optimal_speaker_mapping(REF, hyp) == {"B": "A", "A": "B"}


def test_collar_excludes_boundary_errors():
    # 0.2s error right at the 10s boundary vanishes under collar=0.25
    hyp = [(0.0, 10.2, "a"), (10.2, 20.0, "b")]
    assert der_score(REF, hyp, collar=0.25)["DER"] == pytest.approx(0.0)
    assert der_score(REF, hyp, collar=0.0)["DER"] > 0


def test_ignore_overlap():
    ref = [(0.0, 10.0, "A"), (5.0, 10.0, "B")]  # overlap in [5,10]
    hyp = [(0.0, 10.0, "x")]
    r = der_score(ref, hyp, collar=0.0, ignore_overlap=True)
    # only [0,5] scored (single-speaker region), matched -> 0
    assert r["DER"] == pytest.approx(0.0)
    assert r["total_speech_s"] == pytest.approx(5.0)
    r2 = der_score(ref, hyp, collar=0.0, ignore_overlap=False)
    assert r2["MISS"] == pytest.approx(5.0 / 15.0)  # B missed in [5,10]


def test_rttm_roundtrip_and_cumulative(tmp_path):
    text = segments_to_rttm(REF, "utt")
    assert text.splitlines()[0].startswith("SPEAKER utt 1   0.000   10.000")
    p_ref = write_rttm(str(tmp_path / "ref.rttm"), REF, "utt")
    segs = rttm_to_segments(p_ref)
    assert [(round(s, 3), round(e, 3), k) for s, e, k in segs] == REF

    p_hyp = write_rttm(str(tmp_path / "hyp.rttm"),
                       [(5.0, 10.0, "x"), (10.0, 25.0, "y")], "utt")
    cum = score_rttm_files([(p_ref, p_hyp)], collar=0.0)
    assert cum["DER"] == pytest.approx(0.5)
