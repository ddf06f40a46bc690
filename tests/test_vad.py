"""VAD post-processing parity tests (reference vad_utils.py).

Oracles: independent brute-force implementations of the smoothing and
binarization semantics, plus hand-computed fixtures.
"""

import numpy as np
import pytest

from conformer_nemo_tpu.decode.vad import (
    binarization,
    cal_vad_onset_offset,
    detection_error_rate,
    filter_short_segments,
    filtering,
    gen_pred_from_speech_segments,
    get_gap_segments,
    get_parameter_grid,
    merge_overlap_segments,
    postprocess_frame_predictions,
    segments_to_table,
    smooth_overlap_predictions,
    stitch_segmented_transcripts,
    tune_thresholds,
)


# ---------------------------------------------------------------------------
# oracles: naive loop implementations of the reference semantics
# ---------------------------------------------------------------------------

def _oracle_smooth(frame, method, overlap, win_s, shift_s):
    shift = int(shift_s / 0.01)
    seg = int(win_s / 0.01 + 1)
    jump_frame = int(int(seg * (1 - overlap)) / shift)
    target = len(frame) * shift
    buckets = [[] for _ in range(target)]
    for i, p in enumerate(frame):
        if i % jump_frame != 0:
            continue
        for j in range(i * shift, min(i * shift + seg, target)):
            buckets[j].append(p)
    agg = np.mean if method == "mean" else np.median
    out = np.full(target, np.nan)
    for j, b in enumerate(buckets):
        if b:
            out[j] = agg(b)
    last = out[~np.isnan(out)][-1]
    out[np.isnan(out)] = last
    return np.round(out, 4)


def _oracle_binarize(seq, onset, offset, pad_on, pad_off, shift):
    segs = []
    speech = False
    start = 0.0
    for i in range(1, len(seq)):
        if speech and seq[i] < offset:
            s, e = max(0.0, start - pad_on), i * shift + pad_off
            if e > s:
                segs.append((s, e))
            speech = False
        elif not speech and seq[i] > onset:
            start = i * shift
            speech = True
    if speech:
        segs.append((max(0.0, start - pad_on), (len(seq) - 1) * shift + pad_off))
    # merge overlaps
    segs.sort()
    merged = []
    for s, e in segs:
        if merged and merged[-1][1] >= s:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return [tuple(m) for m in merged]


@pytest.mark.parametrize("method", ["mean", "median"])
def test_smoothing_matches_oracle(method):
    rng = np.random.default_rng(0)
    frame = rng.uniform(size=200)
    got = smooth_overlap_predictions(frame, method, overlap=0.875,
                                     window_length_in_sec=0.63,
                                     shift_length_in_sec=0.01)
    want = _oracle_smooth(frame, method, 0.875, 0.63, 0.01)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_smoothing_rejects_degenerate_jump():
    with pytest.raises(ValueError):
        smooth_overlap_predictions(np.zeros(10), "mean", overlap=0.99,
                                   window_length_in_sec=0.05)


def test_binarization_matches_oracle():
    rng = np.random.default_rng(1)
    for _ in range(20):
        seq = rng.uniform(size=120)
        pad_on, pad_off = rng.uniform(0, 0.05, size=2)
        got = binarization(seq, onset=0.7, offset=0.4,
                           pad_onset=pad_on, pad_offset=pad_off)
        want = _oracle_binarize(seq, 0.7, 0.4, pad_on, pad_off, 0.01)
        assert got == pytest.approx(want)


def test_binarization_hysteresis():
    # rises above onset at frame 2, dips below offset at frame 6
    seq = np.array([0.0, 0.1, 0.9, 0.6, 0.55, 0.52, 0.2, 0.1])
    segs = binarization(seq, onset=0.8, offset=0.3)
    assert segs == [pytest.approx((0.02, 0.06))]
    # mid values between offset and onset keep the state unchanged
    segs2 = binarization(seq, onset=0.5, offset=0.5)
    assert segs2 == [pytest.approx((0.02, 0.06))]


def test_onset_offset_scales():
    seq = np.linspace(0.2, 0.8, 100)
    on_abs, off_abs = cal_vad_onset_offset("absolute", 0.5, 0.5, seq)
    assert on_abs == off_abs == 0.5
    on_rel, _ = cal_vad_onset_offset("relative", 0.5, 0.5, seq)
    assert on_rel == pytest.approx(0.5, abs=1e-6)
    on_pct, _ = cal_vad_onset_offset("percentile", 0.0, 0.0, seq)
    assert on_pct == pytest.approx(np.nanpercentile(seq, 1))


def test_gap_merge_filter_helpers():
    segs = [(0.0, 1.0), (1.5, 2.0), (2.05, 3.0)]
    assert get_gap_segments(segs) == [pytest.approx((1.0, 1.5)),
                                      pytest.approx((2.0, 2.05))]
    assert merge_overlap_segments([(0, 2), (1, 3), (5, 6)]) == [(0, 3), (5, 6)]
    assert filter_short_segments(segs, 0.6) == [(0.0, 1.0), (2.05, 3.0)]


def test_filtering_orders():
    segs = [(0.0, 0.1), (0.2, 1.0), (1.05, 2.0)]
    # speech-first: drop the 0.1s blip, then bridge the 0.05s gap
    out = filtering(segs, min_duration_on=0.15, min_duration_off=0.1,
                    filter_speech_first=True)
    assert out == [(0.2, 2.0)]
    # gap-first: bridging happens before the blip is dropped; the 0.1s gap
    # between blip and next segment is also < 0.1 -> everything fuses
    out2 = filtering(segs, min_duration_on=0.15, min_duration_off=0.11,
                     filter_speech_first=False)
    assert out2 == [(0.0, 2.0)]


def test_rasterize_roundtrip():
    seq = np.zeros(300)
    seq[50:120] = 1.0
    seq[200:260] = 1.0
    segs = postprocess_frame_predictions(seq, {"onset": 0.5, "offset": 0.5})
    pred = gen_pred_from_speech_segments(segs, len(seq))
    # hysteresis trims exactly the first frame of each run (> onset at i=50
    # means start=0.50s) and ends at the first below-offset frame
    assert pred[55:119].all() and pred[205:259].all()
    assert not pred[:50].any() and not pred[125:200].any()
    table = segments_to_table(segs)
    assert all(lab == "speech" and d > 0 for _, d, lab in table)


def test_detection_error_rate():
    ref = [(0.0, 1.0), (2.0, 3.0)]
    assert detection_error_rate(ref, ref)["DetER"] == 0.0
    m = detection_error_rate([(0.0, 0.5)], ref)
    assert m["MISS"] == pytest.approx(1.5 / 2.0)
    assert m["FA"] == 0.0
    m2 = detection_error_rate([(0.0, 1.0), (2.0, 3.0), (4.0, 5.0)], ref)
    assert m2["FA"] == pytest.approx(0.5)
    assert m2["DetER"] == pytest.approx(0.5)


def test_parameter_grid_and_tuning():
    grid = get_parameter_grid({"onset": [0.3, 0.7], "offset": [0.2],
                               "filter_speech_first": True})
    assert len(grid) == 2 and all(g["filter_speech_first"] for g in grid)

    # ground truth: speech in [0.5s, 1.5s); probs noisy around 0.55 inside
    rng = np.random.default_rng(2)
    seq = np.clip(rng.normal(0.15, 0.05, 200), 0, 1)
    seq[50:150] = np.clip(rng.normal(0.62, 0.05, 100), 0, 1)
    refs = {"utt": [(0.5, 1.5)]}
    preds = {"utt": seq}
    best, scores = tune_thresholds(
        {"onset": [0.4, 0.9], "offset": [0.3, 0.9],
         "pad_onset": [0.0], "pad_offset": [0.01],
         "min_duration_on": [0.1], "min_duration_off": [0.1]},
        preds, refs)
    # only the low onset can detect 0.62-ish speech (0.9 never triggers);
    # offset choice matters less because min_duration_off re-bridges gaps
    assert best["onset"] == 0.4
    assert scores["DetER"] < 0.15


def test_stitch_segmented_transcripts():
    segs = [(0.0, 1.0), (1.5, 2.5), (10.0, 11.0)]
    texts = ["hello", "world", "again"]
    out = stitch_segmented_transcripts(segs, texts, max_gap=1.0)
    assert out == [(0.0, 2.5, "hello world"), (10.0, 11.0, "again")]
