"""Diarization scoring: DER / confusion / FA / MISS with optimal speaker
mapping, plus RTTM read/write helpers.

Parity target: reference `asr/parts/utils/speaker_utils.py` —
`rttm_to_labels` (:279), `labels_to_rttmfile` (:262) and `score_labels`
(:386, pyannote `DiarizationErrorRate(collar=2*collar, skip_overlap=...)` +
`optimal_mapping`). pyannote is an external dependency there; here the same
metric is computed directly with exact interval arithmetic:

  DER = (MISS + FA + CONFUSION) / TOTAL-REFERENCE-SPEECH

over elementary intervals between segment-boundary events, with the
speaker mapping that maximizes ref<->hyp overlap (Hungarian assignment),
a +-collar no-score zone around each reference boundary (pyannote's collar
semantics: total width 2*collar), and optional skipping of reference-overlap
regions (`ignore_overlap`).
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Sequence, Tuple

import numpy as np

Segment = Tuple[float, float, str]  # (start_s, end_s, speaker)


# ---------------------------------------------------------------------------
# RTTM I/O (speaker_utils.py:262-291)
# ---------------------------------------------------------------------------

def rttm_to_segments(path: str) -> List[Segment]:
    """SPEAKER lines -> (start, end, speaker) (rttm_to_labels:279)."""
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split()
            if not parts or parts[0] != "SPEAKER":
                continue
            start, dur, speaker = float(parts[3]), float(parts[4]), parts[7]
            out.append((start, start + dur, speaker))
    return out


def segments_to_rttm(segments: Sequence[Segment], uniq_id: str) -> str:
    """(start, end, speaker) list -> RTTM text (labels_to_rttmfile:262)."""
    lines = []
    for start, end, speaker in segments:
        lines.append(
            f"SPEAKER {uniq_id} 1   {start:.3f}   {end - start:.3f} "
            f"<NA> <NA> {speaker} <NA> <NA>")
    return "\n".join(lines) + ("\n" if lines else "")


def write_rttm(path: str, segments: Sequence[Segment], uniq_id: str) -> str:
    with open(path, "w", encoding="utf-8") as f:
        f.write(segments_to_rttm(segments, uniq_id))
    return path


# ---------------------------------------------------------------------------
# DER
# ---------------------------------------------------------------------------

def _overlap(a: Segment, b: Segment) -> float:
    return max(0.0, min(a[1], b[1]) - max(a[0], b[0]))


def optimal_speaker_mapping(
    ref: Sequence[Segment], hyp: Sequence[Segment]
) -> Dict[str, str]:
    """hyp-speaker -> ref-speaker mapping maximizing total overlap
    (pyannote `optimal_mapping` semantics, used by score_labels:410)."""
    ref_spk = sorted({s for _, _, s in ref})
    hyp_spk = sorted({s for _, _, s in hyp})
    if not ref_spk or not hyp_spk:
        return {}
    cost = np.zeros((len(hyp_spk), len(ref_spk)))
    for (i, hs), (j, rs) in itertools.product(
            enumerate(hyp_spk), enumerate(ref_spk)):
        cost[i, j] = sum(
            _overlap(r, h)
            for r in ref if r[2] == rs
            for h in hyp if h[2] == hs)
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(-cost)
    return {hyp_spk[i]: ref_spk[j] for i, j in zip(rows, cols)
            if cost[i, j] > 0}


def der_score(
    ref: Sequence[Segment],
    hyp: Sequence[Segment],
    collar: float = 0.25,
    ignore_overlap: bool = True,
) -> Dict[str, float]:
    """DER components over elementary intervals (score_labels:386 parity;
    collar has pyannote semantics: a no-score zone of total width 2*collar
    centered on every reference boundary)."""
    mapping = optimal_speaker_mapping(ref, hyp)
    hyp_m = [(s, e, mapping.get(spk, f"__hyp_{spk}")) for s, e, spk in hyp]

    # no-score zones around reference boundaries
    noscore = []
    for s, e, _ in ref:
        noscore.append((s - collar, s + collar))
        noscore.append((e - collar, e + collar))

    points = sorted({p for s, e, _ in list(ref) + hyp_m for p in (s, e)}
                    | {p for z in noscore for p in z})
    miss = fa = conf = total = 0.0
    for a, b in zip(points, points[1:]):
        dur = b - a
        if dur <= 0:
            continue
        mid = 0.5 * (a + b)
        if any(zs < mid < ze for zs, ze in noscore):
            continue
        r = {spk for s, e, spk in ref if s < mid < e}
        h = {spk for s, e, spk in hyp_m if s < mid < e}
        if ignore_overlap and len(r) > 1:
            continue
        total += len(r) * dur
        miss += max(len(r) - len(h), 0) * dur
        fa += max(len(h) - len(r), 0) * dur
        conf += (min(len(r), len(h)) - len(r & h)) * dur
    denom = max(total, 1e-12)
    return {
        "DER": (miss + fa + conf) / denom,
        "CER": conf / denom,
        "FA": fa / denom,
        "MISS": miss / denom,
        "total_speech_s": total,
        "mapping": mapping,
    }


def score_rttm_files(
    pairs: Sequence[Tuple[str, str]],
    collar: float = 0.25,
    ignore_overlap: bool = True,
) -> Dict[str, float]:
    """Cumulative DER over (ref_rttm_path, hyp_rttm_path) pairs — the
    multi-file aggregation of score_labels (errors and totals summed across
    files before dividing)."""
    sums = {"miss": 0.0, "fa": 0.0, "conf": 0.0, "total": 0.0}
    for ref_path, hyp_path in pairs:
        r = der_score(rttm_to_segments(ref_path), rttm_to_segments(hyp_path),
                      collar, ignore_overlap)
        t = r["total_speech_s"]
        sums["miss"] += r["MISS"] * t
        sums["fa"] += r["FA"] * t
        sums["conf"] += r["CER"] * t
        sums["total"] += t
    denom = max(sums["total"], 1e-12)
    return {
        "DER": (sums["miss"] + sums["fa"] + sums["conf"]) / denom,
        "CER": sums["conf"] / denom,
        "FA": sums["fa"] / denom,
        "MISS": sums["miss"] / denom,
        "total_speech_s": sums["total"],
    }
