"""Joint ASR + diarization output: speaker-labeled word sequences and
transcripts.

Parity target: `ASR_DIAR_OFFLINE`
(reference `/root/reference/nemo/collections/asr/parts/utils/diarization_utils.py:117`):
- `get_word_dict_seq_list` (:446) — advance through the diarization segments
  as word anchors pass each segment's end; clamp at the last segment.
- `get_word_timestamp_anchor` (:561) — start / end / mid anchor choice.
- `get_speech_labels_from_decoded_prediction` (:186-210) — ASR-based VAD:
  merge word ranges whose gap <= `asr_based_vad_threshold` into speech
  segments.
- `make_json_output` / transcript writing (:467) — per-file dict with a
  speaker-labeled word list and a readable speaker-turn transcript.

Everything is host-side composition of two device products: word timestamps
(`api.ConformerCTC.transcribe_with_timestamps`) and diarization segments
(`decode.diarization.ClusteringDiarizer`). The reference's optional ARPA
realigning LM is not ported (external `arpa` package there; documented gap).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

DiarSegment = Tuple[float, float, str]  # (start_s, end_s, speaker_label)


def word_anchor(start: float, end: float, pos: str = "start",
                offset: float = 0.0) -> float:
    """Reference anchor choice (diarization_utils.py:561-580)."""
    if pos == "start":
        a = start
    elif pos == "end":
        a = end
    elif pos == "mid":
        a = 0.5 * (start + end)
    else:
        raise ValueError("anchor pos must be start|end|mid")
    return a + offset


def assign_words_to_speakers(
    words: Sequence,
    diar_segments: Sequence[DiarSegment],
    anchor_pos: str = "start",
    anchor_offset: float = 0.0,
) -> List[Dict]:
    """Label each word with the diarization speaker whose segment covers its
    anchor (`get_word_dict_seq_list`, diarization_utils.py:446-465: a single
    forward pointer; words past the last segment keep the last speaker).

    `words` are WordTimestamp-like (word/start_s/duration_s attributes).
    """
    out: List[Dict] = []
    if not diar_segments:
        return [
            {"word": w.word, "start_time": round(w.start_s, 2),
             "end_time": round(w.start_s + w.duration_s, 2),
             "speaker_label": "speaker_0"}
            for w in words
        ]
    idx = 0
    for w in words:
        start, end = w.start_s, w.start_s + w.duration_s
        a = word_anchor(start, end, anchor_pos, anchor_offset)
        while idx < len(diar_segments) - 1 and a > diar_segments[idx][1]:
            idx += 1
        out.append({
            "word": w.word,
            "start_time": round(start, 2),
            "end_time": round(end, 2),
            "speaker_label": diar_segments[idx][2],
        })
    return out


def speech_segments_from_words(
    words: Sequence,
    nonspeech_threshold: float = 1.0,
) -> List[Tuple[float, float]]:
    """ASR-based VAD: merge word extents separated by gaps <= threshold
    (`get_speech_labels_from_decoded_prediction`, diarization_utils.py:186)."""
    spans = [[w.start_s, w.start_s + w.duration_s] for w in words]
    i = len(spans) - 1
    while i > 0:
        if spans[i][0] - spans[i - 1][1] <= nonspeech_threshold:
            spans[i - 1] = [spans[i - 1][0], spans[i][1]]
            spans.pop(i)
        i -= 1
    return [(s, e) for s, e in spans]


def speaker_turns(word_dicts: Sequence[Dict]) -> List[Dict]:
    """Group consecutive same-speaker words into turns (the transcript
    grouping of `make_json_output`, diarization_utils.py:467)."""
    turns: List[Dict] = []
    for wd in word_dicts:
        if turns and turns[-1]["speaker_label"] == wd["speaker_label"]:
            turns[-1]["words"].append(wd["word"])
            turns[-1]["end_time"] = wd["end_time"]
        else:
            turns.append({
                "speaker_label": wd["speaker_label"],
                "start_time": wd["start_time"],
                "end_time": wd["end_time"],
                "words": [wd["word"]],
            })
    for t in turns:
        t["text"] = " ".join(t["words"])
    return turns


def format_transcript(turns: Sequence[Dict]) -> str:
    """`[HH:MM:SS.ss - HH:MM:SS.ss] speaker: text` lines."""

    def fmt(t: float) -> str:
        m, s = divmod(max(t, 0.0), 60.0)
        h, m = divmod(int(m), 60)
        return f"{h:02d}:{int(m):02d}:{s:05.2f}"

    return "\n".join(
        f"[{fmt(t['start_time'])} - {fmt(t['end_time'])}] "
        f"{t['speaker_label']}: {t['text']}"
        for t in turns
    )


def transcribe_with_speakers(
    words: Sequence,
    diar_segments: Sequence[DiarSegment],
    anchor_pos: str = "start",
) -> Dict:
    """One-file composition (the per-file body of
    `get_transcript_with_speaker_labels`, diarization_utils.py:400): words +
    diarization -> {"words": [...], "turns": [...], "transcript": str}."""
    word_dicts = assign_words_to_speakers(words, diar_segments, anchor_pos)
    turns = speaker_turns(word_dicts)
    return {"words": word_dicts, "turns": turns,
            "transcript": format_transcript(turns)}
