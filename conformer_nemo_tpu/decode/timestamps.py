"""CTC time alignments: token/word timestamps and CTM output.

Parity targets:
- `FrameCtmUnit` / `ASRCTMPredictionWriter`
  (reference `/root/reference/nemo/collections/asr/data/audio_to_ctm_dataset.py:26-80`):
  CTM line format `<utt> <channel> <start_s> <dur_s> <label> <prob>`.
- `WERBPE_TS.ctc_decoder_predictions_tensor_with_ts`
  (`/root/reference/nemo/collections/asr/parts/utils/decoder_timestamps_utils.py:69`):
  greedy CTC collapse that keeps the FRAME INDEX where each new token first
  appears, then groups tokens into words.

All host-side NumPy over device-produced log-probs/argmax ids; the device
work is the model forward.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class FrameAlignedToken:
    """One emitted token with frame-level extent (FrameCtmUnit parity)."""

    token_id: int
    start_frame: int
    length: int
    probability: float = 1.0

    @property
    def end_frame(self) -> int:
        return self.start_frame + self.length


def ctc_frame_alignments(
    pred_ids: np.ndarray,
    lengths: np.ndarray,
    blank_id: int,
    probs: Optional[np.ndarray] = None,
) -> List[List[FrameAlignedToken]]:
    """Greedy CTC collapse keeping frame extents.

    pred_ids: [B, T] per-frame argmax ids; lengths: [B] valid frames;
    probs: optional [B, T] per-frame max softmax probability (token
    probability = mean over its frames, matching the CTM writer's
    per-unit probability).

    A token's extent runs from the first frame it appears on through its
    repeats (the collapse-repeats-then-drop-blank rule of
    `WER.ctc_decoder_predictions_tensor`, metrics/wer.py:127, augmented with
    the first-frame bookkeeping of decoder_timestamps_utils.py:69).
    """
    out: List[List[FrameAlignedToken]] = []
    for b in range(pred_ids.shape[0]):
        row = pred_ids[b, : int(lengths[b])]
        units: List[FrameAlignedToken] = []
        prev = blank_id
        for t, tok in enumerate(row):
            tok = int(tok)
            if tok != blank_id and tok != prev:
                units.append(FrameAlignedToken(tok, t, 1))
            elif tok != blank_id and tok == prev and units:
                units[-1].length += 1
            prev = tok
        if probs is not None:
            for u in units:
                u.probability = float(
                    np.mean(probs[b, u.start_frame : u.end_frame]))
        out.append(units)
    return out


@dataclasses.dataclass
class WordTimestamp:
    word: str
    start_s: float
    duration_s: float
    probability: float = 1.0


def words_from_alignments(
    units: Sequence[FrameAlignedToken],
    tokenizer,
    time_per_frame: float,
) -> List[WordTimestamp]:
    """Group token units into words (the grouping rule of
    decoder_timestamps_utils.py:102-115): a SentencePiece '▁'-prefixed token
    starts a new word; a pure-space token (char tokenizers) is a separator.
    Word start/end = frame extent of its first/last token."""
    words: List[WordTimestamp] = []
    cur: List[FrameAlignedToken] = []

    def flush():
        if not cur:
            return
        text = tokenizer.ids_to_text([u.token_id for u in cur]).strip()
        if text:
            start = cur[0].start_frame * time_per_frame
            end = cur[-1].end_frame * time_per_frame
            prob = float(np.mean([u.probability for u in cur]))
            words.append(WordTimestamp(text, start, end - start, prob))
        cur.clear()

    tokens = tokenizer.ids_to_tokens([u.token_id for u in units])
    for u, tok in zip(units, tokens):
        if tok.strip() in ("", "▁"):  # separator token
            flush()
            continue
        if tok.startswith("▁") or tok.startswith(" "):
            flush()
        cur.append(u)
    flush()
    return words


def ctm_lines(
    utt_name: str,
    units: Sequence[FrameAlignedToken],
    labels: Sequence[str],
    time_per_frame: float,
    channel: int = 1,
) -> List[str]:
    """CTM serialization (`FrameCtmUnit.to_ctm_str` + writer loop,
    audio_to_ctm_dataset.py:42-64):
    `<utt> <channel> <start_s> <dur_s> <label> <prob>`."""
    out = []
    for u in units:
        label = labels[u.token_id] if u.token_id < len(labels) else str(u.token_id)
        out.append(
            f"{utt_name} {channel} {u.start_frame * time_per_frame:.3f} "
            f"{u.length * time_per_frame:.3f} {label} {u.probability:1.3f}")
    return out


def write_ctm(path: str, utt_name: str, units, labels, time_per_frame: float):
    with open(path, "w", encoding="utf-8") as f:
        for line in ctm_lines(utt_name, units, labels, time_per_frame):
            f.write(line + "\n")
    return path
