"""ASR + diarization composition (ASR_DIAR_OFFLINE parity,
diarization_utils.py:117-580)."""

from conformer_nemo_tpu.decode.asr_diar import (
    assign_words_to_speakers,
    format_transcript,
    speaker_turns,
    speech_segments_from_words,
    transcribe_with_speakers,
    word_anchor,
)
from conformer_nemo_tpu.decode.timestamps import WordTimestamp


def W(word, start, dur):
    return WordTimestamp(word, start, dur)


SEGS = [(0.0, 2.0, "speaker_0"), (2.0, 4.0, "speaker_1"),
        (4.0, 6.0, "speaker_0")]


def test_word_anchor_positions():
    assert word_anchor(1.0, 2.0, "start") == 1.0
    assert word_anchor(1.0, 2.0, "end") == 2.0
    assert word_anchor(1.0, 2.0, "mid") == 1.5
    assert word_anchor(1.0, 2.0, "start", offset=0.1) == 1.1


def test_assign_words_forward_pointer():
    words = [W("a", 0.5, 0.3), W("b", 1.8, 0.3), W("c", 2.5, 0.3),
             W("d", 5.0, 0.3), W("e", 7.0, 0.3)]  # e past last segment
    out = assign_words_to_speakers(words, SEGS)
    assert [w["speaker_label"] for w in out] == [
        "speaker_0", "speaker_0", "speaker_1", "speaker_0", "speaker_0"]
    # anchor=end flips the boundary word (1.8+0.3=2.1 > 2.0)
    out_end = assign_words_to_speakers(words, SEGS, anchor_pos="end")
    assert out_end[1]["speaker_label"] == "speaker_1"
    # no segments -> everything speaker_0
    out_none = assign_words_to_speakers(words, [])
    assert {w["speaker_label"] for w in out_none} == {"speaker_0"}


def test_speech_segments_merge():
    words = [W("a", 0.0, 0.5), W("b", 0.7, 0.4), W("c", 3.0, 0.5)]
    # gap a->b = 0.2 <= 0.5 merges; b->c = 1.9 > 0.5 stays split
    segs = speech_segments_from_words(words, nonspeech_threshold=0.5)
    assert segs == [(0.0, 1.1), (3.0, 3.5)]
    # large threshold merges everything
    assert speech_segments_from_words(words, 5.0) == [(0.0, 3.5)]


def test_turns_and_transcript():
    words = [W("hello", 0.5, 0.3), W("there", 1.0, 0.3),
             W("hi", 2.5, 0.2), W("back", 4.5, 0.2)]
    result = transcribe_with_speakers(words, SEGS)
    turns = result["turns"]
    assert [(t["speaker_label"], t["text"]) for t in turns] == [
        ("speaker_0", "hello there"), ("speaker_1", "hi"),
        ("speaker_0", "back")]
    text = result["transcript"]
    assert "[00:00:00.50 - 00:00:01.30] speaker_0: hello there" in text
    assert text == format_transcript(speaker_turns(result["words"]))
