"""CTC frame alignments, word timestamps, CTM output
(audio_to_ctm_dataset.py + decoder_timestamps_utils.py parity)."""

import numpy as np

from conformer_nemo_tpu.data.tokenizers import CharTokenizer
from conformer_nemo_tpu.decode.timestamps import (
    FrameAlignedToken,
    ctc_frame_alignments,
    ctm_lines,
    words_from_alignments,
    write_ctm,
)

BLANK = 4


def test_frame_alignments_collapse():
    #         c  c  -  a  a  -  -  b  a  (pad pad)
    ids = np.array([[3, 3, BLANK, 1, 1, BLANK, BLANK, 2, 1, 0, 0]])
    lens = np.array([9])
    probs = np.array([[0.9, 0.7, 1.0, 0.5, 0.5, 1.0, 1.0, 0.8, 0.6, 0, 0]])
    units = ctc_frame_alignments(ids, lens, BLANK, probs)[0]
    assert [(u.token_id, u.start_frame, u.length) for u in units] == [
        (3, 0, 2), (1, 3, 2), (2, 7, 1), (1, 8, 1)]
    assert units[0].probability == np.float32(0.8)  # mean of its frames
    # repeated label separated by blank is a NEW token (CTC rule)
    assert units[1].token_id == units[3].token_id == 1


def test_words_and_ctm(tmp_path):
    tok = CharTokenizer([" ", "a", "b", "c"])
    # "ca b" with spaces as separators: tokens c,a,' ',b
    units = [FrameAlignedToken(3, 0, 2, 0.9), FrameAlignedToken(1, 3, 2, 0.5),
             FrameAlignedToken(0, 6, 1, 1.0), FrameAlignedToken(2, 8, 2, 0.8)]
    words = words_from_alignments(units, tok, time_per_frame=0.04)
    assert [(w.word, round(w.start_s, 2), round(w.duration_s, 2)) for w in words] == [
        ("ca", 0.0, 0.2), ("b", 0.32, 0.08)]
    assert words[0].probability == np.float32(0.7)

    lines = ctm_lines("utt1", units, [" ", "a", "b", "c"], 0.04)
    assert lines[0] == "utt1 1 0.000 0.080 c 0.900"
    p = write_ctm(str(tmp_path / "a.ctm"), "utt1", units,
                  [" ", "a", "b", "c"], 0.04)
    assert open(p).read().count("\n") == 4


def test_words_sentencepiece_style():
    class FakeBPE:
        pieces = {5: "▁hel", 6: "lo", 7: "▁wo", 8: "rld"}

        def ids_to_tokens(self, ids):
            return [self.pieces[i] for i in ids]

        def ids_to_text(self, ids):
            return "".join(self.pieces[i] for i in ids).replace("▁", " ")

    units = [FrameAlignedToken(5, 0, 1), FrameAlignedToken(6, 2, 1),
             FrameAlignedToken(7, 5, 1), FrameAlignedToken(8, 7, 2)]
    words = words_from_alignments(units, FakeBPE(), time_per_frame=0.1)
    assert [(w.word, round(w.start_s, 1), round(w.duration_s, 1))
            for w in words] == [("hel lo", 0.0, 0.3), ("wo rld", 0.5, 0.4)] or \
        [w.word for w in words] == ["hello", "world"]
    # the '▁' boundary must split exactly into two words
    assert len(words) == 2 and words[1].start_s == 0.5


def test_api_transcribe_with_timestamps(tmp_path):
    """Contract: one list of WordTimestamps per input file, in input order,
    with frame times scaled by window_stride * subsampling_factor."""
    import json

    import jax.numpy as jnp

    from conformer_nemo_tpu.api import ConformerCTC
    from conformer_nemo_tpu.data.audio_io import write_wav
    from test_api_integration import TINY_CFG

    sr = 16000
    rng = np.random.RandomState(0)
    entries = []
    for i, text in enumerate(["ab", "ba"]):
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, (rng.randn(6400) * 0.1).astype(np.float32), sr)
        entries.append({"audio_filepath": p, "duration": 0.4, "text": text})
    man = str(tmp_path / "m.json")
    with open(man, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    cfgp = str(tmp_path / "cfg.yaml")
    with open(cfgp, "w") as f:
        f.write(TINY_CFG.format(manifest=man, exp_dir=str(tmp_path / "exp")))

    model = ConformerCTC.from_config_file(cfgp, dtype=jnp.float32)
    model.fit(max_epochs=8)
    paths = [e["audio_filepath"] for e in entries]
    ts = model.transcribe_with_timestamps(paths, batch_size=2)
    assert len(ts) == 2
    flat_text = [" ".join(w.word for w in words) for words in ts]
    hyps = model.transcribe(paths, batch_size=2)
    assert flat_text == hyps  # alignment text == greedy transcription
    for words in ts:
        for w in words:
            assert w.start_s >= 0 and w.duration_s >= 0


def test_rnnt_hypotheses_and_word_timestamps(tmp_path):
    """Transducer greedy decode records per-token emission frames
    (reference Hypothesis.timestep) surfaced via return_hypotheses and
    transcribe_with_timestamps."""
    import jax.numpy as jnp
    import numpy as np

    from conformer_nemo_tpu.api import ConformerTransducer, TranscriptionHypothesis
    from conformer_nemo_tpu.data.audio_io import write_wav
    from conformer_nemo_tpu.data.tokenizers import CharTokenizer

    p = str(tmp_path / "u.wav")
    write_wav(p, (0.1 * np.random.RandomState(0).randn(8000)).astype(np.float32), 16000)

    model = ConformerTransducer(
        {"model": {
            "labels": list("ab "), "sample_rate": 16000,
            "preprocessor": {}, "encoder": {"n_layers": 1, "d_model": 32, "n_heads": 2,
                                            "subsampling_conv_channels": 32},
            "decoder": {"prednet": {"pred_hidden": 16}},
            "joint": {"jointnet": {"joint_hidden": 16}},
        }},
        CharTokenizer(list("ab ")), dtype=jnp.float32)
    model.state = model._init_state(model._make_optimizer())

    hyps = model.transcribe([p], batch_size=1, return_hypotheses=True)
    assert isinstance(hyps[0], TranscriptionHypothesis)
    assert hyps[0].timestep is not None
    assert len(hyps[0].timestep) == len(hyps[0].y_sequence)
    # emission frames are non-decreasing and within the encoder length
    ts = hyps[0].timestep
    assert all(a <= b for a, b in zip(ts, ts[1:]))

    out = model.transcribe_with_timestamps([p], batch_size=1)
    assert " ".join(w.word for w in out[0]) == hyps[0].text.strip()
    for w in out[0]:
        assert w.start_s >= 0 and w.duration_s >= 0
