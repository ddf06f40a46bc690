"""Label-task path: datasets (repeat collate, VAD slicing) and the
classification / speaker high-level models end-to-end on synthetic audio."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from conformer_nemo_tpu.api_label import (
    ClassificationModel,
    RegressionModel,
    SpeakerLabelModel,
    matchboxnet_blocks,
)
from conformer_nemo_tpu.data.feature_to_label import (
    FeatureSeqLabelLoader,
    FeatureToSeqSpeakerLabelDataset,
    load_external_feature,
)
from conformer_nemo_tpu.audio.features import MelFeatureConfig
from conformer_nemo_tpu.data.audio_io import write_wav
from conformer_nemo_tpu.data.audio_to_label import (
    AudioToLabelDataset,
    FixedSeqLabelLoader,
    repeat_to_length,
    vad_frame_slices,
)
from conformer_nemo_tpu.models.conv_asr import JasperBlockConfig

SR = 16000


def _tone(f0, seconds, seed=0):
    rs = np.random.RandomState(seed)
    t = np.arange(int(seconds * SR)) / SR
    sig = 0.25 * np.sin(2 * np.pi * f0 * t) + 0.15 * np.sin(2 * np.pi * 2 * f0 * t)
    return (sig + 0.01 * rs.randn(len(t))).astype(np.float32)


@pytest.fixture(scope="module")
def label_manifest(tmp_path_factory):
    """8 utterances, 2 classes distinguished by pitch."""
    root = tmp_path_factory.mktemp("labeldata")
    rows = []
    for i in range(8):
        label = "low" if i % 2 == 0 else "high"
        f0 = 150 if label == "low" else 600
        dur = 0.4 + 0.1 * (i % 3)
        path = str(root / f"utt{i}.wav")
        write_wav(path, _tone(f0, dur, seed=i), SR)
        rows.append({"audio_filepath": path, "duration": dur, "label": label})
    manifest = str(root / "manifest.json")
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return manifest


def test_repeat_to_length():
    sig = np.arange(5, dtype=np.float32)
    out = repeat_to_length(sig, 12)
    # repeat=2 full copies + last 2 samples (reference repeat_signal tail rule)
    np.testing.assert_array_equal(out, [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 3, 4])
    np.testing.assert_array_equal(repeat_to_length(sig, 3), [0, 1, 2])


def test_label_dataset_and_loader(label_manifest):
    ds = AudioToLabelDataset(label_manifest, sample_rate=SR)
    assert ds.labels == ["high", "low"]  # sorted unique
    wav, lab = ds[0]
    assert lab == ds.label2id["low"]
    loader = FixedSeqLabelLoader(ds, batch_size=4, fixed_seconds=1.0)
    batches = list(loader)
    assert len(batches) == 2
    audio, lens, labels, n = batches[0]
    assert audio.shape == (4, SR) and n == 4
    assert (lens == SR).all()
    # short signals were repeated, not zero padded
    assert np.abs(audio).min(axis=1).max() >= 0  # no structural guarantee, but:
    assert (np.abs(audio) > 1e-4).mean() > 0.9


def test_vad_frame_slices():
    sig = np.ones(SR, np.float32)
    slices = vad_frame_slices(sig, SR, window_sec=0.31, shift_sec=0.01)
    win = int(0.31 * SR)
    assert slices.shape[1] == win
    # reference slice count: (len + win - win) // shift = len // shift
    assert slices.shape[0] == SR // int(0.01 * SR)
    # first slice starts with the zero-extension half-window
    assert (slices[0, : win // 2] == 0).all()


def _small_blocks():
    return [
        JasperBlockConfig(filters=32, repeat=1, kernel=11, stride=2,
                          residual=False, separable=True),
        JasperBlockConfig(filters=32, repeat=1, kernel=13, residual=True,
                          separable=True),
        JasperBlockConfig(filters=64, repeat=1, kernel=1, residual=False),
    ]


def test_classification_model_e2e(label_manifest, tmp_path):
    model = ClassificationModel(
        labels=["high", "low"], mel=MelFeatureConfig(features=32),
        blocks=_small_blocks(),
    )
    result = model.fit(label_manifest, max_steps=40, batch_size=8,
                       fixed_seconds=1.0, lr=3e-3, log_every_n_steps=10)
    assert result["steps"] == 40
    metrics = model.evaluate(label_manifest, batch_size=8, fixed_seconds=1.0)
    assert metrics["top1"] == 1.0

    # predict returns label strings, in input order
    ds = AudioToLabelDataset(label_manifest, sample_rate=SR)
    paths = [s.audio_file for s in ds.samples]
    preds = model.predict(paths, fixed_seconds=1.0)
    truth = [s.label for s in ds.samples]
    assert preds == truth
    lp = model.predict(paths[:2], fixed_seconds=1.0, logprobs=True)
    assert lp[0].shape == (2,)

    # portable save/restore keeps predictions
    p = str(tmp_path / "cls.cntpu")
    model.save_portable(p)
    restored = ClassificationModel.restore_portable(
        p, blocks=_small_blocks())
    assert restored.predict(paths, fixed_seconds=1.0) == truth


def test_classification_change_labels(label_manifest):
    model = ClassificationModel(
        labels=["high", "low"], mel=MelFeatureConfig(features=32),
        blocks=_small_blocks(),
    )
    model.fit(label_manifest, max_steps=5, batch_size=8, fixed_seconds=1.0)
    old_enc = model.state.params["encoder"]
    model.change_labels(["a", "b", "c"])
    assert model.net.dec_cfg.num_classes == 3
    # encoder kept, head reinitialized
    leaves_old = jnp.concatenate([x.ravel() for x in
                                  __import__("jax").tree.leaves(old_enc)])
    leaves_new = jnp.concatenate([x.ravel() for x in
                                  __import__("jax").tree.leaves(
                                      model.state.params["encoder"])])
    assert np.allclose(np.asarray(leaves_old), np.asarray(leaves_new))


def test_speaker_model_e2e(label_manifest, tmp_path):
    model = SpeakerLabelModel(
        labels=["high", "low"], mel=MelFeatureConfig(features=32),
        filters=(32, 32, 32, 64), kernel_sizes=(5, 3, 3, 1),
        dilations=(1, 2, 3, 1), scale=4, emb_sizes=(16,),
        pool_mode="attention", angular=True,
    )
    result = model.fit(label_manifest, max_steps=40, batch_size=8,
                       fixed_seconds=1.0, lr=3e-3)
    assert model.evaluate(label_manifest, batch_size=8,
                          fixed_seconds=1.0)["top1"] == 1.0

    ds = AudioToLabelDataset(label_manifest, sample_rate=SR)
    low = [s.audio_file for s in ds.samples if s.label == "low"]
    high = [s.audio_file for s in ds.samples if s.label == "high"]
    emb = model.get_embedding(low[0])
    assert emb.shape == (16,)

    def cos(a, b):
        a, b = a / np.linalg.norm(a), b / np.linalg.norm(b)
        return float(a @ b)

    same = cos(model.get_embedding(low[0]), model.get_embedding(low[1]))
    diff = cos(model.get_embedding(low[0]), model.get_embedding(high[0]))
    assert same > diff
    assert model.verify_speakers(low[0], low[1],
                                 threshold=(diff + 1) / 2 + 1e-6)

    embs, logits, labels, id2label = model.get_batch_embeddings(
        label_manifest, batch_size=8, fixed_seconds=1.0)
    assert embs.shape == (8, 16) and logits.shape == (8, 2)
    assert set(id2label.values()) == {"high", "low"}


def test_neural_vad_pipeline(tmp_path):
    """vad_frame_probs + decode.vad postprocessing finds the speech region
    of a composite waveform (generate_vad_frame_pred parity, array-level)."""
    from conformer_nemo_tpu.decode.vad import postprocess_frame_predictions

    rs = np.random.RandomState(7)
    rows = []
    for i in range(8):
        label = "background" if i % 2 == 0 else "speech"
        if label == "speech":
            sig = _tone(350, 0.7, seed=i)
        else:
            sig = (0.005 * rs.randn(int(0.7 * SR))).astype(np.float32)
        path = str(tmp_path / f"v{i}.wav")
        write_wav(path, sig, SR)
        rows.append({"audio_filepath": path, "duration": 0.7, "label": label})
    manifest = str(tmp_path / "vad.json")
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    model = ClassificationModel(
        labels=["background", "speech"], mel=MelFeatureConfig(features=32),
        blocks=_small_blocks(),
    )
    model.fit(manifest, max_steps=30, batch_size=8, fixed_seconds=0.63,
              lr=3e-3)

    # 0.8s noise | 1.2s tone | 0.8s noise
    wav = np.concatenate([
        (0.005 * rs.randn(int(0.8 * SR))).astype(np.float32),
        _tone(350, 1.2, seed=3),
        (0.005 * rs.randn(int(0.8 * SR))).astype(np.float32),
    ])
    probs = model.vad_frame_probs(wav, shift_length_in_sec=0.02)
    assert probs.shape[0] == (len(wav) - int(0.63 * SR)) // int(0.02 * SR) + 1
    segs = postprocess_frame_predictions(
        probs, {"onset": 0.5, "offset": 0.4, "min_duration_on": 0.2,
                "min_duration_off": 0.2}, shift_length_in_sec=0.02)
    assert len(segs) == 1
    s, e = segs[0]
    # window is left-aligned so detection begins once the window overlaps
    # the tone substantially; allow the 0.63s window of slack
    assert 0.2 <= s <= 1.2 and 1.15 <= e <= 2.3 and e - s >= 0.3

    # adapter form used by ClusteringDiarizer(vad=...)
    vad_fn = model.as_vad_callable(
        {"onset": 0.5, "offset": 0.4, "min_duration_on": 0.2,
         "min_duration_off": 0.2}, shift_length_in_sec=0.02)
    segs2 = vad_fn(wav, SR)
    assert segs2 == segs


def test_regression_model_e2e(tmp_path):
    """EncDecRegressionModel parity: float targets, MSE loss, MSE/MAE eval,
    predict() -> floats (classification_models.py:628-755)."""
    rows = []
    for i in range(8):
        f0 = 150 if i % 2 == 0 else 600
        target = 0.0 if i % 2 == 0 else 1.0
        path = str(tmp_path / f"r{i}.wav")
        write_wav(path, _tone(f0, 0.5, seed=i), SR)
        rows.append({"audio_filepath": path, "duration": 0.5, "target": target})
    manifest = str(tmp_path / "reg.json")
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    model = RegressionModel(mel=MelFeatureConfig(features=32),
                            blocks=_small_blocks())
    result = model.fit(manifest, max_steps=60, batch_size=8,
                       fixed_seconds=0.5, lr=3e-3, log_every_n_steps=10)
    assert result["steps"] == 60
    metrics = model.evaluate(manifest, batch_size=8, fixed_seconds=0.5)
    assert set(metrics) == {"mse", "mae"}
    assert metrics["mse"] < 0.05

    preds = model.predict([r["audio_filepath"] for r in rows],
                          fixed_seconds=0.5)
    assert all(isinstance(p, float) for p in preds)
    for p, r in zip(preds, rows):
        assert abs(p - r["target"]) < 0.35

    # portable roundtrip
    p = str(tmp_path / "reg.cntpu")
    model.save_portable(p)
    restored = RegressionModel.restore_portable(p, blocks=_small_blocks())
    preds2 = restored.predict([rows[0]["audio_filepath"]], fixed_seconds=0.5)
    assert abs(preds2[0] - preds[0]) < 1e-5


def test_feature_to_seq_speaker_label_dataset(tmp_path):
    """FeatureToSeqSpeakerLabelDataset parity: npy/npz/int loading, sorted
    label table, stack collate (feature_to_label.py:24-139)."""
    rng = np.random.RandomState(0)
    rows = []
    for i in range(4):
        feats = rng.randn(10, 6).astype(np.float32)
        path = str(tmp_path / f"f{i}.npy")
        np.save(path, feats)
        rows.append({"feature_filepath": path,
                     "seq_label": " ".join(["spkA", "spkB"][j % 2]
                                           for j in range(i, i + 5))})
    manifest = str(tmp_path / "feat.json")
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    ds = FeatureToSeqSpeakerLabelDataset(manifest)
    assert ds.labels == ["spkA", "spkB"]
    feats, flen, ids, ilen = ds[0]
    assert feats.shape == (10, 6) and flen == 10
    assert ids.tolist() == [0, 1, 0, 1, 0] and ilen == 5

    loader = FeatureSeqLabelLoader(ds, batch_size=2)
    batches = list(loader)
    assert len(batches) == 2
    bf, bfl, bt, btl = batches[0]
    assert bf.shape == (2, 10, 6) and bt.shape == (2, 5)
    assert (bfl == 10).all() and (btl == 5).all()

    # integer features scale to [-1, 1]; npz round-trips
    ints = (rng.randn(4, 3) * 1000).astype(np.int16)
    pi = str(tmp_path / "int.npy")
    np.save(pi, ints)
    scaled = load_external_feature(pi)
    np.testing.assert_allclose(scaled, ints.astype(np.float32) / 2 ** 15)
    pz = str(tmp_path / "z.npz")
    np.savez(pz, feats=np.ones((2, 2), np.float32))
    np.testing.assert_array_equal(load_external_feature(pz), np.ones((2, 2)))
