"""NME-SC clustering + diarization pipeline.

Oracles: synthetic Gaussian speaker clusters (clustering must recover them
and the eigengap must count them), synthetic two-speaker audio for the
pipeline end-to-end.
"""

import json

import numpy as np
import pytest

from conformer_nemo_tpu.decode.diarization import (
    ClusteringDiarizer,
    NMESC,
    affinity_graph,
    cos_affinity_matrix,
    energy_vad,
    estimate_num_speakers,
    is_fully_connected,
    merge_labeled_segments,
    nme_spectral_clustering,
    sliding_window_segments,
    spectral_cluster,
    to_rttm,
)


def _clusters(k, n_per, dim=16, sep=6.0, seed=0):
    rs = np.random.RandomState(seed)
    centers = rs.randn(k, dim) * sep
    embs, labels = [], []
    for i in range(k):
        embs.append(centers[i] + rs.randn(n_per, dim))
        labels += [i] * n_per
    return np.vstack(embs), np.array(labels)


def _cluster_accuracy(pred, truth):
    """Best-permutation accuracy (small k)."""
    from itertools import permutations

    k = max(truth) + 1
    best = 0.0
    for perm in permutations(range(max(pred.max() + 1, k))):
        mapped = np.array([perm[p] for p in pred])
        best = max(best, float((mapped == truth).mean()))
    return best


def test_cos_affinity_range():
    emb, _ = _clusters(2, 10)
    mat = cos_affinity_matrix(emb)
    assert mat.shape == (20, 20)
    assert mat.min() >= 0.0 and mat.max() <= 1.0 + 1e-9


def test_affinity_graph_symmetric_connected():
    emb, _ = _clusters(3, 15)
    mat = cos_affinity_matrix(emb)
    # p > cluster size forces cross-cluster edges -> connected
    g = affinity_graph(mat, 16)
    assert np.allclose(g, g.T)
    assert is_fully_connected(g)
    # p=1 on well-separated clusters: disconnected
    g1 = affinity_graph(mat, 1)
    assert not is_fully_connected(g1)


@pytest.mark.parametrize("k", [2, 3, 4])
def test_eigengap_counts_speakers(k):
    emb, _ = _clusters(k, 20, seed=k)
    g = affinity_graph(cos_affinity_matrix(emb), 12)
    est, _, _ = estimate_num_speakers(g, max_num_speakers=8)
    assert est == k


def test_nmesc_and_spectral_recover_clusters():
    emb, truth = _clusters(3, 25, seed=1)
    mat = cos_affinity_matrix(emb)
    k, p_hat = NMESC(mat, max_num_speakers=8).analyze()
    assert k == 3
    labels = spectral_cluster(affinity_graph(mat, p_hat), k)
    assert _cluster_accuracy(labels, truth) == 1.0


def test_nme_spectral_clustering_end_to_end():
    # large-N path (no enhanced counting)
    emb, truth = _clusters(2, 50, seed=2)
    labels = nme_spectral_clustering(emb, enhanced_count_thres=10)
    assert _cluster_accuracy(labels, truth) == 1.0
    # oracle speaker count respected
    labels = nme_spectral_clustering(emb, oracle_num_speakers=2)
    assert len(set(labels.tolist())) == 2
    # single segment
    assert nme_spectral_clustering(np.ones((1, 8))).tolist() == [0]
    # short-recording path (anchor-enhanced counting)
    emb, truth = _clusters(2, 10, seed=3)
    labels = nme_spectral_clustering(emb)
    assert _cluster_accuracy(labels, truth) == 1.0


def test_sliding_window_and_merge():
    segs = sliding_window_segments([(0.0, 4.0)], window=1.5, shift=0.75)
    assert segs[0] == (0.0, 1.5)
    assert abs(segs[1][0] - 0.75) < 1e-9
    assert segs[-1][1] <= 4.0 + 1e-9
    merged = merge_labeled_segments(segs, [0] * (len(segs) - 1) + [1])
    # same-speaker overlapping windows collapse into one turn + final turn
    assert len(merged) == 2
    assert merged[0][2] == 0 and merged[1][2] == 1
    assert abs(merged[0][0] - 0.0) < 1e-9 and abs(merged[-1][1] - 4.0) < 1e-9
    rttm = to_rttm(merged, "session0")
    assert rttm.startswith("SPEAKER session0 1 0.000")
    assert "speaker_1" in rttm


def test_energy_vad():
    sr = 16000
    wav = np.zeros(3 * sr, np.float32)
    t = np.arange(sr) / sr
    wav[sr : 2 * sr] = 0.5 * np.sin(2 * np.pi * 220 * t)
    regions = energy_vad(wav, sr)
    assert len(regions) == 1
    a, b = regions[0]
    assert abs(a - 1.0) < 0.1 and abs(b - 2.0) < 0.1


def test_clustering_diarizer_pipeline(tmp_path):
    """Two synthetic 'speakers' alternating turns; the pipeline must find 2
    speakers and segment boundaries near the truth."""
    import jax.numpy as jnp

    from conformer_nemo_tpu.api_label import SpeakerLabelModel
    from conformer_nemo_tpu.audio.features import MelFeatureConfig
    from conformer_nemo_tpu.data.audio_io import write_wav

    sr = 16000
    rs = np.random.RandomState(0)

    def spk(f0, seconds, seed):
        t = np.arange(int(seconds * sr)) / sr
        return (0.3 * np.sin(2 * np.pi * f0 * t)
                + 0.15 * np.sin(2 * np.pi * 2 * f0 * t)
                + 0.01 * np.random.RandomState(seed).randn(len(t))).astype(np.float32)

    # train a tiny speaker model on the two voices
    rows = []
    for i in range(8):
        label = "A" if i % 2 == 0 else "B"
        f0 = 140 if label == "A" else 520
        p = str(tmp_path / f"tr{i}.wav")
        write_wav(p, spk(f0, 0.8, i), sr)
        rows.append({"audio_filepath": p, "duration": 0.8, "label": label})
    manifest = str(tmp_path / "m.json")
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    model = SpeakerLabelModel(
        labels=["A", "B"], mel=MelFeatureConfig(features=32),
        filters=(32, 32, 32, 64), kernel_sizes=(5, 3, 3, 1),
        dilations=(1, 2, 3, 1), scale=4, emb_sizes=(16,),
        pool_mode="attention", angular=True)
    model.fit(manifest, max_steps=40, batch_size=8, fixed_seconds=0.8, lr=3e-3)

    # session: A(3s) B(3s) A(3s)
    session = np.concatenate([spk(140, 3, 100), spk(520, 3, 101), spk(140, 3, 102)])
    sess_path = str(tmp_path / "session.wav")
    write_wav(sess_path, session, sr)

    diar = ClusteringDiarizer(model, window=1.5, shift=0.75)
    turns = diar.diarize(sess_path, oracle_num_speakers=2,
                         speech_regions=[(0.0, 9.0)])
    assert len(turns) >= 2
    assert set(t[2] for t in turns) == {0, 1}
    # the dominant label of [0,3] and [3,6] must differ
    def label_at(ts):
        for a, b, l in turns:
            if a <= ts < b:
                return l
        return None
    assert label_at(1.5) == label_at(7.5)
    assert label_at(1.5) != label_at(4.5)
    rttm = to_rttm(turns, "sess")
    assert rttm.count("SPEAKER") == len(turns)
