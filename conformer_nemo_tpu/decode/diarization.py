"""Speaker diarization: NME-SC clustering + a clustering-diarizer pipeline.

Parity targets:
- NME-SC (NME spectral clustering) — reference
  `/root/reference/nemo/collections/asr/parts/utils/nmesc_clustering.py`:
  min-max-scaled cosine affinity (:274), top-p binarized + symmetrized graph
  (:85-105), unnormalized Laplacian eigengap speaker-count estimate
  (:284-333), p-value search minimizing g_p = (p/N)/max_eigengap (:529-556),
  subsampling for the NME analysis (:503), anchor-embedding enhanced count
  for short recordings (:209-272), spectral embedding + k-means (:336-366),
  `COSclustering` orchestration (:578-676).
- `ClusteringDiarizer` — reference
  `asr/models/clustering_diarizer.py` (VAD -> sliding-window segmentation ->
  speaker embeddings -> clustering -> RTTM).

Design: clustering is host-side NumPy (eigendecompositions of a few-hundred-
row Laplacian — not a TPU-shaped problem); the only device work is the
batched speaker-embedding extraction, which reuses `SpeakerLabelModel`.
Single-scale embeddings (the 1.8-era default); multi-scale fusion is out of
scope and documented here.
"""

from __future__ import annotations

import dataclasses
from collections import Counter
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# affinity graph helpers
# ---------------------------------------------------------------------------

def cos_affinity_matrix(emb: np.ndarray) -> np.ndarray:
    """Cosine similarity, then per-column min-max scaling to [0, 1]
    (getCosAffinityMatrix — sklearn MinMaxScaler semantics)."""
    normed = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    sim = normed @ normed.T
    lo, hi = sim.min(axis=0, keepdims=True), sim.max(axis=0, keepdims=True)
    return (sim - lo) / np.maximum(hi - lo, 1e-12)


def binarize_top_p(affinity: np.ndarray, p_value: int) -> np.ndarray:
    """Keep each COLUMN's top-p entries (getKneighborsConnections sets
    `binarized[indices, i] = 1` for row i's top indices)."""
    n = affinity.shape[0]
    out = np.zeros_like(affinity)
    top = np.argsort(-affinity, axis=1)[:, : max(p_value, 1)]
    rows = np.repeat(np.arange(n), top.shape[1])
    out[top.ravel(), rows] = 1.0
    return out


def affinity_graph(affinity: np.ndarray, p_value: int) -> np.ndarray:
    """Symmetrized binarized graph (getAffinityGraphMat)."""
    x = binarize_top_p(affinity, p_value)
    return 0.5 * (x + x.T)


def is_fully_connected(affinity: np.ndarray) -> bool:
    n = affinity.shape[0]
    reached = np.zeros(n, bool)
    frontier = np.zeros(n, bool)
    frontier[0] = True
    while True:
        new = reached | frontier
        if new.sum() == reached.sum():
            break
        reached = new
        frontier = (affinity[frontier].sum(axis=0) > 0) & ~reached
        if not frontier.any():
            break
    return bool(reached.sum() == n)


def laplacian(affinity: np.ndarray) -> np.ndarray:
    a = affinity.copy()
    np.fill_diagonal(a, 0.0)
    return np.diag(np.abs(a).sum(axis=1)) - a


def estimate_num_speakers(
    affinity: np.ndarray, max_num_speakers: int
) -> Tuple[int, np.ndarray, np.ndarray]:
    """Eigengap estimate on the unnormalized Laplacian
    (estimateNumofSpeakers)."""
    lambdas = np.sort(np.real(np.linalg.eigvalsh(laplacian(affinity))))
    gaps = lambdas[1:] - lambdas[:-1]
    k = int(np.argmax(gaps[: min(max_num_speakers, len(gaps))])) + 1
    return k, lambdas, gaps


# ---------------------------------------------------------------------------
# NMESC
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class NMESC:
    """p-value search minimizing g_p (NMESC class, nmesc_clustering.py:369)."""

    mat: np.ndarray
    max_num_speakers: int = 8
    max_rp_threshold: float = 0.25
    sparse_search: bool = True
    sparse_search_volume: int = 30
    fixed_thres: Optional[float] = None
    nme_mat_size: int = 300
    eps: float = 1e-10

    def analyze(self) -> Tuple[int, int]:
        """-> (estimated num speakers, p_hat for the FULL matrix)."""
        full_n = self.mat.shape[0]
        mat = self.mat
        subsample_ratio = 1
        if self.nme_mat_size and full_n > self.nme_mat_size:
            subsample_ratio = int(max(1, full_n / self.nme_mat_size))
            mat = mat[::subsample_ratio, ::subsample_ratio]

        p_values, max_n = self._p_value_list(mat.shape[0])
        best_gp, best_p, best_k = np.inf, p_values[0], 1
        est_by_p = {}
        for p in p_values:
            k, g_p = self._eig_ratio(mat, p)
            est_by_p[p] = k
            if g_p < best_gp:
                best_gp, best_p, best_k = g_p, p, k

        graph = affinity_graph(mat, best_p)
        if not is_fully_connected(graph):
            # add connections until connected (getMinimumConnection)
            for p in p_values:
                graph = affinity_graph(mat, p)
                if is_fully_connected(graph) or p > max_n:
                    best_p = p
                    break
            best_k = est_by_p.get(best_p, best_k)
        return best_k, int(subsample_ratio * best_p)

    def _p_value_list(self, n: int) -> Tuple[List[int], int]:
        if self.fixed_thres:
            p = max(int(n * self.fixed_thres), 1)
            return [p], p
        max_n = max(int(n * self.max_rp_threshold), 2)
        if self.sparse_search:
            count = min(max_n, self.sparse_search_volume)
            ps = np.unique(np.linspace(1, max_n, count, endpoint=True).astype(int))
            return list(ps), max_n
        return list(range(1, max_n)), max_n

    def _eig_ratio(self, mat: np.ndarray, p_neighbors: int) -> Tuple[int, float]:
        graph = affinity_graph(mat, p_neighbors)
        k, lambdas, gaps = estimate_num_speakers(graph, self.max_num_speakers)
        max_gap = np.max(gaps[: self.max_num_speakers]) / (lambdas.max() + self.eps)
        g_p = (p_neighbors / mat.shape[0]) / (max_gap + self.eps)
        return k, g_p


def _kmeans(x: np.ndarray, k: int, n_init: int = 10, seed: int = 0,
            iters: int = 100) -> np.ndarray:
    """Lloyd k-means with k-means++ init and n_init restarts (host NumPy)."""
    rs = np.random.RandomState(seed)
    best_labels, best_inertia = None, np.inf
    for _ in range(n_init):
        centers = [x[rs.randint(len(x))]]
        for _ in range(1, k):
            d2 = np.min(
                [np.sum((x - c) ** 2, axis=1) for c in centers], axis=0)
            probs = d2 / max(d2.sum(), 1e-12)
            centers.append(x[rs.choice(len(x), p=probs)])
        c = np.stack(centers)
        for _ in range(iters):
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            labels = d.argmin(axis=1)
            new_c = np.stack([
                x[labels == j].mean(axis=0) if (labels == j).any() else c[j]
                for j in range(k)])
            if np.allclose(new_c, c):
                break
            c = new_c
        inertia = float(((x - c[labels]) ** 2).sum())
        if inertia < best_inertia:
            best_inertia, best_labels = inertia, labels
    return best_labels


def spectral_cluster(affinity: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    """First-k Laplacian eigenvectors -> k-means (_SpectralClustering)."""
    _, vecs = np.linalg.eigh(laplacian(affinity))
    emb = vecs[:, :k]
    return _kmeans(emb, k, seed=seed)


def _enhanced_speaker_count(
    emb: np.ndarray, random_test_count: int = 5, anchor_spk_n: int = 3,
    anchor_sample_n: int = 10, sigma: float = 50.0,
) -> int:
    """Anchor-embedding speaker counting for short recordings
    (getEnhancedSpeakerCount / addAnchorEmb)."""
    estimates = []
    emb_dim = emb.shape[1]
    std_org = np.std(emb, axis=0)
    for seed in range(random_test_count):
        rs = np.random.RandomState(seed)
        blocks = []
        for _ in range(anchor_spk_n):
            mean = np.tile(rs.randn(1, emb_dim), (anchor_sample_n, 1))
            noise = rs.randn(anchor_sample_n, emb_dim).T
            noise = (np.diag(std_org) @ (noise / np.max(np.abs(noise)))).T
            blocks.append(mean + sigma * noise)
        blocks.append(emb)
        aug = np.vstack(blocks)
        nmesc = NMESC(cos_affinity_matrix(aug), max_num_speakers=emb.shape[0])
        k, _ = nmesc.analyze()
        estimates.append(k)
    common = Counter(estimates).most_common(1)[0][0]
    return max(common - anchor_spk_n, 1)


def nme_spectral_clustering(
    embeddings: np.ndarray,
    oracle_num_speakers: Optional[int] = None,
    max_num_speakers: int = 8,
    min_samples_for_nmesc: int = 6,
    enhanced_count_thres: int = 80,
    max_rp_threshold: float = 0.25,
    sparse_search_volume: int = 30,
    fixed_thres: Optional[float] = None,
    seed: int = 0,
) -> np.ndarray:
    """Cluster speaker embeddings [N, D] -> labels [N] (COSclustering)."""
    emb = np.asarray(embeddings, np.float64)
    n = emb.shape[0]
    if n == 1:
        return np.array([0])

    est_enhanced = None
    if n <= max(enhanced_count_thres, min_samples_for_nmesc) and \
            oracle_num_speakers is None:
        est_enhanced = _enhanced_speaker_count(emb)

    if oracle_num_speakers:
        max_num_speakers = oracle_num_speakers

    mat = cos_affinity_matrix(emb)
    nmesc = NMESC(
        mat, max_num_speakers=max_num_speakers,
        max_rp_threshold=max_rp_threshold,
        sparse_search_volume=sparse_search_volume, fixed_thres=fixed_thres)

    if n > min_samples_for_nmesc:
        est_k, p_hat = nmesc.analyze()
        affinity = affinity_graph(mat, p_hat)
    else:
        est_k, affinity = 1, mat

    if oracle_num_speakers:
        est_k = oracle_num_speakers
    elif est_enhanced:
        est_k = est_enhanced

    return spectral_cluster(affinity, max(est_k, 1), seed=seed)


# ---------------------------------------------------------------------------
# diarization pipeline
# ---------------------------------------------------------------------------

def energy_vad(
    wav: np.ndarray, sr: int, frame_sec: float = 0.05,
    threshold_db: float = -40.0, min_speech_sec: float = 0.2,
    floor_db: float = -55.0,
) -> List[Tuple[float, float]]:
    """Simple energy VAD -> speech regions [(start_s, end_s)]. Stand-in for
    the reference's MarbleNet VAD stage (oracle regions or a trained
    ClassificationModel can be passed to `ClusteringDiarizer.diarize`).

    `floor_db` is an absolute gate so silence-only input yields no regions
    (a purely relative threshold marks everything as speech)."""
    frame = max(int(frame_sec * sr), 1)
    n = len(wav) // frame
    if n == 0:
        return []
    e = (wav[: n * frame].reshape(n, frame) ** 2).mean(axis=1)
    db = 10 * np.log10(e + 1e-12)
    ref = db.max()
    speech = (db > (ref + threshold_db)) & (db > floor_db)
    regions, start = [], None
    for i, s in enumerate(speech):
        if s and start is None:
            start = i
        elif not s and start is not None:
            regions.append((start * frame_sec, i * frame_sec))
            start = None
    if start is not None:
        regions.append((start * frame_sec, n * frame_sec))
    return [(a, b) for a, b in regions if b - a >= min_speech_sec]


def sliding_window_segments(
    regions: Sequence[Tuple[float, float]], window: float = 1.5,
    shift: float = 0.75,
) -> List[Tuple[float, float]]:
    """Split speech regions into overlapping windows (the reference
    segmentation stage, clustering_diarizer.py `_perform_segmentation`)."""
    segs = []
    for start, end in regions:
        t = start
        while t + window <= end + 1e-9:
            segs.append((t, t + window))
            t += shift
        if not segs or segs[-1][1] < end - 1e-9:
            segs.append((max(end - window, start), end))
    return segs


def merge_labeled_segments(
    segments: Sequence[Tuple[float, float]], labels: Sequence[int]
) -> List[Tuple[float, float, int]]:
    """Midpoint-split overlapping neighbors, merge adjacent same-speaker runs
    (reference get_contiguous_stamps + merge_stamps)."""
    if not segments:
        return []
    order = np.argsort([s[0] for s in segments])
    segs = [list(segments[i]) + [labels[i]] for i in order]
    for i in range(len(segs) - 1):
        if segs[i][1] > segs[i + 1][0]:  # overlap -> split at midpoint
            mid = (segs[i][1] + segs[i + 1][0]) / 2
            segs[i][1] = mid
            segs[i + 1][0] = mid
    merged = [segs[0]]
    for s in segs[1:]:
        if s[2] == merged[-1][2] and abs(s[0] - merged[-1][1]) < 1e-6:
            merged[-1][1] = s[1]
        else:
            merged.append(s)
    return [(a, b, l) for a, b, l in merged]


def to_rttm(segments: Sequence[Tuple[float, float, int]], uniq_id: str) -> str:
    """RTTM lines (reference labels_to_rttmfile format)."""
    lines = []
    for start, end, label in segments:
        lines.append(
            f"SPEAKER {uniq_id} 1 {start:.3f} {end - start:.3f} "
            f"<NA> <NA> speaker_{label} <NA> <NA>")
    return "\n".join(lines) + "\n"


class ClusteringDiarizer:
    """VAD -> segmentation -> embeddings -> NME-SC -> merged speaker turns.

    `speaker_model` is a fitted `SpeakerLabelModel` (api_label.py);
    `vad` overrides the energy VAD with (wav, sr) -> regions."""

    def __init__(self, speaker_model, window: float = 1.5, shift: float = 0.75,
                 vad: Optional[Callable] = None):
        self.speaker_model = speaker_model
        self.window = window
        self.shift = shift
        self.vad = vad or energy_vad

    def diarize(
        self, audio_path: str,
        oracle_num_speakers: Optional[int] = None,
        speech_regions: Optional[Sequence[Tuple[float, float]]] = None,
        max_num_speakers: int = 8,
    ) -> List[Tuple[float, float, int]]:
        import jax.numpy as jnp

        from conformer_nemo_tpu.data.audio_io import load_audio

        sr = self.speaker_model.sample_rate
        wav = load_audio(audio_path, target_sr=sr)
        regions = (list(speech_regions) if speech_regions is not None
                   else self.vad(wav, sr))
        segments = sliding_window_segments(regions, self.window, self.shift)
        if not segments:
            return []

        t_fixed = int(self.window * sr)
        batch = np.zeros((len(segments), t_fixed), np.float32)
        for i, (a, b) in enumerate(segments):
            chunk = wav[int(a * sr): int(b * sr)]
            from conformer_nemo_tpu.data.audio_to_label import repeat_to_length

            batch[i] = repeat_to_length(chunk, t_fixed)

        m = self.speaker_model
        feats, flens = m._features(
            jnp.asarray(batch), jnp.full((len(segments),), t_fixed))
        (_logits, embs), _ = m._apply(m.state, feats, flens, train=False)
        labels = nme_spectral_clustering(
            np.asarray(embs), oracle_num_speakers=oracle_num_speakers,
            max_num_speakers=max_num_speakers)
        return merge_labeled_segments(segments, labels)
