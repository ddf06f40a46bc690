"""Log-mel spectrogram frontend, TPU-native.

Behavioral parity target: the reference `FilterbankFeatures`
(`/root/reference/nemo/collections/asr/parts/preprocessing/features.py:196-453`):

    dither -> preemphasis -> STFT (hann, center=True) -> magnitude -> power
    -> mel matmul (Slaney filters) -> log(x + 2^-24) -> per-feature masked
    mean/std normalization -> zero-fill beyond length -> pad_to multiple.

TPU-first design: instead of a CUDA FFT, the STFT is computed as a single
framed matmul against a precomputed windowed real-DFT basis
[n_fft, 2*(n_fft//2+1)] — for ASR-sized n_fft (512) this rides the MXU and
fuses with the mel projection's surrounding elementwise work under XLA.
Everything is static-shape and jittable; the waveform arrives as a padded
[B, T] bucket and valid lengths flow through the exact frame-count formula
(`features.py:369`: frames = floor((len + 2*pad - n_fft) / hop) + 1).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.utils.typecheck import typecheck

LOG_GUARD = 2.0 ** -24  # reference log_zero_guard_value (features.py:216)
STD_GUARD = 1e-5  # reference CONSTANT added to std (features.py:52,68)


# ---------------------------------------------------------------------------
# Host-side constant construction (numpy): mel filters + windowed DFT basis
# ---------------------------------------------------------------------------


def _hz_to_mel_slaney(freqs: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    freqs = np.asarray(freqs, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3.0
    mels = (freqs - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = freqs >= min_log_hz
    mels = np.where(above, min_log_mel + np.log(np.maximum(freqs, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3.0
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = mels >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, [n_mels, n_fft//2 + 1].

    Matches `librosa.filters.mel(..., htk=False, norm='slaney')`, which is what
    the reference bakes into its `fb` buffer (features.py:316-320).
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalization.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _hann_window_sym(win_length: int) -> np.ndarray:
    """Symmetric (periodic=False) Hann window, matching torch.hann_window(periodic=False)."""
    if win_length == 1:
        return np.ones(1, dtype=np.float64)
    n = np.arange(win_length, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (win_length - 1))


def window_fn(window: str | None, win_length: int) -> np.ndarray:
    """Symmetric (periodic=False) analysis window.

    Same set the reference wires into torch.stft (features.py:279-288):
    hann | hamming | blackman | bartlett | none, each matching the
    corresponding torch.*_window(win_length, periodic=False).
    """
    if window in (None, "none"):
        return np.ones(win_length, dtype=np.float64)
    if win_length == 1:
        return np.ones(1, dtype=np.float64)
    n = np.arange(win_length, dtype=np.float64)
    frac = n / (win_length - 1)
    if window == "hann":
        return 0.5 - 0.5 * np.cos(2.0 * np.pi * frac)
    if window == "hamming":
        return 0.54 - 0.46 * np.cos(2.0 * np.pi * frac)
    if window == "blackman":
        return 0.42 - 0.5 * np.cos(2.0 * np.pi * frac) + 0.08 * np.cos(4.0 * np.pi * frac)
    if window == "bartlett":
        return 1.0 - np.abs(2.0 * frac - 1.0)
    raise ValueError(f"unsupported window: {window}")


def stft_basis(n_fft: int, win_length: int, window: str = "hann") -> np.ndarray:
    """Windowed real-DFT basis, [n_fft, 2 * n_bins] = [cos | -sin] columns.

    frames @ basis yields (real, imag) of the one-sided spectrum, identical to
    torch.stft with a center-padded window of length `win_length`. Expressing
    the DFT as a matmul keeps the STFT on the MXU.
    """
    n_bins = n_fft // 2 + 1
    win = window_fn(window, win_length)
    # torch.stft center-pads a short window with zeros to n_fft.
    pad_left = (n_fft - win_length) // 2
    full_win = np.zeros(n_fft, dtype=np.float64)
    full_win[pad_left : pad_left + win_length] = win

    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    cos_basis = np.cos(angle) * full_win[:, None]
    sin_basis = -np.sin(angle) * full_win[:, None]
    return np.concatenate([cos_basis, sin_basis], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MelFeatureConfig:
    """Mirrors the schema of the reference `AudioToMelSpectrogramPreprocessor`
    (config surface: configs/conformer_ctc_bpe.yaml:81-94)."""

    sample_rate: int = 16000
    window_size: float = 0.025  # seconds
    window_stride: float = 0.01  # seconds
    window: str = "hann"  # hann | hamming | blackman | bartlett | none
    features: int = 80
    n_fft: int | None = 512
    lowfreq: float = 0.0
    highfreq: float | None = None
    log: bool = True
    log_zero_guard_type: str = "add"  # add | clamp (features.py:424-429)
    log_zero_guard_value: float | str = LOG_GUARD  # number | 'tiny' | 'eps'
    dither: float = 1e-5
    preemph: float | None = 0.97
    normalize: str = "per_feature"  # per_feature | all_features | fixed_mean_and_std | none
    # used when normalize == 'fixed_mean_and_std' (reference normalize_batch
    # accepts a dict with 'fixed_mean'/'fixed_std'; features.py:78-81).
    fixed_mean: tuple | None = None
    fixed_std: tuple | None = None
    mag_power: float = 2.0
    pad_to: int | str = 0  # int multiple, or 'max' (pad to max_duration frames)
    pad_value: float = 0.0
    max_duration: float = 16.7  # only used by pad_to='max' (features.py:315)
    frame_splicing: int = 1
    exact_pad: bool = False  # center=False with (n_fft-hop)//2 reflect pad
    # narrowband simulation: with prob p per sample (train only), zero all FFT
    # bins >= nb_max_freq (features.py:333-338,410-413).
    nb_augmentation_prob: float = 0.0
    nb_max_freq: int = 4000

    def __post_init__(self):
        if self.exact_pad and self.hop_length % 2 == 1:
            # reference raises the same constraint (features.py:241-245)
            raise ValueError("exact_pad requires an even hop size")
        if self.log_zero_guard_type not in ("add", "clamp"):
            raise ValueError(
                f"log_zero_guard_type must be 'add' or 'clamp', got {self.log_zero_guard_type!r}")

    @property
    def win_length(self) -> int:
        return int(self.window_size * self.sample_rate)

    @property
    def hop_length(self) -> int:
        return int(self.window_stride * self.sample_rate)

    @property
    def n_fft_(self) -> int:
        return self.n_fft or 2 ** math.ceil(math.log2(self.win_length))

    @property
    def stft_pad_amount(self) -> int:
        """One-sided reflect pad: center=True pads n_fft//2; exact_pad pads
        (n_fft - hop)//2 so out frames == len//hop (features.py:267,385-388)."""
        n_fft = self.n_fft_
        return (n_fft - self.hop_length) // 2 if self.exact_pad else n_fft // 2

    @property
    def log_guard(self) -> float:
        """Resolve 'tiny'/'eps' against fp32 like the reference's
        log_zero_guard_value_fn (features.py:354-368; x is fp32 on our path)."""
        v = self.log_zero_guard_value
        if v == "tiny":
            return float(np.finfo(np.float32).tiny)
        if v == "eps":
            return float(np.finfo(np.float32).eps)
        return float(v)


def mel_seq_len(cfg: MelFeatureConfig, sample_len) -> jnp.ndarray:
    """Number of STFT frames for `sample_len` samples.

    Parity with reference get_seq_len (features.py:369-377), including the
    exact_pad variant's smaller pad amount.
    """
    n_fft, hop = cfg.n_fft_, cfg.hop_length
    pad_amount = cfg.stft_pad_amount * 2
    return (jnp.floor((jnp.asarray(sample_len, jnp.float32) + pad_amount - n_fft) / hop) + 1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Device-side pipeline (pure JAX, jittable, static shapes)
# ---------------------------------------------------------------------------


def _frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[B, T_padded] -> frames [B, F, n_fft] with F = (T_padded - n_fft)//hop + 1."""
    b, t = x.shape
    num_frames = (t - n_fft) // hop + 1
    # Static gather index matrix [F, n_fft]; XLA lowers this to an efficient
    # strided gather. (A Pallas fused frame+matmul kernel can replace this.)
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[:, idx]


def _framed_dft(x: jnp.ndarray, basis: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """frames(x) @ basis without materializing frames (no gather).

    The overlapping-frame gather was measured at ~3.5 ms/step on TPU (a pure
    data-movement fusion at ~33 GB/s). Instead, view x as hop-sized rows
    [B, R, hop]; frame i's samples split into K = ceil(n_fft/hop) hop-aligned
    chunks, chunk k being rows[i + k]. The STFT then becomes a sum of K
    matmuls over *contiguous strided slices* of the row view — each slice
    fuses into its matmul's operand read, so the only HBM write is the
    spectrum itself. Numerically identical to frames @ basis up to fp32
    summation order (K=4 partial sums for n_fft=512/hop=160).
    """
    b, t = x.shape
    num_frames = (t - n_fft) // hop + 1
    n_chunks = -(-n_fft // hop)
    rows_needed = num_frames - 1 + n_chunks
    pad_t = rows_needed * hop - t
    if pad_t > 0:
        x = jnp.pad(x, ((0, 0), (0, max(pad_t, 0))))
    rows = x[:, : rows_needed * hop].reshape(b, rows_needed, hop)
    spec = None
    for k in range(n_chunks):
        size = min(hop, n_fft - k * hop)
        bk = basis[k * hop : k * hop + size]  # [size, n_out]
        xk = rows[:, k : k + num_frames, :size]  # [B, F, size]
        term = jnp.einsum("bfs,sk->bfk", xk, bk, precision=jax.lax.Precision.HIGHEST)
        spec = term if spec is None else spec + term
    return spec


@partial(jax.jit, static_argnames=("cfg", "training"))
@typecheck(waveform=("B", "T"), lengths=("B",))
def log_mel_spectrogram(
    cfg: MelFeatureConfig,
    waveform: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    rng: jax.Array | None = None,
    training: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """wav [B, T] (+ valid lengths [B]) -> (log-mel [B, D, Tf], frame lengths [B]).

    Runs entirely on device in fp32 (feature extraction is precision-critical;
    the reference likewise keeps its STFT out of autocast, features.py:399).
    """
    n_fft, hop = cfg.n_fft_, cfg.hop_length
    x = waveform.astype(jnp.float32)
    if waveform.dtype == jnp.int16:
        # PCM16 batches: loaders may ship int16 to halve H2D traffic (the
        # host->device copy is the training pipeline's bandwidth bottleneck);
        # dequantize on device to the same [-1, 1) scale load_audio uses.
        x = x * (1.0 / 32768.0)
    elif waveform.dtype == jnp.int8:
        # mu-law (mu=255) 8-bit transport (BucketedLoader transport=
        # "mulaw8", encoder in data/audio_io.py mulaw8_encode): expand the
        # companded code back to [-1, 1). 256**|y| == 2**(8|y|).
        y = x * (1.0 / 127.0)
        x = jnp.sign(y) * (jnp.exp2(8.0 * jnp.abs(y)) - 1.0) * (1.0 / 255.0)
    seq_len = mel_seq_len(cfg, lengths)

    needs_nb = training and 0.0 < cfg.nb_augmentation_prob and cfg.nb_max_freq < cfg.sample_rate / 2
    if training and (cfg.dither > 0 or needs_nb):
        if rng is None:
            raise ValueError("training=True with dither/nb augmentation requires an rng key")
        rng, nb_rng = jax.random.split(rng)
    if training and cfg.dither > 0:
        x = x + cfg.dither * jax.random.normal(rng, x.shape, dtype=x.dtype)

    if cfg.preemph is not None:
        x = jnp.concatenate([x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]], axis=1)

    # Reflect padding: torch.stft center=True pads n_fft//2; the exact_pad
    # mode instead pre-pads (n_fft-hop)//2 and runs center=False, so the
    # frame count is exactly len//hop (features.py:385-388).
    pad = cfg.stft_pad_amount
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")

    basis = jnp.asarray(stft_basis(n_fft, cfg.win_length, cfg.window))
    spec = _framed_dft(x, basis, n_fft, hop)  # == frames @ basis, gather-free
    n_bins = n_fft // 2 + 1
    power = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2  # [B, F, bins]

    if needs_nb:
        # Per-sample narrowband simulation (features.py:410-413): zeroing the
        # magnitude bins >= nb_max_fft_bin equals zeroing the power bins.
        nb_bin = int((cfg.nb_max_freq / cfg.sample_rate) * n_fft)
        drop = jax.random.bernoulli(nb_rng, cfg.nb_augmentation_prob, (power.shape[0], 1, 1))
        hi = (jnp.arange(n_bins) >= nb_bin)[None, None, :]
        power = jnp.where(drop & hi, 0.0, power)

    if cfg.mag_power == 1.0:
        power = jnp.sqrt(power)
    elif cfg.mag_power != 2.0:
        power = jnp.sqrt(power) ** cfg.mag_power

    fb = jnp.asarray(
        mel_filterbank(cfg.sample_rate, n_fft, cfg.features, cfg.lowfreq, cfg.highfreq)
    )
    mel = jnp.einsum("bfk,mk->bmf", power, fb, precision=jax.lax.Precision.HIGHEST)  # [B, D, F]

    if cfg.log:
        if cfg.log_zero_guard_type == "add":
            mel = jnp.log(mel + cfg.log_guard)
        else:  # clamp (features.py:427-428)
            mel = jnp.log(jnp.maximum(mel, cfg.log_guard))

    if cfg.frame_splicing > 1:
        # Literal parity with reference splice_frames (features.py:86-96):
        # note the reference's cat([x[:,:,:n], x[:,:,n:]]) reconstructs x
        # unchanged, so splicing degenerates to channel duplication — we
        # reproduce that behavior exactly (all six recipes use splicing=1).
        mel = jnp.concatenate([mel] * cfg.frame_splicing, axis=1)

    num_frames = mel.shape[-1]
    frame_idx = jnp.arange(num_frames)[None, :]
    valid = frame_idx < seq_len[:, None]  # [B, F]

    if cfg.normalize == "per_feature":
        mask = valid[:, None, :].astype(mel.dtype)  # [B, 1, F]
        cnt = jnp.maximum(seq_len.astype(mel.dtype), 1.0)[:, None, None]
        mean = jnp.sum(mel * mask, axis=-1, keepdims=True) / cnt
        # torch.std default is the unbiased (ddof=1) estimator.
        var = jnp.sum(((mel - mean) * mask) ** 2, axis=-1, keepdims=True) / jnp.maximum(cnt - 1.0, 1.0)
        std = jnp.sqrt(var) + STD_GUARD
        mel = (mel - mean) / std
    elif cfg.normalize == "all_features":
        mask = valid[:, None, :].astype(mel.dtype)
        cnt = jnp.maximum(seq_len.astype(mel.dtype), 1.0)[:, None, None] * mel.shape[1]
        mean = jnp.sum(mel * mask, axis=(1, 2), keepdims=True) / cnt
        var = jnp.sum(((mel - mean) * mask) ** 2, axis=(1, 2), keepdims=True) / jnp.maximum(cnt - 1.0, 1.0)
        std = jnp.sqrt(var) + STD_GUARD
        mel = (mel - mean) / std
    elif cfg.normalize == "fixed_mean_and_std":
        # reference normalize_batch dict mode (features.py:78-81): global
        # per-feature constants, no length masking.
        mean = jnp.asarray(cfg.fixed_mean, jnp.float32)[None, :, None]
        std = jnp.asarray(cfg.fixed_std, jnp.float32)[None, :, None]
        mel = (mel - mean) / std

    mel = jnp.where(valid[:, None, :], mel, cfg.pad_value)

    if cfg.pad_to == "max":
        # pad to the frame count of max_duration (features.py:314-318,447-449)
        max_len = int(
            math.floor((cfg.max_duration * cfg.sample_rate + cfg.stft_pad_amount * 2 - n_fft) / hop)
            + 1
        )
        if mel.shape[-1] < max_len:
            mel = jnp.pad(
                mel, ((0, 0), (0, 0), (0, max_len - mel.shape[-1])),
                constant_values=cfg.pad_value,
            )
    elif cfg.pad_to and cfg.pad_to > 0:
        rem = mel.shape[-1] % cfg.pad_to
        if rem != 0:
            mel = jnp.pad(
                mel, ((0, 0), (0, 0), (0, cfg.pad_to - rem)), constant_values=cfg.pad_value
            )
    return mel, seq_len
