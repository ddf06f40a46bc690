"""Waveform perturbations (host-side augmentation).

Behavioral parity target: reference `perturb.py`
(`/root/reference/nemo/collections/asr/parts/preprocessing/perturb.py`):
speed (resample-based), time-stretch, gain, shift, white-noise, noise
(SNR-targeted mixing from a manifest), impulse (RIR convolution), and the
`AudioAugmentor` registry applying each perturbation with probability `prob`
(`process_augmentations:738`).

The reference shells out to librosa/sox; here the DSP is scipy/numpy —
polyphase resampling for speed, FFT convolution for RIR. Audio augmentation
is host-side work feeding the device pipeline in both designs.
"""

from __future__ import annotations

import dataclasses
import random
from typing import List, Optional, Sequence

import numpy as np

from conformer_nemo_tpu.data.audio_io import load_audio, resample_poly


class Perturbation:
    def max_augmentation_length(self, length: float) -> float:
        return length

    def perturb(self, samples: np.ndarray, sr: int, rng: random.Random) -> np.ndarray:
        raise NotImplementedError


class SpeedPerturbation(Perturbation):
    """Resample-based speed change (perturb.py:101): rate drawn from
    [min_speed_rate, max_speed_rate] or discrete num_rates grid."""

    def __init__(self, sr: int = 16000, resample_type: str = "kaiser_fast",
                 min_speed_rate: float = 0.9, max_speed_rate: float = 1.1,
                 num_rates: int = 5):
        self.min_rate = min_speed_rate
        self.max_rate = max_speed_rate
        self.num_rates = num_rates
        if num_rates > 0:
            self.rates = np.linspace(min_speed_rate, max_speed_rate, num_rates)

    def max_augmentation_length(self, length: float) -> float:
        return length * self.max_rate

    def perturb(self, samples, sr, rng):
        if self.num_rates > 0:
            rate = float(self.rates[rng.randrange(self.num_rates)])
        else:
            rate = rng.uniform(self.min_rate, self.max_rate)
        if abs(rate - 1.0) < 1e-6:
            return samples
        new_sr = int(round(sr * rate))
        return resample_poly(samples, new_sr, sr)


def _stft_np(y: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """librosa.core.stft semantics: periodic hann, win_length=n_fft,
    center=True reflect padding. -> complex [n_fft//2+1, frames]."""
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)
    pad = n_fft // 2
    y = np.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = y[idx] * win[None, :]
    return np.fft.rfft(frames, axis=1).T.astype(np.complex64)


def _istft_np(D: np.ndarray, hop: int, length: int) -> np.ndarray:
    """librosa.core.istft semantics: periodic hann overlap-add with
    squared-window normalization, center trim, crop/pad to `length`."""
    n_fft = 2 * (D.shape[0] - 1)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)
    frames = np.fft.irfft(D.T, n=n_fft, axis=1)  # [T, n_fft]
    n_frames = frames.shape[0]
    out_len = n_fft + hop * (n_frames - 1)
    y = np.zeros(out_len, np.float64)
    wsum = np.zeros(out_len, np.float64)
    for t in range(n_frames):
        s = t * hop
        y[s : s + n_fft] += frames[t] * win
        wsum[s : s + n_fft] += win**2
    y = np.where(wsum > 1e-10, y / np.maximum(wsum, 1e-10), y)
    pad = n_fft // 2
    y = y[pad:]
    if length is not None:
        y = y[:length] if len(y) >= length else np.pad(y, (0, length - len(y)))
    return y


def phase_vocoder(D: np.ndarray, rate: float, hop: int) -> np.ndarray:
    """Pitch-preserving time stretch of a complex spectrogram.

    Vectorized port of the reference's numba kernel
    (asr/parts/utils/numba_utils.py:18-88, itself librosa.core.phase_vocoder):
    linear magnitude interpolation between straddling frames + accumulated
    wrapped phase advance (here as one cumsum instead of the frame loop).
    """
    n_bins = D.shape[0]
    phi_advance = np.linspace(0, np.pi * hop, n_bins)
    time_steps = np.arange(0, D.shape[1], rate)
    Dp = np.pad(D, [(0, 0), (0, 2)], mode="constant")
    idx = time_steps.astype(np.int64)
    alpha = np.mod(time_steps, 1.0)[None, :]
    c0 = Dp[:, idx]
    c1 = Dp[:, idx + 1]
    mag = (1.0 - alpha) * np.abs(c0) + alpha * np.abs(c1)
    dphase = np.angle(c1) - np.angle(c0) - phi_advance[:, None]
    dphase -= 2.0 * np.pi * np.round(dphase / (2.0 * np.pi))
    # phase used at output frame t is the accumulation over frames < t,
    # seeded with the first input frame's phase
    steps = phi_advance[:, None] + dphase
    phase = np.angle(D[:, :1]) + np.concatenate(
        [np.zeros((n_bins, 1)), np.cumsum(steps, axis=1)[:, :-1]], axis=1
    )
    return (mag * np.exp(1.0j * phase)).astype(np.complex64)


class TimeStretchPerturbation(Perturbation):
    """Pitch-preserving tempo change via STFT -> phase vocoder -> iSTFT
    (reference TimeStretchPerturbation, perturb.py:170-276, incl. the
    n_fft-doubling trick for slow-down rates)."""

    def __init__(self, min_speed_rate: float = 0.9, max_speed_rate: float = 1.1,
                 num_rates: int = 5, n_fft: int = 512):
        self.min_rate = float(min_speed_rate)
        self.max_rate = float(max_speed_rate)
        self.num_rates = num_rates
        if num_rates > 0:
            self.rates = np.linspace(min_speed_rate, max_speed_rate, num_rates)
        self.n_fft = int(n_fft)

    def max_augmentation_length(self, length: float) -> float:
        return length * self.max_rate

    def perturb(self, samples, sr, rng):
        if self.num_rates > 0:
            rate = float(self.rates[rng.randrange(self.num_rates)])
        else:
            rate = rng.uniform(self.min_rate, self.max_rate)
        if abs(rate - 1.0) < 1e-6:
            return samples
        # slow-down uses 2x n_fft (reference perturb.py:242-256)
        mult = 1 if rate >= 1.0 else 2
        n_fft = self.n_fft * mult
        hop = (self.n_fft // 2) * mult
        D = _stft_np(np.asarray(samples, np.float32), n_fft, hop)
        D2 = phase_vocoder(D, rate, hop)
        return _istft_np(D2, hop, int(round(len(samples) / rate))).astype(np.float32)


class GainPerturbation(Perturbation):
    """Random gain in dB (perturb.py:232)."""

    def __init__(self, min_gain_dbfs: float = -10, max_gain_dbfs: float = 10):
        self.min_gain = min_gain_dbfs
        self.max_gain = max_gain_dbfs

    def perturb(self, samples, sr, rng):
        gain = rng.uniform(self.min_gain, self.max_gain)
        return samples * (10.0 ** (gain / 20.0))


class ShiftPerturbation(Perturbation):
    """Time shift in ms, zero-filled (perturb.py:324)."""

    def __init__(self, min_shift_ms: float = -5.0, max_shift_ms: float = 5.0):
        self.min_shift = min_shift_ms
        self.max_shift = max_shift_ms

    def perturb(self, samples, sr, rng):
        shift_ms = rng.uniform(self.min_shift, self.max_shift)
        shift = int(sr * shift_ms / 1000.0)
        if shift == 0:
            return samples
        out = np.zeros_like(samples)
        if shift > 0:
            out[shift:] = samples[:-shift]
        else:
            out[:shift] = samples[-shift:]
        return out


class WhiteNoisePerturbation(Perturbation):
    """Gaussian noise at a random dB level (perturb.py:481)."""

    def __init__(self, min_level: float = -90, max_level: float = -46):
        self.min_level = min_level
        self.max_level = max_level

    def perturb(self, samples, sr, rng):
        level = rng.uniform(self.min_level, self.max_level)
        std = 10.0 ** (level / 20.0)
        noise = np.random.RandomState(rng.randrange(2 ** 31)).randn(len(samples)).astype(np.float32)
        return samples + std * noise


def _rms_db(x: np.ndarray) -> float:
    mean_sq = float(np.mean(x ** 2)) + 1e-12
    return 10.0 * np.log10(mean_sq)


class NoisePerturbation(Perturbation):
    """SNR-targeted mixing of noise clips from a manifest (perturb.py:377)."""

    def __init__(self, manifest_path: str, min_snr_db: float = 10,
                 max_snr_db: float = 50, max_gain_db: float = 300.0,
                 audio_tar_filepaths=None, orig_sr: int = 16000):
        from conformer_nemo_tpu.data.manifest import read_manifest

        self.samples_meta = read_manifest(manifest_path)
        self.min_snr = min_snr_db
        self.max_snr = max_snr_db
        self.max_gain = max_gain_db

    def perturb(self, samples, sr, rng):
        meta = self.samples_meta[rng.randrange(len(self.samples_meta))]
        noise = load_audio(meta.audio_file, target_sr=sr)
        if len(noise) == 0:
            return samples
        snr = rng.uniform(self.min_snr, self.max_snr)
        gain_db = min(_rms_db(samples) - _rms_db(noise) - snr, self.max_gain)
        noise = noise * (10.0 ** (gain_db / 20.0))
        if len(noise) >= len(samples):
            start = rng.randrange(len(noise) - len(samples) + 1)
            return samples + noise[start : start + len(samples)]
        start = rng.randrange(len(samples) - len(noise) + 1)
        out = samples.copy()
        out[start : start + len(noise)] += noise
        return out


class ImpulsePerturbation(Perturbation):
    """Room impulse response convolution (perturb.py:275)."""

    def __init__(self, manifest_path: str, shift_impulse: bool = False):
        from conformer_nemo_tpu.data.manifest import read_manifest

        self.samples_meta = read_manifest(manifest_path)
        self.shift_impulse = shift_impulse

    def perturb(self, samples, sr, rng):
        from scipy.signal import fftconvolve

        meta = self.samples_meta[rng.randrange(len(self.samples_meta))]
        rir = load_audio(meta.audio_file, target_sr=sr)
        if len(rir) == 0:
            return samples
        rir = rir / (np.abs(rir).max() + 1e-9)
        out = fftconvolve(samples, rir)[: len(samples)]
        return out.astype(np.float32)


@dataclasses.dataclass
class _Entry:
    prob: float
    perturbation: Perturbation


class AudioAugmentor:
    """Applies each registered perturbation with its probability
    (perturb.py:709-737)."""

    def __init__(self, perturbations: Optional[List[tuple]] = None, seed: Optional[int] = None):
        self._rng = random.Random(seed)
        self._entries = [ _Entry(p, pert) for p, pert in (perturbations or []) ]

    def perturb(self, samples: np.ndarray, sr: int) -> np.ndarray:
        for e in self._entries:
            if self._rng.random() <= e.prob:
                samples = e.perturbation.perturb(samples, sr, self._rng)
        return np.ascontiguousarray(samples, dtype=np.float32)

    def max_augmentation_length(self, length: float) -> float:
        for e in self._entries:
            length = e.perturbation.max_augmentation_length(length)
        return length


_REGISTRY = {
    "speed": SpeedPerturbation,
    "time_stretch": TimeStretchPerturbation,
    "gain": GainPerturbation,
    "shift": ShiftPerturbation,
    "white_noise": WhiteNoisePerturbation,
    "noise": NoisePerturbation,
    "impulse": ImpulsePerturbation,
}


def process_augmentations(augmenter_cfg: Optional[dict], seed: Optional[int] = None) -> Optional[AudioAugmentor]:
    """Config dict {name: {prob: p, **kwargs}} -> AudioAugmentor
    (perturb.py:738 registry semantics)."""
    if not augmenter_cfg:
        return None
    entries = []
    for name, kwargs in augmenter_cfg.items():
        kwargs = dict(kwargs or {})
        prob = float(kwargs.pop("prob", 1.0))
        cls = _REGISTRY.get(name)
        if cls is None:
            raise ValueError(f"unknown perturbation '{name}' (known: {sorted(_REGISTRY)})")
        entries.append((prob, cls(**kwargs)))
    return AudioAugmentor(entries, seed=seed)
