"""MFCC frontend.

Behavioral parity target: reference `AudioToMFCCPreprocessor`
(`/root/reference/nemo/collections/asr/modules/audio_preprocessing.py:284-418`),
which wraps torchaudio MFCC: mel power spectrogram -> log -> DCT-II (ortho)
-> keep n_mfcc coefficients.

Reuses the MXU-matmul STFT/mel pipeline; the DCT is one more small matmul.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.audio.features import (
    MelFeatureConfig,
    _frame_signal,
    mel_filterbank,
    mel_seq_len,
    stft_basis,
)


@dataclasses.dataclass(frozen=True)
class MFCCConfig:
    sample_rate: int = 16000
    window_size: float = 0.02
    window_stride: float = 0.01
    window: str = "hann"
    n_fft: int | None = None
    lowfreq: float = 0.0
    highfreq: float | None = None
    n_mels: int = 64
    n_mfcc: int = 64
    dct_type: int = 2
    norm: str = "ortho"
    log: bool = True

    @property
    def win_length(self) -> int:
        return int(self.window_size * self.sample_rate)

    @property
    def hop_length(self) -> int:
        return int(self.window_stride * self.sample_rate)

    @property
    def n_fft_(self) -> int:
        return self.n_fft or 2 ** math.ceil(math.log2(self.win_length))


def dct_matrix(n_mfcc: int, n_mels: int, norm: str = "ortho") -> np.ndarray:
    """DCT-II basis [n_mels, n_mfcc] (torchaudio create_dct convention)."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)[None, :]
    basis = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k)
    if norm == "ortho":
        basis[:, 0] *= 1.0 / math.sqrt(n_mels)
        basis[:, 1:] *= math.sqrt(2.0 / n_mels)
    else:
        basis *= 2.0
    return basis.astype(np.float32)


@partial(jax.jit, static_argnames=("cfg",))
def mfcc(cfg: MFCCConfig, waveform: jnp.ndarray, lengths: jnp.ndarray):
    """wav [B, T] -> (mfcc [B, n_mfcc, Tf], frame lengths [B])."""
    n_fft, hop = cfg.n_fft_, cfg.hop_length
    x = waveform.astype(jnp.float32)
    # torchaudio MelSpectrogram: center=True reflect pad, power=2, no preemph
    mel_cfg_len = mel_seq_len(
        MelFeatureConfig(
            sample_rate=cfg.sample_rate, window_size=cfg.window_size,
            window_stride=cfg.window_stride, n_fft=cfg.n_fft_,
        ),
        lengths,
    )
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    frames = _frame_signal(x, n_fft, hop)
    basis = jnp.asarray(stft_basis(n_fft, cfg.win_length, cfg.window))
    spec = jnp.einsum("bfn,nk->bfk", frames, basis, precision=jax.lax.Precision.HIGHEST)
    n_bins = n_fft // 2 + 1
    power = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, n_fft, cfg.n_mels, cfg.lowfreq, cfg.highfreq))
    mel = jnp.einsum("bfk,mk->bfm", power, fb)
    if cfg.log:
        mel = jnp.log(mel + 1e-6)
    else:
        mel = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))  # db scale
    dct = jnp.asarray(dct_matrix(cfg.n_mfcc, cfg.n_mels, cfg.norm))
    out = jnp.einsum("bfm,mc->bcf", mel, dct)  # [B, n_mfcc, Tf]
    return out, mel_cfg_len
