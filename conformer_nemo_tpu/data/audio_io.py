"""Host-side audio decode, dependency-free.

Parity target: reference `AudioSegment`
(`/root/reference/nemo/collections/asr/parts/preprocessing/segment.py:60`):
decode -> float32 in [-1, 1] -> mono mix -> resample -> offset/duration crop.

The reference leans on libsndfile/librosa; neither is installed here, so WAV
files (PCM16/24/32, float32) are parsed directly from the RIFF container and
resampling uses scipy's polyphase filter. Audio IO is host-side work feeding
the device pipeline — exactly where the reference keeps it too.
"""

from __future__ import annotations

import struct
import wave
from fractions import Fraction

import numpy as np


def read_wav_bytes(data: bytes) -> tuple[np.ndarray, int]:
    """Parse WAV from an in-memory buffer (tar-shard path)."""
    import io

    with wave.open(io.BytesIO(data), "rb") as w:
        return _parse_wav(w)


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 samples [T] mono or [T, C], sample_rate)."""
    with wave.open(path, "rb") as w:
        return _parse_wav(w)


def _parse_wav(w) -> tuple[np.ndarray, int]:
    sr = w.getframerate()
    n_ch = w.getnchannels()
    width = w.getsampwidth()
    n_frames = w.getnframes()
    raw = w.readframes(n_frames)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        b = np.zeros((a.shape[0], 4), dtype=np.uint8)
        b[:, 1:] = a
        data = b.view("<i4")[:, 0].astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width} in {path}")
    if n_ch > 1:
        data = data.reshape(-1, n_ch)
    return data, sr


def resample_poly(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return x
    from scipy.signal import resample_poly as _rp

    frac = Fraction(target_sr, orig_sr)
    return _rp(x, frac.numerator, frac.denominator).astype(np.float32)


def load_audio(
    path: str,
    target_sr: int = 16000,
    offset: float = 0.0,
    duration: float = 0.0,
    mono: bool = True,
) -> np.ndarray:
    """Decode + mono-mix + resample + crop -> float32 [T] at target_sr."""
    data, sr = read_wav(path)
    if mono and data.ndim > 1:
        data = data.mean(axis=1)
    if offset > 0 or duration > 0:
        start = int(offset * sr)
        end = start + int(duration * sr) if duration > 0 else len(data)
        data = data[start:end]
    data = resample_poly(data, sr, target_sr)
    return np.ascontiguousarray(data, dtype=np.float32)


def write_wav(path: str, samples: np.ndarray, sr: int = 16000) -> None:
    """PCM16 writer (test fixtures)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
