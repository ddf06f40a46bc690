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


_FLAC_LIB = None
_FLAC_FAILED = False


def _flac_lib():
    """Build/load the native FLAC decoder (native/flacdec/flac_decoder.cpp,
    ctypes C ABI — same on-demand g++ pattern as the edit-distance lib)."""
    global _FLAC_LIB, _FLAC_FAILED
    if _FLAC_LIB is not None or _FLAC_FAILED:
        return _FLAC_LIB
    import ctypes
    import os
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = os.path.join(root, "native", "flacdec", "flac_decoder.cpp")
    build = os.path.join(root, "native", "build")
    so = os.path.join(build, "libflac_decoder.so")
    try:
        os.makedirs(build, exist_ok=True)
        if not (os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.flac_decode.restype = ctypes.c_int
        lib.flac_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        _FLAC_LIB = lib
    except Exception:
        _FLAC_FAILED = True
    return _FLAC_LIB


def _read_flac_raw(data: bytes) -> tuple[np.ndarray, int, int, int]:
    """-> (int32 samples [T*C] interleaved, channels, sr, bits_per_sample)."""
    import ctypes

    lib = _flac_lib()
    if lib is None:
        raise RuntimeError(
            "FLAC decoding requires the native decoder "
            "(native/flacdec/flac_decoder.cpp) and no C++ compiler is "
            "available to build it")
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    out = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    bps = ctypes.c_int()
    rc = lib.flac_decode(buf, len(data), ctypes.byref(out), ctypes.byref(n),
                         ctypes.byref(ch), ctypes.byref(sr), ctypes.byref(bps))
    if rc != 0:
        raise ValueError(f"FLAC decode failed (code {rc})")
    try:
        total = n.value * ch.value
        arr = np.ctypeslib.as_array(out, shape=(total,)).copy()
    finally:
        lib.flac_free(out)
    return arr, ch.value, sr.value, bps.value


def read_flac_bytes(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an in-memory FLAC stream -> (float32 [T] or [T, C], sr)."""
    arr, ch, sr, bps = _read_flac_raw(data)
    scale = float(1 << (bps - 1))
    audio = arr.astype(np.float32) / scale
    if ch > 1:
        audio = audio.reshape(-1, ch)
    return audio, sr


def read_flac(path: str) -> tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return read_flac_bytes(f.read())


def trim_silence(x: np.ndarray, top_db: float = 60.0,
                 frame_length: int = 2048, hop_length: int = 512) -> np.ndarray:
    """Energy-based lead/tail silence trim (librosa.effects.trim semantics:
    drop frames whose RMS is more than top_db below the max-RMS frame), the
    reference AudioSegment trim path (segment.py:60 / perturb-time
    `trim_silence` dataset knob)."""
    if len(x) == 0:
        return x
    n_frames = max(1, 1 + (len(x) - frame_length) // hop_length) if len(x) >= frame_length else 1
    rms = np.empty(n_frames, np.float64)
    for i in range(n_frames):
        seg = x[i * hop_length : i * hop_length + frame_length]
        rms[i] = np.sqrt(np.mean(np.square(seg, dtype=np.float64))) if len(seg) else 0.0
    ref = rms.max()
    if ref <= 0:
        return x
    keep = rms > ref * (10.0 ** (-top_db / 20.0))
    if not keep.any():
        return x[:0]
    first, last = int(np.argmax(keep)), int(len(keep) - 1 - np.argmax(keep[::-1]))
    start = first * hop_length
    end = min(len(x), last * hop_length + frame_length)
    return x[start:end]


def resample_poly(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return x
    from scipy.signal import resample_poly as _rp

    frac = Fraction(target_sr, orig_sr)
    return _rp(x, frac.numerator, frac.denominator).astype(np.float32)


def decode_audio_bytes(data: bytes, hint: str = "") -> tuple[np.ndarray, int]:
    """Decode an in-memory audio container (WAV/FLAC/MP3/Ogg-Vorbis) by magic
    bytes -> (float32 [T] or [T, C], sr). `hint` (a filename or extension) is
    used only in the error message."""
    from conformer_nemo_tpu.data.codecs import (
        read_mp3_bytes, read_ogg_bytes, read_opus_bytes, sniff_container)

    kind = sniff_container(data)
    if kind == "wav":
        return read_wav_bytes(data)
    if kind == "flac":
        return read_flac_bytes(data)
    if kind == "mp3":
        return read_mp3_bytes(data)
    if kind == "ogg":
        return read_ogg_bytes(data)
    if kind == "opus":
        return read_opus_bytes(data)
    raise ValueError(f"unrecognized audio container{f' for {hint}' if hint else ''} "
                     "(supported: WAV, FLAC, MP3, Ogg/Vorbis, Ogg/Opus)")


def load_audio(
    path: str,
    target_sr: int = 16000,
    offset: float = 0.0,
    duration: float = 0.0,
    mono: bool = True,
    trim: bool = False,
) -> np.ndarray:
    """Decode + mono-mix + resample + crop (+ optional silence trim) ->
    float32 [T] at target_sr."""
    lower = path.lower()
    if lower.endswith(".flac"):
        data, sr = read_flac(path)
    elif lower.endswith(".wav"):
        data, sr = read_wav(path)
    elif lower.endswith(".mp3"):
        from conformer_nemo_tpu.data.codecs import read_mp3

        data, sr = read_mp3(path)
    elif lower.endswith((".ogg", ".oga")):
        # .ogg containers may hold vorbis or opus: dispatch on magic
        with open(path, "rb") as f:
            data, sr = decode_audio_bytes(f.read(), hint=path)
    elif lower.endswith(".opus"):
        from conformer_nemo_tpu.data.codecs import read_opus

        data, sr = read_opus(path)
    else:
        with open(path, "rb") as f:
            data, sr = decode_audio_bytes(f.read(), hint=path)
    if mono and data.ndim > 1:
        data = data.mean(axis=1)
    if offset > 0 or duration > 0:
        start = int(offset * sr)
        end = start + int(duration * sr) if duration > 0 else len(data)
        data = data[start:end]
    data = resample_poly(data, sr, target_sr)
    if trim:
        data = trim_silence(data)
    return np.ascontiguousarray(data, dtype=np.float32)


def load_audio_pcm16(
    path: str,
    target_sr: int = 16000,
    offset: float = 0.0,
    duration: float = 0.0,
) -> np.ndarray:
    """Decode straight to int16 [T] when lossless (mono PCM16 WAV / 16-bps
    mono FLAC already at target_sr) — skips the float32 dequant/requant
    passes, which matter on bandwidth-limited hosts feeding `pcm16` loader
    batches. Falls back to load_audio + quantization otherwise."""
    try:
        if path.lower().endswith(".flac"):
            with open(path, "rb") as f:
                arr, ch, sr, bps = _read_flac_raw(f.read())
            if ch == 1 and bps == 16 and sr == target_sr:
                data = arr.astype(np.int16)
            else:
                raise _Pcm16Fallback
        elif not path.lower().endswith(".wav"):
            raise _Pcm16Fallback  # lossy containers: decode via load_audio
        else:
            with wave.open(path, "rb") as w:
                if (w.getnchannels() == 1 and w.getsampwidth() == 2
                        and w.getframerate() == target_sr):
                    data = np.frombuffer(
                        w.readframes(w.getnframes()), dtype="<i2").copy()
                else:
                    raise _Pcm16Fallback
        if offset > 0 or duration > 0:
            start = int(offset * target_sr)
            end = start + int(duration * target_sr) if duration > 0 else len(data)
            data = data[start:end]
        return data
    except _Pcm16Fallback:
        x = load_audio(path, target_sr=target_sr, offset=offset, duration=duration)
        return np.clip(x * 32768.0, -32768, 32767).astype(np.int16)


class _Pcm16Fallback(Exception):
    pass


def mulaw8_encode(x: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] (or int16) waveform -> int8 mu-law (mu=255) code.

    8-bit transport format for bandwidth-limited host->device links: halves
    the wire bytes vs pcm16 (quarters vs f32) at ~38 dB SNR — logarithmic
    companding keeps quantization noise proportional to signal level, which
    log-mel features are near-insensitive to (tests/test_transport.py
    measures feature + WER neutrality). Device-side decode lives in
    audio/features.py (int8 branch of log_mel_spectrogram)."""
    if x.dtype == np.int16:
        x = x.astype(np.float32) * (1.0 / 32768.0)
    x = np.clip(x.astype(np.float32), -1.0, 1.0)
    y = np.sign(x) * np.log1p(255.0 * np.abs(x)) * (1.0 / np.log(256.0))
    return np.clip(np.rint(y * 127.0), -127, 127).astype(np.int8)


def write_wav(path: str, samples: np.ndarray, sr: int = 16000) -> None:
    """PCM16 writer (test fixtures)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
