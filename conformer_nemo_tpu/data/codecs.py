"""Lossy-codec audio IO over the system codec libraries (ctypes).

Parity target: reference `AudioSegment.from_file`
(`/root/reference/nemo/collections/asr/parts/preprocessing/segment.py:60`),
which decodes mp3/ogg through libsndfile (soundfile's cffi binding) or pydub.
This image ships no header files and no soundfile, so we bind the runtime
codec libraries directly — the exact same division of labor: host-side
native decode feeding the device pipeline.

Decoders:
- mp3  -> libmpg123   (feed API: works on in-memory bytes, tar shards too)
- ogg/vorbis -> libvorbisfile (ov_open_callbacks over an in-memory cursor)

Encoders (fixture/corpus generation; the reference gets these from sox):
- mp3  -> libmp3lame
- ogg/vorbis -> libvorbis + libvorbisenc + libogg

Everything is lazy: libraries load on first use; callers get a clear
RuntimeError when a codec library is absent from the host.
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

# ---------------------------------------------------------------- lib loading

_LIBS: dict[str, object] = {}


def _lib(key: str, sonames: tuple[str, ...]):
    """dlopen the first available soname (only versioned .so files ship in
    this image — there are no dev symlinks)."""
    if key in _LIBS:
        lib = _LIBS[key]
        if lib is None:
            raise RuntimeError(f"codec library {sonames[0]} is not available on this host")
        return lib
    for name in sonames:
        try:
            _LIBS[key] = ctypes.CDLL(name)
            return _LIBS[key]
        except OSError:
            continue
    _LIBS[key] = None
    raise RuntimeError(f"codec library {sonames[0]} is not available on this host")


def have_codec(name: str) -> bool:
    """True if the decode path for `name` ('mp3' | 'ogg') can load."""
    try:
        if name == "mp3":
            _mpg123()
        elif name == "ogg":
            _oggshim()
        elif name == "opus":
            _opusshim()
        else:
            return False
        return True
    except RuntimeError:
        return False


# ------------------------------------------------------------------ mp3 read

_MPG123_OK = 0
_MPG123_NEED_MORE = -10
_MPG123_NEW_FORMAT = -11
_MPG123_DONE = -12
_ENC_S16 = 0xD0        # MPG123_ENC_SIGNED_16
_ENC_F32 = 0x200       # MPG123_ENC_FLOAT_32
_ENC_S32 = 0x1100      # MPG123_ENC_SIGNED_32


def _mpg123():
    lib = _lib("mpg123", ("libmpg123.so.0", "libmpg123.so"))
    if not getattr(lib, "_proto_done", False):
        lib.mpg123_init.restype = ctypes.c_int
        lib.mpg123_new.restype = ctypes.c_void_p
        lib.mpg123_new.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
        lib.mpg123_open_feed.restype = ctypes.c_int
        lib.mpg123_open_feed.argtypes = [ctypes.c_void_p]
        lib.mpg123_feed.restype = ctypes.c_int
        lib.mpg123_feed.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
        lib.mpg123_read.restype = ctypes.c_int
        lib.mpg123_read.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t)]
        lib.mpg123_getformat.restype = ctypes.c_int
        lib.mpg123_getformat.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.mpg123_close.argtypes = [ctypes.c_void_p]
        lib.mpg123_delete.argtypes = [ctypes.c_void_p]
        lib.mpg123_init()  # no-op in modern libmpg123; required pre-1.27
        lib._proto_done = True
    return lib


def read_mp3_bytes(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an in-memory MP3 stream -> (float32 [T] or [T, C], sr)."""
    lib = _mpg123()
    err = ctypes.c_int(0)
    h = lib.mpg123_new(None, ctypes.byref(err))
    if not h:
        raise RuntimeError(f"mpg123_new failed (code {err.value})")
    try:
        if lib.mpg123_open_feed(h) != _MPG123_OK:
            raise ValueError("mpg123_open_feed failed")
        if lib.mpg123_feed(h, data, len(data)) != _MPG123_OK:
            raise ValueError("mpg123_feed failed")
        rate = ctypes.c_long(0)
        channels = ctypes.c_int(0)
        encoding = ctypes.c_int(0)
        chunks: list[bytes] = []
        buf = ctypes.create_string_buffer(1 << 18)
        done = ctypes.c_size_t(0)
        while True:
            rc = lib.mpg123_read(h, buf, len(buf), ctypes.byref(done))
            if done.value:
                chunks.append(buf.raw[: done.value])
            if rc == _MPG123_NEW_FORMAT:
                lib.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(channels),
                                     ctypes.byref(encoding))
            elif rc in (_MPG123_DONE, _MPG123_NEED_MORE):
                break  # NEED_MORE after the full feed == end of stream
            elif rc != _MPG123_OK:
                raise ValueError(f"mpg123_read failed (code {rc})")
        if rate.value == 0:
            raise ValueError("mp3 decode produced no format (corrupt stream?)")
        raw = b"".join(chunks)
        enc = encoding.value
        if enc == _ENC_S16:
            audio = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif enc == _ENC_F32:
            audio = np.frombuffer(raw, dtype="<f4").astype(np.float32)
        elif enc == _ENC_S32:
            audio = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unexpected mpg123 output encoding 0x{enc:x}")
        ch = channels.value
        if ch > 1:
            audio = audio[: (len(audio) // ch) * ch].reshape(-1, ch)
        return audio, int(rate.value)
    finally:
        lib.mpg123_close(h)
        lib.mpg123_delete(h)


def read_mp3(path: str) -> tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return read_mp3_bytes(f.read())


# ----------------------------------------------------------- ogg/vorbis read
#
# Decode goes through a small C shim (native/codecshim/ogg_mem.c) built on
# demand and linked against the system libvorbisfile by full path: ctypes
# cannot pass vorbisfile's by-value ov_callbacks struct to ov_open_callbacks
# (verified: identical C caller works, the ctypes call never reaches the
# callbacks), and a C memory cursor is faster than Python read callbacks
# anyway.

_SHIMS: dict[str, object] = {}
_SHIM_BUILD_LOCK = threading.Lock()


def _find_codec_so(stems: tuple[str, ...]) -> str | None:
    """Locate a versioned runtime .so (no dev symlinks in this image)."""
    import glob

    for d in ("/usr/lib/x86_64-linux-gnu", "/usr/lib", "/usr/local/lib",
              "/lib/x86_64-linux-gnu"):
        for stem in stems:
            hits = sorted(glob.glob(f"{d}/{stem}.so*"))
            if hits:
                return hits[0]
    return None


# s16 decode entry points share one signature: (data, len, &out, &n, &ch, &sr)
_DECODE_S16_ARGTYPES = [
    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
    ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.c_int)]


def _build_shim(key: str, src_name: str, dep_stems: tuple[str, ...], proto):
    """Build/load a native/codecshim source on demand, linked against the
    system codec libraries by full path (flacdec on-demand g++ pattern).
    `proto(lib)` declares the ctypes prototypes. Failures are cached."""
    # serialize first-use builds: loader worker threads can hit this
    # concurrently, and two gcc processes writing the same .so (gcc truncates
    # in place) would CDLL a torn file and cache a permanent failure
    with _SHIM_BUILD_LOCK:
        cached = _SHIMS.get(key)
        if isinstance(cached, str):  # cached failure message
            raise RuntimeError(cached)
        if cached is not None:
            return cached
        import os
        import subprocess

        root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        src = os.path.join(root, "native", "codecshim", src_name)
        build = os.path.join(root, "native", "build")
        so = os.path.join(build, f"lib{key}.so")
        deps = [_find_codec_so((stem,)) for stem in dep_stems]
        if any(d is None for d in deps):
            missing = [s for s, d in zip(dep_stems, deps) if d is None]
            _SHIMS[key] = f"{'/'.join(missing)} not available on this host"
            raise RuntimeError(_SHIMS[key])
        try:
            os.makedirs(build, exist_ok=True)
            if not (os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src)):
                # compile to a private temp name, then atomic-rename into
                # place (other PROCESSES may be racing on the same path)
                tmp = f"{so}.tmp.{os.getpid()}"
                try:
                    subprocess.run(
                        ["gcc", "-O2", "-shared", "-fPIC", src, *deps, "-o", tmp],
                        check=True, capture_output=True)
                    os.replace(tmp, so)
                finally:
                    if os.path.exists(tmp):
                        os.unlink(tmp)
            lib = ctypes.CDLL(so)
            proto(lib)
            _SHIMS[key] = lib
            return lib
        except Exception as e:  # compiler missing / link failure
            _SHIMS[key] = f"{key} shim unavailable: {e}"
            raise RuntimeError(_SHIMS[key])


def _oggshim():
    def proto(lib):
        lib.ogg_vorbis_decode.restype = ctypes.c_int
        lib.ogg_vorbis_decode.argtypes = _DECODE_S16_ARGTYPES
        lib.ogg_vorbis_free.argtypes = [ctypes.POINTER(ctypes.c_int16)]

    return _build_shim("ogg_mem", "ogg_mem.c", ("libvorbisfile",), proto)


def read_ogg_bytes(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an in-memory Ogg/Vorbis stream -> (float32 [T] or [T, C], sr)."""
    lib = _oggshim()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    out = ctypes.POINTER(ctypes.c_int16)()
    n = ctypes.c_int64()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    rc = lib.ogg_vorbis_decode(buf, len(data), ctypes.byref(out),
                               ctypes.byref(n), ctypes.byref(ch), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"Ogg/Vorbis decode failed (code {rc})")
    try:
        total = n.value * ch.value
        pcm = np.ctypeslib.as_array(out, shape=(total,)).copy()
    finally:
        lib.ogg_vorbis_free(out)
    audio = pcm.astype(np.float32) / 32768.0
    if ch.value > 1:
        audio = audio.reshape(-1, ch.value)
    return audio, sr.value


def read_ogg(path: str) -> tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return read_ogg_bytes(f.read())


# ----------------------------------------------------------------- mp3 write

def _lame():
    lib = _lib("lame", ("libmp3lame.so.0", "libmp3lame.so"))
    if not getattr(lib, "_proto_done", False):
        lib.lame_init.restype = ctypes.c_void_p
        for fn in ("lame_set_in_samplerate", "lame_set_num_channels",
                   "lame_set_brate", "lame_set_quality", "lame_set_mode",
                   "lame_init_params", "lame_close"):
            f = getattr(lib, fn)
            f.restype = ctypes.c_int
            f.argtypes = [ctypes.c_void_p] + ([ctypes.c_int] if "set_" in fn else [])
        lib.lame_encode_buffer.restype = ctypes.c_int
        lib.lame_encode_buffer.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int]
        lib.lame_encode_flush.restype = ctypes.c_int
        lib.lame_encode_flush.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib._proto_done = True
    return lib


def write_mp3(path: str, samples: np.ndarray, sr: int = 16000,
              bitrate_kbps: int = 128) -> None:
    """Encode mono float32 [-1, 1] -> MP3 (fixture/corpus generation)."""
    lib = _lame()
    gfp = lib.lame_init()
    if not gfp:
        raise RuntimeError("lame_init failed")
    try:
        lib.lame_set_in_samplerate(gfp, sr)
        lib.lame_set_num_channels(gfp, 1)
        lib.lame_set_mode(gfp, 3)  # MONO
        lib.lame_set_brate(gfp, bitrate_kbps)
        lib.lame_set_quality(gfp, 2)
        if lib.lame_init_params(gfp) < 0:
            raise RuntimeError("lame_init_params failed")
        pcm = np.clip(np.asarray(samples, np.float32), -1.0, 1.0)
        pcm = (pcm * 32767.0).astype("<i2")
        out = ctypes.create_string_buffer(len(pcm) * 5 // 4 + 7200)
        n = lib.lame_encode_buffer(
            gfp, pcm.ctypes.data_as(ctypes.c_void_p),
            pcm.ctypes.data_as(ctypes.c_void_p), len(pcm), out, len(out))
        if n < 0:
            raise RuntimeError(f"lame_encode_buffer failed (code {n})")
        tail = ctypes.create_string_buffer(7200)
        m = lib.lame_encode_flush(gfp, tail, len(tail))
        with open(path, "wb") as f:
            f.write(out.raw[:n])
            if m > 0:
                f.write(tail.raw[:m])
    finally:
        lib.lame_close(gfp)


# ---------------------------------------------------------- ogg/vorbis write

class _OggPage(ctypes.Structure):
    _fields_ = [("header", ctypes.c_void_p), ("header_len", ctypes.c_long),
                ("body", ctypes.c_void_p), ("body_len", ctypes.c_long)]


def _vorbis_enc_libs():
    ogg = _lib("ogg", ("libogg.so.0", "libogg.so"))
    vorbis = _lib("vorbis", ("libvorbis.so.0", "libvorbis.so"))
    venc = _lib("vorbisenc", ("libvorbisenc.so.2", "libvorbisenc.so"))
    if not getattr(vorbis, "_proto_done", False):
        vorbis.vorbis_analysis_buffer.restype = ctypes.POINTER(
            ctypes.POINTER(ctypes.c_float))
        vorbis.vorbis_analysis_buffer.argtypes = [ctypes.c_void_p, ctypes.c_int]
        venc.vorbis_encode_init_vbr.restype = ctypes.c_int
        venc.vorbis_encode_init_vbr.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_float]
        vorbis._proto_done = True
    return ogg, vorbis, venc


def write_ogg(path: str, samples: np.ndarray, sr: int = 16000,
              quality: float = 0.4) -> None:
    """Encode mono float32 [-1, 1] -> Ogg/Vorbis (fixture/corpus generation).

    Standard libvorbis encode loop (analysis -> blockout -> bitrate ->
    packetin -> pageout), all structs held as oversized opaque buffers."""
    ogg, vorbis, venc = _vorbis_enc_libs()
    vi = ctypes.create_string_buffer(256)    # vorbis_info (56 B)
    vc = ctypes.create_string_buffer(64)     # vorbis_comment (32 B)
    vd = ctypes.create_string_buffer(4096)   # vorbis_dsp_state
    vb = ctypes.create_string_buffer(4096)   # vorbis_block
    os_ = ctypes.create_string_buffer(4096)  # ogg_stream_state (~408 B)
    op = ctypes.create_string_buffer(64)     # ogg_packet (48 B)
    page = _OggPage()

    vorbis.vorbis_info_init(vi)
    inited = []
    try:
        if venc.vorbis_encode_init_vbr(vi, 1, sr, ctypes.c_float(quality)) != 0:
            raise RuntimeError("vorbis_encode_init_vbr failed")
        vorbis.vorbis_comment_init(vc)
        inited.append(lambda: vorbis.vorbis_comment_clear(vc))
        if vorbis.vorbis_analysis_init(vd, vi) != 0:
            raise RuntimeError("vorbis_analysis_init failed")
        inited.append(lambda: vorbis.vorbis_dsp_clear(vd))
        vorbis.vorbis_block_init(vd, vb)
        inited.append(lambda: vorbis.vorbis_block_clear(vb))
        ogg.ogg_stream_init(os_, 1)
        inited.append(lambda: ogg.ogg_stream_clear(os_))

        h1 = ctypes.create_string_buffer(64)
        h2 = ctypes.create_string_buffer(64)
        h3 = ctypes.create_string_buffer(64)
        vorbis.vorbis_analysis_headerout(vd, vc, h1, h2, h3)
        for h in (h1, h2, h3):
            ogg.ogg_stream_packetin(os_, h)

        out = []

        def _drain(flush: bool):
            fn = ogg.ogg_stream_flush if flush else ogg.ogg_stream_pageout
            while fn(os_, ctypes.byref(page)) != 0:
                out.append(ctypes.string_at(page.header, page.header_len))
                out.append(ctypes.string_at(page.body, page.body_len))

        _drain(flush=True)  # header pages must precede audio data

        def _encode_pending():
            while vorbis.vorbis_analysis_blockout(vd, vb) == 1:
                vorbis.vorbis_analysis(vb, None)
                vorbis.vorbis_bitrate_addblock(vb)
                while vorbis.vorbis_bitrate_flushpacket(vd, op) == 1:
                    ogg.ogg_stream_packetin(os_, op)
                    _drain(flush=False)

        pcm = np.clip(np.ascontiguousarray(samples, np.float32), -1.0, 1.0)
        CHUNK = 4096
        for start in range(0, len(pcm), CHUNK):
            block = pcm[start: start + CHUNK]
            bufpp = vorbis.vorbis_analysis_buffer(vd, len(block))
            ctypes.memmove(bufpp[0], block.ctypes.data, 4 * len(block))
            vorbis.vorbis_analysis_wrote(vd, len(block))
            _encode_pending()
        vorbis.vorbis_analysis_wrote(vd, 0)  # end of stream
        _encode_pending()
        _drain(flush=True)
        with open(path, "wb") as f:
            f.write(b"".join(out))
    finally:
        for clear in reversed(inited):
            clear()
        vorbis.vorbis_info_clear(vi)


# ------------------------------------------------------------- ogg/opus IO

def _opusshim():
    def proto(lib):
        lib.ogg_opus_decode.restype = ctypes.c_int
        lib.ogg_opus_decode.argtypes = _DECODE_S16_ARGTYPES
        lib.ogg_opus_free.argtypes = [ctypes.POINTER(ctypes.c_int16)]
        lib.ogg_opus_encode.restype = ctypes.c_int
        lib.ogg_opus_encode.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64)]
        lib.ogg_opus_free_bytes.argtypes = [ctypes.POINTER(ctypes.c_uint8)]

    return _build_shim("opus_mem", "opus_mem.c", ("libopus", "libogg"), proto)


def read_opus_bytes(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an in-memory Ogg/Opus stream -> (float32 [T] or [T, C], 48000).

    Opus always decodes at 48 kHz; callers (load_audio) resample to target."""
    lib = _opusshim()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    out = ctypes.POINTER(ctypes.c_int16)()
    n = ctypes.c_int64()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    rc = lib.ogg_opus_decode(buf, len(data), ctypes.byref(out),
                             ctypes.byref(n), ctypes.byref(ch), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"Ogg/Opus decode failed (code {rc})")
    try:
        total = n.value * ch.value
        pcm = np.ctypeslib.as_array(out, shape=(total,)).copy() if total else \
            np.zeros((0,), np.int16)
    finally:
        lib.ogg_opus_free(out)
    audio = pcm.astype(np.float32) / 32768.0
    if ch.value > 1:
        audio = audio.reshape(-1, ch.value)
    return audio, sr.value


def read_opus(path: str) -> tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return read_opus_bytes(f.read())


def write_opus(path: str, samples: np.ndarray, sr: int = 16000,
               bitrate_bps: int = 64000) -> None:
    """Encode mono float32 [-1, 1] at sr in {8,12,16,24,48} kHz -> Ogg/Opus."""
    if sr not in (8000, 12000, 16000, 24000, 48000):
        raise ValueError(f"opus input rate must be 8/12/16/24/48 kHz, got {sr}")
    lib = _opusshim()
    pcm = np.clip(np.ascontiguousarray(samples, np.float32), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_int64()
    rc = lib.ogg_opus_encode(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(pcm), sr,
        bitrate_bps, ctypes.byref(out), ctypes.byref(out_len))
    if rc != 0:
        raise RuntimeError(f"Ogg/Opus encode failed (code {rc})")
    try:
        data = ctypes.string_at(out, out_len.value)
    finally:
        lib.ogg_opus_free_bytes(out)
    with open(path, "wb") as f:
        f.write(data)


# -------------------------------------------------------- container dispatch

def sniff_container(data: bytes) -> str:
    """Identify an audio container from magic bytes -> 'wav'|'flac'|'mp3'|
    'ogg'|'opus'|'unknown'."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:4] == b"OggS":
        # first packet starts after the 27-byte page header + segment table
        if len(data) > 27:
            first = 27 + data[26]
            if data[first: first + 8] == b"OpusHead":
                return "opus"
        return "ogg"
    if data[:3] == b"ID3":
        return "mp3"
    if len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0:
        return "mp3"
    return "unknown"
