"""Native FLAC decoder vs a minimal in-test encoder.

The image has no FLAC encoder, so these tests build spec-conformant FLAC
streams directly (bitwriter + STREAMINFO + frames) covering every subframe
type the decoder implements — VERBATIM, CONSTANT, FIXED orders 0-4 with rice
partitions and escape codes, LPC with quantized shift — plus the three
stereo decorrelation modes and wasted bits. Lossless round-trip means the
decoder must reproduce the original int samples EXACTLY.
"""

import numpy as np
import pytest

from conformer_nemo_tpu.data.audio_io import read_flac_bytes


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        self.bits.extend([0] * q + [1])

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def streaminfo(sr, nch, bps, total):
    bw = BitWriter()
    bw.write(0x80 | 0, 8)  # last metadata block, type 0
    bw.write(34, 24)
    bw.write(4096, 16)  # min block
    bw.write(4096, 16)  # max block
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sr, 20)
    bw.write(nch - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(total, 36)
    for _ in range(16):
        bw.write(0, 8)  # md5
    return bw


def frame_header(bw, block_size, ch_code, bps_code=4, frame_no=0):
    bw.write(0x3FFE, 14)
    bw.write(0, 1)  # reserved
    bw.write(0, 1)  # fixed blocksize stream
    bw.write(7, 4)  # block size: 16-bit field at end
    bw.write(0, 4)  # sample rate: from streaminfo
    bw.write(ch_code, 4)
    bw.write(bps_code, 3)  # 4 => 16-bit
    bw.write(0, 1)
    bw.write(frame_no, 8)  # utf8-coded frame number (single byte < 0x80)
    bw.write(block_size - 1, 16)
    bw.write(0, 8)  # header CRC-8 (decoder consumes, doesn't verify)


def end_frame(bw):
    bw.align()
    bw.write(0, 16)  # frame CRC-16


def sub_verbatim(bw, samples, bps):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)  # no wasted bits
    for s in samples:
        bw.write_signed(int(s), bps)


def sub_constant(bw, value, bps):
    bw.write(0, 1)
    bw.write(0, 6)
    bw.write(0, 1)
    bw.write_signed(int(value), bps)


def rice_residual(bw, residual, order, param, partition_order=0, escape=False):
    bw.write(0, 2)  # rice method, 4-bit params
    bw.write(partition_order, 4)
    n = len(residual) + order
    psize = n >> partition_order
    idx = 0
    for p in range(1 << partition_order):
        count = psize - (order if p == 0 else 0)
        if escape:
            bw.write(15, 4)
            bw.write(17, 5)
            for _ in range(count):
                bw.write_signed(int(residual[idx]), 17)
                idx += 1
        else:
            bw.write(param, 4)
            for _ in range(count):
                v = int(residual[idx])
                idx += 1
                u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
                u = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
                bw.write_unary(u >> param)
                bw.write(u & ((1 << param) - 1), param)


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def sub_fixed(bw, samples, bps, order, param=3, partition_order=0, escape=False):
    bw.write(0, 1)
    bw.write(8 + order, 6)
    bw.write(0, 1)
    for s in samples[:order]:
        bw.write_signed(int(s), bps)
    coef = _FIXED_COEF[order]
    res = [
        int(samples[i]) - sum(c * int(samples[i - 1 - j]) for j, c in enumerate(coef))
        for i in range(order, len(samples))
    ]
    rice_residual(bw, res, order, param, partition_order, escape)


def sub_lpc(bw, samples, bps, coefs, shift, precision=12, param=4):
    order = len(coefs)
    bw.write(0, 1)
    bw.write(32 + order - 1, 6)
    bw.write(0, 1)
    for s in samples[:order]:
        bw.write_signed(int(s), bps)
    bw.write(precision - 1, 4)
    bw.write_signed(shift, 5)
    for c in coefs:
        bw.write_signed(int(c), precision)
    res = []
    for i in range(order, len(samples)):
        acc = sum(int(c) * int(samples[i - 1 - j]) for j, c in enumerate(coefs))
        res.append(int(samples[i]) - (acc >> shift))
    rice_residual(bw, res, order, param)


def make_flac(frames_fn, sr=16000, nch=1, bps=16, total=0):
    bw = BitWriter()
    frames_fn(bw)
    body = bw.bytes()
    return b"fLaC" + streaminfo(sr, nch, bps, total).bytes() + body


def test_verbatim_and_constant_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randint(-32768, 32767, size=256).astype(np.int64)

    def frames(bw):
        frame_header(bw, 256, ch_code=0)
        sub_verbatim(bw, x, 16)
        end_frame(bw)
        frame_header(bw, 64, ch_code=0, frame_no=1)
        sub_constant(bw, -123, 16)
        end_frame(bw)

    audio, sr = read_flac_bytes(make_flac(frames, total=320))
    assert sr == 16000 and audio.shape == (320,)
    np.testing.assert_array_equal((audio[:256] * 32768).round().astype(np.int64), x)
    np.testing.assert_array_equal((audio[256:] * 32768).round().astype(np.int64), -123)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("partition_order", [0, 2])
def test_fixed_orders_roundtrip(order, partition_order):
    rng = np.random.RandomState(order)
    # smooth signal so fixed-predictor residuals are small
    t = np.arange(512)
    x = (1000 * np.sin(t / 17.0) + rng.randint(-20, 20, size=512)).astype(np.int64)

    def frames(bw):
        frame_header(bw, 512, ch_code=0)
        sub_fixed(bw, x, 16, order, param=5, partition_order=partition_order)
        end_frame(bw)

    audio, _ = read_flac_bytes(make_flac(frames, total=512))
    np.testing.assert_array_equal((audio * 32768).round().astype(np.int64), x)


def test_rice_escape_roundtrip():
    rng = np.random.RandomState(7)
    x = rng.randint(-30000, 30000, size=128).astype(np.int64)

    def frames(bw):
        frame_header(bw, 128, ch_code=0)
        sub_fixed(bw, x, 16, order=1, escape=True)
        end_frame(bw)

    audio, _ = read_flac_bytes(make_flac(frames, total=128))
    np.testing.assert_array_equal((audio * 32768).round().astype(np.int64), x)


def test_lpc_roundtrip():
    rng = np.random.RandomState(3)
    t = np.arange(512)
    x = (5000 * np.sin(t / 9.0) + rng.randint(-50, 50, size=512)).astype(np.int64)

    def frames(bw):
        frame_header(bw, 512, ch_code=0)
        sub_lpc(bw, x, 16, coefs=[3000, -1500, 400], shift=11, precision=14)
        end_frame(bw)

    audio, _ = read_flac_bytes(make_flac(frames, total=512))
    np.testing.assert_array_equal((audio * 32768).round().astype(np.int64), x)


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation(mode):
    rng = np.random.RandomState(11)
    left = rng.randint(-20000, 20000, size=256).astype(np.int64)
    right = rng.randint(-20000, 20000, size=256).astype(np.int64)
    side = left - right

    def frames(bw):
        if mode == "left_side":
            frame_header(bw, 256, ch_code=8)
            sub_verbatim(bw, left, 16)
            sub_verbatim(bw, side, 17)  # side channel carries +1 bit
        elif mode == "right_side":
            frame_header(bw, 256, ch_code=9)
            sub_verbatim(bw, side, 17)
            sub_verbatim(bw, right, 16)
        else:
            mid = (left + right) >> 1
            frame_header(bw, 256, ch_code=10)
            sub_verbatim(bw, mid, 16)
            sub_verbatim(bw, side, 17)

    audio, _ = read_flac_bytes(make_flac(frames, nch=2, total=256))
    got = (audio * 32768).round().astype(np.int64)
    np.testing.assert_array_equal(got[:, 0], left)
    np.testing.assert_array_equal(got[:, 1], right)


def test_load_audio_flac_path(tmp_path):
    rng = np.random.RandomState(5)
    x = rng.randint(-32768, 32767, size=16000).astype(np.int64)

    def frames(bw):
        for fno in range(4):
            frame_header(bw, 4000, ch_code=0, frame_no=fno)
            sub_verbatim(bw, x[fno * 4000 : (fno + 1) * 4000], 16)
            end_frame(bw)

    p = tmp_path / "utt.flac"
    p.write_bytes(make_flac(frames, total=16000))
    from conformer_nemo_tpu.data.audio_io import load_audio

    out = load_audio(str(p), target_sr=16000)
    np.testing.assert_array_equal((out * 32768).round().astype(np.int64), x)


def test_wasted_bits_roundtrip():
    """Subframes with wasted bits: samples encoded right-shifted by k with a
    unary wasted-bits count; decoder must shift back."""
    rng = np.random.RandomState(13)
    k = 3
    x = (rng.randint(-4000, 4000, size=128) << k).astype(np.int64)

    def frames(bw):
        frame_header(bw, 128, ch_code=0)
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(1, 1)  # wasted bits present
        bw.write_unary(k - 1)  # k = count-of-zeros + 1
        for s in x >> k:
            bw.write_signed(int(s), 16 - k)
        end_frame(bw)

    audio, _ = read_flac_bytes(make_flac(frames, total=128))
    np.testing.assert_array_equal((audio * 32768).round().astype(np.int64), x)


@pytest.mark.parametrize("bps,bps_code", [(8, 1), (24, 6)])
def test_other_bit_depths(bps, bps_code):
    rng = np.random.RandomState(bps)
    lim = 1 << (bps - 1)
    x = rng.randint(-lim, lim - 1, size=64).astype(np.int64)

    def frames(bw):
        frame_header(bw, 64, ch_code=0, bps_code=bps_code)
        sub_verbatim(bw, x, bps)
        end_frame(bw)

    audio, _ = read_flac_bytes(make_flac(frames, bps=bps, total=64))
    np.testing.assert_array_equal((audio * lim).round().astype(np.int64), x)
