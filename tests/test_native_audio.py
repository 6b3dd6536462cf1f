"""Native decoder tests: decode FLAC produced by an independent mini-encoder.

A pure-Python FLAC encoder (verbatim / constant / fixed-predictor subframes
with Rice-coded residuals, correct CRC-8/CRC-16 and UTF-8 frame numbers)
generates bitstreams; the C++ decoder must reproduce the source samples
exactly. WAV decoding is cross-checked against scipy.
"""

import os
import subprocess

import numpy as np
import pytest

from quickvc_tpu.data import native

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not native.available():
        subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)
        native._LIB_TRIED = False  # re-probe
    if not native.available():
        pytest.skip("native library unavailable")


# ----------------------------------------------------------- mini FLAC encoder
class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

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


def crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def rice_encode(bw: BitWriter, residuals, param: int):
    for r in residuals:
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1  # zigzag
        u = (2 * r) if r >= 0 else (-2 * r - 1)
        bw.write_unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


def encode_flac(channels_data: np.ndarray, sr: int = 16000, bps: int = 16,
                blocksize: int = 256, subframe_kind: str = "verbatim") -> bytes:
    """channels_data: (N, C) int samples. Independent channels only."""
    n, c = channels_data.shape
    out = bytearray(b"fLaC")
    # STREAMINFO (last block)
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(c - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)  # md5 zeros
    payload = si.bytes()
    out += bytes([0x80, 0, 0, len(payload)]) + payload

    frame_idx = 0
    pos = 0
    while pos < n:
        bs = min(blocksize, n - pos)
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)       # reserved
        bw.write(0, 1)       # fixed blocksize strategy -> frame number coding
        bw.write(7, 4)       # blocksize: 16-bit at end of header
        bw.write(0, 4)       # sample rate: from STREAMINFO
        bw.write(c - 1, 4)   # independent channels
        bw.write(4, 3)       # 16 bps code
        bw.write(0, 1)
        assert frame_idx < 128
        bw.write(frame_idx, 8)     # UTF-8 single byte
        bw.write(bs - 1, 16)
        header = bw.bytes()
        header += bytes([crc8(header)])

        body = BitWriter()
        for ch in range(c):
            samples = channels_data[pos : pos + bs, ch].astype(np.int64)
            body.write(0, 1)  # padding
            if subframe_kind == "constant" and np.all(samples == samples[0]):
                body.write(0, 6)
                body.write(0, 1)  # no wasted bits
                body.write_signed(int(samples[0]), bps)
            elif subframe_kind == "fixed1":
                body.write(9, 6)  # FIXED order 1
                body.write(0, 1)
                body.write_signed(int(samples[0]), bps)
                res = np.diff(samples)
                body.write(0, 2)   # rice 4-bit method
                body.write(0, 4)   # partition order 0
                param = 6
                body.write(param, 4)
                rice_encode(body, [int(r) for r in res], param)
            else:  # verbatim
                body.write(1, 6)
                body.write(0, 1)
                for s in samples:
                    body.write_signed(int(s), bps)
        frame = header + body.bytes()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
        pos += bs
        frame_idx += 1
    return bytes(out)


@pytest.mark.parametrize("kind", ["verbatim", "fixed1", "constant"])
@pytest.mark.parametrize("channels", [1, 2])
def test_flac_decode_roundtrip(tmp_path, rng, kind, channels):
    n = 1000
    if kind == "constant":
        data = np.full((n, channels), 123, np.int64)
    elif kind == "fixed1":
        # smooth ramps: small first differences fit rice param 6
        base = np.cumsum(rng.integers(-20, 20, size=(n, channels)), axis=0)
        data = base.astype(np.int64)
    else:
        data = rng.integers(-30000, 30000, size=(n, channels)).astype(np.int64)

    path = tmp_path / f"test_{kind}_{channels}.flac"
    path.write_bytes(encode_flac(data, subframe_kind=kind))

    x, sr = native.read_audio(str(path))
    assert sr == 16000
    assert len(x) == n
    expected = data.astype(np.float32).mean(axis=1) / 32768.0
    np.testing.assert_allclose(x, expected, atol=1e-7)


def test_wav_decode_matches_scipy(tmp_path, rng):
    from scipy.io import wavfile

    data = (rng.standard_normal(5000) * 10000).astype(np.int16)
    path = tmp_path / "t.wav"
    wavfile.write(str(path), 16000, data)
    x, sr = native.read_audio(str(path))
    assert sr == 16000
    np.testing.assert_allclose(x, data.astype(np.float32) / 32768.0, atol=1e-7)


def test_wav_float32_decode(tmp_path, rng):
    from scipy.io import wavfile

    data = rng.standard_normal(3000).astype(np.float32) * 0.5
    path = tmp_path / "f.wav"
    wavfile.write(str(path), 22050, data)
    x, sr = native.read_audio(str(path))
    assert sr == 22050
    np.testing.assert_allclose(x, data, atol=1e-6)


def test_autobuild_from_sources(tmp_path):
    """_autobuild produces the .so in a fresh copy of the native tree —
    the lazy first-use build a clean checkout relies on (the .so is a
    gitignored artifact)."""
    import shutil

    nd = tmp_path / "native"
    shutil.copytree(NATIVE_DIR, nd, ignore=shutil.ignore_patterns("*.so", "*.lock",
                                                                  "fuzz_driver_asan"))
    assert not (nd / "libqvc_audio.so").exists()
    native._autobuild(str(nd))
    assert (nd / "libqvc_audio.so").exists()
