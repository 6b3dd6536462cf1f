"""Fuzz gate for the native audio decoder (VERDICT r3 item 4).

``native/qvc_audio.cpp`` hand-parses untrusted bytes (FLAC bit reader,
Rice residuals, UTF-8 frame numbers, RIFF chunk walking). A corrupt file
in a training corpus must surface as a negative error code — never crash,
hang, or overrun a buffer in a loader worker.

Two layers:

1. A few hundred mutations (truncations, bit flips, header corruption,
   random garbage) of valid FLAC/WAV fixtures run through
   ``native/fuzz_driver_asan`` — qvc_audio compiled with
   -fsanitize=address,undefined -fno-sanitize-recover, plus a
   deliberately tiny decode buffer per file to exercise the capacity
   guard. Any OOB/UB aborts the driver and fails the test.
2. The same ctypes bindings the loader uses must convert malformed input
   into Python IOError, not a segfault.

The hardening this gate pinned down (found by inspection + fuzz):
warmup-sample counts past the blocksize (heap overflow), unary wasted-bits
past the sample width (shift UB), truncated WAV fmt chunks (OOB read),
zero bps/channels (div by zero), predictor arithmetic overflow (UB).
"""

import os
import subprocess

import numpy as np
import pytest

from quickvc_tpu.data import native
from test_native_audio import BitWriter, crc8, encode_flac

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
DRIVER = os.path.join(NATIVE_DIR, "fuzz_driver_asan")


@pytest.fixture(scope="module", autouse=True)
def built():
    subprocess.run(["make", "-C", NATIVE_DIR, "all", "asan"],
                   check=True, capture_output=True)
    native._LIB_TRIED = False
    assert native.available()
    assert os.path.exists(DRIVER)


def _wav_bytes(rng, dtype) -> bytes:
    from scipy.io import wavfile
    import io

    if dtype == "s16":
        data = (rng.standard_normal(4000) * 10000).astype(np.int16)
    elif dtype == "f32":
        data = rng.standard_normal(4000).astype(np.float32) * 0.5
    else:  # s32
        data = (rng.standard_normal(4000) * 1e8).astype(np.int32)
    buf = io.BytesIO()
    wavfile.write(buf, 16000, data)
    return buf.getvalue()


def _seed_corpus(rng) -> list[bytes]:
    seeds = []
    for kind in ("verbatim", "fixed1", "constant"):
        for ch in (1, 2):
            if kind == "constant":
                data = np.full((2000, ch), 123, np.int64)
            elif kind == "fixed1":
                data = np.cumsum(rng.integers(-20, 20, size=(2000, ch)),
                                 axis=0).astype(np.int64)
            else:
                data = rng.integers(-30000, 30000, size=(2000, ch)).astype(np.int64)
            seeds.append(encode_flac(data, subframe_kind=kind))
    for dtype in ("s16", "f32", "s32"):
        seeds.append(_wav_bytes(rng, dtype))
    return seeds


def _mutations(seed: bytes, rng) -> list[bytes]:
    out = []
    n = len(seed)
    # truncations — including inside the header and mid-frame
    for _ in range(6):
        out.append(seed[: int(rng.integers(0, n))])
    # random byte flips (1..8 bytes anywhere)
    for _ in range(14):
        m = bytearray(seed)
        for _ in range(int(rng.integers(1, 9))):
            m[int(rng.integers(0, n))] ^= int(rng.integers(1, 256))
        out.append(bytes(m))
    # header-targeted corruption (first 64 bytes hold STREAMINFO / fmt)
    for _ in range(8):
        m = bytearray(seed)
        for _ in range(int(rng.integers(1, 5))):
            m[int(rng.integers(0, min(64, n)))] ^= int(rng.integers(1, 256))
        out.append(bytes(m))
    return out


def _crafted_lpc_overflow() -> bytes:
    """Directed adversarial FLAC: a blocksize-1 frame declaring an LPC
    subframe of order 32 — 32 warmup samples into a 1-sample buffer. This
    is the exact heap overflow the round-4 hardening closed
    (qvc_audio.cpp decode_subframe ``order > blocksize`` guard); kept as a
    regression tripwire for the ASAN gate."""
    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(1, 16); si.write(1, 16)         # min/max blocksize
    si.write(0, 24); si.write(0, 24)
    si.write(16000, 20)
    si.write(0, 3)                           # 1 channel
    si.write(15, 5)                          # 16 bps
    si.write(1, 36)                          # 1 total sample
    for _ in range(16):
        si.write(0, 8)
    payload = si.bytes()
    out += bytes([0x80, 0, 0, len(payload)]) + payload

    bw = BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 1); bw.write(0, 1)
    bw.write(6, 4)                           # blocksize: 8-bit at end
    bw.write(0, 4)                           # sr from STREAMINFO
    bw.write(0, 4)                           # 1 channel
    bw.write(4, 3)                           # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)                           # frame number (UTF-8, 1 byte)
    bw.write(0, 8)                           # blocksize-1 = 0 -> blocksize 1
    header = bw.bytes()
    header += bytes([crc8(header)])

    body = BitWriter()
    body.write(0, 1)                         # padding
    body.write(63, 6)                        # LPC, order 32
    body.write(0, 1)                         # no wasted bits
    for i in range(32):                      # 32 warmup samples
        body.write_signed(i * 999, 16)
    body.write(14, 4)                        # precision 15
    body.write(0, 5)                         # shift 0
    for _ in range(32):
        body.write_signed(1, 15)             # coefficients
    body.write(0, 2); body.write(0, 4); body.write(6, 4)  # rice header
    return bytes(out + header + body.bytes() + b"\x00\x00")


def test_fuzz_asan_clean(tmp_path, rng):
    """~300 malformed inputs through the ASAN+UBSAN driver: no aborts."""
    paths = []

    def add(data: bytes):
        p = tmp_path / f"m{len(paths):04d}.bin"
        p.write_bytes(data)
        paths.append(str(p))

    seeds = _seed_corpus(rng)
    for s in seeds:
        add(s)  # the unmutated seed must decode cleanly too
        for m in _mutations(s, rng):
            add(m)
    add(_crafted_lpc_overflow())  # directed: order-32 LPC in a 1-sample frame
    # pure garbage, magic-only, and empty files
    add(b"")
    add(b"fLaC")
    add(b"RIFF")
    add(b"RIFF\x00\x00\x00\x00WAVE")
    for _ in range(16):
        add(rng.integers(0, 256, size=int(rng.integers(1, 4096)),
                         dtype=np.uint8).tobytes())

    # batches keep argv under control; timeout guards against hangs
    bs = 64
    for i in range(0, len(paths), bs):
        proc = subprocess.run([DRIVER] + paths[i : i + bs],
                              capture_output=True, timeout=300)
        assert proc.returncode == 0, (
            f"sanitizer abort on batch {i // bs}:\n"
            + proc.stderr.decode(errors="replace")[-3000:])


def test_malformed_inputs_raise_ioerror(tmp_path, rng):
    """The loader-facing ctypes path turns corrupt files into IOError."""
    flac = encode_flac(np.cumsum(rng.integers(-9, 9, size=(1000, 1)),
                                 axis=0).astype(np.int64),
                       subframe_kind="fixed1")
    cases = {
        "trunc_header.flac": flac[:20],
        "trunc_frame.flac": flac[: len(flac) // 2],
        "empty.flac": b"",
        "garbage.wav": bytes(rng.integers(0, 256, 512, dtype=np.uint8)),
        "zero_fmt.wav": b"RIFF\xff\x00\x00\x00WAVEfmt \x10\x00\x00\x00"
                        + b"\x00" * 16 + b"data\x04\x00\x00\x00\x00\x00\x00\x00",
    }
    for name, data in cases.items():
        p = tmp_path / name
        p.write_bytes(data)
        with pytest.raises((IOError, RuntimeError)):
            native.read_audio(str(p))
    # a valid file still round-trips after all that
    good = tmp_path / "good.flac"
    good.write_bytes(flac)
    x, sr = native.read_audio(str(good))
    assert sr == 16000 and len(x) == 1000


def test_truncated_frame_partial_or_error(tmp_path, rng):
    """A FLAC truncated mid-frame must yield either a clean error or a
    shorter-than-declared decode — qvc_decode's return is what the
    bindings trust for the output length."""
    data = np.cumsum(rng.integers(-9, 9, size=(2000, 1)), axis=0).astype(np.int64)
    flac = encode_flac(data, subframe_kind="fixed1")
    p = tmp_path / "t.flac"
    p.write_bytes(flac[: int(len(flac) * 0.7)])
    try:
        x, _sr = native.read_audio(str(p))
        assert len(x) <= 2000
    except IOError:
        pass  # clean rejection is equally acceptable
