"""Pure numpy+zlib image codecs (SURVEY.md §2.B F8; no Pillow in the
sandbox, per the [env] probe). PNG (color type 2, 8-bit RGB), a trivial
raw little-endian format (both lossless — the BASELINE.json:15 per-row
invariant holds exactly through every tiling round-trip), and baseline
JPEG via functions/jpeg_codec (lossy; quality 98 clears the invariant's
PSNR ≥ 40 dB bar on the fixture corpus, tests/test_jpeg.py).

Everything operates on uint8 arrays of shape (h, w, 3).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# module-level (NOT function-level) import: image_codec ships to Python
# workers by cloudpickle value (registry.py), and a runtime import inside
# encode()/decode() would execute on the worker, where the package is not
# on sys.path — the depth-1 sibling of the kernel-import bug the AST gate
# (tests/test_kernel_import_gate.py) bans at depth >= 2.
from etf_topox_spark.functions import jpeg_codec as _jpeg

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray, level: int = 1) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = np.empty((h, 1 + w * 3), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int) -> np.ndarray:
    """Undo PNG scanline filters 0-4 (full spec, not just our encoder's 0)."""
    stride = w * 3
    out = np.zeros((h, stride), np.uint8)
    bpp = 3
    for y in range(h):
        f = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            cur = line
        elif f == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[x] = (cur[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, 1 + w * 3)
    return _unfilter(raw, h, w).reshape(h, w, 3)


# raw format: b"RAW0" + u32le w + u32le h + h*w*3 bytes
def raw_encode(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"RAW0" + struct.pack("<II", w, h) + img.tobytes()


def raw_decode(data: bytes) -> np.ndarray:
    assert data[:4] == b"RAW0"
    w, h = struct.unpack("<II", data[4:12])
    return np.frombuffer(data[12 : 12 + h * w * 3], np.uint8).reshape(h, w, 3).copy()


def encode(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "raw":
        return raw_encode(img)
    if fmt == "jpeg":
        # pure-numpy baseline JFIF (functions/jpeg_codec) — quality 98
        # keeps the fixture corpus above the BASELINE.json:15 PSNR≥40dB
        # lossy invariant (q97 measured 40.8 dB worst; 98 gives margin)
        return _jpeg.jpeg_encode(img, quality=98)
    raise NotImplementedError(
        f"codec {fmt!r} not available in this sandbox (no image libs); "
        "plumbing supports any fmt whose codec is registered here"
    )


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "raw":
        return raw_decode(data)
    if fmt == "jpeg":
        return _jpeg.jpeg_decode(data)
    raise NotImplementedError(f"codec {fmt!r} not available")


def psnr(a: np.ndarray, b: np.ndarray, cap: float = 99.0) -> float:
    """Peak signal-to-noise ratio in dB; identical images → `cap`."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return cap
    return min(cap, 10.0 * np.log10(255.0 * 255.0 / mse))


def average_hash(img: np.ndarray) -> int:
    """64-bit perceptual hash (8×8 block-mean average hash, FIXTURES.md §1).
    Requires h, w divisible by 8 (fixture sizes are).

    Bit k is set iff block k's mean gray exceeds the whole-image mean —
    compared in EXACT integer arithmetic (64·block_sum > total_sum rather
    than float block means vs a float mean), so the hash is a pure integer
    function of the pixels: any engine (numpy here, the SQL twin in
    image_queries._PHASH_CORPUS_SQL) reproduces it bit-for-bit with no
    dependence on float summation order. Equivalent to the float form
    whenever no block mean ties the image mean (verified: min |64·s −
    total| = 4 over the first 2000 fixture images)."""
    h, w, _ = img.shape
    gray = img.astype(np.uint64).sum(axis=2) // 3
    bh, bw = h // 8, w // 8
    s = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).sum(axis=(1, 3))
    bits = (64 * s > s.sum()).ravel()
    out = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))
