"""Real WAV/PCM audio path (functions/audio_codec + operators/multimodal):
codec dialect coverage and a pure-numpy oracle for the Spark feature kernel
(VERDICT r3 "Next round" #8 done-criterion).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etf_topox_spark.functions.audio_codec import wav_decode, wav_encode
from etf_topox_spark.operators.multimodal import audio_features
from etf_topox_spark.sources.audio import clip_pcm, clip_wav, synthetic_audio


def test_encode_decode_roundtrip_int16():
    pcm = np.sin(np.linspace(0, 20, 4000))[:, None]
    out, sr, ch = wav_decode(wav_encode(pcm, 12345))
    assert (sr, ch) == (12345, 1)
    assert out.shape == (4000, 1)
    # int16 quantization error bound: half a step
    assert np.abs(out[:, 0] - pcm[:, 0]).max() <= 2.0 / 32768 + 1e-12


def test_stereo_interleave_roundtrip():
    left = np.linspace(-0.9, 0.9, 1000)
    right = -left
    out, sr, ch = wav_decode(wav_encode(np.stack([left, right], axis=1), 8000))
    assert ch == 2 and out.shape == (1000, 2)
    assert np.abs(out[:, 0] - left).max() <= 2.0 / 32768 + 1e-12
    assert np.abs(out[:, 1] - right).max() <= 2.0 / 32768 + 1e-12


def _wav_blob(fmt_code, bits, data, n_ch=1, rate=8000, extensible_guid=None):
    if extensible_guid is not None:
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, n_ch, rate, rate * n_ch * bits // 8,
            n_ch * bits // 8, bits, 22, bits, 0,
        ) + extensible_guid
    else:
        fmt = struct.pack(
            "<HHIIHH", fmt_code, n_ch, rate, rate * n_ch * bits // 8,
            n_ch * bits // 8, bits,
        )
    # include a LIST chunk before data to exercise chunk skipping
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + lst
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_decode_8bit_unsigned():
    raw = np.array([0, 128, 255], dtype=np.uint8).tobytes()
    out, sr, ch = wav_decode(_wav_blob(1, 8, raw))
    assert np.allclose(out[:, 0], [(0 - 128) / 128, 0.0, (255 - 128) / 128])


def test_decode_24bit():
    vals = [1 << 22, -(1 << 22), 0]
    raw = b"".join(struct.pack("<i", v)[:3] for v in vals)
    out, _, _ = wav_decode(_wav_blob(1, 24, raw))
    assert np.allclose(out[:, 0], [0.5, -0.5, 0.0])


def test_decode_32bit_int_and_float():
    iraw = np.array([1 << 30, -(1 << 30)], dtype="<i4").tobytes()
    out, _, _ = wav_decode(_wav_blob(1, 32, iraw))
    assert np.allclose(out[:, 0], [0.5, -0.5])
    fraw = np.array([0.25, -0.75], dtype="<f4").tobytes()
    out, _, _ = wav_decode(_wav_blob(3, 32, fraw))
    assert np.allclose(out[:, 0], [0.25, -0.75])


def test_decode_extensible_pcm_guid():
    guid = b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    raw = np.array([16384, -16384], dtype="<i2").tobytes()
    out, _, _ = wav_decode(_wav_blob(None, 16, raw, extensible_guid=guid))
    assert np.allclose(out[:, 0], [0.5, -0.5])


def test_compressed_format_raises():
    with pytest.raises(NotImplementedError, match="compressed"):
        wav_decode(_wav_blob(85, 16, b"\x00\x00"))  # 85 = MP3


def test_not_wav_raises():
    with pytest.raises(ValueError):
        wav_decode(b"OggS" + b"\x00" * 40)


def test_spark_audio_features_numpy_oracle(spark):
    """The done-criterion: the driver query decodes REAL WAV bytes and the
    features match a pure-numpy replay of codec+feature math exactly."""
    out = (
        audio_features(synthetic_audio(spark, 24))
        .orderBy("clip_id")
        .toPandas()
    )
    assert len(out) == 24
    for r in out.itertuples(index=False):
        blob, sr, ch = clip_wav(int(r.clip_id))
        pcm, rate, n_ch = wav_decode(blob)
        assert (r.sample_rate, r.n_channels) == (rate, n_ch)
        assert r.n_samples == pcm.shape[0]
        mono = pcm.mean(axis=1)
        zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        assert r.rms == float(np.sqrt(np.mean(pcm**2)))
        assert r.peak == float(np.abs(pcm).max())
        assert r.zcr == float(zc / max(1, len(mono) - 1))
        # and the decoded samples track the analytic pre-quantization PCM
        ref, _ = clip_pcm(int(r.clip_id))
        assert np.abs(pcm - ref).max() <= 2.0 / 32768 + 1e-12


def test_audio_exact_features_numpy_oracle(spark):
    """The driver-contract twin: exact integer features equal a pure-numpy
    replay (quantize → sq_sum/peak_q/zc) for every clip."""
    from etf_topox_spark.operators.multimodal import audio_features_exact

    out = (
        audio_features_exact(synthetic_audio(spark, 24))
        .orderBy("clip_id")
        .toPandas()
    )
    assert len(out) == 24
    for r in out.itertuples(index=False):
        pcm, sr = clip_pcm(int(r.clip_id))
        q = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype(np.int64)
        s = q.sum(axis=1)
        assert r.sq_sum == int((q * q).sum())
        assert r.peak_q == int(np.abs(q).max())
        assert r.zc == int(np.count_nonzero((s[1:] < 0) != (s[:-1] < 0)))
        assert r.n_samples == q.shape[0]


def test_audio_quantization_boundary_margin():
    """No corpus sample may sit near an int16 half-boundary: a 1-ulp sin
    difference between numpy and an oracle engine's libm must never flip a
    quantized integer (min distance 1.6e-6 steps vs ~1e-8 drift)."""
    worst = 1.0
    for cid in range(100):
        pcm, _ = clip_pcm(cid)
        for arr in (pcm[:, 0], 0.5 * pcm[:, 0]):
            v = arr * 32767.0
            fr = np.abs((v - np.floor(v)) - 0.5)
            fr[0] = 1.0  # t=0 is exactly 0 — not a half boundary
            worst = min(worst, float(fr.min()))
    assert worst > 1e-6, worst
