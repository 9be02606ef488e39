"""Pure-numpy baseline JPEG codec (functions/jpeg_codec — VERDICT r4
next-round #5): encode→decode round trip must clear the BASELINE.json:15
lossy invariant (PSNR ≥ 40 dB) on the fixture corpus, unsupported
profiles must raise loudly, and jpeg-format images must flow through the
Spark multimodal kernels end-to-end."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etf_topox_spark.functions import image_codec as IC
from etf_topox_spark.functions.jpeg_codec import jpeg_decode, jpeg_encode
from etf_topox_spark.sources.images import image_meta, image_pixels


def test_roundtrip_psnr_fixture_corpus():
    worst = 99.0
    for i in range(9):  # all three sizes, three bases each
        w, h, _, _ = image_meta(i)
        px = image_pixels(i, w, h)
        blob = IC.encode(px, "jpeg")
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        rec = IC.decode(blob, "jpeg")
        assert rec.shape == px.shape and rec.dtype == np.uint8
        worst = min(worst, IC.psnr(px, rec))
    assert worst >= 40.0, worst  # the BASELINE lossy gate, with q98 margin


def test_non_multiple_of_8_dims():
    px = image_pixels(3, 50, 35)[:35, :50]
    rec = jpeg_decode(jpeg_encode(px, quality=98))
    assert rec.shape == (35, 50, 3)
    assert IC.psnr(px, rec) >= 40.0


def test_flat_image_near_lossless():
    px = np.full((24, 24, 3), 130, np.uint8)
    rec = jpeg_decode(jpeg_encode(px, quality=95))
    assert IC.psnr(px, rec) >= 50.0


def test_restart_markers_roundtrip():
    px = image_pixels(5, 64, 64)
    plain = jpeg_decode(jpeg_encode(px, quality=95))
    with_rst = jpeg_encode(px, quality=95, restart_interval=3)
    assert b"\xff\xdd" in with_rst  # DRI present
    rec = jpeg_decode(with_rst)
    # restart resync must be bit-equivalent to the plain stream's pixels
    assert np.array_equal(rec, plain)


def test_quality_monotonic():
    px = image_pixels(7, 64, 64)
    p50 = IC.psnr(px, jpeg_decode(jpeg_encode(px, 50)))
    p90 = IC.psnr(px, jpeg_decode(jpeg_encode(px, 90)))
    p100 = IC.psnr(px, jpeg_decode(jpeg_encode(px, 100)))
    assert p50 < p90 < p100
    assert len(jpeg_encode(px, 50)) < len(jpeg_encode(px, 90))


def _patch_marker(blob: bytes, old: bytes, new: bytes) -> bytes:
    i = blob.index(old)
    return blob[:i] + new + blob[i + len(old) :]


def test_progressive_raises():
    blob = jpeg_encode(image_pixels(0, 16, 16)[:16, :16])
    bad = _patch_marker(blob, b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg_decode(bad)


def test_subsampled_raises():
    blob = jpeg_encode(image_pixels(0, 16, 16)[:16, :16])
    i = blob.index(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) n(1) then (id, samp, tq)*3 —
    # flip component 1's sampling to 2x2
    j = i + 2 + 2 + 1 + 4 + 1 + 1  # ...marker len prec h w n id -> samp byte
    bad = blob[:j] + b"\x22" + blob[j + 1 :]
    with pytest.raises(NotImplementedError, match="subsampled"):
        jpeg_decode(bad)


def test_truncated_raises():
    blob = jpeg_encode(image_pixels(0, 16, 16)[:16, :16])
    with pytest.raises(ValueError):
        jpeg_decode(blob[:2])
    with pytest.raises(ValueError):
        jpeg_decode(b"RAW0" + b"\x00" * 16)


def test_jpeg_through_spark_multimodal_kernel(spark):
    """fmt='jpeg' payloads flow through the Spark image-features kernel
    (the VERDICT r4 #5 done-criterion): features computed on the lossy
    decode match a pure-numpy replay, and the decode itself clears 40 dB
    vs the synthetic generator."""
    import pandas as pd

    from etf_topox_spark.operators.multimodal import image_features

    rows = []
    for i in range(6):
        w, h, _, _ = image_meta(i)
        px = image_pixels(i, w, h)
        rows.append((f"img-{i:012d}", IC.encode(px, "jpeg"), w, h, "jpeg"))
    pdf = pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])
    df = spark.createDataFrame(pdf)
    out = image_features(df).orderBy("image_id").toPandas()
    assert len(out) == 6
    for k, r in enumerate(out.itertuples(index=False)):
        px = image_pixels(k, *image_meta(k)[:2])
        dec = IC.decode(bytes(rows[k][1]), "jpeg")
        assert IC.psnr(px, dec) >= 40.0
        img = dec.astype(np.float64)
        mean = img.mean(axis=(0, 1)) / 255.0
        got = np.asarray(r.feat[:3], np.float64)
        assert np.allclose(got, mean, atol=1e-6)
