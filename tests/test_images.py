"""Image path tests (SURVEY.md §5.2 item 5): codec round-trips, per-row
PSNR≥40dB + caption + phash invariants through tiling (BASELINE.json:15)."""

from __future__ import annotations

import numpy as np
import pytest

from etf_topox_spark.functions import image_codec as IC
from etf_topox_spark.operators.images import tiling_invariants
from etf_topox_spark.sources.images import image_pixels, synthetic_images


@pytest.mark.parametrize("fmt", ["png", "raw"])
@pytest.mark.parametrize("i,w,h", [(0, 64, 64), (7, 128, 96), (11, 96, 128)])
def test_codec_roundtrip_exact(fmt, i, w, h):
    img = image_pixels(i, w, h)
    rt = IC.decode(IC.encode(img, fmt), fmt)
    assert (rt == img).all()
    assert IC.psnr(img, rt) == 99.0


def test_png_decoder_handles_filtered_input():
    # our encoder emits filter 0 only, but the decoder must accept a spec-
    # compliant stream using Up filtering (synthesized here)
    import struct
    import zlib

    img = image_pixels(3, 64, 64)
    h, w, _ = img.shape
    raw = np.empty((h, 1 + w * 3), np.uint8)
    raw[0, 0] = 0
    raw[0, 1:] = img[0].reshape(-1)
    for y in range(1, h):
        raw[y, 0] = 2  # Up
        raw[y, 1:] = (img[y].astype(np.int32) - img[y - 1].astype(np.int32)).astype(np.uint8).reshape(-1)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    from etf_topox_spark.functions.image_codec import _PNG_SIG, _chunk

    data = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + _chunk(b"IEND", b"")
    )
    assert (IC.png_decode(data) == img).all()


def test_psnr_sensitivity():
    img = image_pixels(5, 64, 64)
    noisy = img.copy()
    noisy[::2] = np.clip(noisy[::2].astype(np.int32) + 40, 0, 255).astype(np.uint8)
    assert IC.psnr(img, noisy) < 40.0  # heavy corruption must fail the gate


def test_unknown_codec_is_explicit():
    # jpeg graduated from stub to a real pure-numpy codec in round 5
    # (functions/jpeg_codec); unknown formats must still raise loudly
    with pytest.raises(NotImplementedError):
        IC.encode(image_pixels(0, 64, 64), "webp")


def test_tiling_invariants_spark(spark):
    inv = tiling_invariants(synthetic_images(spark, 24)).toPandas()
    assert len(inv) == 24
    assert (inv.psnr >= 40.0).all()
    assert inv.caption_ok.all()
    assert inv.phash_ok.all()
    # tile counts follow the (w/32)*(h/32) cycle: 4, 12, 12
    got = inv.sort_values("image_id").n_tiles.to_numpy()
    expect = np.tile([4, 12, 12], 8)
    assert (got == expect).all()


def test_image_dedup_phash_planted_pairs(spark):
    """Every planted exact copy must pair with its original at hamming 0
    (pair order: 'dup_img_x' sorts before 'img_x')."""
    from etf_topox_spark.operators.image_queries import (
        DUP_PREFIX,
        N_DUP_IMAGES,
        image_dedup_phash,
    )

    rows = image_dedup_phash(spark, "/root/testdata/sf0.01").collect()
    ham0 = {(r["img_a"], r["img_b"]) for r in rows if r["hamming"] == 0}
    planted = {
        a.removeprefix(DUP_PREFIX)
        for (a, b) in ham0
        if a.startswith(DUP_PREFIX) and a.removeprefix(DUP_PREFIX) == b
    }
    assert len(planted) == N_DUP_IMAGES


def test_image_dedup_phash_exact_expected_set(spark):
    """The blocked funnel must return EXACTLY the brute-force hamming ≤ 4
    pair set over the deterministic corpus — with hamming ≤ 4, at least
    one of the four 16-bit chunks is untouched (pigeonhole), so chunk
    blocking is provably lossless and the sets must be equal, values
    included."""
    import numpy as np

    from etf_topox_spark.operators.image_queries import (
        DUP_PREFIX,
        N_DUP_IMAGES,
        image_dedup_phash,
    )
    from etf_topox_spark.sources.images import synthetic_images
    from pyspark.sql import functions as F

    base = synthetic_images(spark, 400)
    dups = (
        base.filter(F.substring("image_id", -6, 6).cast("int") < N_DUP_IMAGES)
        .withColumn("image_id", F.concat(F.lit(DUP_PREFIX), F.col("image_id")))
    )
    corpus = base.unionByName(dups).select("image_id", "phash").toPandas()
    ids = corpus["image_id"].to_numpy()
    ph = corpus["phash"].to_numpy().astype(np.uint64)
    xor = ph[:, None] ^ ph[None, :]
    ham = np.zeros(xor.shape, np.int64)
    v = xor.copy()
    for _ in range(64):
        ham += (v & np.uint64(1)).astype(np.int64)
        v >>= np.uint64(1)
    expected = {}
    n = len(ids)
    for i in range(n):
        for j in range(n):
            if ids[i] < ids[j] and ham[i, j] <= 4:
                expected[(ids[i], ids[j])] = int(ham[i, j])
    got = {
        (r["img_a"], r["img_b"]): r["hamming"]
        for r in image_dedup_phash(spark, "/root/testdata/sf0.01").collect()
    }
    assert got == expected


def test_phash_knn_planted_dups_rank_first(spark):
    """Probes with a planted exact copy (i < N_DUP_IMAGES) must see it as
    their rank-1 neighbor at hamming 0; every probe returns exactly K rows
    in non-decreasing hamming order."""
    from etf_topox_spark.operators.image_queries import (
        DUP_PREFIX,
        K_PHASH,
        N_DUP_IMAGES,
        N_PHASH_PROBES,
        image_phash_knn,
    )

    got = image_phash_knn(spark, "/root/testdata/sf0.01").toPandas()
    assert len(got) == N_PHASH_PROBES * K_PHASH
    for pid, grp in got.groupby("probe_id"):
        grp = grp.sort_values("rk")
        assert list(grp["rk"]) == list(range(1, K_PHASH + 1))
        assert (grp["hamming"].diff().dropna() >= 0).all()
        i = int(pid[-6:])
        if i < N_DUP_IMAGES:
            first = grp.iloc[0]
            assert first["neighbor_id"] == DUP_PREFIX + pid
            assert first["hamming"] == 0


def test_zonal_stats_mass_conservation(spark):
    """Every in-grid tile lands in exactly one zone: per-zone pixel counts
    sum to the pixel total of in-grid tiles, and means stay within [0,255]."""
    from etf_topox_spark.operators.image_queries import zonal_stats

    got = zonal_stats(spark, "/root/testdata/sf0.01").toPandas()
    assert (got["mean_gray"] >= 0).all() and (got["mean_gray"] <= 255).all()
    assert (got["n_pixels"] == got["n_tiles"] * 32 * 32).all()
    assert got["feature_id"].between(0, 399).all()
    assert got["feature_id"].is_unique
