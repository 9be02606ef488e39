"""Invariant tests for the round-3d operators beyond the DuckDB oracles:
planted-fixture checks for the tile dedup and entropy kernels (whose tile
bytes live outside SQL), and planted-document checks for the Gopher-style
repetition gate and the contamination scan (their oracles replay the same
corpus; these tests assert the DETECTION behavior on adversarial inputs the
driver corpus doesn't contain).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pytest

from etf_topox_spark.operators.image_queries import image_entropy, image_tile_dedup
from etf_topox_spark.sources.images import image_meta, image_pixels

# image i and i+753 share the pixel base (753 = 3*251 ≡ 0 mod 251) AND the
# size cycle (753 ≡ 0 mod 3) → identical pixels; i and i+251 share only the
# base → identical content on the overlapping tile grid, different sizes.
_BASE_PERIOD = 251
_FULL_PERIOD = 753


def test_pixel_base_period_planted():
    p0 = image_pixels(0, 64, 64)
    p251 = image_pixels(_BASE_PERIOD, 64, 64)
    p753 = image_pixels(_FULL_PERIOD, 64, 64)
    assert (p0 == p251).all() and (p0 == p753).all()
    assert not (p0 == image_pixels(1, 64, 64)).all()


def test_image_tile_dedup_planted_pairs(spark, sf_smoke):
    out = image_tile_dedup(spark, sf_smoke).toPandas()
    assert (out["n_copies"] > 1).all()
    # img-0 (64×64: 2×2 tiles) and img-251 (96×128) share the pixel base →
    # all 4 of img-0's tiles must sit in multi-copy groups
    tiles = out["keep_tile_id"].to_numpy()
    # keep_tile_id packs (img_index << 16 | ty << 8 | tx); img 0's tiles are
    # the minimum ids of their groups whenever img 0 participates
    img0_tiles = {(0 << 16) | (ty << 8) | tx for ty in range(2) for tx in range(2)}
    assert img0_tiles <= set(tiles.tolist())
    # every duplicate group's copy count spans ≥2 distinct images OR ≥2
    # in-image copies; with this generator duplicates are cross-image only
    assert (out["n_images"] == out["n_copies"]).all()


def test_image_entropy_deterministic_and_planted(spark, sf_smoke):
    out = image_entropy(spark, sf_smoke).toPandas().set_index("image_id")
    # direct numpy oracle, one image per (size, fmt) class
    for i in (0, 1, 7, 8):
        w, h, fmt, _ = image_meta(i)
        px = image_pixels(i, w, h)
        gray = (px[..., 0].astype(np.uint32) + px[..., 1] + px[..., 2]) // 3
        hist = np.bincount(gray.ravel(), minlength=256)
        p = hist[hist > 0] / gray.size
        want = float(-(p * np.log2(p)).sum())
        row = out.loc["img-%012d" % i]
        assert int(row["entropy_ubits"]) == int(np.floor(want * 1e6 + 0.5))
        assert int(row["gray_sum"]) == int(gray.sum(dtype=np.int64))
        assert int(row["n_px"]) == gray.size
        # entropy of this interference pattern is far from degenerate
        assert 4.0 < want <= 8.0


def test_image_entropy_rounding_margin(spark, sf_smoke):
    """The micro-bit contract is safe across engines only if no corpus
    value sits near a floor(e*1e6+0.5) boundary: cross-engine log2 +
    summation-order drift is ~1e-9 at this scale, so demand > 1e-4."""
    from etf_topox_spark.operators.image_queries import N_IMAGES
    from etf_topox_spark.sources.images import image_meta as meta

    worst = 1.0
    for i in range(N_IMAGES):
        w, h, _, _ = meta(i)
        px = image_pixels(i, w, h)
        gray = (px[..., 0].astype(np.uint32) + px[..., 1] + px[..., 2]) // 3
        hist = np.bincount(gray.ravel(), minlength=256)
        p = hist[hist > 0] / gray.size
        e = float(-(p * np.log2(p)).sum())
        frac = (e * 1e6 + 0.5) % 1.0
        worst = min(worst, min(frac, 1.0 - frac))
    assert worst > 1e-4, worst


@pytest.fixture(scope="module")
def planted_docs_dir(spark, tmp_path_factory):
    """A documents table with adversarial rows the synthetic corpus lacks:
    a pathologically repetitive doc, a single-token-dominated doc, a clean
    doc, and a doc that quotes a benchmark document verbatim."""
    d = tmp_path_factory.mktemp("planted") / "sf"
    os.makedirs(d, exist_ok=True)
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        # doc_id < 16 → benchmark set for text_contamination
        (0, bench_text, "en", "bench", len(bench_text)),
        (100, "spam " * 50, "en", "web", 250),            # one token dominates
        (101, "one two three " * 20, "en", "web", 280),   # repeated trigram
        (102, "clean unique words " + " ".join(f"w{i}" for i in range(40)),
         "en", "web", 200),
        (103, "prefix words then " + bench_text + " trailing text here",
         "en", "web", 80),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(str(d / "documents.parquet"), index=False)
    return str(d)


def test_repetition_filter_planted(spark, planted_docs_dir):
    from etf_topox_spark.operators.text import text_repetition_filter

    out = (
        text_repetition_filter(spark, planted_docs_dir)
        .toPandas()
        .set_index("doc_id")
    )
    assert not out.loc[100, "keep"]  # top_token_share = 1.0
    assert out.loc[100, "top_token_share"] == 1.0
    assert not out.loc[101, "keep"]  # dup trigram fraction ≈ 1
    assert out.loc[101, "dup_trigram_frac"] > 0.9
    assert out.loc[102, "keep"]
    assert out.loc[102, "dup_trigram_frac"] == 0.0


def test_contamination_planted(spark, planted_docs_dir):
    from etf_topox_spark.operators.text import text_contamination

    out = text_contamination(spark, planted_docs_dir).toPandas()
    hit = out[(out["doc_id"] == 103) & (out["bench_id"] == 0)]
    assert len(hit) == 1
    # the quote embeds all 6 of the benchmark's 5-grams
    assert int(hit["n_shared"].iloc[0]) == 6
    assert math.isclose(float(hit["contaminated_frac"].iloc[0]), 1.0)
    # the clean doc never appears
    assert not (out["doc_id"] == 102).any()


def test_event_funnel_monotone(spark, sf_smoke):
    from etf_topox_spark.operators.aggregates import event_funnel

    row = event_funnel(spark, sf_smoke).collect()[0]
    assert row.n_users >= row.n_viewed >= row.n_clicked >= row.n_purchased
    assert row.n_purchased > 0  # the fixture corpus converts


def test_spatial_anti_join_complement(spark, sf_smoke):
    from etf_topox_spark.operators.spatial_queries import (
        N_POINTS,
        spatial_anti_join,
        spatial_pip_join,
    )

    anti = spatial_anti_join(spark, sf_smoke)
    n_anti = anti.count()
    assert 0 < n_anti < N_POINTS
    # complement property vs the 10×10 closed form
    pdf = anti.toPandas()
    assert ((pdf["x"] > 10) | (pdf["y"] > 10)).all()


def test_geohash_canonical_vectors():
    """Public test vectors (Niemeyer's scheme): ezs42* for (42.605961,
    -5.603027); sqc8b49r* for Palermo."""
    from etf_topox_spark.functions.cells import geohash_decode_bounds, geohash_encode

    lon = np.array([-5.603027, 13.361389])
    lat = np.array([42.605961, 38.115556])
    gh = geohash_encode(lon, lat, 8)
    assert gh[0].startswith("ezs42")
    assert gh[1] == "sqc8b49r"
    x0, y0, x1, y1 = geohash_decode_bounds(gh, 8)
    assert ((x0 <= lon) & (lon < x1) & (y0 <= lat) & (lat < y1)).all()
    # prefix-containment: the 6-char cell contains the 8-char cell
    gh6 = geohash_encode(lon, lat, 6)
    assert all(g8.startswith(g6) for g8, g6 in zip(gh, gh6))
    a0, b0, a1, b1 = geohash_decode_bounds(gh6, 6)
    assert ((a0 <= x0) & (x1 <= a1) & (b0 <= y0) & (y1 <= b1)).all()


def test_geohash_rejects_bad_input():
    from etf_topox_spark.functions.cells import geohash_decode_bounds, geohash_encode

    with pytest.raises(ValueError):
        geohash_encode(np.zeros(1), np.zeros(1), 7)  # odd precision
    with pytest.raises(ValueError):
        geohash_decode_bounds(np.array(["aaaaaaaa"], dtype=object), 8)  # 'a' invalid


def test_gapfill_grid_dense_and_filled(spark, sf_smoke):
    from etf_topox_spark.operators.timewindows import timeseries_gapfill

    out = timeseries_gapfill(spark, sf_smoke).toPandas()
    # dense grid: every user has exactly the same bucket set
    per_user = out.groupby("user_id")["bucket"].count()
    assert per_user.nunique() == 1
    # gaps are filled with the previous non-gap value (or 0 before any)
    one = out[out["user_id"] == out["user_id"].iloc[0]].sort_values("bucket")
    prev = 0.0
    for r in one.itertuples(index=False):
        if r.is_gap:
            assert r.filled_value == prev and r.n_events == 0
        else:
            assert r.n_events > 0
            prev = r.filled_value
