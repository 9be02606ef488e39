"""Deterministic synthetic image+caption source (SURVEY.md §2.B S3;
FIXTURES.md §1) — the BASELINE.json:15 input table
(image_id, bytes, w, h, fmt, caption, phash) generated as a pure function
of the image index: no RNG state, no wall clock, any partitioning yields
identical rows ("no external data", BASELINE.json:14).

Each image also carries an implicit geolocation on the mosaic window
(integer-mod arithmetic like sources.points) used by the raster-tile↔vector
assignment; it is re-derivable from image_id on both the Spark and oracle
sides.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from etf_topox_spark.functions import image_codec as IC

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)

SIZES_W = (64, 128, 96)
SIZES_H = (64, 96, 128)
FMTS = ("png", "raw")

# geolocation: same 20×20-degree window as the point fixtures
GEO_KX = 9241
GEO_KY = 5437
GEO_M = 20000
GEO_DIV = 1000.0
PX_DEG = 1.0 / 1024.0  # degrees per pixel


def image_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB gradient+interference pattern (FIXTURES.md §1)."""
    base = (i * 2654435761) % 251
    yy, xx = np.mgrid[0:h, 0:w]
    r = (base + 3 * xx + 5 * yy) % 256
    g = (base * 7 + 11 * xx + 2 * yy + (xx * yy) % 17) % 256
    b = (base * 13 + xx // 2 + 7 * yy) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def image_meta(i: int) -> tuple[int, int, str, str]:
    w = SIZES_W[i % 3]
    h = SIZES_H[i % 3]
    fmt = FMTS[i % 2]
    caption = f"synthetic scene {i % 1000} tile caption"
    return w, h, fmt, caption


def image_geo(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Anchor lon/lat of each image's raster footprint (exact doubles)."""
    i = ids.astype(np.int64)
    lon = ((i * GEO_KX) % GEO_M).astype(np.float64) / GEO_DIV
    lat = ((i * GEO_KY) % GEO_M).astype(np.float64) / GEO_DIV
    return lon, lat


def make_image_row(i: int) -> tuple:
    w, h, fmt, caption = image_meta(i)
    px = image_pixels(i, w, h)
    return (
        f"img-{i:012d}",
        IC.encode(px, fmt),
        w,
        h,
        fmt,
        caption,
        IC.average_hash(px),
    )


def synthetic_images(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # chunk output frames so Arrow batches stay small despite the
            # binary payloads (SURVEY.md §2.B Arrow-batch note)
            for s in range(0, len(ids), 256):
                rows = [make_image_row(int(i)) for i in ids[s : s + 256]]
                yield pd.DataFrame(
                    rows,
                    columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
                )

    return rng.mapInPandas(gen, IMAGE_SCHEMA)
