"""Image tiling + invariants + raster-tile↔vector assignment
(SURVEY.md §2.B F8/J12; BASELINE.json:15 per-row invariant).

Tiling is a mapInPandas Arrow kernel (decode → 32×32 pixel tiles → raw
re-encode); the invariant check co-locates tiles with their source image
(tagged union + one image_id exchange) and
asserts PSNR ≥ 40 dB (exact equality for our lossless codecs), caption
byte-equality, and stored-phash == recomputed-phash. Tile↔vector assignment
is the PIP machinery applied to tile centers (the tile side of the
two-stage cell join; SURVEY.md §2.B J12).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.functions import image_codec as IC
from etf_topox_spark.sources.images import PX_DEG, image_geo

TILE = 32

TILE_SCHEMA = (
    "image_id string, tile_id long, tx int, ty int, tile_bytes binary, "
    "caption string, cx double, cy double"
)

INVARIANT_SCHEMA = (
    "image_id string, psnr double, caption_ok boolean, phash_ok boolean, "
    "n_tiles int"
)


def _img_index(image_id: str) -> int:
    return int(image_id.rsplit("-", 1)[1])


def tile_images(images: DataFrame) -> DataFrame:
    """images → 32×32 raw tiles with carried caption and geo tile center."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = IC.decode(bytes(r.bytes), r.fmt)
                i = _img_index(r.image_id)
                lon, lat = image_geo(np.array([i]))
                ntx, nty = r.w // TILE, r.h // TILE
                for ty in range(nty):
                    for tx in range(ntx):
                        t = img[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE]
                        rows.append(
                            (
                                r.image_id,
                                (i << 16) | (ty << 8) | tx,
                                tx,
                                ty,
                                IC.raw_encode(np.ascontiguousarray(t)),
                                r.caption,
                                float(lon[0]) + (tx * TILE + TILE // 2) * PX_DEG,
                                float(lat[0]) + (ty * TILE + TILE // 2) * PX_DEG,
                            )
                        )
                if len(rows) >= 2048:
                    yield pd.DataFrame(rows, columns=_TILE_COLS)
                    rows = []
            if rows:
                yield pd.DataFrame(rows, columns=_TILE_COLS)

    return images.mapInPandas(kernel, TILE_SCHEMA)


_TILE_COLS = ["image_id", "tile_id", "tx", "ty", "tile_bytes", "caption", "cx", "cy"]


def tiling_invariants(images: DataFrame) -> DataFrame:
    """Round-trip check per image: reassembled tiles vs original decode.

    Tiles and originals meet through ONE tagged union + hash exchange on
    image_id, checked by a partition-level kernel that re-groups locally:
    the cogrouped applyInPandas form pays per-GROUP Arrow/invoke overhead
    (~1 ms × n_images — measured dominant at 10^3 groups already, fatal at
    10^12), while the union form pays it per partition. Both sides stay
    binary/primitive columns through the exchange (the Spark 4.1 cogroup
    Arrow reader nested-type segfault is moot here, but the flat schema
    rule is kept anyway)."""
    tiles = tile_images(images)
    tagged = tiles.select(
        "image_id",
        F.lit(0).alias("kind"),
        "tx",
        "ty",
        F.col("tile_bytes").alias("payload"),
        "caption",
        F.lit(None).cast("string").alias("fmt"),
        # int64 with nulls arrives in pandas as float64 — a full-range
        # phash does not survive that round trip; ship it as text
        F.lit(None).cast("string").alias("phash"),
    ).unionByName(
        images.select(
            "image_id",
            F.lit(1).alias("kind"),
            F.lit(None).cast("int").alias("tx"),
            F.lit(None).cast("int").alias("ty"),
            F.col("bytes").alias("payload"),
            "caption",
            "fmt",
            F.col("phash").cast("string").alias("phash"),
        )
    )

    def part_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        out: dict[str, list] = {
            "image_id": [], "psnr": [], "caption_ok": [], "phash_ok": [], "n_tiles": []
        }
        for image_id, g in pdf.groupby("image_id", sort=False):
            orig = g[g["kind"] == 1]
            timg = g[g["kind"] == 0]
            if len(orig) == 0 or len(timg) == 0:
                continue
            o = orig.iloc[0]
            img = IC.decode(bytes(o.payload), o.fmt)
            recon = np.zeros_like(img)
            # tx/ty pass the union as nullable ints (floats/NaN on the
            # image rows) — cast back on the tile rows
            for t in timg.itertuples(index=False):
                ty, tx = int(t.ty), int(t.tx)
                recon[
                    ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE
                ] = IC.raw_decode(bytes(t.payload))
            out["image_id"].append(image_id)
            out["psnr"].append(IC.psnr(img, recon))
            out["caption_ok"].append(bool((timg.caption == o.caption).all()))
            out["phash_ok"].append(IC.average_hash(img) == int(o.phash))
            out["n_tiles"].append(len(timg))
        if out["image_id"]:
            yield pd.DataFrame(out)

    n_parts = int(images.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return tagged.repartition(n_parts, "image_id").mapInPandas(
        part_kernel, INVARIANT_SCHEMA
    )
