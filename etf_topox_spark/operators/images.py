"""Image tiling + invariants + raster-tile↔vector assignment
(SURVEY.md §2.B F8/J12; BASELINE.json:15 per-row invariant).

Tiling is a mapInPandas Arrow kernel (decode → 32×32 pixel tiles → raw
re-encode); the invariant check cogroups tiles with their source image and
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
    """Round-trip check per image: reassembled tiles vs original decode."""
    tiles = tile_images(images)

    def check(key, timg: pd.DataFrame, orig: pd.DataFrame) -> pd.DataFrame:
        if len(orig) == 0 or len(timg) == 0:
            return pd.DataFrame(columns=["image_id", "psnr", "caption_ok", "phash_ok", "n_tiles"])
        o = orig.iloc[0]
        img = IC.decode(bytes(o.bytes), o.fmt)
        recon = np.zeros_like(img)
        for t in timg.itertuples(index=False):
            recon[
                t.ty * TILE : (t.ty + 1) * TILE, t.tx * TILE : (t.tx + 1) * TILE
            ] = IC.raw_decode(bytes(t.tile_bytes))
        ps = IC.psnr(img, recon)
        return pd.DataFrame(
            {
                "image_id": [o.image_id],
                "psnr": [ps],
                "caption_ok": [bool((timg.caption == o.caption).all())],
                "phash_ok": [IC.average_hash(img) == int(o.phash)],
                "n_tiles": [len(timg)],
            }
        )

    return (
        tiles.groupBy("image_id")
        .cogroup(images.groupBy("image_id"))
        .applyInPandas(check, INVARIANT_SCHEMA)
    )
