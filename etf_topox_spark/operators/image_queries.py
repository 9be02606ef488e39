"""Driver-contract surface for the image path.

- `image_tiling_invariants` (rows-only): per-image PSNR/caption/phash
  round-trip results — pytest asserts every row passes (the BASELINE.json:15
  gate); the driver sees stable rows.
- `image_tile_stats`: tile counts/geometry per format — full DuckDB oracle
  (tile counts are a closed form of the deterministic metadata cycle).
- `raster_tile_assign`: tile-center → vector feature assignment with the
  closed-form grid oracle (the J12 raster↔vector join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.images import TILE, tile_images, tiling_invariants
from etf_topox_spark.operators.spatial import pip_join
from etf_topox_spark.registry import query
from etf_topox_spark.sources.images import (
    GEO_DIV,
    GEO_KX,
    GEO_KY,
    GEO_M,
    synthetic_images,
)
from etf_topox_spark.sources.mosaic import surface_mosaic
from etf_topox_spark.sources.tables import load_table as TT

N_IMAGES = 600
GRID_N = 20


# The BASELINE.json:15 invariant IS the oracle: both fixture codecs (png,
# raw) are lossless, so reassembly must be bit-identical → psnr pegged at
# the 99.0 cap, caption/phash equality true, and the tile count is the
# closed form of the metadata cycle. Any slip anywhere in the
# decode→tile→shuffle→reassemble funnel (stride, row order, channel swap,
# caption mixup, phash drift) breaks at least one column.
_TILING_INV_SQL = f"""
WITH imgs AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT range AS i FROM range(0, {N_IMAGES}))
)
SELECT printf('img-%012d', i) AS image_id,
       99.0 AS psnr,
       TRUE AS caption_ok,
       TRUE AS phash_ok,
       CAST((w // 32) * (h // 32) AS INTEGER) AS n_tiles
FROM imgs ORDER BY image_id
"""


@query("image_tiling_invariants", oracle=_TILING_INV_SQL)
def image_tiling_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tiling_invariants(synthetic_images(spark, N_IMAGES)).orderBy("image_id")


# tile counts per fmt: sizes cycle (64,64),(128,96),(96,128) by i%3 and fmt
# cycles png/raw by i%2 → closed form over i < N_IMAGES
_TILE_STATS_SQL = f"""
WITH imgs AS (
  SELECT i,
         CASE i % 2 WHEN 0 THEN 'png' ELSE 'raw' END AS fmt,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT range AS i FROM range(0, {N_IMAGES}))
)
SELECT fmt,
       CAST(SUM((w / {TILE}) * (h / {TILE})) AS BIGINT) AS n_tiles,
       COUNT(*) AS n_images
FROM imgs GROUP BY fmt ORDER BY fmt
"""


@query("image_tile_stats", oracle=_TILE_STATS_SQL)
def image_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = synthetic_images(spark, N_IMAGES)
    tiles = tile_images(imgs)
    joined = tiles.join(imgs.select("image_id", "fmt"), "image_id")
    return (
        joined.groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.countDistinct("image_id").alias("n_images"),
        )
        .orderBy("fmt")
    )


# closed-form oracle for tile-center → grid-square assignment (same tie rule
# as spatial_queries._PIP_SQL); centers regenerated in SQL from image ids
_TILE_ASSIGN_SQL = f"""
WITH imgs AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         CAST((i * {GEO_KX}) % {GEO_M} AS DOUBLE) / {GEO_DIV} AS lon,
         CAST((i * {GEO_KY}) % {GEO_M} AS DOUBLE) / {GEO_DIV} AS lat
  FROM (SELECT range AS i FROM range(0, {N_IMAGES}))
),
tiles AS (
  SELECT i, tx.range AS tx, ty.range AS ty,
         lon + CAST(tx.range * {TILE} + {TILE // 2} AS DOUBLE) / 1024.0 AS cx,
         lat + CAST(ty.range * {TILE} + {TILE // 2} AS DOUBLE) / 1024.0 AS cy
  FROM imgs, range(0, 4) tx, range(0, 4) ty
  WHERE tx.range < w / {TILE} AND ty.range < h / {TILE}
),
inside AS (SELECT * FROM tiles WHERE cx <= 20.0 AND cy <= 20.0)
SELECT (i << 16) | (ty << 8) | tx AS tile_id,
       CAST((CASE WHEN cy = floor(cy) AND cy > 0 THEN cy - 1 ELSE floor(cy) END) * {GRID_N}
          + (CASE WHEN cx = floor(cx) AND cx > 0 THEN cx - 1 ELSE floor(cx) END) AS BIGINT)
         AS feature_id
FROM inside
"""


@query("raster_tile_assign", oracle=_TILE_ASSIGN_SQL)
def raster_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    tiles = tile_images(synthetic_images(spark, N_IMAGES))
    centers = tiles.select(
        F.col("tile_id").alias("point_id"),
        F.col("cx").alias("x"),
        F.col("cy").alias("y"),
    )
    rings = surface_mosaic(spark, rows=GRID_N, cols=GRID_N, defect="valid_mosaic")
    return pip_join(spark, centers, rings).select(
        F.col("point_id").alias("tile_id"), "feature_id"
    )


# --- image near-dup dedup via perceptual hash (training-data op × image axis) --

N_DUP_IMAGES = 50
DUP_PREFIX = "dup_"


HAM_T = 4  # report threshold; blocking uses HAM_T+1 chunks (see below)
# t+1 chunks of the 64-bit hash: a pair within hamming t differs in at
# most t chunks, so some chunk matches exactly — blocking is provably
# lossless (4 chunks only guaranteed t ≤ 3; the exact-set pytest caught
# exactly that: hamming-4 pairs with one flipped bit per 16-bit chunk)
_CHUNK_BITS = [13, 13, 13, 13, 12]
_CHUNK_OFFS = [0, 13, 26, 39, 52]
N_PHASH_IMAGES = 400

# SQL twin of the phash corpus: the fixture pixels are pure integer
# arithmetic in (i, x, y) (sources/images.py image_pixels) and average_hash
# thresholds in exact integers (64·block_sum > total_sum, image_codec.py),
# so DuckDB re-derives every stored phash bit-for-bit from generate_series —
# no decode, no floats. Shapes/base must mirror SIZES_W/SIZES_H and
# image_pixels; printf mirrors make_image_row's f"img-{i:012d}".
_PHASH_CORPUS_SQL = f"""
par AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base
  FROM (SELECT unnest(range({N_PHASH_IMAGES})) AS i)
),
px AS (SELECT i, w, h, base, unnest(range(w * h)) AS p FROM par),
gray AS (
  SELECT i,
         ((p // w) // (h // 8)) AS br,
         ((p % w) // (w // 8)) AS bc,
         (  ((base + 3 * (p % w) + 5 * (p // w)) % 256)
          + ((base * 7 + 11 * (p % w) + 2 * (p // w) + ((p % w) * (p // w)) % 17) % 256)
          + ((base * 13 + (p % w) // 2 + 7 * (p // w)) % 256)) // 3 AS g
  FROM px
),
blk AS (SELECT i, br, bc, SUM(g) AS s FROM gray GROUP BY 1, 2, 3),
tot AS (SELECT i, SUM(s) AS t FROM blk GROUP BY 1),
phu AS (
  SELECT b.i,
         SUM(CASE WHEN 64 * b.s > t.t
                  THEN (1::HUGEINT << (b.br * 8 + b.bc)) ELSE 0::HUGEINT END) AS u
  FROM blk b JOIN tot t USING (i) GROUP BY 1
),
ph AS (
  SELECT i, CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                      THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS phash
  FROM phu
),
corpus AS (
  SELECT printf('img-%012d', i) AS image_id, phash FROM ph
  UNION ALL
  SELECT '{DUP_PREFIX}' || printf('img-%012d', i), phash FROM ph WHERE i < {N_DUP_IMAGES}
)"""

_DEDUP_PHASH_SQL = f"""
WITH {_PHASH_CORPUS_SQL},
chunks AS (
  SELECT image_id, phash, c.chunk, (phash >> c.off) & ((1::BIGINT << c.bits) - 1) AS ch
  FROM corpus CROSS JOIN (VALUES {", ".join(f"({c}, {o}, {b})" for c, (o, b) in enumerate(zip(_CHUNK_OFFS, _CHUNK_BITS)))}) AS c(chunk, off, bits)
)
SELECT DISTINCT a.image_id AS img_a, b.image_id AS img_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM chunks a JOIN chunks b
  ON a.chunk = b.chunk AND a.ch = b.ch AND a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= {HAM_T}
ORDER BY img_a, img_b
"""


@query("image_dedup_phash", oracle=_DEDUP_PHASH_SQL)
def image_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs by phash hamming distance ≤ HAM_T,
    blocked on HAM_T+1 hash chunks (the pigeonhole blocking rule: ≤ t bit
    flips cannot touch all t+1 chunks, so candidate generation loses
    nothing — pytest pins the funnel output EQUAL to brute force). The
    corpus plants exact copies of the first N_DUP_IMAGES images under new
    ids — those pairs MUST surface with hamming 0 (pytest pins this);
    visually-near gradients may add more pairs deterministically.
    Full-funnel DuckDB oracle: average_hash thresholds in exact integer
    arithmetic, so the oracle re-derives every phash from the deterministic
    pixel formula (no decode needed) and replays the chunk blocking +
    hamming join symbolically."""
    base = synthetic_images(spark, N_PHASH_IMAGES)
    dups = (
        base.filter(F.substring("image_id", -6, 6).cast("int") < N_DUP_IMAGES)
        .withColumn("image_id", F.concat(F.lit(DUP_PREFIX), F.col("image_id")))
    )
    corpus = base.unionByName(dups).select("image_id", "phash")
    chunk_structs = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright(F.col("phash"), off)
            .bitwiseAND(F.lit((1 << bits) - 1))
            .alias("ch"),
        )
        for c, (off, bits) in enumerate(zip(_CHUNK_OFFS, _CHUNK_BITS))
    ]
    chunks = corpus.select(
        "image_id", "phash", F.explode(F.array(*chunk_structs)).alias("cc")
    ).select("image_id", "phash", F.col("cc.chunk").alias("chunk"), F.col("cc.ch").alias("ch"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(b, ["chunk", "ch"])
        .filter(F.col("a.image_id") < F.col("b.image_id"))
        .select(
            F.col("a.image_id").alias("img_a"),
            F.col("b.image_id").alias("img_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["img_a", "img_b"])
        .filter(F.col("hamming") <= HAM_T)
        .orderBy("img_a", "img_b")
    )


# --- phash hamming kNN (image similarity search, training-data op × image axis) --

K_PHASH = 5
N_PHASH_PROBES = 40

_PHASH_KNN_SQL = f"""
WITH {_PHASH_CORPUS_SQL},
probes AS (
  SELECT printf('img-%012d', i) AS probe_id, phash FROM ph WHERE i < {N_PHASH_PROBES}
),
scored AS (
  SELECT p.probe_id, c.image_id AS neighbor_id,
         CAST(bit_count(xor(p.phash, c.phash)) AS INT) AS hamming
  FROM probes p JOIN corpus c ON c.image_id <> p.probe_id
),
ranked AS (
  SELECT probe_id, neighbor_id, hamming,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY hamming, neighbor_id) AS rk
  FROM scored
)
SELECT probe_id, neighbor_id, hamming, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= {K_PHASH} ORDER BY probe_id, rk
"""


@query("image_phash_knn", oracle=_PHASH_KNN_SQL)
def image_phash_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K most-similar images per probe by phash hamming distance —
    exact similarity search over the perceptual-hash space (the image twin
    of ann_cosine_topk's brute-force baseline).

    Scale shape: the probe set broadcasts (a query batch is small by
    definition); the corpus scan is embarrassingly parallel map-side
    hamming (BroadcastNestedLoopJoin — no corpus shuffle), and only the
    tiny scored top-K candidates flow into the per-probe rank window.
    Ties break on neighbor_id, so the result is a deterministic total
    order. Full-funnel DuckDB oracle: phashes re-derived bit-for-bit from
    the deterministic pixel formula (see _PHASH_CORPUS_SQL), then the same
    scan + rank replayed symbolically."""
    from pyspark.sql import Window

    base = synthetic_images(spark, N_PHASH_IMAGES)
    dups = (
        base.filter(F.substring("image_id", -6, 6).cast("int") < N_DUP_IMAGES)
        .withColumn("image_id", F.concat(F.lit(DUP_PREFIX), F.col("image_id")))
    )
    corpus = base.unionByName(dups).select("image_id", "phash")
    probes = F.broadcast(
        base.filter(F.substring("image_id", -6, 6).cast("int") < N_PHASH_PROBES)
        .select(F.col("image_id").alias("probe_id"), F.col("phash").alias("p_phash"))
    )
    scored = (
        corpus.join(probes, F.col("image_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("image_id").alias("neighbor_id"),
            F.bit_count(F.col("p_phash").bitwiseXOR(F.col("phash")))
            .cast("int")
            .alias("hamming"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= K_PHASH)
        .orderBy("probe_id", "rk")
    )


# --- zonal statistics (raster↔vector: per-zone aggregate of tile pixels) -----

_ZONAL_SQL = f"""
WITH par AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base,
         CAST((i * {GEO_KX}) % {GEO_M} AS DOUBLE) / {GEO_DIV} AS lon,
         CAST((i * {GEO_KY}) % {GEO_M} AS DOUBLE) / {GEO_DIV} AS lat
  FROM (SELECT unnest(range({N_IMAGES})) AS i)
),
px AS (SELECT i, w, h, base, lon, lat, unnest(range(w * h)) AS p FROM par),
gray AS (
  SELECT i, lon, lat,
         (p % w) // {TILE} AS tx, (p // w) // {TILE} AS ty,
         (  ((base + 3 * (p % w) + 5 * (p // w)) % 256)
          + ((base * 7 + 11 * (p % w) + 2 * (p // w) + ((p % w) * (p // w)) % 17) % 256)
          + ((base * 13 + (p % w) // 2 + 7 * (p // w)) % 256)) // 3 AS g
  FROM px
),
tsum AS (
  SELECT i, tx, ty, ANY_VALUE(lon) AS lon, ANY_VALUE(lat) AS lat,
         SUM(g) AS gsum, COUNT(*) AS npx
  FROM gray GROUP BY 1, 2, 3
),
centers AS (
  SELECT *, lon + CAST(tx * {TILE} + {TILE // 2} AS DOUBLE) / 1024.0 AS cx,
            lat + CAST(ty * {TILE} + {TILE // 2} AS DOUBLE) / 1024.0 AS cy
  FROM tsum
),
assigned AS (
  SELECT CAST((CASE WHEN cy = floor(cy) AND cy > 0 THEN cy - 1 ELSE floor(cy) END) * {GRID_N}
            + (CASE WHEN cx = floor(cx) AND cx > 0 THEN cx - 1 ELSE floor(cx) END) AS BIGINT)
           AS feature_id,
         gsum, npx
  FROM centers WHERE cx <= 20.0 AND cy <= 20.0
)
SELECT feature_id, COUNT(*) AS n_tiles,
       CAST(SUM(gsum) AS BIGINT) AS gray_sum,
       CAST(SUM(npx) AS BIGINT) AS n_pixels,
       CAST(SUM(gsum) AS DOUBLE) / CAST(SUM(npx) AS DOUBLE) AS mean_gray
FROM assigned GROUP BY 1 ORDER BY 1
"""


@query("zonal_stats", oracle=_ZONAL_SQL)
def zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics — the raster↔vector payoff query: aggregate pixel
    values of every raster tile whose center falls in a vector zone (one
    grid feature), per zone. The classic remote-sensing/geo-ML op (band
    mean per parcel) over the engine's image+caption table.

    Scale shape: tile gray sums are a pure map-side Arrow kernel over the
    tiling output (no pixel ever crosses an exchange — only (tile, sum,
    count) triples); zone assignment is the broadcast PIP join (J12); the
    final per-zone rollup is one partial-aggregable groupBy on feature_id.
    Exact across engines: all-integer pixel sums, one final double
    division. Full-funnel DuckDB oracle re-derives every pixel from the
    deterministic generator and replays tiling + assignment symbolically."""
    import numpy as np
    import pandas as pd

    tiles = tile_images(synthetic_images(spark, N_IMAGES))

    def kernel(batches):
        for pdf in batches:
            gsum = np.empty(len(pdf), np.int64)
            npx = np.empty(len(pdf), np.int64)
            for k, tb in enumerate(pdf["tile_bytes"]):
                import struct

                w, h = struct.unpack("<II", tb[4:12])
                a = np.frombuffer(tb, np.uint8, count=w * h * 3, offset=12)
                rgb = a.reshape(h, w, 3).astype(np.int64)
                g = (rgb[:, :, 0] + rgb[:, :, 1] + rgb[:, :, 2]) // 3
                gsum[k] = int(g.sum())
                npx[k] = w * h
            yield pd.DataFrame(
                {
                    "tile_id": pdf["tile_id"],
                    "x": pdf["cx"],
                    "y": pdf["cy"],
                    "gsum": gsum,
                    "npx": npx,
                }
            )

    tstats = tiles.mapInPandas(
        kernel, "tile_id long, x double, y double, gsum long, npx long"
    )
    rings = surface_mosaic(spark, rows=GRID_N, cols=GRID_N, defect="valid_mosaic")
    centers = tstats.select(F.col("tile_id").alias("point_id"), "x", "y")
    assigned = pip_join(spark, centers, rings).select(
        F.col("point_id").alias("tile_id"), "feature_id"
    )
    return (
        tstats.join(assigned, "tile_id")
        .groupBy("feature_id")
        .agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.sum("gsum").alias("gray_sum"),
            F.sum("npx").alias("n_pixels"),
            (F.sum("gsum").cast("double") / F.sum("npx").cast("double")).alias(
                "mean_gray"
            ),
        )
        .orderBy("feature_id")
    )


# --- raster overview pyramid (multi-level rollup, the COG/gdaladdo analog) ----

PYR_LEVELS = 4
N_PYR_IMAGES = 300

# Exact-integer oracle: gray pixels re-derived from the deterministic
# generator formula; level-k pooled cell = SUM of gray over the (y>>k, x>>k)
# block (sum pooling, not mean — keeps every level in int64 with no
# rounding), px_max = max pooled cell per level. All sizes are multiples of
# 2^(PYR_LEVELS-1) by construction (SIZES_W/H ∈ {64, 96, 128}).
_PYRAMID_SQL = f"""
WITH par AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base
  FROM (SELECT unnest(range({N_PYR_IMAGES})) AS i)
),
px AS (SELECT i, w, h, base, unnest(range(w * h)) AS p FROM par),
gray AS (
  SELECT i, w, h, (p % w) AS x, (p // w) AS y,
         (  ((base + 3 * (p % w) + 5 * (p // w)) % 256)
          + ((base * 7 + 11 * (p % w) + 2 * (p // w) + ((p % w) * (p // w)) % 17) % 256)
          + ((base * 13 + (p % w) // 2 + 7 * (p // w)) % 256)) // 3 AS g
  FROM px
),
lv AS (SELECT unnest(range({PYR_LEVELS})) AS level),
cells AS (
  SELECT i, level, w, h, (y >> level) AS cy, (x >> level) AS cx, SUM(g) AS cs
  FROM gray, lv GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT printf('img-%012d', i) AS image_id, CAST(level AS INT) AS level,
       CAST(w >> level AS INT) AS lw, CAST(h >> level AS INT) AS lh,
       CAST(SUM(cs) AS BIGINT) AS px_sum, CAST(MAX(cs) AS BIGINT) AS px_max
FROM cells GROUP BY 1, 2, 3, 4
ORDER BY image_id, level
"""


@query("image_pyramid", oracle=_PYRAMID_SQL)
def image_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster overview pyramid — per image, PYR_LEVELS levels of 2× sum
    pooling over the gray channel (the cloud-optimized-GeoTIFF overview /
    gdaladdo rollup, re-expressed as a map-only Arrow kernel). Level 0 is
    the full-resolution gray raster; level k+1 pools 2×2 cells of level k,
    so per-level totals are invariant (sum pooling) while per-level maxima
    step up — the oracle checks both per (image, level).

    Scale shape: pure mapInPandas over the image partition — no pixel ever
    crosses an exchange; output is PYR_LEVELS summary rows per image. At
    10^12 images the pyramid levels would persist per-partition to the
    lineage-checkpointed sink exactly like the tiling stage (SCALE.md).
    Exact across engines: all-integer pooling, bit-exact vs the symbolic
    DuckDB replay of the pixel generator."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_PYR_IMAGES)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = IC.decode(bytes(r.bytes), r.fmt).astype(np.int64)
                g = (img[:, :, 0] + img[:, :, 1] + img[:, :, 2]) // 3
                lvl = g
                for k in range(PYR_LEVELS):
                    if k > 0:
                        lvl = (
                            lvl[0::2, 0::2]
                            + lvl[0::2, 1::2]
                            + lvl[1::2, 0::2]
                            + lvl[1::2, 1::2]
                        )
                    rows.append(
                        (
                            r.image_id,
                            k,
                            lvl.shape[1],
                            lvl.shape[0],
                            int(lvl.sum()),
                            int(lvl.max()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["image_id", "level", "lw", "lh", "px_sum", "px_max"]
            )

    return imgs.mapInPandas(
        kernel, "image_id string, level int, lw int, lh int, px_sum long, px_max long"
    ).orderBy("image_id", "level")


# --- joint caption+phash dedup (multimodal near-dup, text-block × visual-confirm) --

N_CAP_IMAGES = 1100  # > 1000 so caption (period-1000) collides for i vs i+1000
N_CAP_DUPS = 40
CAP_PREFIX = "cdup_"

# corpus twin with captions: phash re-derived from the pixel formula (same
# integer-threshold replay as _PHASH_CORPUS_SQL), caption from the metadata
# cycle. The caption period is 1000, so ids i and i+1000 collide on caption
# with DIFFERENT pixels — the visual-confirm stage must reject those unless
# their hashes happen to be near (both engines agree either way).
_CAP_CORPUS_SQL = f"""
par AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base
  FROM (SELECT unnest(range({N_CAP_IMAGES})) AS i)
),
px AS (SELECT i, w, h, base, unnest(range(w * h)) AS p FROM par),
gray AS (
  SELECT i,
         ((p // w) // (h // 8)) AS br,
         ((p % w) // (w // 8)) AS bc,
         (  ((base + 3 * (p % w) + 5 * (p // w)) % 256)
          + ((base * 7 + 11 * (p % w) + 2 * (p // w) + ((p % w) * (p // w)) % 17) % 256)
          + ((base * 13 + (p % w) // 2 + 7 * (p // w)) % 256)) // 3 AS g
  FROM px
),
blk AS (SELECT i, br, bc, SUM(g) AS s FROM gray GROUP BY 1, 2, 3),
tot AS (SELECT i, SUM(s) AS t FROM blk GROUP BY 1),
phu AS (
  SELECT b.i,
         SUM(CASE WHEN 64 * b.s > t.t
                  THEN (1::HUGEINT << (b.br * 8 + b.bc)) ELSE 0::HUGEINT END) AS u
  FROM blk b JOIN tot t USING (i) GROUP BY 1
),
ph AS (
  SELECT i, CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                      THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS phash
  FROM phu
),
cap AS (
  SELECT printf('img-%012d', i) AS image_id, phash,
         printf('synthetic scene %d tile caption', i % 1000) AS caption
  FROM ph
  UNION ALL
  SELECT '{CAP_PREFIX}' || printf('img-%012d', i), phash,
         printf('synthetic scene %d tile caption', i % 1000)
  FROM ph WHERE i < {N_CAP_DUPS}
)"""

_CAPTION_DEDUP_SQL = f"""
WITH {_CAP_CORPUS_SQL}
SELECT a.image_id AS img_a, b.image_id AS img_b, a.caption,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM cap a JOIN cap b ON a.caption = b.caption AND a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= {HAM_T}
ORDER BY img_a, img_b
"""


@query("image_caption_dedup", oracle=_CAPTION_DEDUP_SQL)
def image_caption_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint multimodal near-dup: block on EXACT caption equality (the
    cheap text key — a hash-partitioned self-join, no pixel ever shuffles),
    then confirm visually with phash hamming ≤ HAM_T. The corpus plants
    exact copies of the first N_CAP_DUPS images under new ids (caption AND
    pixels equal → hamming 0, must surface) and, because the caption cycle
    has period 1000 with N_CAP_IMAGES > 1000, ids i and i+1000 collide on
    caption with different pixels — the confirm stage filters those.

    Scale shape: the join key is the caption hash, so candidate generation
    is one shuffle of (caption, phash, id) triples — 20 bytes/row, never
    bytes. Skewed caption groups (boilerplate captions at web scale) would
    salt exactly like join_salted_skew; here groups are ≤ 3 rows. Pure
    Catalyst end-to-end (bit_count + xor are JVM intrinsics); full-funnel
    DuckDB oracle re-derives phash + caption symbolically."""
    base = synthetic_images(spark, N_CAP_IMAGES)
    dups = (
        base.filter(F.substring("image_id", -6, 6).cast("int") < N_CAP_DUPS)
        .withColumn("image_id", F.concat(F.lit(CAP_PREFIX), F.col("image_id")))
    )
    corpus = base.unionByName(dups).select("image_id", "caption", "phash")
    a = corpus.alias("a")
    b = corpus.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).cast("int")
    return (
        a.join(b, "caption")
        .filter(F.col("a.image_id") < F.col("b.image_id"))
        .select(
            F.col("a.image_id").alias("img_a"),
            F.col("b.image_id").alias("img_b"),
            F.col("caption"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= HAM_T)
        .orderBy("img_a", "img_b")
    )


# --- gradient energy (texture / blur scoring for image quality filtering) -----

N_GRAD_IMAGES = 300


def _g_expr(xe: str, ye: str) -> str:
    """DuckDB expression for the generator's gray value at pixel ({xe},{ye})
    — the same three-channel formula as sources.images.image_pixels,
    averaged. Substituting shifted coordinates gives neighbor pixels with
    no self-join."""
    return (
        f"((((base + 3 * ({xe}) + 5 * ({ye})) % 256)"
        f" + ((base * 7 + 11 * ({xe}) + 2 * ({ye}) + (({xe}) * ({ye})) % 17) % 256)"
        f" + ((base * 13 + ({xe}) // 2 + 7 * ({ye})) % 256)) // 3)"
    )


# symbolic-pixel oracle: interior central differences of the gray raster,
# |gx| + |gy| summed/maxed per image — all-integer, bit-exact across engines
_GRAD_SQL = f"""
WITH par AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base
  FROM (SELECT unnest(range({N_GRAD_IMAGES})) AS i)
),
px AS (SELECT i, base, w, h, unnest(range(w * h)) AS p FROM par),
c AS (
  SELECT i, base, (p % w) AS x, (p // w) AS y
  FROM px
  WHERE (p % w) BETWEEN 1 AND w - 2 AND (p // w) BETWEEN 1 AND h - 2
),
e AS (
  SELECT i,
         abs({_g_expr("x + 1", "y")} - {_g_expr("x - 1", "y")})
       + abs({_g_expr("x", "y + 1")} - {_g_expr("x", "y - 1")}) AS m
  FROM c
)
SELECT printf('img-%012d', i) AS image_id,
       CAST(SUM(m) AS BIGINT) AS grad_energy,
       CAST(MAX(m) AS BIGINT) AS grad_max,
       CAST(COUNT(*) AS BIGINT) AS n_interior
FROM e GROUP BY 1 ORDER BY image_id
"""


@query("image_gradient_energy", oracle=_GRAD_SQL)
def image_gradient_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image gradient energy — the sum and max of |∂x| + |∂y| central
    differences of the gray channel over interior pixels. This is the
    classic sharpness/texture score a training-data pipeline uses to drop
    blurred or flat images (a blur halves the energy; a constant image
    scores 0) — the image-payload sibling of text_quality.

    Scale shape: map-only Arrow kernel over the image partition (decode →
    two numpy slice subtractions → three scalars per image); no pixel
    crosses an exchange, so throughput is decode-bound and scales with
    executors linearly. Exact: all-integer arithmetic, verified bit-exact
    against the symbolic DuckDB replay of the pixel generator (the same
    pattern as image_pyramid / zonal_stats)."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_GRAD_IMAGES)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = IC.decode(bytes(r.bytes), r.fmt).astype(np.int64)
                g = (img[:, :, 0] + img[:, :, 1] + img[:, :, 2]) // 3
                gx = g[1:-1, 2:] - g[1:-1, :-2]
                gy = g[2:, 1:-1] - g[:-2, 1:-1]
                m = np.abs(gx) + np.abs(gy)
                rows.append((r.image_id, int(m.sum()), int(m.max()), int(m.size)))
            yield pd.DataFrame(
                rows, columns=["image_id", "grad_energy", "grad_max", "n_interior"]
            )

    return imgs.mapInPandas(
        kernel, "image_id string, grad_energy long, grad_max long, n_interior long"
    ).orderBy("image_id")


# --- cross-image duplicate tiles (content-hash tile dedup) --------------------

# Full-funnel DuckDB twin (VERDICT r4 next-round #4): two tiles are in the
# same md5 group iff their raw pixel bytes match, and every tile pixel is
# a closed-form integer in (i, X, Y) — so the oracle groups tiles by the
# literal pixel sequence (string_agg over (y, x) of the packed rgb int)
# instead of the digest. The digest itself therefore stays OUT of the
# contract columns (it is an engine-side blocking key, not an answer);
# the group structure — representative id, copy count, image span — is
# the answer, and it is digest-algorithm-independent.
_TILE_DEDUP_SQL = f"""
WITH imgs AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base
  FROM (SELECT range AS i FROM range(0, {N_IMAGES}))
),
tiles AS (
  SELECT i, base, tx.range AS tx, ty.range AS ty
  FROM imgs, range(0, 4) tx, range(0, 4) ty
  WHERE tx.range < w // {TILE} AND ty.range < h // {TILE}
),
px AS (
  SELECT i, tx, ty, y.range AS y, x.range AS x,
         ((base + 3 * (tx * {TILE} + x.range) + 5 * (ty * {TILE} + y.range)) % 256)
           * 65536
         + ((base * 7 + 11 * (tx * {TILE} + x.range) + 2 * (ty * {TILE} + y.range)
             + ((tx * {TILE} + x.range) * (ty * {TILE} + y.range)) % 17) % 256)
           * 256
         + ((base * 13 + (tx * {TILE} + x.range) // 2
             + 7 * (ty * {TILE} + y.range)) % 256) AS v
  FROM tiles, range(0, {TILE}) x, range(0, {TILE}) y
),
content AS (
  SELECT i, tx, ty,
         string_agg(v::VARCHAR, ',' ORDER BY y, x) AS ckey
  FROM px GROUP BY i, tx, ty
)
SELECT MIN((i << 16) | (ty << 8) | tx) AS keep_tile_id,
       COUNT(*) AS n_copies,
       COUNT(DISTINCT i) AS n_images
FROM content
GROUP BY ckey HAVING COUNT(*) > 1
ORDER BY keep_tile_id
"""


@query("image_tile_dedup", oracle=_TILE_DEDUP_SQL)
def image_tile_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined duplicate-tile detection ACROSS images: tile every
    image, hash raw tile bytes (md5 — exact content identity, no
    perceptual tolerance), keep hash groups with > 1 member. The dedup
    shape of a 10^12-image tile store: one hash-aggregable exchange on the
    digest, map-side partial counts, representative = min tile_id (stable
    under any partitioning). The digest is internal blocking state, not a
    contract column — the DuckDB oracle regroups tiles by literal pixel
    content from the symbolic generator, so decode→tile→hash must be
    byte-perfect for the group structure to match."""
    tiles = tile_images(synthetic_images(spark, N_IMAGES))
    return (
        tiles.select(
            F.md5(F.col("tile_bytes")).alias("tile_hash"),
            "tile_id",
            "image_id",
        )
        .groupBy("tile_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("image_id").alias("n_images"),
            F.min("tile_id").alias("keep_tile_id"),
        )
        .filter(F.col("n_copies") > 1)
        .select("keep_tile_id", "n_copies", "n_images")
        .orderBy("keep_tile_id")
    )


# --- per-image histogram entropy ----------------------------------------------

# Full-funnel DuckDB twin (VERDICT r4 next-round #4): the fixture pixels
# are pure integer arithmetic in (i, x, y) (sources/images.py
# image_pixels), so the gray histogram — and from it the entropy — is
# re-derivable in SQL from range() alone; the decode path must be
# pixel-perfect for the histograms to agree. Floats stay OUT of the
# contract: gray_sum/n_px are exact integers and entropy ships as
# micro-bits via the shared half-up rule floor(ent*1e6 + 0.5) on both
# sides (cross-engine log2/summation drift is ~1e-9 at micro-bit scale;
# tests/test_images.py asserts every corpus value sits > 1e-4 from a
# rounding boundary, so any IEEE log2 agrees).
_ENTROPY_SQL = f"""
WITH imgs AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base
  FROM (SELECT range AS i FROM range(0, {N_IMAGES}))
),
pix AS (
  SELECT i, w, h,
         (((base + 3 * x.range + 5 * y.range) % 256)
          + ((base * 7 + 11 * x.range + 2 * y.range + (x.range * y.range) % 17) % 256)
          + ((base * 13 + x.range // 2 + 7 * y.range) % 256)) // 3 AS gray
  FROM imgs, range(0, 128) x, range(0, 128) y
  WHERE x.range < w AND y.range < h
),
hist AS (
  SELECT i, gray, COUNT(*) AS c, MAX(w * h) AS n_px
  FROM pix GROUP BY i, gray
),
ent AS (
  SELECT i, n_px,
         SUM(-(CAST(c AS DOUBLE) / n_px)
             * log2(CAST(c AS DOUBLE) / n_px)) AS e,
         SUM(gray * c) AS gsum
  FROM hist GROUP BY i, n_px
)
SELECT printf('img-%012d', i) AS image_id,
       CAST(FLOOR(e * 1000000.0 + 0.5) AS BIGINT) AS entropy_ubits,
       CAST(gsum AS BIGINT) AS gray_sum,
       CAST(n_px AS BIGINT) AS n_px
FROM ent ORDER BY image_id
"""


@query("image_entropy", oracle=_ENTROPY_SQL)
def image_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each image's gray-level histogram — the classic
    information-content quality score for filtering near-blank frames out
    of a vision training set. Map-only Arrow kernel (one pass per image,
    numpy bincount). Contract is float-free (the supplier_wilson lesson):
    exact gray_sum/n_px integers plus entropy in micro-bits under the
    shared floor(e*1e6+0.5) rule; the DuckDB oracle replays the whole
    funnel from the symbolic pixel formulas."""
    import numpy as np  # local: keep worker import cost off module load
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_IMAGES)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ents = np.empty(len(pdf), np.int64)
            gsums = np.empty(len(pdf), np.int64)
            sizes = np.empty(len(pdf), np.int64)
            for k, r in enumerate(pdf.itertuples(index=False)):
                px = IC.decode(bytes(r.bytes), r.fmt)
                gray = (
                    px[..., 0].astype(np.uint32)
                    + px[..., 1]
                    + px[..., 2]
                ) // 3
                hist = np.bincount(gray.ravel(), minlength=256)
                p = hist[hist > 0] / gray.size
                e = float(-(p * np.log2(p)).sum())
                ents[k] = int(np.floor(e * 1000000.0 + 0.5))
                gsums[k] = int(gray.sum(dtype=np.int64))
                sizes[k] = gray.size
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "entropy_ubits": ents,
                    "gray_sum": gsums,
                    "n_px": sizes,
                }
            )

    return imgs.mapInPandas(
        kernel,
        "image_id string, entropy_ubits long, gray_sum long, n_px long",
    ).orderBy("image_id")


# --- bounding-box NMS over synthetic detections -------------------------------

# Detections derived deterministically from lineitem (pure integer closed
# form, so the DuckDB oracle replays them exactly): one box per distinct
# line item, placed on image (l_orderkey % NMS_IMAGES) of a 256x256 canvas.
# (orderkey, linenumber) is NOT unique in the synthetic corpus, so box_id
# bit-packs all four participating ints (orderkey:*, linenumber:3,
# partkey:20, suppkey:11 bits — injective at every shipped sf) and the box
# table is DISTINCT over it. Scores are a multiplicative bit-mix of box_id;
# a score tie (possible mod 2^32) just leaves both boxes alive — the rule
# stays total and engine/oracle-deterministic.
NMS_IMAGES = 500
NMS_IOU_NUM, NMS_IOU_DEN = 3, 10  # suppress at IoU >= 0.3, exact rational

_NMS_BOX_ID_SQL = (
    "((l_orderkey * 8 + l_linenumber) * 1048576 + l_partkey % 1048576) * 2048"
    " + l_suppkey % 2048"
)

_NMS_BOXES_SQL = f"""
  SELECT DISTINCT
         {_NMS_BOX_ID_SQL} AS box_id,
         l_orderkey % {NMS_IMAGES} AS image_id,
         (l_partkey * 13) % 192 AS x0,
         (l_suppkey * 29) % 192 AS y0,
         (l_partkey * 13) % 192 + 16 + l_partkey % 49 AS x1,
         (l_suppkey * 29) % 192 + 16 + l_suppkey % 49 AS y1,
         ((({_NMS_BOX_ID_SQL}) % 2097152) * 2654435761
            + (({_NMS_BOX_ID_SQL}) // 2097152) * 2246822519
            + ({_NMS_BOX_ID_SQL})) % 4294967296 AS score
  FROM lineitem
"""

_NMS_SQL = f"""
WITH boxes AS ({_NMS_BOXES_SQL}),
pairs AS (
  SELECT b.box_id,
         GREATEST(0, LEAST(a.x1, b.x1) - GREATEST(a.x0, b.x0))
           * GREATEST(0, LEAST(a.y1, b.y1) - GREATEST(a.y0, b.y0)) AS inter,
         (a.x1 - a.x0) * (a.y1 - a.y0) + (b.x1 - b.x0) * (b.y1 - b.y0) AS s_area
  FROM boxes a JOIN boxes b
    ON a.image_id = b.image_id AND a.score > b.score
),
sup AS (
  SELECT DISTINCT box_id FROM pairs
  WHERE inter * {NMS_IOU_DEN} >= (s_area - inter) * {NMS_IOU_NUM}
)
SELECT box_id, image_id, x0, y0, x1, y1, score
FROM boxes WHERE box_id NOT IN (SELECT box_id FROM sup)
ORDER BY box_id
"""


def nms_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic detection table (engine twin of _NMS_BOXES_SQL)."""
    li = TT(spark, sf_dir, "lineitem")
    box_id = (
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")) * 1048576
        + F.col("l_partkey") % 1048576
    ) * 2048 + F.col("l_suppkey") % 2048
    return li.select(
        box_id.alias("box_id"),
        (F.col("l_orderkey") % NMS_IMAGES).alias("image_id"),
        ((F.col("l_partkey") * 13) % 192).alias("x0"),
        ((F.col("l_suppkey") * 29) % 192).alias("y0"),
        ((F.col("l_partkey") * 13) % 192 + 16 + F.col("l_partkey") % 49).alias("x1"),
        ((F.col("l_suppkey") * 29) % 192 + 16 + F.col("l_suppkey") % 49).alias("y1"),
        (
            F.pmod(
                (box_id % 2097152) * 2654435761
                + F.expr(
                    "((((l_orderkey * 8 + l_linenumber) * 1048576"
                    " + l_partkey % 1048576) * 2048 + l_suppkey % 2048)"
                    " div 2097152) * 2246822519"
                )
                + box_id,
                F.lit(4294967296),
            )
        ).alias("score"),
    ).distinct()


@query("image_box_nms", oracle=_NMS_SQL)
def image_box_nms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding-box suppression for detection/crop dedup — the Matrix-NMS
    hard rule: drop any box that overlaps (IoU >= 0.3) ANY higher-scored box
    in the same image. Unlike greedy Soft-NMS this rule has no sequential
    dependency, so it is one within-image self-join + one anti-join — the
    shape that survives 10^12 detections (pairs are bounded per image;
    boxes-per-image is bounded by the detector's top-k, and a hot image key
    would reuse the pip_join recon-salting). All-integer IoU test
    (inter*10 >= union*3) keeps both engines bit-exact.

    Reference tie-in: suppression-by-overlap mirrors TopoX's
    duplicate/overlapping-boundary rejection (same "conflict kills the
    newcomer" shape), lifted to scored raster regions."""
    b = nms_boxes(spark, sf_dir)
    a = b.select(
        F.col("image_id").alias("a_image_id"),
        F.col("score").alias("a_score"),
        F.col("x0").alias("a_x0"),
        F.col("y0").alias("a_y0"),
        F.col("x1").alias("a_x1"),
        F.col("y1").alias("a_y1"),
        ((F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))).alias("a_area"),
    )
    inter = F.greatest(
        F.lit(0), F.least("a_x1", "x1") - F.greatest("a_x0", "x0")
    ) * F.greatest(F.lit(0), F.least("a_y1", "y1") - F.greatest("a_y0", "y0"))
    area = (F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))
    suppressed = (
        b.join(
            a,
            (F.col("image_id") == F.col("a_image_id"))
            & (F.col("a_score") > F.col("score")),
        )
        .where(
            inter * NMS_IOU_DEN >= (F.col("a_area") + area - inter) * NMS_IOU_NUM
        )
        .select("box_id")
        .distinct()
    )
    return b.join(suppressed, "box_id", "left_anti").orderBy("box_id")


def _nms_greedy_sql() -> str:
    """Greedy NMS as a per-image LIST-state recursive CTE (upgrades this
    query from rows-only; the trajectory_dtw / raster_strahler oracle
    family): each image's state is its not-yet-suppressed boxes sorted by
    (score DESC, box_id); every round pops the head as KEPT and
    list_filters the survivors by the exact rational IoU test. Images
    retire from the recursion independently as their lists drain."""
    h = "remaining[1]"

    def fld(src: str, f: str) -> str:
        return f"struct_extract({src}, '{f}')"

    inter = (
        f"(GREATEST(0, LEAST({fld(h, 'x1')}, {fld('b', 'x1')})"
        f" - GREATEST({fld(h, 'x0')}, {fld('b', 'x0')}))"
        f" * GREATEST(0, LEAST({fld(h, 'y1')}, {fld('b', 'y1')})"
        f" - GREATEST({fld(h, 'y0')}, {fld('b', 'y0')})))"
    )
    areas = (
        f"(({fld(h, 'x1')} - {fld(h, 'x0')}) * ({fld(h, 'y1')} - {fld(h, 'y0')})"
        f" + ({fld('b', 'x1')} - {fld('b', 'x0')}) * ({fld('b', 'y1')} - {fld('b', 'y0')}))"
    )
    survive = f"{inter} * {NMS_IOU_DEN} < ({areas} - {inter}) * {NMS_IOU_NUM}"
    return f"""
WITH RECURSIVE boxes AS ({_NMS_BOXES_SQL}),
grouped AS (
  SELECT image_id,
         list({{'box_id': box_id, 'x0': x0, 'y0': y0, 'x1': x1, 'y1': y1,
                'score': score}} ORDER BY score DESC, box_id) AS remaining
  FROM boxes GROUP BY image_id
),
greedy AS (
  SELECT image_id, remaining, CAST(NULL AS BIGINT) AS kept_id
  FROM grouped
  UNION ALL
  SELECT image_id,
         list_filter(list_slice(remaining, 2, len(remaining)), b -> {survive}),
         struct_extract(remaining[1], 'box_id')
  FROM greedy WHERE len(remaining) > 0
)
SELECT b.box_id, b.image_id, b.x0, b.y0, b.x1, b.y1, b.score
FROM greedy g JOIN boxes b ON b.box_id = g.kept_id
ORDER BY b.box_id
"""


@query("image_box_nms_greedy", oracle=_nms_greedy_sql())
def image_box_nms_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic greedy NMS (the detector-head reference semantics): walk each
    image's boxes by descending score; keep a box iff it overlaps no
    ALREADY-KEPT box at IoU >= 0.3. The keep-set is a superset of
    image_box_nms's matrix rule (a suppressed suppressor cannot kill there);
    pytest pins both that containment and a pure-python replay. Sequential
    per image, parallel across images — one Arrow kernel per image group
    (the standard vectorized-suppression loop: each kept box eliminates its
    whole overlap set in one numpy pass). Oracled since round 4 by the
    per-image list-state recursion of _nms_greedy_sql."""
    import numpy as np
    import pandas as pd

    boxes = nms_boxes(spark, sf_dir)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # total order: score desc, box_id asc — deterministic whatever
        # partition order Spark hands the group in
        o = np.lexsort(
            (pdf["box_id"].to_numpy(np.int64), -pdf["score"].to_numpy(np.int64))
        )
        x0, y0, x1, y1 = (
            pdf[c].to_numpy(np.int64)[o] for c in ("x0", "y0", "x1", "y1")
        )
        area = (x1 - x0) * (y1 - y0)
        alive = np.ones(len(o), bool)
        keep = np.zeros(len(o), bool)
        for i in range(len(o)):
            if not alive[i]:
                continue
            keep[i] = True
            ix = np.maximum(
                0, np.minimum(x1[i], x1) - np.maximum(x0[i], x0)
            ) * np.maximum(0, np.minimum(y1[i], y1) - np.maximum(y0[i], y0))
            union = area[i] + area - ix
            alive &= ix * NMS_IOU_DEN < union * NMS_IOU_NUM
            alive[i] = False
        return pdf.iloc[o[keep]]

    out_schema = "box_id long, image_id long, x0 long, y0 long, x1 long, y1 long, score long"
    return (
        boxes.groupBy("image_id")
        .applyInPandas(kernel, out_schema)
        .orderBy("box_id")
    )


# --- detection precision/recall via one-to-one IoU matching -------------------

# Evaluation threshold (PASCAL-style 0.5), exact rational compare so both
# engines agree bit-for-bit: match iff inter/union >= 1/2.
MATCH_IOU_NUM, MATCH_IOU_DEN = 1, 2

# Ground-truth boxes derived deterministically from `orders` (o_orderkey is
# unique, so gt_id needs no bit packing): same 256x256 canvas and 16..64
# side range as the detection family, different placement constants so
# overlap with detections is incidental — exactly what a matcher must sort
# out.
_GT_BOXES_SQL = f"""
  SELECT o_orderkey AS gt_id,
         o_orderkey % {NMS_IMAGES} AS image_id,
         (o_custkey * 17) % 192 AS x0,
         (o_custkey * 23) % 192 AS y0,
         (o_custkey * 17) % 192 + 16 + o_orderkey % 49 AS x1,
         (o_custkey * 23) % 192 + 16 + o_orderkey % 49 AS y1
  FROM orders
"""

_MATCH_PR_SQL = f"""
WITH pred AS ({_NMS_BOXES_SQL}),
gt AS ({_GT_BOXES_SQL}),
qual AS (
  SELECT p.box_id, p.image_id, p.score, g.gt_id,
         GREATEST(0, LEAST(p.x1, g.x1) - GREATEST(p.x0, g.x0))
           * GREATEST(0, LEAST(p.y1, g.y1) - GREATEST(p.y0, g.y0)) AS inter,
         (p.x1 - p.x0) * (p.y1 - p.y0) + (g.x1 - g.x0) * (g.y1 - g.y0) AS s_area
  FROM pred p JOIN gt g ON p.image_id = g.image_id
  WHERE GREATEST(0, LEAST(p.x1, g.x1) - GREATEST(p.x0, g.x0))
          * GREATEST(0, LEAST(p.y1, g.y1) - GREATEST(p.y0, g.y0))
          * {MATCH_IOU_DEN}
        >= ((p.x1 - p.x0) * (p.y1 - p.y0) + (g.x1 - g.x0) * (g.y1 - g.y0)
            - GREATEST(0, LEAST(p.x1, g.x1) - GREATEST(p.x0, g.x0))
              * GREATEST(0, LEAST(p.y1, g.y1) - GREATEST(p.y0, g.y0)))
           * {MATCH_IOU_NUM}
),
assigned AS (
  SELECT * FROM (
    SELECT box_id, image_id, score, gt_id,
           ROW_NUMBER() OVER (
             PARTITION BY box_id
             ORDER BY CAST(inter AS DOUBLE) / (s_area - inter) DESC, gt_id
           ) AS rk
    FROM qual
  ) WHERE rk = 1
),
tp_rows AS (
  SELECT * FROM (
    SELECT image_id, gt_id, box_id,
           ROW_NUMBER() OVER (
             PARTITION BY gt_id ORDER BY score DESC, box_id
           ) AS rk2
    FROM assigned
  ) WHERE rk2 = 1
),
np_ AS (SELECT image_id, COUNT(*) AS n_pred FROM pred GROUP BY 1),
ng_ AS (SELECT image_id, COUNT(*) AS n_gt FROM gt GROUP BY 1),
nt_ AS (SELECT image_id, COUNT(*) AS tp FROM tp_rows GROUP BY 1),
univ AS (SELECT image_id FROM np_ UNION SELECT image_id FROM ng_)
SELECT u.image_id,
       COALESCE(np_.n_pred, 0) AS n_pred,
       COALESCE(ng_.n_gt, 0) AS n_gt,
       COALESCE(nt_.tp, 0) AS tp,
       COALESCE(np_.n_pred, 0) - COALESCE(nt_.tp, 0) AS fp,
       COALESCE(ng_.n_gt, 0) - COALESCE(nt_.tp, 0) AS fn,
       CAST(COALESCE(nt_.tp, 0) AS DOUBLE)
         / NULLIF(COALESCE(np_.n_pred, 0), 0) AS precision,
       CAST(COALESCE(nt_.tp, 0) AS DOUBLE)
         / NULLIF(COALESCE(ng_.n_gt, 0), 0) AS recall
FROM univ u
LEFT JOIN np_ USING (image_id)
LEFT JOIN ng_ USING (image_id)
LEFT JOIN nt_ USING (image_id)
ORDER BY u.image_id
"""


def gt_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic ground-truth table (engine twin of _GT_BOXES_SQL)."""
    o = TT(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("gt_id"),
        (F.col("o_orderkey") % NMS_IMAGES).alias("image_id"),
        ((F.col("o_custkey") * 17) % 192).alias("x0"),
        ((F.col("o_custkey") * 23) % 192).alias("y0"),
        ((F.col("o_custkey") * 17) % 192 + 16 + F.col("o_orderkey") % 49).alias("x1"),
        ((F.col("o_custkey") * 23) % 192 + 16 + F.col("o_orderkey") % 49).alias("y1"),
    )


@query("image_box_match_pr", oracle=_MATCH_PR_SQL)
def image_box_match_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detection-quality scoring: one-to-one IoU matching of predicted
    boxes to ground truth, per-image TP/FP/FN + precision/recall — the
    metric pass a curation pipeline runs after NMS to gate a detector's
    crops before training. The matching rule is fully relational (no
    sequential greedy walk): every prediction is assigned to its max-IoU
    qualifying gt (IoU >= 1/2 by exact integer cross-multiplication; the
    argmax tiebreak is min gt_id), then each gt keeps its top-scoring
    assigned prediction — a valid one-to-one matching computed by two
    windowed argmaxes. IoU ordering inside the window divides two exact
    small ints in IEEE double, identical in Spark and DuckDB.

    Scale shape: ONE image-keyed equi join with per-image box counts
    bounded by the detector top-k (pairs bounded per image, no global
    stage); the two windows partition on box_id / gt_id — maximal-
    cardinality keys, so no skew; final per-image rollup is partial-
    aggregable. Hot image keys would reuse pip_join's recon salting.
    """
    from pyspark.sql import Window

    pred = nms_boxes(spark, sf_dir)
    gt = gt_boxes(spark, sf_dir)
    p = pred.select(
        "box_id", "image_id", "score",
        F.col("x0").alias("px0"), F.col("y0").alias("py0"),
        F.col("x1").alias("px1"), F.col("y1").alias("py1"),
    )
    g = gt.select(
        "gt_id", F.col("image_id").alias("g_image_id"),
        F.col("x0").alias("gx0"), F.col("y0").alias("gy0"),
        F.col("x1").alias("gx1"), F.col("y1").alias("gy1"),
    )
    inter = F.greatest(
        F.lit(0), F.least("px1", "gx1") - F.greatest("px0", "gx0")
    ) * F.greatest(F.lit(0), F.least("py1", "gy1") - F.greatest("py0", "gy0"))
    s_area = (F.col("px1") - F.col("px0")) * (F.col("py1") - F.col("py0")) + (
        F.col("gx1") - F.col("gx0")
    ) * (F.col("gy1") - F.col("gy0"))
    qual = (
        p.join(g, F.col("image_id") == F.col("g_image_id"))
        .where(inter * MATCH_IOU_DEN >= (s_area - inter) * MATCH_IOU_NUM)
        .select(
            "box_id", "image_id", "score", "gt_id",
            inter.alias("inter"), s_area.alias("s_area"),
        )
    )
    w_pred = Window.partitionBy("box_id").orderBy(
        (F.col("inter").cast("double") / (F.col("s_area") - F.col("inter"))).desc(),
        "gt_id",
    )
    assigned = (
        qual.withColumn("rk", F.row_number().over(w_pred)).where(F.col("rk") == 1)
    )
    w_gt = Window.partitionBy("gt_id").orderBy(F.col("score").desc(), "box_id")
    tp_rows = (
        assigned.withColumn("rk2", F.row_number().over(w_gt)).where(F.col("rk2") == 1)
    )
    np_ = pred.groupBy("image_id").agg(F.count(F.lit(1)).alias("n_pred"))
    ng_ = gt.groupBy("image_id").agg(F.count(F.lit(1)).alias("n_gt"))
    nt_ = tp_rows.groupBy("image_id").agg(F.count(F.lit(1)).alias("tp"))
    univ = np_.select("image_id").union(ng_.select("image_id")).distinct()
    z = F.lit(0)
    out = (
        univ.join(np_, "image_id", "left")
        .join(ng_, "image_id", "left")
        .join(nt_, "image_id", "left")
        .select(
            "image_id",
            F.coalesce("n_pred", z).alias("n_pred"),
            F.coalesce("n_gt", z).alias("n_gt"),
            F.coalesce("tp", z).alias("tp"),
            (F.coalesce("n_pred", z) - F.coalesce("tp", z)).alias("fp"),
            (F.coalesce("n_gt", z) - F.coalesce("tp", z)).alias("fn"),
            (
                F.coalesce("tp", z).cast("double")
                / F.nullif(F.coalesce("n_pred", z), z)
            ).alias("precision"),
            (
                F.coalesce("tp", z).cast("double")
                / F.nullif(F.coalesce("n_gt", z), z)
            ).alias("recall"),
        )
    )
    return out.orderBy("image_id")


# --- frame-to-frame IoU box tracking ------------------------------------------

_TRACK_SQL = f"""
WITH boxes AS ({_NMS_BOXES_SQL}),
pred AS (SELECT * FROM boxes WHERE image_id < {NMS_IMAGES - 1}),
nxt AS (SELECT * FROM boxes),
qual AS (
  SELECT p.box_id AS box_a, p.image_id, p.score, n.box_id AS box_b,
         GREATEST(0, LEAST(p.x1, n.x1) - GREATEST(p.x0, n.x0))
           * GREATEST(0, LEAST(p.y1, n.y1) - GREATEST(p.y0, n.y0)) AS inter,
         (p.x1 - p.x0) * (p.y1 - p.y0) + (n.x1 - n.x0) * (n.y1 - n.y0) AS s_area
  FROM pred p JOIN nxt n ON n.image_id = p.image_id + 1
  WHERE GREATEST(0, LEAST(p.x1, n.x1) - GREATEST(p.x0, n.x0))
          * GREATEST(0, LEAST(p.y1, n.y1) - GREATEST(p.y0, n.y0)) * {MATCH_IOU_DEN}
        >= ((p.x1 - p.x0) * (p.y1 - p.y0) + (n.x1 - n.x0) * (n.y1 - n.y0)
            - GREATEST(0, LEAST(p.x1, n.x1) - GREATEST(p.x0, n.x0))
              * GREATEST(0, LEAST(p.y1, n.y1) - GREATEST(p.y0, n.y0)))
           * {MATCH_IOU_NUM}
),
assigned AS (
  SELECT * FROM (
    SELECT box_a, image_id, score, box_b,
           ROW_NUMBER() OVER (
             PARTITION BY box_a
             ORDER BY CAST(inter AS DOUBLE) / (s_area - inter) DESC, box_b
           ) AS rk
    FROM qual) WHERE rk = 1
),
tracks AS (
  SELECT * FROM (
    SELECT image_id, box_a, box_b,
           ROW_NUMBER() OVER (
             PARTITION BY box_b ORDER BY score DESC, box_a) AS rk2
    FROM assigned) WHERE rk2 = 1
)
SELECT image_id AS frame, CAST(COUNT(*) AS BIGINT) AS n_tracks,
       MIN(box_a) AS min_box_a, MAX(box_b) AS max_box_b
FROM tracks GROUP BY 1 ORDER BY 1
"""


@query("image_box_track", oracle=_TRACK_SQL)
def image_box_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-to-frame detection tracking: boxes of frame k associate
    one-to-one with boxes of frame k+1 by the same relational double-
    argmax the PR matcher uses (each box takes its max-IoU successor at
    IoU ≥ 1/2; each successor keeps its top-scoring claimant) — the
    IoU-tracker data association step (SORT-style, minus the motion
    model) with no sequential greedy walk. Per-frame track counts +
    boundary ids summarize the association. Same bounded per-image pair
    shape as NMS/PR; windows on maximal-cardinality box keys."""
    b = nms_boxes(spark, sf_dir)
    p = b.where(F.col("image_id") < NMS_IMAGES - 1).select(
        F.col("box_id").alias("box_a"), "image_id", "score",
        F.col("x0").alias("px0"), F.col("y0").alias("py0"),
        F.col("x1").alias("px1"), F.col("y1").alias("py1"),
    )
    n = b.select(
        F.col("box_id").alias("box_b"), F.col("image_id").alias("n_img"),
        F.col("x0").alias("nx0"), F.col("y0").alias("ny0"),
        F.col("x1").alias("nx1"), F.col("y1").alias("ny1"),
    )
    inter = F.greatest(
        F.lit(0), F.least("px1", "nx1") - F.greatest("px0", "nx0")
    ) * F.greatest(F.lit(0), F.least("py1", "ny1") - F.greatest("py0", "ny0"))
    s_area = (F.col("px1") - F.col("px0")) * (F.col("py1") - F.col("py0")) + (
        F.col("nx1") - F.col("nx0")
    ) * (F.col("ny1") - F.col("ny0"))
    qual = (
        p.join(n, F.col("n_img") == F.col("image_id") + 1)
        .where(inter * MATCH_IOU_DEN >= (s_area - inter) * MATCH_IOU_NUM)
        .select(
            "box_a", "image_id", "score", "box_b",
            inter.alias("inter"), s_area.alias("s_area"),
        )
    )
    from pyspark.sql import Window

    w1 = Window.partitionBy("box_a").orderBy(
        (F.col("inter").cast("double") / (F.col("s_area") - F.col("inter"))).desc(),
        "box_b",
    )
    assigned = qual.withColumn("rk", F.row_number().over(w1)).where(F.col("rk") == 1)
    w2 = Window.partitionBy("box_b").orderBy(F.col("score").desc(), "box_a")
    tracks = assigned.withColumn("rk2", F.row_number().over(w2)).where(
        F.col("rk2") == 1
    )
    return (
        tracks.groupBy(F.col("image_id").alias("frame"))
        .agg(
            F.count(F.lit(1)).alias("n_tracks"),
            F.min("box_a").alias("min_box_a"),
            F.max("box_b").alias("max_box_b"),
        )
        .orderBy("frame")
    )


# --- per-channel pixel histogram, decode-vs-symbolic cross check ---------------

N_HIST_IMGS = 150  # smaller corpus: the oracle replays every pixel in SQL

_CHANNEL_HIST_SQL = f"""
WITH imgs AS (
  SELECT i, (i * 2654435761) % 251 AS base,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT range AS i FROM range(0, {N_HIST_IMGS}))
),
px AS (
  SELECT base, x.range AS x, y.range AS y
  FROM imgs, range(0, 128) x, range(0, 128) y
  WHERE x.range < w AND y.range < h
),
chans AS (
  SELECT 'r' AS channel, (base + 3 * x + 5 * y) % 256 AS bin FROM px
  UNION ALL
  SELECT 'g', (base * 7 + 11 * x + 2 * y + (x * y) % 17) % 256 FROM px
  UNION ALL
  SELECT 'b', (base * 13 + x // 2 + 7 * y) % 256 FROM px
)
SELECT channel, bin, COUNT(*) AS n
FROM chans GROUP BY channel, bin ORDER BY channel, bin
"""


@query("image_channel_histogram", oracle=_CHANNEL_HIST_SQL)
def image_channel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide per-channel pixel histogram — the dataset-statistics
    pass every vision-training pipeline runs (normalization constants,
    exposure skew, dead-channel detection) — computed from the REAL
    decoded bytes (PNG inflate / raw view) and checked against a symbolic
    SQL replay of the generator formulas: a second, independent proof of
    lossless decode beside the PSNR invariant (a single wrong pixel in any
    image shifts two histogram bins).

    Scale shape: the kernel decodes a whole Arrow batch and emits ONE
    pre-reduced 768-row partial histogram per batch (np.bincount), so the
    shuffle carries #batches × 768 rows, never #pixels; the final
    (channel, bin) aggregate is partial-aggregable on both sides of the
    exchange. At 10^12 images this is the canonical map-side-combine
    reduction — bytes never leave the map task."""
    import numpy as np  # local: keep worker import cost off module load
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_HIST_IMGS)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            acc = np.zeros((3, 256), np.int64)
            for r in pdf.itertuples(index=False):
                px = IC.decode(bytes(r.bytes), r.fmt)
                for c in range(3):
                    acc[c] += np.bincount(px[..., c].ravel(), minlength=256)
            yield pd.DataFrame(
                {
                    "channel": np.repeat(np.array(["r", "g", "b"], object), 256),
                    "bin": np.tile(np.arange(256, dtype=np.int64), 3),
                    "n": acc.reshape(-1),
                }
            )

    return (
        imgs.mapInPandas(kernel, "channel string, bin long, n long")
        .groupBy("channel", "bin")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") > 0)
        .orderBy("channel", "bin")
    )


# --- zonal statistics: decoded raster pixels aggregated per vector zone --------

N_ZONAL_IMGS = 120

# Symbolic replay of the decoded-tile sums: enumerate every pixel of every
# in-window tile from the generator formulas (sources/images.py
# image_pixels), assign the tile's center to its grid zone with the same
# left/lower tie rule as _TILE_ASSIGN_SQL, and aggregate per zone. Any
# single wrong byte in the engine's real decode path shifts a zone sum.
_ZONAL_SQL = f"""
WITH imgs AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base,
         CAST((i * {GEO_KX}) % {GEO_M} AS DOUBLE) / {GEO_DIV} AS lon,
         CAST((i * {GEO_KY}) % {GEO_M} AS DOUBLE) / {GEO_DIV} AS lat
  FROM (SELECT range AS i FROM range(0, {N_ZONAL_IMGS}))
),
tiles AS (
  SELECT i, base, tx.range AS tx, ty.range AS ty,
         lon + CAST(tx.range * {TILE} + {TILE // 2} AS DOUBLE) / 1024.0 AS cx,
         lat + CAST(ty.range * {TILE} + {TILE // 2} AS DOUBLE) / 1024.0 AS cy
  FROM imgs, range(0, 4) tx, range(0, 4) ty
  WHERE tx.range < w / {TILE} AND ty.range < h / {TILE}
),
inside AS (
  SELECT *,
         CAST((CASE WHEN cy = floor(cy) AND cy > 0 THEN cy - 1 ELSE floor(cy) END) * {GRID_N}
            + (CASE WHEN cx = floor(cx) AND cx > 0 THEN cx - 1 ELSE floor(cx) END) AS BIGINT)
           AS feature_id
  FROM tiles WHERE cx <= 20.0 AND cy <= 20.0
),
px AS (
  SELECT feature_id, base,
         tx * {TILE} + dx.range AS x, ty * {TILE} + dy.range AS y
  FROM inside, range(0, {TILE}) dx, range(0, {TILE}) dy
)
SELECT feature_id,
       COUNT(DISTINCT base) AS n_src,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM((base + 3 * x + 5 * y) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((base * 7 + 11 * x + 2 * y + (x * y) % 17) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((base * 13 + x // 2 + 7 * y) % 256) AS BIGINT) AS sum_b,
       CAST(MAX((base + 3 * x + 5 * y) % 256) AS BIGINT) AS max_r,
       CAST(MIN((base * 13 + x // 2 + 7 * y) % 256) AS BIGINT) AS min_b
FROM px GROUP BY feature_id ORDER BY feature_id
"""


@query("raster_zonal_stats", oracle=_ZONAL_SQL)
def raster_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics — the raster↔vector payoff query: per-vector-zone
    aggregates of REAL decoded pixel values (sum/min/max per channel),
    computed by decoding every 32×32 tile's raw bytes (the actual binary
    column, PNG-inflated upstream by tile_images) and reducing per tile
    BEFORE any exchange.

    Scale shape: the decode kernel emits ONE 8-number row per tile (the
    mapInPandas pre-reduction — pixel bytes never cross a shuffle), tile
    centers join to zones through the existing pip_join (broadcast cell
    index at this polygon count, two-stage shuffle beyond), and the final
    per-zone aggregate is an ordinary partial-aggregable hash agg. At
    10^12 images the exchange carries one stats row per tile, ~3 orders
    below the pixel payload; identical to the channel-histogram reduction
    but keyed by a spatial join instead of a constant."""
    import numpy as np  # local: worker-side kernel deps
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    tiles = tile_images(synthetic_images(spark, N_ZONAL_IMGS))

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                t = IC.raw_decode(bytes(r.tile_bytes)).astype(np.int64)
                rows.append(
                    (
                        int(r.tile_id),
                        float(r.cx),
                        float(r.cy),
                        int(t[..., 0].sum()),
                        int(t[..., 1].sum()),
                        int(t[..., 2].sum()),
                        int(t[..., 0].max()),
                        int(t[..., 2].min()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "tile_id", "cx", "cy",
                    "sum_r", "sum_g", "sum_b", "max_r", "min_b",
                ],
            )

    stats = tiles.mapInPandas(
        kernel,
        "tile_id long, cx double, cy double, "
        "sum_r long, sum_g long, sum_b long, max_r long, min_b long",
    )
    centers = stats.select(
        F.col("tile_id").alias("point_id"), F.col("cx").alias("x"), F.col("cy").alias("y")
    )
    rings = surface_mosaic(spark, rows=GRID_N, cols=GRID_N, defect="valid_mosaic")
    assign = pip_join(spark, centers, rings).select(
        F.col("point_id").alias("tile_id"), "feature_id"
    )
    return (
        stats.join(assign, "tile_id")
        .withColumn("src", F.expr(f"(CAST(tile_id AS BIGINT) >> 16) * 2654435761 % 251"))
        .groupBy("feature_id")
        .agg(
            F.countDistinct("src").alias("n_src"),
            (F.count(F.lit(1)) * (TILE * TILE)).alias("n_px"),
            F.sum("sum_r").alias("sum_r"),
            F.sum("sum_g").alias("sum_g"),
            F.sum("sum_b").alias("sum_b"),
            F.max("max_r").alias("max_r"),
            F.min("min_b").alias("min_b"),
        )
        .orderBy("feature_id")
    )


# --- slippy-map tile cover: which z/x/y tiles does each raster touch ----------

COVER_N_IMGS = 400
COVER_Z0, COVER_Z1 = 5, 9  # tile widths 0.625° … 20/512°
_COVER_MAX_SPAN = 8  # ≥ ceil(max extent 0.125° / min tile width) + 1

_TILE_COVER_SQL = f"""
WITH imgs AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         CAST((i * {GEO_KX}) % {GEO_M} AS DOUBLE) / {GEO_DIV} AS lon,
         CAST((i * {GEO_KY}) % {GEO_M} AS DOUBLE) / {GEO_DIV} AS lat
  FROM (SELECT range AS i FROM range(0, {COVER_N_IMGS}))
),
zs AS (SELECT range AS z, CAST(1 << range AS DOUBLE) AS p2
       FROM range({COVER_Z0}, {COVER_Z1 + 1})),
b AS (
  SELECT i, z, p2,
         CAST(FLOOR(lon * p2 / 20.0) AS BIGINT) AS tx0,
         CAST(FLOOR(lat * p2 / 20.0) AS BIGINT) AS ty0,
         lon + CAST(w AS DOUBLE) / 1024.0 AS xe,
         lat + CAST(h AS DOUBLE) / 1024.0 AS ye
  FROM imgs, zs
),
hx AS (
  SELECT *,
         LEAST(CAST((1 << z) - 1 AS BIGINT),
               CAST(CASE WHEN xe * p2 / 20.0 = FLOOR(xe * p2 / 20.0)
                         THEN FLOOR(xe * p2 / 20.0) - 1
                         ELSE FLOOR(xe * p2 / 20.0) END AS BIGINT)) AS tx1,
         LEAST(CAST((1 << z) - 1 AS BIGINT),
               CAST(CASE WHEN ye * p2 / 20.0 = FLOOR(ye * p2 / 20.0)
                         THEN FLOOR(ye * p2 / 20.0) - 1
                         ELSE FLOOR(ye * p2 / 20.0) END AS BIGINT)) AS ty1
  FROM b
),
refs AS (
  SELECT i, z, tx0 + dx.range AS tx, ty0 + dy.range AS ty
  FROM hx, range(0, {_COVER_MAX_SPAN}) dx, range(0, {_COVER_MAX_SPAN}) dy
  WHERE tx0 + dx.range <= tx1 AND ty0 + dy.range <= ty1
),
per_img AS (SELECT i, z, COUNT(*) AS nt FROM refs GROUP BY 1, 2),
agg AS (SELECT z, CAST(SUM(nt) AS BIGINT) AS n_tile_refs,
               CAST(MAX(nt) AS BIGINT) AS max_tiles_per_image
        FROM per_img GROUP BY z),
dis AS (SELECT z, COUNT(DISTINCT tx * (CAST(1 AS BIGINT) << 32) + ty) AS n_distinct_tiles
        FROM refs GROUP BY z)
SELECT CAST(agg.z AS INTEGER) AS zoom, n_tile_refs, n_distinct_tiles,
       max_tiles_per_image
FROM agg JOIN dis USING (z) ORDER BY zoom
"""


@query("raster_tile_cover", oracle=_TILE_COVER_SQL)
def raster_tile_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slippy-map tile cover — for every raster footprint, the set of
    z/x/y map tiles its half-open extent [anchor, anchor + size_px·PX_DEG)
    touches, across a zoom pyramid; reported per zoom as total refs,
    distinct tiles (shared-tile dedup across overlapping rasters) and the
    worst per-image fan-out. This is THE ingestion planner for a tile
    server / ML tile pipeline: refs-per-zoom sizes each level's shuffle,
    distinct-tiles its storage, max-per-image its skew.

    Boundary semantics pinned exactly: a raster whose edge lands ON a tile
    boundary does not touch the next tile (half-open), via the same
    `v = floor(v) → v−1` tie rule the PIP fixtures use; tile indices clamp
    to the world grid. All tile math is closed-form on exact doubles
    (power-of-two scale via shiftleft, one correctly-rounded divide), so
    DuckDB replays bit-for-bit.

    Scale shape: pure Catalyst — metadata-only (no pixel decode), explode
    via sequence(tx0, tx1) bounded by the zoom fan-out, every aggregate
    partial-aggregable; the distinct-tiles count is a two-level hash agg
    on the packed (z, tx, ty) key."""
    imgs = synthetic_images(spark, COVER_N_IMGS).select("image_id", "w", "h")
    i_expr = F.substring("image_id", 5, 12).cast("long")
    base = imgs.select(
        i_expr.alias("i"),
        "w",
        "h",
        ((i_expr * GEO_KX) % GEO_M).cast("double").alias("lon_n"),
        ((i_expr * GEO_KY) % GEO_M).cast("double").alias("lat_n"),
    ).select(
        "i",
        "w",
        "h",
        (F.col("lon_n") / GEO_DIV).alias("lon"),
        (F.col("lat_n") / GEO_DIV).alias("lat"),
    )
    zdf = base.select(
        "*", F.explode(F.array([F.lit(z) for z in range(COVER_Z0, COVER_Z1 + 1)])).alias("z")
    ).withColumn("p2", F.expr("CAST(shiftleft(CAST(1 AS BIGINT), z) AS DOUBLE)"))

    def _hi(end_col: str) -> F.Column:
        v = F.col(end_col) * F.col("p2") / F.lit(20.0)
        raw = F.when(v == F.floor(v), F.floor(v) - 1).otherwise(F.floor(v))
        return F.least(F.expr("CAST(shiftleft(CAST(1 AS BIGINT), z) - 1 AS BIGINT)"), raw.cast("long"))

    bounds = (
        zdf.withColumn("xe", F.col("lon") + F.col("w").cast("double") / F.lit(1024.0))
        .withColumn("ye", F.col("lat") + F.col("h").cast("double") / F.lit(1024.0))
        .withColumn("tx0", F.floor(F.col("lon") * F.col("p2") / F.lit(20.0)).cast("long"))
        .withColumn("ty0", F.floor(F.col("lat") * F.col("p2") / F.lit(20.0)).cast("long"))
        .withColumn("tx1", _hi("xe"))
        .withColumn("ty1", _hi("ye"))
    )
    refs = (
        bounds.select("i", "z", F.explode(F.sequence("tx0", "tx1")).alias("tx"), "ty0", "ty1")
        .select("i", "z", "tx", F.explode(F.sequence("ty0", "ty1")).alias("ty"))
    )
    per_img = refs.groupBy("i", "z").agg(F.count(F.lit(1)).alias("nt"))
    per_zoom = per_img.groupBy("z").agg(
        F.sum("nt").alias("n_tile_refs"), F.max("nt").alias("max_tiles_per_image")
    )
    distinct = (
        refs.select("z", (F.col("tx") * F.lit(1 << 32).cast("long") + F.col("ty")).alias("tk"))
        .distinct()
        .groupBy("z")
        .agg(F.count(F.lit(1)).alias("n_distinct_tiles"))
    )
    return (
        per_zoom.join(distinct, "z")
        .select(
            F.col("z").cast("int").alias("zoom"),
            "n_tile_refs",
            "n_distinct_tiles",
            "max_tiles_per_image",
        )
        .orderBy("zoom")
    )


# --- image pyramid: 2× box-filter downsample levels, decode-backed -------------

N_PYRSTAT_IMGS = 100
PYRSTAT_LEVELS = 2  # level 0 = native decode, levels 1..2 = 2× floor-average

# Symbolic replay: level-1 pixel = floor(mean of its 2×2 original block),
# level-2 = floor(mean of its 2×2 level-1 block) — nested integer floors,
# exactly the engine kernel's arithmetic, over the generator formulas.
_PYR_SQL = f"""
WITH imgs AS (
  SELECT i, (i * 2654435761) % 251 AS base,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT range AS i FROM range(0, {N_PYRSTAT_IMGS}))
),
px AS (
  SELECT i, base, x.range AS x, y.range AS y
  FROM imgs, range(0, 128) x, range(0, 128) y
  WHERE x.range < w AND y.range < h
),
l0 AS (
  SELECT i, x, y,
         (base + 3 * x + 5 * y) % 256 AS r,
         (base * 7 + 11 * x + 2 * y + (x * y) % 17) % 256 AS g,
         (base * 13 + x // 2 + 7 * y) % 256 AS b
  FROM px
),
l1 AS (
  SELECT i, x // 2 AS x, y // 2 AS y,
         SUM(r) // 4 AS r, SUM(g) // 4 AS g, SUM(b) // 4 AS b
  FROM l0 GROUP BY 1, 2, 3
),
l2 AS (
  SELECT i, x // 2 AS x, y // 2 AS y,
         SUM(r) // 4 AS r, SUM(g) // 4 AS g, SUM(b) // 4 AS b
  FROM l1 GROUP BY 1, 2, 3
),
stacked AS (
  SELECT 0 AS level, * FROM l0
  UNION ALL SELECT 1, * FROM l1
  UNION ALL SELECT 2, * FROM l2
),
chan AS (
  SELECT level, 'r' AS channel, r AS v FROM stacked
  UNION ALL SELECT level, 'g', g FROM stacked
  UNION ALL SELECT level, 'b', b FROM stacked
)
SELECT CAST(level AS INTEGER) AS level, channel,
       COUNT(*) AS n_px, CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(MIN(v) AS BIGINT) AS min_v, CAST(MAX(v) AS BIGINT) AS max_v
FROM chan GROUP BY level, channel ORDER BY level, channel
"""


@query("image_pyramid_stats", oracle=_PYR_SQL)
def image_pyramid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overview-pyramid build check — every tile server / COG writer
    maintains 2× box-filtered overview levels; this decodes the REAL image
    bytes, builds two floor-average levels per image with one vectorized
    reshape-sum per level, and reduces to per-(level, channel) corpus
    stats. The DuckDB oracle replays the nested integer floors
    symbolically, so one wrong byte in any decoded pixel (or one
    off-by-one in the block arithmetic) shifts a sum.

    Scale shape: pyramid construction is embarrassingly parallel per image
    inside the Arrow kernel; the exchange carries 9 stat rows per image
    (pre-reduced further by Catalyst's partial agg), never pixels."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_PYRSTAT_IMGS)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                lvl_px = IC.decode(bytes(r.bytes), r.fmt).astype(np.int64)
                for lvl in range(PYRSTAT_LEVELS + 1):
                    if lvl > 0:
                        h, w, _ = lvl_px.shape
                        lvl_px = (
                            lvl_px.reshape(h // 2, 2, w // 2, 2, 3).sum(axis=(1, 3))
                            // 4
                        )
                    for ci, ch in enumerate("rgb"):
                        c = lvl_px[..., ci]
                        rows.append(
                            (lvl, ch, int(c.size), int(c.sum()), int(c.min()), int(c.max()))
                        )
            yield pd.DataFrame(
                rows, columns=["level", "channel", "n_px", "sum_v", "min_v", "max_v"]
            )

    return (
        imgs.mapInPandas(
            kernel, "level int, channel string, n_px long, sum_v long, min_v long, max_v long"
        )
        .groupBy("level", "channel")
        .agg(
            F.sum("n_px").alias("n_px"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
        .orderBy("level", "channel")
    )


# --- integral image (summed-area table) box-filter sums -------------------------

N_SAT_IMGS = 100
SAT_K = 4  # deterministic query boxes per image

# Box k over image i (size w×h): side lengths alternate 8/16 px, anchor
# walks a deterministic integer lattice that always fits inside the image.
# All integer arithmetic — DuckDB replays the same boxes exactly, summing
# the generator formulas directly over the box extent (no SAT needed on
# the oracle side; the SAT is the engine's O(1)-per-box evaluation trick).
_SAT_SQL = f"""
WITH imgs AS (
  SELECT i, (i * 2654435761) % 251 AS base,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT range AS i FROM range(0, {N_SAT_IMGS}))
),
boxes AS (
  SELECT i, base, w, h, k.range AS k,
         CAST(8 * (1 + (k.range % 2)) AS BIGINT) AS bw,
         CAST(8 * (1 + ((k.range + 1) % 2)) AS BIGINT) AS bh
  FROM imgs, range(0, {SAT_K}) k
),
anchored AS (
  SELECT i, base, k, bw, bh,
         (i * 7 + k * 31) % (w - bw) AS x0,
         (i * 5 + k * 17) % (h - bh) AS y0
  FROM boxes
),
px AS (
  SELECT a.i, a.k, a.base,
         a.x0 + dx.range AS x, a.y0 + dy.range AS y
  FROM anchored a, range(0, 16) dx, range(0, 16) dy
  WHERE dx.range < a.bw AND dy.range < a.bh
),
chan AS (
  SELECT k, 'r' AS channel, (base + 3 * x + 5 * y) % 256 AS v FROM px
  UNION ALL
  SELECT k, 'g', (base * 7 + 11 * x + 2 * y + (x * y) % 17) % 256 FROM px
  UNION ALL
  SELECT k, 'b', (base * 13 + x // 2 + 7 * y) % 256 FROM px
)
SELECT CAST(k AS INTEGER) AS box_id, channel,
       CAST(COUNT(*) AS BIGINT) AS n_px, CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(MIN(v) AS BIGINT) AS min_v, CAST(MAX(v) AS BIGINT) AS max_v
FROM chan GROUP BY box_id, channel ORDER BY box_id, channel
"""


@query("image_integral_boxsum", oracle=_SAT_SQL)
def image_integral_boxsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summed-area-table box sums — the O(1) box-filter primitive behind
    Viola-Jones features, raster zonal means and blur pyramids (Crow 1984,
    public): decode the REAL image bytes once, build a per-channel int64
    integral image, and answer each deterministic query box with 4 corner
    lookups instead of bw·bh pixel reads.

    The DuckDB oracle sums the generator formulas directly over each box
    extent, so it checks BOTH the decode fidelity and the SAT corner
    algebra — one wrong prefix-sum cell or off-by-one box bound shifts a
    sum.

    Scale shape: decode + SAT + K lookups are one map-side Arrow kernel
    per image (the SAT never leaves the worker, the exchange carries
    K·3 stat rows per image, pre-reduced again by Catalyst's partial
    agg); the final per-(box, channel) reduce is an ordinary hash agg."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_SAT_IMGS)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                i = int(r.image_id[4:])
                px = IC.decode(bytes(r.bytes), r.fmt).astype(np.int64)
                h, w, _ = px.shape
                # padded SAT: S[y, x] = sum of px[:y, :x]
                sat = np.zeros((h + 1, w + 1, 3), dtype=np.int64)
                np.cumsum(np.cumsum(px, axis=0), axis=1, out=sat[1:, 1:])
                for k in range(SAT_K):
                    bw = 8 * (1 + (k % 2))
                    bh = 8 * (1 + ((k + 1) % 2))
                    x0 = (i * 7 + k * 31) % (w - bw)
                    y0 = (i * 5 + k * 17) % (h - bh)
                    x1, y1 = x0 + bw, y0 + bh
                    box = (
                        sat[y1, x1] - sat[y0, x1] - sat[y1, x0] + sat[y0, x0]
                    )
                    blk = px[y0:y1, x0:x1]
                    for ci, ch in enumerate("rgb"):
                        rows.append(
                            (
                                k,
                                ch,
                                bw * bh,
                                int(box[ci]),
                                int(blk[..., ci].min()),
                                int(blk[..., ci].max()),
                            )
                        )
            yield pd.DataFrame(
                rows, columns=["box_id", "channel", "n_px", "sum_v", "min_v", "max_v"]
            )

    return (
        imgs.mapInPandas(
            kernel,
            "box_id int, channel string, n_px long, sum_v long, min_v long, max_v long",
        )
        .groupBy("box_id", "channel")
        .agg(
            F.sum("n_px").alias("n_px"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
        .orderBy("box_id", "channel")
    )


# --- augmentation kernels: flip / rot90 with position-sensitive checksums ----
# The training-data augmentation pass (brief: decode / feature-extract /
# resize / frame-sample): a REAL numpy hflip + rot90 over decoded pixels,
# verified by POSITION-WEIGHTED checksums the oracle replays symbolically —
# a transform that merely preserves pixel mass cannot pass:
#   hflip_xr  = Σ x·R_hflip(x,y)  = Σ (w-1-x)·R(x,y)       (index remap)
#   rot90_xg  = Σ x·G_rot90(x,y)  = Σ y·G(x,y)             (rot90 CCW:
#               out[i2,j2] = in[j2, W-1-i2] ⇒ the x-weighted sum of the
#               output equals the y-weighted sum of the input)
#   sum_b     = Σ B(x,y)  (mass invariant under both transforms)
# All exact int64; pixels never leave the kernel — 1 row per image.

N_AUG_IMAGES = 240

_AUG_SQL = f"""
WITH par AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base
  FROM (SELECT unnest(range({N_AUG_IMAGES})) AS i)
),
px AS (SELECT i, w, h, base, unnest(range(w * h)) AS p FROM par),
terms AS (
  SELECT i,
         (w - 1 - (p % w)) * ((base + 3 * (p % w) + 5 * (p // w)) % 256) AS t_hflip,
         (p // w) * ((base * 7 + 11 * (p % w) + 2 * (p // w) + ((p % w) * (p // w)) % 17) % 256) AS t_rot,
         ((base * 13 + (p % w) // 2 + 7 * (p // w)) % 256) AS t_b
  FROM px
)
SELECT printf('img-%012d', i) AS image_id,
       CAST(SUM(t_hflip) AS BIGINT) AS hflip_xr,
       CAST(SUM(t_rot) AS BIGINT) AS rot90_xg,
       CAST(SUM(t_b) AS BIGINT) AS sum_b
FROM terms GROUP BY i ORDER BY image_id
"""


@query("image_augment_stats", oracle=_AUG_SQL)
def image_augment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Augmentation kernel audit: decode each image, apply REAL
    np.fliplr / np.rot90, and emit position-weighted channel checksums
    that the DuckDB oracle re-derives symbolically from the pixel
    generator + the index-remap algebra above. Map-only Arrow kernel
    (zero shuffle before the 1-row-per-image agg exchange); at 10^12
    images this is the same scan-shaped pass as every decode op here —
    the augmented bytes would be written straight to the sink, never
    shuffled."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_AUG_IMAGES)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = IC.decode(bytes(r.bytes), r.fmt).astype(np.int64)
                h, w, _ = img.shape
                xs = np.arange(w, dtype=np.int64)[None, :]
                ys = np.arange(h, dtype=np.int64)[:, None]
                hflip = np.fliplr(img)
                rot = np.rot90(img)  # CCW, shape (w, h, 3)
                xs_rot = np.arange(rot.shape[1], dtype=np.int64)[None, :]
                rows.append(
                    (
                        r.image_id,
                        int((xs * hflip[:, :, 0]).sum()),
                        int((xs_rot * rot[:, :, 1]).sum()),
                        int(img[:, :, 2].sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "hflip_xr", "rot90_xg", "sum_b"]
            )

    return imgs.mapInPandas(
        kernel, "image_id string, hflip_xr long, rot90_xg long, sum_b long"
    ).orderBy("image_id")


# --- marching-squares contour cells (image x geospatial crossover) -------------
#
# Threshold the gray raster at T, classify every 2x2 pixel cell into its
# marching-squares case (0..15), and reduce per image: contour-cell count,
# segment count (saddle cases 5/10 carry two segments), and a
# position-weighted case checksum that pins the exact case of every cell.
# The vector-contour primitive of the image x geospatial graft: the case
# map IS the iso-line topology a raster->vector stage would trace.

CONTOUR_T = 128

# bit order: b0=(x,y) b1=(x+1,y) b2=(x+1,y+1) b3=(x,y+1); case = b0+2b1+4b2+8b3
_CONTOUR_SQL = f"""
WITH par AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base
  FROM (SELECT unnest(range({N_GRAD_IMAGES})) AS i)
),
px AS (SELECT i, base, w, h, unnest(range((w - 1) * (h - 1))) AS p FROM par),
c AS (
  SELECT i, base, (p % (w - 1)) AS x, (p // (w - 1)) AS y
  FROM px
),
k AS (
  SELECT i, x, y,
         (CASE WHEN {_g_expr("x", "y")} >= {CONTOUR_T} THEN 1 ELSE 0 END)
       + (CASE WHEN {_g_expr("x + 1", "y")} >= {CONTOUR_T} THEN 2 ELSE 0 END)
       + (CASE WHEN {_g_expr("x + 1", "y + 1")} >= {CONTOUR_T} THEN 4 ELSE 0 END)
       + (CASE WHEN {_g_expr("x", "y + 1")} >= {CONTOUR_T} THEN 8 ELSE 0 END)
         AS cs
  FROM c
)
SELECT printf('img-%012d', i) AS image_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN cs NOT IN (0, 15) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contour,
       CAST(SUM(CASE WHEN cs IN (5, 10) THEN 2
                     WHEN cs IN (0, 15) THEN 0 ELSE 1 END) AS BIGINT)
         AS n_segments,
       CAST(SUM(cs * (x + 31 * y + 1)) AS BIGINT) AS case_checksum
FROM k GROUP BY 1 ORDER BY image_id
"""


@query("image_contour_cells", oracle=_CONTOUR_SQL)
def image_contour_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares contour extraction over decoded rasters: threshold
    the gray channel at CONTOUR_T, classify every 2x2 cell into its case
    index (corner bits b0..b3 -> 0..15), and reduce per image to contour
    cells, iso-line segment count (ambiguous saddles 5/10 emit two
    segments), and a position-weighted checksum over the full case map —
    one wrong bit in any cell's case flips the checksum, so the DuckDB
    symbolic replay pins the whole contour topology, not just counts.

    Scale shape: map-only Arrow kernel (decode -> one threshold -> three
    shifted-slice adds -> four scalars per image); nothing but 4 longs per
    image crosses an exchange, so it scales like image_gradient_energy —
    decode-bound, embarrassingly parallel, no shuffle at any corpus size.
    Raster->vector contour tracing at 10^12 images would keep this exact
    kernel and emit (cell, case) pairs only for contour cells (~sqrt of
    pixel count) into the cell-indexed join layer."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_GRAD_IMAGES)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = IC.decode(bytes(r.bytes), r.fmt).astype(np.int64)
                g = (img[:, :, 0] + img[:, :, 1] + img[:, :, 2]) // 3
                b = (g >= CONTOUR_T).astype(np.int64)
                cs = (
                    b[:-1, :-1] + 2 * b[:-1, 1:] + 4 * b[1:, 1:] + 8 * b[1:, :-1]
                )
                hh, ww = cs.shape
                xs = np.arange(ww, dtype=np.int64)[None, :]
                ys = np.arange(hh, dtype=np.int64)[:, None]
                contour = (cs != 0) & (cs != 15)
                saddle = (cs == 5) | (cs == 10)
                rows.append(
                    (
                        r.image_id,
                        int(cs.size),
                        int(contour.sum()),
                        int(contour.sum() + saddle.sum()),
                        int((cs * (xs + 31 * ys + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "n_cells", "n_contour", "n_segments",
                    "case_checksum",
                ],
            )

    return imgs.mapInPandas(
        kernel,
        "image_id string, n_cells long, n_contour long, n_segments long,"
        " case_checksum long",
    ).orderBy("image_id")


# --- 3x3 morphology (erode/dilate) over the thresholded raster -----------------
#
# One 3x3 neighborhood SUM of the thresholded bitmap drives everything:
# eroded = (sum == 9), dilated = (sum >= 1), and a position-weighted
# checksum of the sum map pins every neighborhood count exactly.

_MORPH_SQL = f"""
WITH par AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base
  FROM (SELECT unnest(range({N_GRAD_IMAGES})) AS i)
),
px AS (SELECT i, base, w, h, unnest(range((w - 2) * (h - 2))) AS p FROM par),
c AS (
  SELECT i, base, 1 + (p % (w - 2)) AS x, 1 + (p // (w - 2)) AS y
  FROM px
),
k AS (
  SELECT i, x, y,
         (CASE WHEN {_g_expr("x", "y")} >= {CONTOUR_T} THEN 1 ELSE 0 END) AS fg,
         (CASE WHEN {_g_expr("x - 1", "y - 1")} >= {CONTOUR_T} THEN 1 ELSE 0 END)
       + (CASE WHEN {_g_expr("x", "y - 1")} >= {CONTOUR_T} THEN 1 ELSE 0 END)
       + (CASE WHEN {_g_expr("x + 1", "y - 1")} >= {CONTOUR_T} THEN 1 ELSE 0 END)
       + (CASE WHEN {_g_expr("x - 1", "y")} >= {CONTOUR_T} THEN 1 ELSE 0 END)
       + (CASE WHEN {_g_expr("x", "y")} >= {CONTOUR_T} THEN 1 ELSE 0 END)
       + (CASE WHEN {_g_expr("x + 1", "y")} >= {CONTOUR_T} THEN 1 ELSE 0 END)
       + (CASE WHEN {_g_expr("x - 1", "y + 1")} >= {CONTOUR_T} THEN 1 ELSE 0 END)
       + (CASE WHEN {_g_expr("x", "y + 1")} >= {CONTOUR_T} THEN 1 ELSE 0 END)
       + (CASE WHEN {_g_expr("x + 1", "y + 1")} >= {CONTOUR_T} THEN 1 ELSE 0 END)
         AS s
  FROM c
)
SELECT printf('img-%012d', i) AS image_id,
       CAST(COUNT(*) AS BIGINT) AS n_interior,
       CAST(SUM(fg) AS BIGINT) AS n_fg,
       CAST(SUM(CASE WHEN s = 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_eroded,
       CAST(SUM(CASE WHEN s >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dilated,
       CAST(SUM(s * (x + 31 * y + 1)) AS BIGINT) AS nbr_checksum
FROM k GROUP BY 1 ORDER BY image_id
"""


@query("image_morphology_stats", oracle=_MORPH_SQL)
def image_morphology_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 binary morphology over the thresholded gray raster: per interior
    pixel, the 9-neighborhood foreground count s drives erosion (s == 9:
    pixel survives a 3x3 structuring element) and dilation (s >= 1), and
    the position-weighted checksum of the s map pins every neighborhood
    count bit-exactly against the symbolic DuckDB replay — the standard
    denoise / mask-cleanup primitives a segmentation-label curation
    pipeline applies before raster->vector conversion.

    Scale shape: map-only Arrow kernel — decode, one threshold, one 3x3
    box sum (np.add of 9 shifted views), five scalars per image across the
    exchange. Decode-bound, shuffle-free, linear in executors."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_GRAD_IMAGES)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = IC.decode(bytes(r.bytes), r.fmt).astype(np.int64)
                g = (img[:, :, 0] + img[:, :, 1] + img[:, :, 2]) // 3
                b = (g >= CONTOUR_T).astype(np.int64)
                s = sum(
                    b[1 + dy : b.shape[0] - 1 + dy, 1 + dx : b.shape[1] - 1 + dx]
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                )
                fg = b[1:-1, 1:-1]
                hh, ww = s.shape
                xs = np.arange(1, ww + 1, dtype=np.int64)[None, :]
                ys = np.arange(1, hh + 1, dtype=np.int64)[:, None]
                rows.append(
                    (
                        r.image_id,
                        int(s.size),
                        int(fg.sum()),
                        int((s == 9).sum()),
                        int((s >= 1).sum()),
                        int((s * (xs + 31 * ys + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "n_interior", "n_fg", "n_eroded",
                    "n_dilated", "nbr_checksum",
                ],
            )

    return imgs.mapInPandas(
        kernel,
        "image_id string, n_interior long, n_fg long, n_eroded long,"
        " n_dilated long, nbr_checksum long",
    ).orderBy("image_id")


# --- horizontal run-length stats of the thresholded raster ---------------------
#
# Per row of the bitmap, runs = 1 + transitions; transitions are pinned by
# a position-weighted checksum. The RLE-compressibility score of a mask
# store (and the row-segment primitive a scanline polygon-fill uses).

_RLE_SQL = f"""
WITH par AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base
  FROM (SELECT unnest(range({N_GRAD_IMAGES})) AS i)
),
px AS (SELECT i, base, w, h, unnest(range((w - 1) * h)) AS p FROM par),
c AS (
  SELECT i, base, w, h, 1 + (p % (w - 1)) AS x, (p // (w - 1)) AS y
  FROM px
),
k AS (
  SELECT i, h, x, y,
         (CASE WHEN ({_g_expr("x", "y")} >= {CONTOUR_T})
                <> ({_g_expr("x - 1", "y")} >= {CONTOUR_T})
               THEN 1 ELSE 0 END) AS t
  FROM c
)
SELECT printf('img-%012d', i) AS image_id,
       CAST(MIN(h) AS BIGINT) AS n_rows,
       CAST(SUM(t) AS BIGINT) AS n_transitions,
       CAST(MIN(h) + SUM(t) AS BIGINT) AS n_runs,
       CAST(SUM(t * (x + 31 * y)) AS BIGINT) AS rle_checksum
FROM k GROUP BY 1 ORDER BY image_id
"""


@query("image_rle_stats", oracle=_RLE_SQL)
def image_rle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horizontal run-length encoding stats of the thresholded raster: per
    row, runs = 1 + transitions (adjacent-pixel bitmap changes); per image,
    total runs, transitions, and a position-weighted transition checksum
    that pins the exact transition set — the compressibility score a mask
    store uses to pick RLE vs bitmap encoding, and the scanline segment
    count a polygon rasterizer would emit.

    Scale shape: map-only Arrow kernel (decode -> threshold -> one shifted
    XOR -> four scalars); shuffle-free, decode-bound, scales linearly."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_GRAD_IMAGES)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = IC.decode(bytes(r.bytes), r.fmt).astype(np.int64)
                g = (img[:, :, 0] + img[:, :, 1] + img[:, :, 2]) // 3
                b = g >= CONTOUR_T
                d = b[:, 1:] != b[:, :-1]
                hh, ww = d.shape
                xs = np.arange(1, ww + 1, dtype=np.int64)[None, :]
                ys = np.arange(hh, dtype=np.int64)[:, None]
                rows.append(
                    (
                        r.image_id,
                        int(hh),
                        int(d.sum()),
                        int(hh + d.sum()),
                        int(((xs + 31 * ys) * d).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "n_rows", "n_transitions", "n_runs",
                    "rle_checksum",
                ],
            )

    return imgs.mapInPandas(
        kernel,
        "image_id string, n_rows long, n_transitions long, n_runs long,"
        " rle_checksum long",
    ).orderBy("image_id")


# --- binary-mask moments + 4-adjacency perimeter --------------------------------
#
# Raw geometric moments of the thresholded mask (m00..m02) plus the exact
# crack perimeter (count of fg pixel sides facing bg or the image border).
# The shape-descriptor primitives of a segmentation-label curation pass,
# and the oracle twin that pins raster_contour_topology's perimeter/area.

_MOMENTS_SQL = f"""
WITH par AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base
  FROM (SELECT unnest(range({N_GRAD_IMAGES})) AS i)
),
px AS (SELECT i, base, w, h, unnest(range(w * h)) AS p FROM par),
c AS (
  SELECT i, base, w, h, (p % w) AS x, (p // w) AS y FROM px
),
k AS (
  SELECT i, x, y,
         (CASE WHEN {_g_expr("x", "y")} >= {CONTOUR_T} THEN 1 ELSE 0 END) AS fg,
         (CASE WHEN y = 0 OR {_g_expr("x", "y - 1")} < {CONTOUR_T}
               THEN 1 ELSE 0 END)
       + (CASE WHEN y = h - 1 OR {_g_expr("x", "y + 1")} < {CONTOUR_T}
               THEN 1 ELSE 0 END)
       + (CASE WHEN x = 0 OR {_g_expr("x - 1", "y")} < {CONTOUR_T}
               THEN 1 ELSE 0 END)
       + (CASE WHEN x = w - 1 OR {_g_expr("x + 1", "y")} < {CONTOUR_T}
               THEN 1 ELSE 0 END) AS open_sides
  FROM c
)
SELECT printf('img-%012d', i) AS image_id,
       CAST(SUM(fg) AS BIGINT) AS m00,
       CAST(SUM(fg * x) AS BIGINT) AS m10,
       CAST(SUM(fg * y) AS BIGINT) AS m01,
       CAST(SUM(fg * x * y) AS BIGINT) AS m11,
       CAST(SUM(fg * x * x) AS BIGINT) AS m20,
       CAST(SUM(fg * y * y) AS BIGINT) AS m02,
       CAST(SUM(fg * open_sides) AS BIGINT) AS perimeter
FROM k GROUP BY 1 ORDER BY image_id
"""


@query("image_mask_moments", oracle=_MOMENTS_SQL)
def image_mask_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw geometric moments (m00 m10 m01 m11 m20 m02) of the thresholded
    mask plus the exact crack perimeter — every fg pixel side that faces a
    bg pixel or the image border. Centroid / orientation / eccentricity are
    driver-side closed forms of these six integers; the perimeter column is
    the bit-exact twin of raster_contour_topology's traced boundary length
    (tests cross-check them row for row).

    Scale shape: map-only Arrow kernel, one threshold + seven weighted
    sums; seven longs per image cross the exchange. Decode-bound,
    shuffle-free."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_GRAD_IMAGES)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = IC.decode(bytes(r.bytes), r.fmt).astype(np.int64)
                g = (img[:, :, 0] + img[:, :, 1] + img[:, :, 2]) // 3
                b = (g >= CONTOUR_T).astype(np.int64)
                hh, ww = b.shape
                xs = np.arange(ww, dtype=np.int64)[None, :]
                ys = np.arange(hh, dtype=np.int64)[:, None]
                pad = np.zeros((hh + 2, ww + 2), dtype=np.int64)
                pad[1:-1, 1:-1] = b
                open_sides = (
                    (pad[:-2, 1:-1] == 0).astype(np.int64)
                    + (pad[2:, 1:-1] == 0)
                    + (pad[1:-1, :-2] == 0)
                    + (pad[1:-1, 2:] == 0)
                )
                rows.append(
                    (
                        r.image_id,
                        int(b.sum()),
                        int((b * xs).sum()),
                        int((b * ys).sum()),
                        int((b * xs * ys).sum()),
                        int((b * xs * xs).sum()),
                        int((b * ys * ys).sum()),
                        int((b * open_sides).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "m00", "m10", "m01", "m11", "m20", "m02",
                         "perimeter"],
            )

    return imgs.mapInPandas(
        kernel,
        "image_id string, m00 long, m10 long, m01 long, m11 long, m20 long,"
        " m02 long, perimeter long",
    ).orderBy("image_id")


# --- geo-blocked phash near-dup detection (A+B fusion: image x geospatial) -----

# Looser hamming threshold than the global dedup funnel: co-location
# corroborates near-duplication (re-uploads / re-shoots of the same scene),
# so the geo cell IS the blocking key — no pigeonhole chunks needed, and
# the within-cell pair count is bounded by cell population, not corpus
# size. The planted dup_ copies share their original's image index, hence
# its location: every planted pair MUST surface with hamming 0.
GEO_HAM_T = 16
GEO_CELL_DEG = 4  # 4-degree blocking cells over the 20x20 window

_GEO_PHASH_SQL = f"""
WITH {_PHASH_CORPUS_SQL},
geo AS (
  SELECT image_id, phash,
         CAST(substr(image_id, length(image_id) - 11, 12) AS BIGINT) AS i0
  FROM corpus
),
cells AS (
  SELECT image_id, phash,
         ((i0 * {GEO_KX}) % {GEO_M}) // {GEO_CELL_DEG * 1000} AS cell_x,
         ((i0 * {GEO_KY}) % {GEO_M}) // {GEO_CELL_DEG * 1000} AS cell_y
  FROM geo
)
SELECT a.cell_x, a.cell_y,
       a.image_id AS img_a, b.image_id AS img_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM cells a JOIN cells b
  ON a.cell_x = b.cell_x AND a.cell_y = b.cell_y AND a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= {GEO_HAM_T}
ORDER BY 1, 2, 3, 4
"""


@query("image_geo_phash_dedup", oracle=_GEO_PHASH_SQL)
def image_geo_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Location-corroborated near-duplicate detection: image pairs in the
    SAME geo blocking cell (the image corpus carries a deterministic
    footprint anchor, sources/images.py image_geo) with phash hamming <=
    GEO_HAM_T. The street-imagery / satellite-revisit dedup shape: a
    loose perceptual threshold is safe only because the block key is
    physical co-location.

    Scale shape: phash and cell derive map-side; ONE exchange on
    (cell_x, cell_y) carrying (id, phash) — 16 bytes/row, never pixels;
    within-cell pairs are bounded by cell population (a hot landmark cell
    would ride the J14 salting pattern). Full-funnel oracle: phashes
    re-derived from the pixel formulas in exact integer SQL, geo cells
    from the id arithmetic, pair join replayed symbolically."""
    from etf_topox_spark.sources.images import GEO_KX, GEO_KY, GEO_M

    base = synthetic_images(spark, N_PHASH_IMAGES)
    dups = (
        base.filter(F.substring("image_id", -6, 6).cast("int") < N_DUP_IMAGES)
        .withColumn("image_id", F.concat(F.lit(DUP_PREFIX), F.col("image_id")))
    )
    i0 = F.substring("image_id", -12, 12).cast("long")
    cells = (
        base.unionByName(dups)
        .select(
            "image_id", "phash",
            ((i0 * GEO_KX) % GEO_M).alias("mx"),
            ((i0 * GEO_KY) % GEO_M).alias("my"),
        )
        .select(
            "image_id", "phash",
            F.floor(F.col("mx") / (GEO_CELL_DEG * 1000)).alias("cell_x"),
            F.floor(F.col("my") / (GEO_CELL_DEG * 1000)).alias("cell_y"),
        )
    )
    a, b = cells.alias("a"), cells.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(b, ["cell_x", "cell_y"])
        .filter(F.col("a.image_id") < F.col("b.image_id"))
        .filter(ham <= GEO_HAM_T)
        .select(
            "cell_x", "cell_y",
            F.col("a.image_id").alias("img_a"),
            F.col("b.image_id").alias("img_b"),
            ham.alias("hamming"),
        )
        .orderBy("cell_x", "cell_y", "img_a", "img_b")
    )


# --- image-footprint overlap join (mosaic seamline planning) -------------------

# Each image's raster footprint is an axis-aligned rectangle anchored at its
# geo position (sources/images.py image_geo) spanning w x h pixels at
# PX_DEG = 1/1024 degree per pixel. Working unit: 1/128000 degree, in which
# both the anchor (thousandths of a degree x 128) and the pixel span
# (w * 125, since 1/1024 deg = 125 units) are EXACT integers — the overlap
# arithmetic never touches a float. Mosaic/seamline planning needs exactly
# this pair set: which acquisitions overlap, and by how much.
N_FOOT = 3000
FOOT_SCALE = 128          # milli-degree -> 1/128000-degree units
FOOT_PX_U = 125           # one pixel (1/1024 deg) in 1/128000-degree units
FOOT_CELL_U = 512_000     # 4-degree blocking cells in the same units

_FOOT_RECT_SQL = f"""
par AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT unnest(range({N_FOOT})) AS i)
),
rect AS (
  SELECT i,
         ((i * {GEO_KX}) % {GEO_M}) * {FOOT_SCALE} AS x0,
         ((i * {GEO_KX}) % {GEO_M}) * {FOOT_SCALE} + w * {FOOT_PX_U} AS x1,
         ((i * {GEO_KY}) % {GEO_M}) * {FOOT_SCALE} AS y0,
         ((i * {GEO_KY}) % {GEO_M}) * {FOOT_SCALE} + h * {FOOT_PX_U} AS y1
  FROM par
)"""

_FOOT_OVERLAP_SQL = f"""
WITH {_FOOT_RECT_SQL}
SELECT printf('img-%012d', a.i) AS img_a, printf('img-%012d', b.i) AS img_b,
       least(a.x1, b.x1) - greatest(a.x0, b.x0) AS iw,
       least(a.y1, b.y1) - greatest(a.y0, b.y0) AS ih,
       (least(a.x1, b.x1) - greatest(a.x0, b.x0))
         * (least(a.y1, b.y1) - greatest(a.y0, b.y0)) AS inter_area
FROM rect a JOIN rect b ON a.i < b.i
WHERE least(a.x1, b.x1) - greatest(a.x0, b.x0) > 0
  AND least(a.y1, b.y1) - greatest(a.y0, b.y0) > 0
ORDER BY 1, 2
"""


def _footprint_rects(spark: SparkSession, n: int) -> DataFrame:
    """(i, x0, x1, y0, y1) integer footprint rectangles — pure Catalyst
    arithmetic over spark.range, no pixel decode, no Python."""
    i = F.col("id")
    w = F.when(i % 3 == 0, 64).when(i % 3 == 1, 128).otherwise(96)
    h = F.when(i % 3 == 0, 64).when(i % 3 == 1, 96).otherwise(128)
    x0 = ((i * GEO_KX) % GEO_M) * FOOT_SCALE
    y0 = ((i * GEO_KY) % GEO_M) * FOOT_SCALE
    return spark.range(n).select(
        i.alias("i"),
        x0.alias("x0"),
        (x0 + w * FOOT_PX_U).alias("x1"),
        y0.alias("y0"),
        (y0 + h * FOOT_PX_U).alias("y1"),
    )


@query("image_footprint_overlap", oracle=_FOOT_OVERLAP_SQL)
def image_footprint_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of images whose raster footprints overlap, with the exact
    integer intersection extent — the acquisition-overlap graph a mosaic
    seamline planner consumes (north star: 'spatial-join + tiling engine').

    Scale shape: each footprint explodes to the <=4 blocking cells it
    touches (footprints are ~0.1 deg, cells 4 deg, so almost always 1);
    ONE exchange on (cx, cy) carrying five ints per row; within-cell pair
    join; a pair is OWNED by the single cell containing its intersection's
    min corner, so cross-cell duplicates are dropped without a distinct.
    The DuckDB oracle replays the all-pairs join naively — the cell
    decomposition must lose nothing and double nothing."""
    r = _footprint_rects(spark, N_FOOT)
    c = FOOT_CELL_U
    covered = r.select(
        "*",
        F.explode(
            F.sequence(F.floor(F.col("x0") / c), F.floor((F.col("x1") - 1) / c))
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(F.floor(F.col("y0") / c), F.floor((F.col("y1") - 1) / c))
        ).alias("cy"),
    )
    a, b = covered.alias("a"), covered.alias("b")
    iw = F.least("a.x1", "b.x1") - F.greatest("a.x0", "b.x0")
    ih = F.least("a.y1", "b.y1") - F.greatest("a.y0", "b.y0")
    own_x = F.floor(F.greatest("a.x0", "b.x0") / c) == F.col("a.cx")
    own_y = F.floor(F.greatest("a.y0", "b.y0") / c) == F.col("a.cy")
    return (
        a.join(b, ["cx", "cy"])
        .filter((F.col("a.i") < F.col("b.i")) & (iw > 0) & (ih > 0) & own_x & own_y)
        .select(
            F.format_string("img-%012d", "a.i").alias("img_a"),
            F.format_string("img-%012d", "b.i").alias("img_b"),
            iw.alias("iw"),
            ih.alias("ih"),
            (iw * ih).alias("inter_area"),
        )
        .orderBy("img_a", "img_b")
    )


# --- geo-kNN image retrieval with perceptual re-rank ---------------------------

KNN_Q_MOD = 23   # every 23rd image is a retrieval query (~N/23 probes)
KNN_K = 5

_GEO_KNN_SQL = f"""
WITH {_PHASH_CORPUS_SQL},
pos AS (
  SELECT i, phash, printf('img-%012d', i) AS image_id,
         (i * {GEO_KX}) % {GEO_M} AS mx, (i * {GEO_KY}) % {GEO_M} AS my
  FROM ph
),
pairs AS (
  SELECT q.image_id AS query_id, c.image_id AS neighbor_id,
         (q.mx - c.mx) * (q.mx - c.mx) + (q.my - c.my) * (q.my - c.my) AS d2,
         CAST(bit_count(xor(q.phash, c.phash)) AS INT) AS hamming,
         row_number() OVER (
           PARTITION BY q.image_id
           ORDER BY (q.mx - c.mx) * (q.mx - c.mx) + (q.my - c.my) * (q.my - c.my),
                    c.image_id
         ) AS rn
  FROM pos q JOIN pos c ON q.i % {KNN_Q_MOD} = 0 AND c.i <> q.i
)
SELECT query_id, CAST(rn AS INT) AS knn_rank, neighbor_id, d2, hamming
FROM pairs WHERE rn <= {KNN_K}
ORDER BY query_id, knn_rank
"""


@query("image_geo_knn_retrieval", oracle=_GEO_KNN_SQL)
def image_geo_knn_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each probe image, its KNN_K geographically nearest corpus images
    (exact integer squared distance on the milli-degree anchor, ties by
    neighbor id) with the perceptual hamming distance of each hit — the
    'what else was shot here, and does it look the same' retrieval shape
    (satellite revisit / street-level re-capture analysis).

    Scale shape: the probe set is a small filtered fraction, so it rides a
    broadcast against the corpus; only (query_id, neighbor_id, d2, hamming)
    cross the one exchange that ranks per probe. A corpus-scale probe set
    would switch to the certified-ring kNN join (J11, operators/spatial.py)
    — this operator is the retrieval/re-rank fusion on top of the same
    geometry. Full-funnel oracle: phashes re-derived from pixel formulas,
    positions from id arithmetic, ranking replayed as a window."""
    from pyspark.sql.window import Window

    i0 = F.substring("image_id", -12, 12).cast("long")
    pos = synthetic_images(spark, N_PHASH_IMAGES).select(
        "image_id",
        "phash",
        i0.alias("i"),
        ((i0 * GEO_KX) % GEO_M).alias("mx"),
        ((i0 * GEO_KY) % GEO_M).alias("my"),
    )
    q = pos.filter(F.col("i") % KNN_Q_MOD == 0).select(
        F.col("image_id").alias("query_id"),
        F.col("phash").alias("q_phash"),
        F.col("i").alias("qi"),
        F.col("mx").alias("qmx"),
        F.col("my").alias("qmy"),
    )
    d2 = ((F.col("qmx") - F.col("mx")) * (F.col("qmx") - F.col("mx"))
          + (F.col("qmy") - F.col("my")) * (F.col("qmy") - F.col("my")))
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        F.broadcast(q)
        .join(pos, F.col("qi") != F.col("i"))
        .select(
            "query_id",
            F.col("image_id").alias("neighbor_id"),
            d2.alias("d2"),
            F.bit_count(F.col("q_phash").bitwiseXOR(F.col("phash")))
            .cast("int")
            .alias("hamming"),
        )
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= KNN_K)
        .select("query_id", "knn_rank", "neighbor_id", "d2", "hamming")
        .orderBy("query_id", "knn_rank")
    )


# --- acquisition point-coverage join (observations x image footprints) ---------

# Point coordinates in EXACT micro-degrees, replaying sources/points.py
# _coords with the division deferred: even ids scatter over the window
# (((i*KX)%M) milli-deg -> *1000), odd ids collapse into the hot blob at
# (10.3, 10.7) with a ((i*K)%HOT_M) micro-degree spread — the 50% skew
# fixture. Footprint pixel spans are exact too: 1/1024 deg = 15625/16
# micro-deg, and every corpus width/height is a multiple of 16.
N_COV_PTS = 60_000
COV_CELL_U = 250_000  # 0.25-degree join cells in micro-degrees
_PX_MICRO_NUM = 15_625
_PX_MICRO_DEN = 16

_COV_PTS_SQL = f"""
pts AS (
  SELECT i AS point_id,
         CASE WHEN i % 2 = 1 THEN 10300000 + (i * 13619) % 8000
              ELSE ((i * 13619) % 20000) * 1000 END AS px,
         CASE WHEN i % 2 = 1 THEN 10700000 + (i * 7387) % 8000
              ELSE ((i * 7387) % 20000) * 1000 END AS py
  FROM (SELECT unnest(range({N_COV_PTS})) AS i)
),
urect AS (
  SELECT i,
         ((i * {GEO_KX}) % {GEO_M}) * 1000 AS x0,
         ((i * {GEO_KX}) % {GEO_M}) * 1000
           + (CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END)
             * {_PX_MICRO_NUM} // {_PX_MICRO_DEN} AS x1,
         ((i * {GEO_KY}) % {GEO_M}) * 1000 AS y0,
         ((i * {GEO_KY}) % {GEO_M}) * 1000
           + (CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END)
             * {_PX_MICRO_NUM} // {_PX_MICRO_DEN} AS y1
  FROM (SELECT unnest(range({N_FOOT})) AS i)
)"""

_COVERAGE_SQL = f"""
WITH {_COV_PTS_SQL}
SELECT printf('img-%012d', r.i) AS image_id,
       COUNT(*) AS n_covered,
       CAST(SUM(p.point_id) AS BIGINT) AS sum_point_id
FROM urect r JOIN pts p
  ON p.px >= r.x0 AND p.px < r.x1 AND p.py >= r.y0 AND p.py < r.y1
GROUP BY 1 ORDER BY 1
"""


def _coverage_inputs(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    i = F.col("id")
    px = F.when(i % 2 == 1, 10_300_000 + (i * 13619) % 8000).otherwise(
        ((i * 13619) % 20000) * 1000
    )
    py = F.when(i % 2 == 1, 10_700_000 + (i * 7387) % 8000).otherwise(
        ((i * 7387) % 20000) * 1000
    )
    pts = spark.range(N_COV_PTS).select(
        i.alias("point_id"), px.alias("px"), py.alias("py")
    )
    w = F.when(i % 3 == 0, 64).when(i % 3 == 1, 128).otherwise(96)
    h = F.when(i % 3 == 0, 64).when(i % 3 == 1, 96).otherwise(128)
    x0 = ((i * GEO_KX) % GEO_M) * 1000
    y0 = ((i * GEO_KY) % GEO_M) * 1000
    rects = spark.range(N_FOOT).select(
        i.alias("i"),
        x0.alias("x0"),
        (x0 + F.floor(w * _PX_MICRO_NUM / _PX_MICRO_DEN)).alias("x1"),
        y0.alias("y0"),
        (y0 + F.floor(h * _PX_MICRO_NUM / _PX_MICRO_DEN)).alias("y1"),
    )
    return pts, rects


@query("image_footprint_point_coverage", oracle=_COVERAGE_SQL)
def image_footprint_point_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which ground observations does each acquisition cover? Census of
    observation points inside each image footprint (count + exact id-sum
    check column) — the 'is this survey point photographed' QA join.

    Scale shape: points land in exactly ONE 0.25-degree cell; footprints
    (<= 0.125 deg) explode to the <= 4 cells they touch; equi-join on the
    cell key then exact containment filter; per-image partial counts
    combine map-side. The 50%-skew hot blob stresses one cell, but the
    blob only meets footprints anchored in that cell — candidate fan-out
    stays bounded by cell population, the J14 salting pattern applies
    above that. Oracle replays the join naively (DuckDB IEJoin)."""
    pts, rects = _coverage_inputs(spark)
    c = COV_CELL_U
    pc = pts.select(
        "*",
        F.floor(F.col("px") / c).alias("cx"),
        F.floor(F.col("py") / c).alias("cy"),
    )
    rc = rects.select(
        "*",
        F.explode(
            F.sequence(F.floor(F.col("x0") / c), F.floor((F.col("x1") - 1) / c))
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(F.floor(F.col("y0") / c), F.floor((F.col("y1") - 1) / c))
        ).alias("cy"),
    )
    return (
        rc.join(pc, ["cx", "cy"])
        .filter(
            (F.col("px") >= F.col("x0")) & (F.col("px") < F.col("x1"))
            & (F.col("py") >= F.col("y0")) & (F.col("py") < F.col("y1"))
        )
        .groupBy("i")
        .agg(
            F.count("*").alias("n_covered"),
            F.sum("point_id").alias("sum_point_id"),
        )
        .select(
            F.format_string("img-%012d", "i").alias("image_id"),
            "n_covered",
            "sum_point_id",
        )
        .orderBy("image_id")
    )


# --- coverage-gap census (which grid cells no acquisition touches) -------------

GAP_CELL_U = 250_000    # 0.25-degree audit cells (80x80 over the window)
GAP_MACRO = 16          # 4-degree macrocells = 16x16 audit cells

_GAP_SQL = f"""
WITH {_COV_PTS_SQL},
grid AS (
  SELECT gx.g AS gx, gy.g AS gy
  FROM (SELECT unnest(range(80)) AS g) gx, (SELECT unnest(range(80)) AS g) gy
),
covered AS (
  SELECT DISTINCT cx.c AS gx, cy.c AS gy
  FROM urect r,
       LATERAL (SELECT unnest(range(r.x0 // {GAP_CELL_U}, (r.x1 - 1) // {GAP_CELL_U} + 1)) AS c) cx,
       LATERAL (SELECT unnest(range(r.y0 // {GAP_CELL_U}, (r.y1 - 1) // {GAP_CELL_U} + 1)) AS c) cy
)
SELECT g.gx // {GAP_MACRO} AS macro_x, g.gy // {GAP_MACRO} AS macro_y,
       COUNT(*) AS n_gap_cells
FROM grid g ANTI JOIN covered c ON g.gx = c.gx AND g.gy = c.gy
GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("spatial_coverage_gap_census", oracle=_GAP_SQL)
def spatial_coverage_gap_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tasking-gap analysis: 0.25-degree audit cells touched by NO
    acquisition footprint, rolled up per 4-degree macrocell — the 'where
    do we lack imagery' census a collection planner runs first.

    Scale shape: footprints explode map-side to covered audit cells; ONE
    distinct on (gx, gy) (two ints), then a broadcast-able anti-join
    against the closed-form audit grid and a partial-combinable rollup.
    At planetary scale the grid side stays a generated range (never
    materialized wide) and the distinct is the only exchange."""
    _, rects = _coverage_inputs(spark)
    c = GAP_CELL_U
    covered = (
        rects.select(
            F.explode(
                F.sequence(F.floor(F.col("x0") / c), F.floor((F.col("x1") - 1) / c))
            ).alias("gx"),
            "y0",
            "y1",
        )
        .select(
            "gx",
            F.explode(
                F.sequence(F.floor(F.col("y0") / c), F.floor((F.col("y1") - 1) / c))
            ).alias("gy"),
        )
        .distinct()
    )
    gx = spark.range(80).select(F.col("id").alias("gx"))
    gy = spark.range(80).select(F.col("id").alias("gy"))
    grid = gx.crossJoin(gy)
    return (
        grid.join(covered, ["gx", "gy"], "left_anti")
        .groupBy(
            (F.col("gx") / GAP_MACRO).cast("long").alias("macro_x"),
            (F.col("gy") / GAP_MACRO).cast("long").alias("macro_y"),
        )
        .agg(F.count("*").alias("n_gap_cells"))
        .orderBy("macro_x", "macro_y")
    )


# --- brightness-vs-latitude trend (decoded pixels x geolocation) ---------------

_TREND_SQL = f"""
WITH par AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h,
         (i * 2654435761) % 251 AS base
  FROM (SELECT unnest(range({N_PHASH_IMAGES})) AS i)
),
px AS (SELECT i, w, h, base, unnest(range(w * h)) AS p FROM par),
bright AS (
  SELECT i,
         SUM((  ((base + 3 * (p % w) + 5 * (p // w)) % 256)
              + ((base * 7 + 11 * (p % w) + 2 * (p // w) + ((p % w) * (p // w)) % 17) % 256)
              + ((base * 13 + (p % w) // 2 + 7 * (p // w)) % 256)) // 3) AS t
  FROM px GROUP BY 1
),
xy AS (
  SELECT b.i % 3 AS size_class, (b.i * {GEO_KY}) % {GEO_M} AS lat_milli, b.t
  FROM bright b
)
SELECT size_class, COUNT(*) AS n,
       CAST(SUM(lat_milli) AS BIGINT) AS sum_x, CAST(SUM(t) AS BIGINT) AS sum_y,
       CAST(SUM(lat_milli * t) AS BIGINT) AS sum_xy,
       CAST(SUM(lat_milli * lat_milli) AS BIGINT) AS sum_x2,
       CAST(COUNT(*) * SUM(lat_milli * t) - SUM(lat_milli) * SUM(t) AS BIGINT) AS slope_num,
       CAST(COUNT(*) * SUM(lat_milli * lat_milli) - SUM(lat_milli) * SUM(lat_milli) AS BIGINT) AS slope_den
FROM xy GROUP BY 1 ORDER BY 1
"""


@query("image_brightness_geo_trend", oracle=_TREND_SQL)
def image_brightness_geo_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does scene brightness trend with latitude? Exact-integer least-
    squares moments (and the slope's numerator/denominator — no division
    in the contract) of per-image total gray brightness vs the milli-
    degree latitude anchor, per size class. The 'sun-angle / sensor-bias
    drift by geography' screen over REAL decoded pixels.

    Scale shape: brightness reduces inside the Arrow batch (one long per
    image leaves the scan); the five moment sums are classic map-side
    partial aggregates — bytes through the exchange: 6 longs per size
    class per task. Full-funnel oracle: pixel formulas replayed in SQL."""
    import pandas as pd

    # driver-level import: cloudpickle (registry.py pickle-by-value) ships
    # IC inside the kernel closure — a runtime import in the kernel body
    # dies on workers without the repo on sys.path (VERDICT r4 §wrong #2).
    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_PHASH_IMAGES)

    def bright(batches):
        for pdf in batches:
            ids = pdf["image_id"].str[-12:].astype("int64")
            ts = [
                int((IC.decode(b, f).astype("int64").sum(axis=-1) // 3).sum())
                for b, f in zip(pdf["bytes"], pdf["fmt"])
            ]
            yield pd.DataFrame({"i": ids, "t": ts})

    b = imgs.mapInPandas(bright, "i long, t long")
    lat = (F.col("i") * GEO_KY) % GEO_M
    n, sx = F.count("*"), F.sum("lat_milli")
    sy, sxy, sx2 = F.sum("t"), F.sum(F.col("lat_milli") * F.col("t")), F.sum(
        F.col("lat_milli") * F.col("lat_milli")
    )
    return (
        b.select((F.col("i") % 3).alias("size_class"), lat.alias("lat_milli"), "t")
        .groupBy("size_class")
        .agg(
            n.alias("n"),
            sx.alias("sum_x"),
            sy.alias("sum_y"),
            sxy.alias("sum_xy"),
            sx2.alias("sum_x2"),
            (n * sxy - sx * sy).alias("slope_num"),
            (n * sx2 - sx * sx).alias("slope_den"),
        )
        .orderBy("size_class")
    )


# --- acquisition revisit cadence per cell --------------------------------------

# seq (the acquisition index) is the deterministic time proxy: per 4-degree
# cell, how many acquisitions, and the largest gap between successive ones
# — the revisit-cadence census a tasking planner reads next to the
# coverage-gap map.

_REVISIT_SQL = f"""
WITH seqs AS (
  SELECT i,
         ((i * {GEO_KX}) % {GEO_M}) // {GEO_CELL_DEG * 1000} AS cell_x,
         ((i * {GEO_KY}) % {GEO_M}) // {GEO_CELL_DEG * 1000} AS cell_y
  FROM (SELECT unnest(range({N_FOOT})) AS i)
),
gaps AS (
  SELECT cell_x, cell_y, i,
         i - lag(i) OVER (PARTITION BY cell_x, cell_y ORDER BY i) AS gap
  FROM seqs
)
SELECT cell_x, cell_y, COUNT(*) AS n_acq,
       MIN(i) AS first_seq, MAX(i) AS last_seq,
       CAST(MAX(gap) AS BIGINT) AS max_gap
FROM gaps GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("spatial_revisit_cadence", oracle=_REVISIT_SQL)
def spatial_revisit_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell acquisition count and worst revisit gap (successive-seq lag
    window inside each cell). ONE exchange on the cell key; the lag window
    and the rollup share the same partitioning, so the window's sort is
    the only per-cell work — no second shuffle."""
    from pyspark.sql.window import Window

    i = F.col("id")
    cells = spark.range(N_FOOT).select(
        i.alias("i"),
        F.floor(((i * GEO_KX) % GEO_M) / (GEO_CELL_DEG * 1000)).alias("cell_x"),
        F.floor(((i * GEO_KY) % GEO_M) / (GEO_CELL_DEG * 1000)).alias("cell_y"),
    )
    w = Window.partitionBy("cell_x", "cell_y").orderBy("i")
    return (
        cells.withColumn("gap", F.col("i") - F.lag("i").over(w))
        .groupBy("cell_x", "cell_y")
        .agg(
            F.count("*").alias("n_acq"),
            F.min("i").alias("first_seq"),
            F.max("i").alias("last_seq"),
            F.max("gap").alias("max_gap"),
        )
        .orderBy("cell_x", "cell_y")
    )


# --- coverage-depth histogram (how many acquisitions stack per cell) -----------

_DEPTH_SQL = f"""
WITH {_COV_PTS_SQL},
covered AS (
  SELECT cx.c AS gx, cy.c AS gy
  FROM urect r,
       LATERAL (SELECT unnest(range(r.x0 // {GAP_CELL_U}, (r.x1 - 1) // {GAP_CELL_U} + 1)) AS c) cx,
       LATERAL (SELECT unnest(range(r.y0 // {GAP_CELL_U}, (r.y1 - 1) // {GAP_CELL_U} + 1)) AS c) cy
),
depth AS (
  SELECT g.gx, g.gy, COUNT(c.gx) AS d
  FROM (SELECT gx.g AS gx, gy.g AS gy
        FROM (SELECT unnest(range(80)) AS g) gx, (SELECT unnest(range(80)) AS g) gy) g
  LEFT JOIN covered c ON g.gx = c.gx AND g.gy = c.gy
  GROUP BY 1, 2
)
SELECT d AS depth, COUNT(*) AS n_cells
FROM depth GROUP BY 1 ORDER BY 1
"""


@query("spatial_coverage_depth_histogram", oracle=_DEPTH_SQL)
def spatial_coverage_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redundancy census: how many acquisition footprints touch each
    0.25-degree audit cell, histogrammed over the whole window (depth 0 =
    the gap cells; depth >= 2 = stacked revisits a mosaic can blend). Two
    partial-aggregable rollups on tiny keys — the rect→cell explode never
    carries more than two ints per row, and the audit grid side stays a
    generated range."""
    _, rects = _coverage_inputs(spark)
    c = GAP_CELL_U
    per_cell = (
        rects.select(
            F.explode(
                F.sequence(F.floor(F.col("x0") / c), F.floor((F.col("x1") - 1) / c))
            ).alias("gx"),
            "y0",
            "y1",
        )
        .select(
            "gx",
            F.explode(
                F.sequence(F.floor(F.col("y0") / c), F.floor((F.col("y1") - 1) / c))
            ).alias("gy"),
        )
        .groupBy("gx", "gy")
        .agg(F.count("*").alias("d"))
    )
    gx = spark.range(80).select(F.col("id").alias("gx"))
    grid = gx.crossJoin(spark.range(80).select(F.col("id").alias("gy")))
    return (
        grid.join(per_cell, ["gx", "gy"], "left")
        .select(F.coalesce(F.col("d"), F.lit(0)).alias("depth"))
        .groupBy("depth")
        .agg(F.count("*").alias("n_cells"))
        .orderBy("depth")
    )


# --- lossy JPEG ingest invariants ---------------------------------------------

N_JPEG_IMAGES = 120

# Like image_tiling_invariants, the invariant IS the oracle: the pure-
# numpy baseline JFIF codec (functions/jpeg_codec, quality 98) must clear
# the BASELINE.json:15 lossy gate (PSNR >= 40 dB) and preserve dims on
# every fixture image; any regression anywhere in DCT/quant/Huffman/
# container flips a boolean. psnr_db stays OUT of the contract (lossy
# floats — the supplier_wilson lesson); the exact per-image dB values are
# pinned by tests/test_jpeg.py instead.
_JPEG_INV_SQL = f"""
WITH imgs AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT range AS i FROM range(0, {N_JPEG_IMAGES}))
)
SELECT printf('img-%012d', i) AS image_id,
       TRUE AS psnr_ok,
       TRUE AS dims_ok,
       TRUE AS marker_ok,
       TRUE AS phash_stable
FROM imgs ORDER BY image_id
"""


@query("image_jpeg_invariants", oracle=_JPEG_INV_SQL)
def image_jpeg_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip every fixture image through the pure-numpy baseline JPEG
    codec inside a map-only Arrow kernel: encode (q98, 4:4:4) -> decode ->
    PSNR vs the original pixels >= 40 dB (the lossy payload invariant),
    shape preserved, SOI/EOI markers present, and the perceptual hash
    within the dedup threshold (hamming <= 4 vs the original — measured
    worst-case 1 at q98 corpus-wide, so a lossy-recompressed copy still
    lands in the same phash dedup bucket). Scale shape: identical to the
    tiling kernels — blobs live and die inside the batch, four booleans
    per image leave the scan."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC
    from etf_topox_spark.functions import jpeg_codec as JC

    imgs = synthetic_images(spark, N_JPEG_IMAGES)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = IC.decode(bytes(r.bytes), r.fmt)
                blob = JC.jpeg_encode(px, quality=98)
                rec = JC.jpeg_decode(blob)
                ham = bin(
                    (IC.average_hash(px) ^ IC.average_hash(rec))
                    & 0xFFFFFFFFFFFFFFFF
                ).count("1")
                rows.append(
                    (
                        r.image_id,
                        bool(IC.psnr(px, rec) >= 40.0),
                        bool(rec.shape == px.shape and rec.dtype == np.uint8),
                        bool(
                            blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
                        ),
                        bool(ham <= 4),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "psnr_ok", "dims_ok", "marker_ok", "phash_stable"
                ],
            )

    return imgs.mapInPandas(
        kernel,
        "image_id string, psnr_ok boolean, dims_ok boolean, "
        "marker_ok boolean, phash_stable boolean",
    ).orderBy("image_id")
