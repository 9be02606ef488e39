"""Palette color quantization and integer template matching over REAL
decoded pixels (SURVEY.md §2.C multimodal/vision surface).

Two more decoded-pixel kernels on the synthetic image corpus, both
integer-exact end to end and both oracled by the symbolic-replay pattern
(the generator formulas of sources/images.py re-evaluated per pixel in
SQL — any single wrong byte in the engine's decode path shifts a count):

- image_color_quantize: per-pixel nearest color of a fixed 8-corner RGB
  palette (squared-L2, lowest-index tie rule) — the classic dataset
  palette-reduction / color-statistics pass; output is the corpus palette
  census plus the exact total quantization error per palette entry.
- image_template_match: per-image integer SSD (sum of squared
  differences) of a fixed 4x4 template slid over the red channel, argmin
  position with the (ssd, y, x) lexicographic tie rule — template
  matching is the registration/alignment primitive of every stitching
  pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.images import synthetic_images

N_QUANT_IMGS = 120
# the 8 corners of the RGB cube, index order = tie-break order
_PALETTE = [
    (0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255),
    (255, 255, 0), (255, 0, 255), (0, 255, 255), (255, 255, 255),
]

_QUANT_PIXELS_SQL = f"""
  SELECT base, x.range AS x, y.range AS y,
         (base + 3 * x.range + 5 * y.range) % 256 AS r,
         (base * 7 + 11 * x.range + 2 * y.range + (x.range * y.range) % 17) % 256 AS g,
         (base * 13 + x.range // 2 + 7 * y.range) % 256 AS b
  FROM (
    SELECT i, (i * 2654435761) % 251 AS base,
           CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
           CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
    FROM (SELECT range AS i FROM range(0, {N_QUANT_IMGS}))
  ), range(0, 128) x, range(0, 128) y
  WHERE x.range < w AND y.range < h
"""

_D_EXPRS = [
    f"((r - {pr}) * (r - {pr}) + (g - {pg}) * (g - {pg}) + (b - {pb}) * (b - {pb}))"
    for pr, pg, pb in _PALETTE
]
_MIN_D = "LEAST(" + ", ".join(_D_EXPRS) + ")"
_IDX = (
    "CASE "
    + " ".join(f"WHEN {d} = m THEN {k}" for k, d in enumerate(_D_EXPRS))
    + " END"
)

_QUANT_SQL = f"""
WITH px AS ({_QUANT_PIXELS_SQL}),
d AS (SELECT r, g, b, {_MIN_D} AS m FROM px),
assigned AS (SELECT {_IDX} AS palette_idx, m AS err FROM d)
SELECT CAST(palette_idx AS INTEGER) AS palette_idx,
       COUNT(*) AS n_pixels,
       CAST(SUM(err) AS BIGINT) AS sum_sq_err
FROM assigned GROUP BY palette_idx ORDER BY palette_idx
"""


@query("image_color_quantize", oracle=_QUANT_SQL)
def image_color_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus palette census under nearest-of-8-corners quantization:
    per palette entry, pixel count and exact integer total squared error.
    Kernel decodes each Arrow batch and emits ONE pre-reduced 8-row
    partial (np.argmin over the (npix, 8) distance matrix + bincount) —
    the image_channel_histogram exchange shape: bytes never leave the map
    task, the shuffle carries #batches x 8 rows."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_QUANT_IMGS)
    pal = np.array(_PALETTE, dtype=np.int64)  # (8, 3)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_px = np.zeros(8, np.int64)
            err = np.zeros(8, np.int64)
            for r in pdf.itertuples(index=False):
                px = IC.decode(bytes(r.bytes), r.fmt).reshape(-1, 3).astype(np.int64)
                d = ((px[:, None, :] - pal[None, :, :]) ** 2).sum(axis=2)  # (n, 8)
                idx = d.argmin(axis=1)  # first min = lowest palette index
                n_px += np.bincount(idx, minlength=8)
                err += np.bincount(idx, weights=d[np.arange(len(idx)), idx],
                                   minlength=8).astype(np.int64)
            yield pd.DataFrame(
                {"palette_idx": np.arange(8, dtype=np.int32),
                 "n_pixels": n_px, "sum_sq_err": err}
            )

    return (
        imgs.mapInPandas(kernel, "palette_idx int, n_pixels long, sum_sq_err long")
        .groupBy("palette_idx")
        .agg(F.sum("n_pixels").alias("n_pixels"), F.sum("sum_sq_err").alias("sum_sq_err"))
        .filter(F.col("n_pixels") > 0)
        .orderBy("palette_idx")
    )


# --- integer SSD template matching ------------------------------------------

N_TM_IMGS = 12
TM_K = 4  # template side


def _template() -> "np.ndarray":  # noqa: F821 - numpy imported lazily
    import numpy as np

    v, u = np.mgrid[0:TM_K, 0:TM_K]
    return (2 + 3 * u + 5 * v) % 9


_TM_SQL = f"""
WITH imgs AS (
  SELECT i, (i * 2654435761) % 251 AS base,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT range AS i FROM range(0, {N_TM_IMGS}))
),
pos AS (
  SELECT i, base, x.range AS x, y.range AS y
  FROM imgs, range(0, 128) x, range(0, 128) y
  WHERE x.range <= w - {TM_K} AND y.range <= h - {TM_K}
),
terms AS (
  SELECT p.i, p.x, p.y,
         ((p.base + 3 * (p.x + u.range) + 5 * (p.y + v.range)) % 256
          - (2 + 3 * u.range + 5 * v.range) % 9) AS diff
  FROM pos p, range(0, {TM_K}) u, range(0, {TM_K}) v
),
ssd AS (
  SELECT i, x, y, SUM(diff * diff) AS ssd
  FROM terms GROUP BY i, x, y
),
best AS (
  SELECT i, x, y, ssd,
         ROW_NUMBER() OVER (PARTITION BY i ORDER BY ssd, y, x) AS rn
  FROM ssd
)
SELECT printf('img-%012d', i) AS image_id,
       CAST(x AS INTEGER) AS best_x, CAST(y AS INTEGER) AS best_y,
       CAST(ssd AS BIGINT) AS min_ssd
FROM best WHERE rn = 1
ORDER BY image_id
"""


@query("image_template_match", oracle=_TM_SQL)
def image_template_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image exact template matching: integer SSD of the fixed 4x4
    template against every position of the decoded red channel; output
    the argmin position under the (ssd, y, x) lexicographic tie rule
    (numpy row-major argmin == the oracle's ORDER BY ssd, y, x).

    Scale shape: map-only — each image's full SSD surface reduces to one
    row inside the kernel; nothing but (image_id, x, y, ssd) crosses any
    exchange. The SSD loop is {TM_K}x{TM_K} vectorized adds over the
    position grid (no per-position python), the mapInPandas analog of a
    conv2d."""
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, N_TM_IMGS)
    tmpl = _template()

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, bx, by, ssds = [], [], [], []
            for r in pdf.itertuples(index=False):
                red = IC.decode(bytes(r.bytes), r.fmt)[..., 0].astype(np.int64)
                hh, ww = red.shape
                oh, ow = hh - TM_K + 1, ww - TM_K + 1
                acc = np.zeros((oh, ow), np.int64)
                for v in range(TM_K):
                    for u in range(TM_K):
                        d = red[v:v + oh, u:u + ow] - int(tmpl[v, u])
                        acc += d * d
                flat = int(acc.argmin())  # row-major: first min = min (y, x)
                ids.append(r.image_id)
                by.append(flat // ow)
                bx.append(flat % ow)
                ssds.append(int(acc.reshape(-1)[flat]))
            yield pd.DataFrame(
                {"image_id": ids,
                 "best_x": np.array(bx, np.int32),
                 "best_y": np.array(by, np.int32),
                 "min_ssd": np.array(ssds, np.int64)}
            )

    return imgs.mapInPandas(
        kernel, "image_id string, best_x int, best_y int, min_ssd long"
    ).orderBy("image_id")
