"""Minimum-energy vertical seam (seam carving DP) per image — exact.

The Avidan-Shamir content-aware-resize primitive: the cheapest top-to-
bottom 8-connected path through the image's energy field,

    M(y, x) = E(y, x) + min(M(y-1, x-1), M(y-1, x), M(y-1, x+1)),

with E = the decoded r-channel value (int). The DP is inherently
sequential in y but fully vectorized in x, so it runs as one numpy
recurrence inside the Arrow decode kernel — one pass per image, three
scalars out (seam cost, seam end column, mass checksum), nothing
pixel-sized ever leaves the scan. The cross-image layer is
embarrassingly parallel: the classic shape for per-record dynamic
programming on a cluster (same family as text_sequence_packing's
per-group recurrence).

Oracle: the SAME recurrence evaluated the opposite way — a DuckDB
recursive CTE whose state is the whole DP ROW as a LIST, stepped with
list_transform over a BIG-padded copy (padding replaces the boundary
CASEs), from the symbolic pixel formula. Integer end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.images import synthetic_images

N_SEAM_IMGS = 120
BIG = 1 << 40


def seam_costs(spark: SparkSession, n_images: int = N_SEAM_IMGS) -> DataFrame:
    import numpy as np
    import pandas as pd

    from etf_topox_spark.functions import image_codec as IC

    imgs = synthetic_images(spark, n_images)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                e = IC.decode(bytes(r.bytes), r.fmt)[..., 0].astype(np.int64)
                h, w = e.shape
                m = e[0].copy()
                for y in range(1, h):
                    pad = np.concatenate(([BIG], m, [BIG]))
                    m = e[y] + np.minimum(
                        np.minimum(pad[:-2], pad[1:-1]), pad[2:]
                    )
                cost = int(m.min())
                rows.append((int(r.image_id[4:]), h, w, cost,
                             int(np.nonzero(m == cost)[0][0]),
                             int(m.sum())))
            yield pd.DataFrame(rows, columns=[
                "image_id", "h", "w", "seam_cost", "end_x", "last_row_sum",
            ])

    return (
        imgs.mapInPandas(
            kernel,
            "image_id long, h int, w int, seam_cost long, end_x long, "
            "last_row_sum long",
        )
        .orderBy("image_id")
    )


_SEAM_SQL = f"""
WITH RECURSIVE imgs AS (
  SELECT i, (i * 2654435761) % 251 AS base,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 96 END AS w,
         CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS h
  FROM (SELECT range AS i FROM range(0, {N_SEAM_IMGS}))
),
erows AS (
  SELECT g.i, y.range AS y,
         list_transform(range(g.w),
                        x -> (g.base + 3 * x + 5 * y.range) % 256) AS el
  FROM imgs g, range(0, 128) y
  WHERE y.range < g.h
),
walk(i, y, ml) AS (
  SELECT i, CAST(0 AS BIGINT), el FROM erows WHERE y = 0
  UNION ALL
  SELECT w.i, w.y + 1,
         list_transform(
           range(len(w.ml)),
           k -> er.el[k + 1] + LEAST(pad[k + 1], pad[k + 2], pad[k + 3])
         )
  FROM (SELECT i, y, ml,
               list_prepend(CAST({BIG} AS BIGINT),
                            list_append(ml, CAST({BIG} AS BIGINT))) AS pad
        FROM walk) w
  JOIN erows er ON er.i = w.i AND er.y = w.y + 1
),
last AS (
  SELECT w.i, w.ml
  FROM walk w JOIN imgs g ON g.i = w.i
  WHERE w.y = g.h - 1
),
cells AS (
  SELECT l.i, u.x - 1 AS x, l.ml[u.x] AS m
  FROM last l,
       LATERAL (SELECT UNNEST(range(1, len(l.ml) + 1)) AS x) u
)
SELECT c.i AS image_id, g.h, g.w,
       MIN(c.m) AS seam_cost,
       CAST(MIN(CASE WHEN c.m = (SELECT MIN(m) FROM cells c2 WHERE c2.i = c.i)
                     THEN c.x END) AS BIGINT) AS end_x,
       CAST(SUM(c.m) AS BIGINT) AS last_row_sum
FROM cells c JOIN imgs g ON g.i = c.i
GROUP BY c.i, g.h, g.w
ORDER BY image_id
"""


@query("image_seam_carve", oracle=_SEAM_SQL)
def image_seam_carve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum vertical-seam cost, seam end column, and last-DP-row
    checksum per image over REAL decoded energies; the oracle replays the
    identical recurrence as a list-state recursive CTE (module
    docstring)."""
    return seam_costs(spark)
