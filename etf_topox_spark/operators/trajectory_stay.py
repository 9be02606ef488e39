"""Stay-point detection over object trajectories (SURVEY.md §2.C
temporal-feature family; the GeoLife stay-point primitive, Li et al. 2008,
simplified to dense-sampling runs).

A stay point is a maximal run of >= MIN_LEN consecutive small steps
(squared step length <= EPS^2): the dwell episodes that turn raw GPS
streams into visits (POI mining, delivery stops, vessel berthing). The
trajectory corpus here is a purpose-built dwell/travel formula — objects
alternate 25-tick dwell phases (micro-jitter around a per-phase anchor)
with 25-tick travel phases (modular scatter over the 20x20-degree
window), all integer-mod arithmetic plus one double division per term so
the DuckDB oracle replays the identical IEEE values bit-for-bit
(sources/points.py provenance note).

Scale shape: ONE hash exchange on object_id (the natural trajectory
partitioning), lag + gaps-and-islands windows inside each partition, then
a partial-aggregable groupBy on (object_id, run) — nothing wider than an
output row crosses the second exchange. Centroid sums use the
decimal-exact dsum contract so both engines agree bit-for-bit regardless
of per-run summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.relational import _dsum_sql, dsum
from etf_topox_spark.registry import query

N_TRAJ = 20_000
N_OBJECTS = 50
EPS2 = 0.0001  # (0.01 deg)^2
MIN_LEN = 10  # steps
KX = 13619
KY = 7387


def _xy_sql() -> tuple[str, str]:
    """(x, y) of (object_id obj, tick t, point id i) — shared spelling; the
    Spark side swaps // for DIV."""
    ax = "CAST((obj * 131 + (t // 50) * 517) % 20000 AS DOUBLE) / 1000"
    ay = "CAST((obj * 277 + (t // 50) * 839) % 20000 AS DOUBLE) / 1000"
    x = (
        f"CASE WHEN (t // 25) % 2 = 0 THEN ({ax}) + CAST((i * {KX}) % 800 AS DOUBLE) / 1000000"
        f" ELSE CAST((i * {KX}) % 20000 AS DOUBLE) / 1000 END"
    )
    y = (
        f"CASE WHEN (t // 25) % 2 = 0 THEN ({ay}) + CAST((i * {KY}) % 800 AS DOUBLE) / 1000000"
        f" ELSE CAST((i * {KY}) % 20000 AS DOUBLE) / 1000 END"
    )
    return x, y


def _stay_sql() -> str:
    x, y = _xy_sql()
    return f"""
WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range({N_TRAJ})),
tr AS (
  SELECT i % {N_OBJECTS} AS obj, i // {N_OBJECTS} AS t, i FROM ids
),
pos AS (SELECT obj, t, {x} AS x, {y} AS y FROM tr),
st AS (
  SELECT obj, t, x, y,
         x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy
  FROM pos WINDOW w AS (PARTITION BY obj ORDER BY t)
),
fl AS (
  SELECT obj, t, x, y,
         CASE WHEN dx * dx + dy * dy <= {EPS2} THEN 1 ELSE 0 END AS f
  FROM st WHERE dx IS NOT NULL
),
runs AS (
  SELECT obj, t, x, y, f,
         t - ROW_NUMBER() OVER (PARTITION BY obj, f ORDER BY t) AS grp
  FROM fl
)
SELECT obj AS object_id, CAST(MIN(t) AS BIGINT) AS start_t,
       CAST(MAX(t) AS BIGINT) AS end_t, COUNT(*) AS n_steps,
       {_dsum_sql('x')} AS cx_sum, {_dsum_sql('y')} AS cy_sum
FROM runs WHERE f = 1
GROUP BY obj, grp HAVING COUNT(*) >= {MIN_LEN}
ORDER BY object_id, start_t
"""


@query("trajectory_stay_points", oracle=_stay_sql())
def trajectory_stay_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-episode extraction: maximal runs of >= MIN_LEN consecutive
    steps with squared length <= EPS2, one row per stay with its tick span
    and exact centroid mass (module docstring)."""
    from pyspark.sql import Window

    x, y = (s.replace("//", "DIV") for s in _xy_sql())
    tr = spark.range(0, N_TRAJ, 1, spark.sparkContext.defaultParallelism).select(
        (F.col("id") % N_OBJECTS).alias("obj"),
        F.expr(f"id DIV {N_OBJECTS}").alias("t"),
        F.col("id").alias("i"),
    )
    pos = tr.select("obj", "t", F.expr(x).alias("x"), F.expr(y).alias("y"))
    w = Window.partitionBy("obj").orderBy("t")
    st = pos.select(
        "obj", "t", "x", "y",
        (F.col("x") - F.lag("x").over(w)).alias("dx"),
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
    ).filter(F.col("dx").isNotNull())
    fl = st.select(
        "obj", "t", "x", "y",
        F.when(
            F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy") <= EPS2, 1
        ).otherwise(0).alias("f"),
    )
    wr = Window.partitionBy("obj", "f").orderBy("t")
    runs = fl.select(
        "obj", "t", "x", "y", "f",
        (F.col("t") - F.row_number().over(wr)).alias("grp"),
    )
    return (
        runs.filter(F.col("f") == 1)
        .groupBy("obj", "grp")
        .agg(
            F.min("t").alias("start_t"),
            F.max("t").alias("end_t"),
            F.count(F.lit(1)).alias("n_steps"),
            dsum(F.col("x")).alias("cx_sum"),
            dsum(F.col("y")).alias("cy_sum"),
        )
        .filter(F.col("n_steps") >= MIN_LEN)
        .select(
            F.col("obj").alias("object_id"),
            "start_t", "end_t", "n_steps", "cx_sum", "cy_sum",
        )
        .orderBy("object_id", "start_t")
    )


# --- dynamic time warping between revisit track pairs -------------------------

N_DTW_PAIRS = 12
DTW_L = 64  # fixes per track


def _dtw_xy(role: str, t: str) -> tuple[str, str]:
    """Integer track coordinates for pair p, role a/b at tick {t} — shared
    spelling, pure integer arithmetic (both engines evaluate identically)."""
    if role == "a":
        x = f"((p * 131) + (({t}) * 17) + ((({t}) * ({t})) % 23)) % 400"
        y = f"((p * 57) + (({t}) * 13) + ((({t}) * ({t}) * ({t})) % 19)) % 400"
    else:
        x = f"((p * 131) + (({t}) * 19) + (((({t}) + 3) * ({t})) % 29)) % 400"
        y = f"((p * 57) + (({t}) * 11) + (((({t}) + 5) * ({t})) % 31)) % 400"
    return x, y


def _dtw_cost(i: str, j: str) -> str:
    xa, ya = _dtw_xy("a", i)
    xb, yb = _dtw_xy("b", j)
    return f"((({xa}) - ({xb})) * (({xa}) - ({xb})) + (({ya}) - ({yb})) * (({ya}) - ({yb})))"


def _dtw_sql() -> str:
    """DTW as a recursive CTE whose state is the DP ROW as a LIST (the
    image_seam oracle pattern). The textbook recurrence has an in-row
    left-dependency, so the row step uses the equivalent prefix-min
    reformulation: a path reaching (i, j) enters row i at some column
    k <= j (up from (i-1,k) or diagonally from (i-1,k-1)) then moves
    right, hence

        D[i][j] = prefc(i, j) + min_{k<=j} (e(k) - prefc(i, k-1)),
        e(k) = min(D[i-1][k], D[i-1][k-1]),  e(0) = D[i-1][0],

    with prefc the row's cost prefix sum — every term a pure list
    expression."""
    W = DTW_L
    pc = (
        f"list_transform(range({W}), j -> "
        f"list_sum(list_transform(range(j + 1), k -> {_dtw_cost('i + 1', 'k')})))"
    )
    base_pc = (
        f"list_transform(range({W}), j -> "
        f"list_sum(list_transform(range(j + 1), k -> {_dtw_cost('0', 'k')})))"
    )
    d1 = (
        f"list_transform(range({W}), j -> pc[j + 1] + "
        f"list_min(list_transform(range(j + 1), k -> "
        f"(CASE WHEN k = 0 THEN d[1] ELSE least(d[k + 1], d[k]) END) "
        f"- (CASE WHEN k = 0 THEN 0 ELSE pc[k] END))))"
    )
    return f"""
WITH RECURSIVE step AS (
  SELECT p, 0 AS i, {base_pc} AS d
  FROM (SELECT CAST(range AS BIGINT) AS p FROM range({N_DTW_PAIRS}))
  UNION ALL
  SELECT p, i + 1, {d1} AS d
  FROM (SELECT p, i, d, {pc} AS pc FROM step WHERE i < {DTW_L - 1}) t
)
SELECT p AS pair_id, CAST(d[{W}] AS BIGINT) AS dtw_cost
FROM step WHERE i = {DTW_L - 1} ORDER BY pair_id
"""


@query("trajectory_dtw", oracle=_dtw_sql())
def trajectory_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping distance per revisit track pair — the
    trajectory-similarity workhorse (fleet conformance, route clustering).
    Integer squared-euclidean local cost, classic right/up/diag moves.

    Scale shape: the cross-pair layer is embarrassingly parallel (ONE
    exchange co-partitions each pair's fixes; a pair's track fits a task
    by construction); the O(L^2) DP runs vectorized per row inside the
    grouped Arrow kernel — the per-record dynamic-programming shape shared
    with image_seam_carve. The oracle replays the identical recurrence as
    a list-state recursive CTE via the prefix-min reformulation
    (_dtw_sql docstring) — a genuinely different evaluation order, so a
    single wrong cost term breaks the match."""
    import numpy as np
    import pandas as pd

    rows = spark.range(0, N_DTW_PAIRS * 2 * DTW_L, 1,
                       spark.sparkContext.defaultParallelism).select(
        F.expr(f"id DIV {2 * DTW_L}").alias("p"),
        F.expr(f"(id DIV {DTW_L}) % 2").alias("role"),
        (F.col("id") % DTW_L).alias("t"),
    )
    xa, ya = _dtw_xy("a", "t")
    xb, yb = _dtw_xy("b", "t")
    tracks = rows.select(
        "p", "role", "t",
        F.expr(f"CASE WHEN role = 0 THEN {xa} ELSE {xb} END").alias("x"),
        F.expr(f"CASE WHEN role = 0 THEN {ya} ELSE {yb} END").alias("y"),
    )

    def kernel(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["role", "t"])
        a = pdf[pdf["role"] == 0][["x", "y"]].to_numpy(dtype=np.int64)
        b = pdf[pdf["role"] == 1][["x", "y"]].to_numpy(dtype=np.int64)
        if len(a) != DTW_L or len(b) != DTW_L:
            raise ValueError(f"pair {key}: {len(a)}/{len(b)} fixes")
        # cost matrix, then the textbook row scan (vectorized over columns
        # where possible; the in-row chain runs as a short python loop)
        dx = a[:, None, 0] - b[None, :, 0]
        dy = a[:, None, 1] - b[None, :, 1]
        c = dx * dx + dy * dy
        prev = c[0].cumsum()
        for i in range(1, DTW_L):
            cur = np.empty(DTW_L, np.int64)
            cur[0] = prev[0] + c[i, 0]
            for j in range(1, DTW_L):
                cur[j] = c[i, j] + min(prev[j], prev[j - 1], cur[j - 1])
            prev = cur
        return pd.DataFrame({"pair_id": [int(key[0])], "dtw_cost": [int(prev[-1])]})

    return (
        tracks.groupBy("p")
        .applyInPandas(kernel, "pair_id long, dtw_cost long")
        .orderBy("pair_id")
    )
