"""EWMA fast/slow crossover analysis over the events stream (SURVEY.md
§2.C temporal-feature family — the moving-average signal every metrics /
algo-monitoring pipeline computes; sibling of events_cusum_changepoint).

Per event type, the daily value series (decimal-exact dsum per calendar
day, so the pre-aggregation is summation-order-free) feeds two
exponentially weighted moving averages with binary-exact smoothing
factors (alpha = 1/4 fast, 1/16 slow):

    s_t = s_{t-1} + (v_t - s_{t-1}) * alpha,   s_0 = v_0,

evaluated in the IDENTICAL expression order on both engines, so the
double state matches bit for bit. A crossover is any day where the
fast-above-slow flag flips. Output per type: day count, crossover count,
final fast/slow states.

Scale shape: ONE partial-aggregable exchange reduces 10^12 events to
(type x day) rows; the recurrence is inherently sequential per series and
runs in the grouped Arrow kernel over the tiny reduced frame — the same
per-group DP shape as text_sequence_packing. The oracle replays it as a
row-at-a-time recursive CTE (different evaluation machinery, same IEEE
operation sequence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.operators.relational import _dsum_sql, dsum
from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T

FAST = 0.25
SLOW = 0.0625
EPOCH = "2024-01-01"

_EWMA_SQL = f"""
WITH RECURSIVE days AS (
  SELECT event_type,
         datediff('day', DATE '{EPOCH}', CAST(ts AS DATE)) AS d,
         {_dsum_sql('value')} AS v
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM days
),
rec AS (
  SELECT event_type, rn, n, v AS fast, v AS slow, FALSE AS above,
         CAST(0 AS BIGINT) AS n_cross
  FROM idx WHERE rn = 1
  UNION ALL
  SELECT i.event_type, i.rn, i.n,
         r.fast + (i.v - r.fast) * {FAST},
         r.slow + (i.v - r.slow) * {SLOW},
         (r.fast + (i.v - r.fast) * {FAST}) > (r.slow + (i.v - r.slow) * {SLOW}),
         r.n_cross + CASE WHEN
           ((r.fast + (i.v - r.fast) * {FAST}) > (r.slow + (i.v - r.slow) * {SLOW}))
           <> r.above THEN 1 ELSE 0 END
  FROM rec r JOIN idx i ON i.event_type = r.event_type AND i.rn = r.rn + 1
)
SELECT event_type, n AS n_days, n_cross, fast AS final_fast, slow AS final_slow
FROM rec WHERE rn = n ORDER BY event_type
"""


@query("events_ewma_crossover", oracle=_EWMA_SQL)
def events_ewma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast/slow EWMA crossover census per event type over the daily
    value series (module docstring)."""
    import pandas as pd

    e = T(spark, sf_dir, "events")
    days = (
        e.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("d"),
        )
        .agg(dsum(F.col("value")).alias("v"))
    )

    def kernel(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("d")
        vs = pdf["v"].to_list()
        fast = slow = vs[0]
        above = False
        n_cross = 0
        for v in vs[1:]:
            fast = fast + (v - fast) * FAST
            slow = slow + (v - slow) * SLOW
            na = fast > slow
            if na != above:
                n_cross += 1
            above = na
        return pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_days": [len(vs)],
                "n_cross": [n_cross],
                "final_fast": [fast],
                "final_slow": [slow],
            }
        )

    return (
        days.groupBy("event_type")
        .applyInPandas(
            kernel,
            "event_type string, n_days long, n_cross long, "
            "final_fast double, final_slow double",
        )
        .orderBy("event_type")
    )
