"""SQL-string entry point (SURVEY.md §3.3).

``register_views(spark, sf_dir)`` exposes the harness tables as temp views
and registers the engine's cell kernels as SQL functions, so a user can
drive the engine entirely from ``spark.sql("...")`` — the lifecycle after
the parse step is identical to the DataFrame path (§3.2).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etf_topox_spark.functions import cells as C
from etf_topox_spark.sources.tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, res: int = 8) -> None:
    """Temp views for every harness table + cell UDFs (cell_of,
    cell_parent) available from SQL text."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    spark.udf.register("cell_of", C.latlng_to_cell_udf(res))
    spark.udf.register("cell_parent", C.cell_to_parent_udf(max(res - 4, 0)))


# One ANSI string, two engines: this exact text runs on Spark AND DuckDB
# (the strongest form of the oracle contract — no twin to drift).
ANSI_NATION_BALANCES = """
SELECT n_name,
       COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30, 6))) AS DOUBLE) AS total_bal,
       CAST(MIN(CAST(c_acctbal AS DECIMAL(30, 6))) AS DOUBLE) AS min_bal,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(30, 6))) AS DOUBLE) AS max_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""
