"""Query/oracle registry backing the driver contract in __spark_entry__.py.

Each operator module registers ``(spark, sf_dir) -> DataFrame`` callables
plus (where SQL-expressible) the equivalent DuckDB oracle SQL. The driver
compares row-count + schema + order-insensitive value-hash at sf0.01, so:

- every computed column is aliased identically on both sides;
- every floating-point aggregate goes through an exact decimal-cast sum
  (see operators.relational.dsum) so results are bit-identical regardless
  of each engine's summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB SQL over the driver's views
    (region nation customer supplier part orders lineitem events documents
    embeddings) or None for rows-only checks (non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


OPERATOR_MODULES = [
    "relational",
    "aggregates",
    "windows_sets",
    "scalars",
    "timewindows",
    "topology_queries",
    "spatial_queries",
    "image_queries",
    "text",
    "dedup",
    "similarity",
    "multimodal",
    "lineage_queries",
    "export",
]

EXTRA_MODULES = ["etf_topox_spark.streaming.events"]


def load_all_operators() -> None:
    """Import every operator module for its registration side effects, and
    make the whole package cloudpickle-by-value: the grading driver may run
    from any cwd, in which case Spark's Python workers cannot import
    etf_topox_spark to resolve by-reference pickles of the Arrow kernels.
    (At deploy scale the package ships via spark-submit --py-files instead —
    BASELINE.json:6 — and this registration is a harmless no-op.)"""
    import importlib

    import etf_topox_spark

    for pickler_mod in ("pyspark.cloudpickle", "cloudpickle"):
        try:
            cp = importlib.import_module(pickler_mod)
            cp.register_pickle_by_value(etf_topox_spark)
        except Exception:
            pass

    for mod in OPERATOR_MODULES:
        importlib.import_module(f"etf_topox_spark.operators.{mod}")
    for mod in EXTRA_MODULES:
        importlib.import_module(mod)
