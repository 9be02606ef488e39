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
    "raster_vector",
    "raster_ccl",
    "raster_burn",
    "raster_focal",
    "image_otsu",
    "raster_distance",
    "tile_pyramid",
    "image_hough",
    "raster_buffer",
    "raster_shape",
    "spatial_idw",
    "spatial_ripley",
    "image_glcm",
    "image_quantize",
    "raster_watershed",
    "raster_flowacc",
    "raster_terrain",
    "raster_viewshed",
    "raster_sample",
    "trajectory_stay",
    "image_enhance",
    "image_change",
    "cell_compact",
    "image_demosaic",
    "trajectory_mining",
    "events_ewma",
    "graph_mst",
    "image_flow",
    "image_corners",
    "raster_skeleton",
    "spatial_hexbin",
    "raster_strahler",
    "dataset_split",
    "dataset_leakage",
    "image_seam",
    "text",
    "dedup",
    "similarity",
    "multimodal",
    "lineage_queries",
    "cdc",
    "export",
]

EXTRA_MODULES = ["etf_topox_spark.streaming.events"]


def _ship_package() -> None:
    """Make etf_topox_spark importable on executor Python workers.

    Preferred: an active SparkContext → addPyFile a zip of the package (the
    in-session analog of the deploy path's spark-submit --py-files,
    BASELINE.json:6). Kernels then pickle BY REFERENCE — a ~100-byte module
    pointer per task closure.

    Fallback (no context yet, e.g. the grading driver imports
    __spark_entry__ before building its session): cloudpickle-by-value of
    the whole package. Correct from any cwd, but every task closure carries
    and re-unpickles the module graph — measured at ~3× per-task overhead
    on shuffle-partition-heavy plans, which is why it is the fallback and
    not the default."""
    import importlib
    import os
    import tempfile

    import etf_topox_spark

    if not os.environ.get("ETFX_FORCE_BYVALUE"):
        try:
            from pyspark import SparkContext

            sc = SparkContext._active_spark_context
            if sc is not None:
                from etf_topox_spark.shipzip import build

                out = os.path.join(
                    tempfile.gettempdir(), f"etf_topox_spark_{os.getpid()}.zip"
                )
                sc.addPyFile(build(out))
                # a by-value registration from an earlier pre-session call
                # would defeat the by-reference win — undo it
                for pickler_mod in ("pyspark.cloudpickle", "cloudpickle"):
                    try:
                        cp = importlib.import_module(pickler_mod)
                        cp.unregister_pickle_by_value(etf_topox_spark)
                    except Exception:
                        pass
                return
        except Exception:
            pass

    for pickler_mod in ("pyspark.cloudpickle", "cloudpickle"):
        try:
            cp = importlib.import_module(pickler_mod)
            cp.register_pickle_by_value(etf_topox_spark)
        except Exception:
            pass


def load_all_operators() -> None:
    """Import every operator module for its registration side effects and
    ship the package to Python workers (see _ship_package)."""
    import importlib

    _ship_package()

    for mod in OPERATOR_MODULES:
        importlib.import_module(f"etf_topox_spark.operators.{mod}")
    for mod in EXTRA_MODULES:
        importlib.import_module(mod)
