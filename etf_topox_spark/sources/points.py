"""Deterministic synthetic point sets for PIP/kNN fixtures (FIXTURES.md §3).

Coordinates are closed-form functions of the point id using ONLY integer
modular arithmetic plus one double division — DuckDB's fmod is not the
exact IEEE fmod (verified this session), so float mod is banned here. Both
engines compute `((i * K) % M) / D` over exact int64 then one correctly-
rounded division → bit-identical doubles, which lets the DuckDB oracle
regenerate the corpus and value-hash spatial-join results exactly (an
upgrade over SURVEY.md §2.B J10/J11's rows-only plan).

Layout: scatter over a 20×20-degree window anchored at the origin (matching
the mosaic fixtures); odd ids collapse into one hot cell (50% skew) to
exercise the explicit salting path (FIXTURES.md §3).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

KX = 13619
KY = 7387
M = 20000
DIV = 1000.0  # → [0, 20) degrees
HOT_X = 10.3
HOT_Y = 10.7
HOT_M = 8000
HOT_DIV = 1000000.0  # → [0, 0.008) degree spread
GRID = 20.0

POINT_SCHEMA = "point_id long, x double, y double"


def _coords(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    i = ids.astype(np.int64)
    x = ((i * KX) % M).astype(np.float64) / DIV
    y = ((i * KY) % M).astype(np.float64) / DIV
    hot = (i % 2) == 1
    x = np.where(hot, HOT_X + ((i * KX) % HOT_M).astype(np.float64) / HOT_DIV, x)
    y = np.where(hot, HOT_Y + ((i * KY) % HOT_M).astype(np.float64) / HOT_DIV, y)
    return x, y


def synthetic_points(spark: SparkSession, n: int, id_offset: int = 0) -> DataFrame:
    rng = spark.range(id_offset, id_offset + n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            x, y = _coords(ids)
            yield pd.DataFrame({"point_id": ids, "x": x, "y": y})

    return rng.mapInPandas(gen, POINT_SCHEMA)


def points_sql(n: int, id_offset: int = 0) -> str:
    """DuckDB twin of synthetic_points — same doubles, bit for bit."""
    return f"""
    SELECT i AS point_id,
           CASE WHEN i % 2 = 1
                THEN CAST('{HOT_X}' AS DOUBLE) + CAST((i * {KX}) % {HOT_M} AS DOUBLE) / {HOT_DIV}
                ELSE CAST((i * {KX}) % {M} AS DOUBLE) / {DIV} END AS x,
           CASE WHEN i % 2 = 1
                THEN CAST('{HOT_Y}' AS DOUBLE) + CAST((i * {KY}) % {HOT_M} AS DOUBLE) / {HOT_DIV}
                ELSE CAST((i * {KY}) % {M} AS DOUBLE) / {DIV} END AS y
    FROM (SELECT range AS i FROM range({id_offset}, {id_offset + n}))
    """
