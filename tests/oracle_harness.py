"""Local replica of the driver's DuckDB-oracle comparison
(__spark_entry__.py contract): run the Spark query and the oracle SQL on the
same parquet, sort columns by name, compare values order-insensitively.

Stricter than the driver in one way: float columns are compared exactly
(bit-for-bit) by default, because the driver hashes values — if this passes,
the driver's hash check passes.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: repr(v) if not isinstance(v, str) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "?") -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a = _canon(spark_pdf)
    b = _canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype("float64").to_numpy()
            bv = bv.astype("float64").to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            equal = (av == bv) | both_nan
            if not equal.all():
                i = int(np.argmin(equal))
                raise AssertionError(
                    f"{name}: float col {c!r} differs at sorted row {i}: "
                    f"{av[i]!r} vs {bv[i]!r} (diff {abs(av[i]-bv[i])!r})"
                )
        else:
            eq = av.reset_index(drop=True).eq(bv.reset_index(drop=True)) | (
                av.isna().reset_index(drop=True) & bv.isna().reset_index(drop=True)
            )
            if not eq.all():
                i = int(eq.idxmin())
                raise AssertionError(
                    f"{name}: col {c!r} differs at sorted row {i}: "
                    f"{av.iloc[i]!r} vs {bv.iloc[i]!r}"
                )
