"""Driver-contract rehearsal: every registered oracle pair must match DuckDB
exactly at sf0.001 (fast) — the driver re-runs the same check at sf0.01.
"""

from __future__ import annotations

import pytest

from etf_topox_spark.registry import ORACLES, QUERIES, load_all_operators
from tests.oracle_harness import compare, duckdb_con

load_all_operators()


@pytest.fixture(scope="module")
def con(sf_smoke):
    c = duckdb_con(sf_smoke)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_pair(name, spark, sf_smoke, con):
    spark_pdf = QUERIES[name](spark, sf_smoke).toPandas()
    oracle_pdf = con.execute(ORACLES[name]).df()
    compare(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(name, spark, sf_smoke):
    df = QUERIES[name](spark, sf_smoke)
    assert df.count() >= 0  # smoke: plan executes with a stable schema


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns
