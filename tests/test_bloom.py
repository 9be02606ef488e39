"""Bloom-filter join pruning: no false negatives ever, and the prune must
actually drop most of the fact table for a selective key set."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etf_topox_spark.operators.relational import (
    BLOOM_NATION,
    _bloom_positions,
    bloom_build,
    bloom_prune,
)
from etf_topox_spark.sources.tables import load_table as T


def test_bloom_positions_deterministic_and_spread():
    keys = np.arange(10_000, dtype=np.int64)
    p1 = _bloom_positions(keys)
    p2 = _bloom_positions(keys)
    assert (p1 == p2).all()
    assert p1.shape == (10_000, 3)
    # the three hash families must not collapse onto each other
    assert (p1[:, 0] != p1[:, 1]).mean() > 0.99


def test_bloom_prune_no_false_negatives_and_real_pruning(spark, sf_smoke):
    o = T(spark, sf_smoke, "orders")
    c = T(spark, sf_smoke, "customer").filter(F.col("c_nationkey") == BLOOM_NATION)
    keys = o.join(
        F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"), "left_semi"
    ).select("o_orderkey")
    bits = bloom_build(keys, "o_orderkey")

    li = T(spark, sf_smoke, "lineitem").select("l_orderkey")
    total = li.count()
    kept = bloom_prune(li, "l_orderkey", bits)
    kept_keys = set(r.l_orderkey for r in kept.collect())
    true_keys = set(r.o_orderkey for r in keys.collect())
    li_keys = set(r.l_orderkey for r in li.collect())
    # every lineitem row of a qualifying order survives the prune
    assert (true_keys & li_keys) <= kept_keys
    # and the prune is a prune: most of the fact table is gone
    assert len(kept_keys) < 0.25 * len(li_keys)
    assert kept.count() < 0.25 * total


def test_sample_stratified_rates_and_determinism(spark, sf_smoke):
    from etf_topox_spark.operators.relational import SAMPLE_RATES_BP, sample_stratified
    from etf_topox_spark.sources.tables import load_table as T

    a = sample_stratified(spark, sf_smoke).toPandas()
    b = sample_stratified(spark, sf_smoke).toPandas()
    assert a.equals(b)  # pure function of the data
    totals = (
        T(spark, sf_smoke, "lineitem").groupBy("l_returnflag").count().toPandas()
        .set_index("l_returnflag")["count"]
    )
    got = a.groupby("l_returnflag").size()
    for flag, bp in SAMPLE_RATES_BP.items():
        frac = got.get(flag, 0) / totals[flag]
        assert abs(frac - bp / 10_000) < 0.01, (flag, frac)
