"""Stratified split assignment (operators/dataset_split.py).

The driver checks dataset_split_assign against the SQL twin; these tests
pin the quota arithmetic (exact 80/10/10 per stratum), determinism across
repartitions, and stratum-mass conservation."""

import pytest

from etf_topox_spark.operators.dataset_split import split_assign

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def rows(spark):
    return split_assign(spark, SF).collect()


def test_exact_quotas_per_stratum(rows):
    strata = {}
    for r in rows:
        strata.setdefault((r.lang, r.source), {})[r.split] = r.n_docs
    assert strata
    for key, by_split in strata.items():
        n = sum(by_split.values())
        assert by_split.get("train", 0) == (8 * n) // 10, key
        assert by_split.get("train", 0) + by_split.get("val", 0) == (9 * n) // 10
        assert by_split.get("test", 0) == n - (9 * n) // 10


def test_deterministic_across_repartition(spark, rows):
    again = split_assign(spark, SF).repartition(7).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_mass_conservation(spark, rows):
    from etf_topox_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    total = docs.count()
    assert sum(r.n_docs for r in rows) == total
    sum_ids = docs.groupBy().sum("doc_id").collect()[0][0]
    assert sum(r.sum_doc_id for r in rows) == sum_ids
