"""Cross-split leakage census (operators/dataset_leakage.py).

The driver checks split_leakage_census against the funnel SQL twin; these
tests pin the semantics: planted near-dup pairs are all found, the
test-train row reports genuine leaks (the hash split does separate some
planted pairs), and the census is consistent with dedup_minhash_lsh."""

import hashlib

import pytest

from etf_topox_spark.operators.dataset_leakage import leakage_census
from etf_topox_spark.operators.dedup import MUT_OFFSET, N_MUTATED

SF = "/root/testdata/sf0.01"


def _split(doc_id: int) -> str:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return "test" if h[0] in ("0", "1") else "train"


@pytest.fixture(scope="module")
def census(spark):
    return {r.pair_class: r for r in leakage_census(spark, SF).collect()}


def test_all_planted_pairs_found_and_classified(census):
    # every planted (original, mutation) pair must survive the LSH funnel
    assert sum(r.n_planted for r in census.values()) == N_MUTATED
    # ...and each one lands in the class its id-hash split dictates
    expect = {"test-test": 0, "test-train": 0, "train-train": 0}
    for d in range(N_MUTATED):
        a, b = sorted([_split(d), _split(d + MUT_OFFSET)])
        expect[f"{a}-{b}"] += 1
    for k, n in expect.items():
        assert census.get(k).n_planted if n else True
        if k in census:
            assert census[k].n_planted == n, k


def test_train_test_leaks_exist(census):
    # the contamination report must be non-vacuous: the 1/8 hash split
    # separates some planted pairs across train/test
    assert "test-train" in census and census["test-train"].n_pairs > 0


def test_consistent_with_dedup_lsh(spark, census):
    from etf_topox_spark.operators.dedup import dedup_minhash_lsh

    total = dedup_minhash_lsh(spark, SF).count()
    assert sum(r.n_pairs for r in census.values()) == total
