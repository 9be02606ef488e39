"""connected_components: driver label-prop path vs distributed
large-star/small-star path (SURVEY.md §2.A R10). The driver path handles
every test-scale input, so the distributed loop is explicitly forced here —
both must produce identical (node, root=component-min) labelings."""

from __future__ import annotations

import numpy as np

from etf_topox_spark.operators import topology as T


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _chain_plus_islands():
    # component A: chain 0-1-2-3-4 (root 0); component B: triangle 10,11,12
    # (root 10); component C: single edge 20-21 (root 20); self-loop 30-30
    # must be dropped entirely
    return (
        [(i, i + 1) for i in range(4)]
        + [(10, 11), (11, 12), (12, 10)]
        + [(21, 20), (30, 30)]
    )


EXPECTED = {
    0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
    10: 10, 11: 10, 12: 10,
    20: 20, 21: 20,
}


def _roots(df):
    return {r["node"]: r["root"] for r in df.collect()}


def test_driver_path_labels(spark):
    out = _roots(T.connected_components(_pairs_df(spark, _chain_plus_islands())))
    assert out == EXPECTED


def test_distributed_star_path_matches_driver(spark, monkeypatch):
    pairs = _pairs_df(spark, _chain_plus_islands())
    monkeypatch.setattr(T, "DRIVER_CC_MAX_PAIRS", 0)
    dist = _roots(T.connected_components(pairs))
    # star-loop output omits root self-rows differently: every non-root node
    # must map to the component min; roots may be absent (root == node)
    for node, root in EXPECTED.items():
        got = dist.get(node, node)
        assert got == root, (node, got, root)


def test_random_graph_both_paths(spark, monkeypatch):
    rng = np.random.RandomState(7)
    n = 400
    edges = [(int(a), int(b)) for a, b in rng.randint(0, n, size=(600, 2))]
    pairs = _pairs_df(spark, edges)
    drv = _roots(T.connected_components(pairs))
    monkeypatch.setattr(T, "DRIVER_CC_MAX_PAIRS", 0)
    dist = _roots(T.connected_components(pairs))
    for node, root in drv.items():
        assert dist.get(node, node) == root, node
