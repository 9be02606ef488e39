"""Exact Otsu thresholding (operators/image_otsu.py).

The driver checks image_otsu_threshold against the symbolic HUGEINT
DuckDB oracle; these tests pin a pure-python unbounded-int replay over
the REAL generator pixels and that the selected threshold genuinely
maximizes the classic float between-class variance."""

import numpy as np
import pytest

from etf_topox_spark.operators.image_otsu import N_OTSU_IMGS, otsu_thresholds
from etf_topox_spark.sources.images import image_meta, image_pixels


def _exact_otsu(counts: np.ndarray) -> tuple[int, int, int]:
    """(t*, n0, s0) by unbounded python-int cross multiplication."""
    N = int(counts.sum())
    S = int((np.arange(256) * counts).sum())
    best = None
    n0 = s0 = 0
    for t in range(256):
        c = int(counts[t])
        n0 += c
        s0 += t * c
        if c == 0 or n0 >= N:
            continue
        num = (S * n0 - N * s0) ** 2
        den = n0 * (N - n0)
        if best is None or num * best[1] > best[0] * den:
            best = (num, den, t, n0, s0)
    return best[2], best[3], best[4]


@pytest.fixture(scope="module")
def spark_result(spark):
    return {
        int(r.image_id): r
        for r in otsu_thresholds(spark).collect()
    }


def test_matches_exact_python_replay(spark_result):
    assert len(spark_result) == N_OTSU_IMGS
    for i in range(N_OTSU_IMGS):
        w, h, _, _ = image_meta(i)
        counts = np.bincount(image_pixels(i, w, h)[..., 0].ravel(), minlength=256)
        t, n0, s0 = _exact_otsu(counts)
        r = spark_result[i]
        assert (r.otsu_t, r.n_below, r.sum_below) == (t, n0, s0), i
        assert r.n_total == int(counts.sum())


def test_threshold_maximizes_float_between_class_variance(spark_result):
    for i in range(0, N_OTSU_IMGS, 7):
        w, h, _, _ = image_meta(i)
        counts = np.bincount(
            image_pixels(i, w, h)[..., 0].ravel(), minlength=256
        ).astype(np.float64)
        N = counts.sum()
        S = (np.arange(256) * counts).sum()
        n0 = np.cumsum(counts)
        s0 = np.cumsum(np.arange(256) * counts)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = (S * n0 - N * s0) ** 2 / (n0 * (N - n0))
        f[~np.isfinite(f)] = -1.0
        t = spark_result[i].otsu_t
        assert f[t] >= f.max() * (1 - 1e-12), i
