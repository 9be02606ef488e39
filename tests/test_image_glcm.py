"""GLCM texture features (operators/image_glcm.py).

The driver checks image_glcm_texture against the symbolic SQL twin; these
tests pin the numpy replay from REAL generator pixels and the Haralick
feature identities (pair-count conservation, energy bounds)."""

import numpy as np
import pytest

from etf_topox_spark.operators.image_glcm import HSCALE, Q, glcm_features
from etf_topox_spark.sources.images import image_meta, image_pixels


@pytest.fixture(scope="module")
def result(spark):
    return {int(r.image_id): r for r in glcm_features(spark).collect()}


def test_matches_numpy_replay(result):
    for i in range(0, 150, 7):
        w, h, _, _ = image_meta(i)
        q = image_pixels(i, w, h)[..., 0].astype(np.int64) // Q
        q1 = q[:, :-1].ravel()
        q2 = q[:, 1:].ravel()
        cnt = np.bincount(q1 * Q + q2, minlength=Q * Q)
        nz = np.nonzero(cnt)[0]
        n = cnt[nz]
        d = (nz // Q) - (nz % Q)
        r = result[i]
        assert r.n_pairs == int(n.sum())
        assert r.contrast == int((n * d * d).sum())
        assert r.energy == int((n * n).sum())
        assert r.homogeneity_scaled == int((n * HSCALE // (1 + np.abs(d))).sum())


def test_feature_identities(result):
    for i, r in result.items():
        w, h, _, _ = image_meta(i)
        assert r.n_pairs == (w - 1) * h  # every horizontal pair counted once
        # energy in [n^2/256 (uniform matrix), n^2 (single cell)]
        assert r.n_pairs**2 // (Q * Q) <= r.energy <= r.n_pairs**2
        # homogeneity is maximal iff all mass sits on the diagonal
        assert r.homogeneity_scaled <= r.n_pairs * HSCALE
