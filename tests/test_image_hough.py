"""Integer Hough transform (operators/image_hough.py).

The driver checks image_hough_lines against the symbolic DuckDB oracle;
these tests pin the signal-detection semantics the oracle can't see:
the winner really is the generator's true line family, and the votes
replay exactly from the decoded pixels."""

import numpy as np
import pytest

from etf_topox_spark.operators.image_hough import DIRS, Q, hough_peaks
from etf_topox_spark.sources.images import image_meta, image_pixels

TRUE_DIR = DIRS.index((3, 5))  # the generator's line normal


@pytest.fixture(scope="module")
def peaks(spark):
    out = {}
    for r in hough_peaks(spark).collect():
        out.setdefault(r.image_id, []).append(r)
    return out


def test_rank1_is_the_true_line_family(peaks):
    # edge pixels satisfy 3x + 5y = const (mod 256): a perfect line along
    # normal (3, 5). Every pixel of one line lands in the same (3,5)-bucket
    # up to the DIV-16 quantization, so direction 6 must dominate rank 1
    # in the overwhelming majority of images (quantization can split a
    # line across two adjacent buckets and occasionally let a diagonal
    # alias win a tie).
    wins = sum(1 for rows in peaks.values() if rows[0].dir_id == TRUE_DIR)
    assert wins >= 0.9 * len(peaks), f"{wins}/{len(peaks)}"


def test_votes_replay_from_decoded_pixels(peaks):
    for i in range(0, 150, 11):
        w, h, _, _ = image_meta(i)
        px = image_pixels(i, w, h)
        ey, ex = np.nonzero(px[..., 0] == 0)
        acc: dict[tuple[int, int], int] = {}
        for d, (a, b) in enumerate(DIRS):
            for x, y in zip(ex, ey):
                k = (d, (a * int(x) + b * int(y) + 1024) // Q)
                acc[k] = acc.get(k, 0) + 1
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got = [((r.dir_id, r.bucket), r.votes) for r in peaks[i]]
        assert got == ranked, i
