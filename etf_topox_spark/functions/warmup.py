"""Python-worker warm-up shared by bench.py and tools/profile_topo.py.

A long-running cluster's Python workers are warm: numpy/pandas imported,
allocator arena grown and faulted in. On this sandbox host the second part
matters a lot — first-touch page faults under the Firecracker hypervisor
make a worker's FIRST large-array kernel call ~4-8× slower than every later
one (measured 9.1 s vs 0.7 s on an identical 480k-row grouped-intersection
call), a fixed per-worker cost that lands hardest on the parallelism level
with the fewest partitions per worker and reads as fake anti-scaling.
`spark.python.worker.reuse` (default on) keeps the warmed pool alive across
queries, matching steady state.
"""

from __future__ import annotations

import numpy as np


def warm_worker(n: int = 200_000) -> None:
    """Run one representative grouped-intersection kernel call on synthetic
    gridded edges, sized to fault in the arena the real partitions need."""
    from etf_topox_spark.functions import geom

    rng = np.random.default_rng(0)
    cells = np.repeat(np.arange(n // 24 + 1, dtype=np.int64), 24)[:n]
    cx, cy = (cells % 400) * 2.0, (cells // 400) * 2.0
    ox = rng.integers(0, 2, n).astype(np.float64)
    oy = rng.integers(0, 2, n).astype(np.float64)
    horiz = rng.integers(0, 2, n).astype(bool)
    x1, y1 = cx + ox, cy + oy
    x2 = np.where(horiz, x1 + 1.0, x1)
    y2 = np.where(horiz, y1, y1 + 1.0)
    geom.segment_intersections_grouped(
        x1, y1, x2, y2,
        rng.integers(0, 1 << 20, n), np.zeros(n, np.int64), cells,
    )


def warm_python_workers(spark, cpus: int) -> None:
    """One warm_worker() per core (plus slack partitions so every pooled
    worker sees one) before any timed stage."""

    def _warm(batches):
        warm_worker()
        for b in batches:
            yield b

    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        _warm, "id long"
    ).count()
