"""Deterministic synthetic surface mosaics (SURVEY.md §2.B S4) — the analog
of the reference's bundled GML defect fixtures (FIXTURES.md §2). The
reference ships hand-crafted GML surface files with known topology defects
(SURVEY.md §5.1); since those aren't available offline, each defect class is
re-created procedurally with an exactly known expected error set.

Base mosaic: an R×C grid of unit squares whose neighbors share edges
exactly (valid topology, zero errors). Defect features are appended with
ids ≥ R*C. All coordinates are small integers or x.5 halves — exactly
representable doubles, so hash identity (functions.coords) is exact.

Generation is distributed: spark.range over feature ids → mapInPandas
numpy kernel; content is a pure function of feature_id (no RNG state, no
wall clock), so any partitioning yields identical data.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RING_SCHEMA = (
    "feature_id long, theme string, ring_idx int, is_exterior boolean, "
    "xs array<double>, ys array<double>"
)

DEFECTS = (
    "valid_mosaic",
    "dup_boundary",
    "overlap_partial",
    "self_intersect",
    "free_standing",
    "hole_defect",
    "zero_edge",
)


def _square(x0: float, y0: float, side: float = 1.0) -> tuple[list[float], list[float]]:
    """CCW closed exterior ring of a square."""
    return (
        [x0, x0 + side, x0 + side, x0, x0],
        [y0, y0, y0 + side, y0 + side, y0],
    )


def _plain_squares(
    fids: np.ndarray, cols: int, ox: float, oy: float, theme: str
) -> pd.DataFrame:
    """Vectorized unit squares for defect-free base-grid ids — the bulk of
    every mosaic (at bench scale 640k of 640,001 features), so the
    generator must not loop per feature in Python."""
    r, c = np.divmod(fids, cols)
    x0 = ox + c.astype(np.float64)
    y0 = oy + r.astype(np.float64)
    xs = np.stack([x0, x0 + 1.0, x0 + 1.0, x0, x0], axis=1)
    ys = np.stack([y0, y0, y0 + 1.0, y0 + 1.0, y0], axis=1)
    return pd.DataFrame(
        {
            "feature_id": fids,
            "theme": theme,
            "ring_idx": np.zeros(len(fids), np.int64),
            "is_exterior": np.ones(len(fids), bool),
            # ndarray row views, not .tolist(): boxing 5 floats × n rows was
            # the generator's hot spot, and Arrow converts ndarray elements
            # ~2× faster than lists of boxed floats
            "xs": list(xs),
            "ys": list(ys),
        }
    )


def mosaic_rings(
    feature_ids: np.ndarray,
    rows: int,
    cols: int,
    defect: str,
    ox: float,
    oy: float,
    theme: str,
) -> pd.DataFrame:
    """Rings for the given feature ids — pure function of the id."""
    base_n = rows * cols
    fids = np.asarray(feature_ids, np.int64)
    special = fids >= base_n
    if defect in ("self_intersect", "zero_edge"):
        special |= fids == 0
    if defect == "hole_defect":
        special |= fids == min(base_n - 1, 3 * cols + 3)
    plain = _plain_squares(fids[~special], cols, ox, oy, theme)
    if not special.any():
        return plain
    loop_part = _mosaic_rings_loop(fids[special], rows, cols, defect, ox, oy, theme)
    out = pd.concat([plain, loop_part], ignore_index=True)
    return out.sort_values(
        ["feature_id", "ring_idx"], kind="stable", ignore_index=True
    )


def _mosaic_rings_loop(
    feature_ids: np.ndarray,
    rows: int,
    cols: int,
    defect: str,
    ox: float,
    oy: float,
    theme: str,
) -> pd.DataFrame:
    """Per-feature path for the handful of special ids (defect features,
    extra rings) — same pure function of the id as before vectorization."""
    base_n = rows * cols
    recs: list[tuple] = []
    for fid in feature_ids.tolist():
        if fid < base_n:
            r, c = divmod(fid, cols)
            xs, ys = _square(ox + c, oy + r)
            if defect == "self_intersect" and fid == 0:
                # bowtie (figure-8): edges cross at the square's center
                xs = [ox + 0.0, ox + 1.0, ox + 1.0, ox + 0.0, ox + 0.0]
                ys = [oy + 0.0, oy + 1.0, oy + 0.0, oy + 1.0, oy + 0.0]
            if defect == "zero_edge" and fid == 0:
                # consecutive duplicate vertex → zero-length edge
                xs = [xs[0], xs[0]] + xs[1:]
                ys = [ys[0], ys[0]] + ys[1:]
            recs.append((fid, theme, 0, True, xs, ys))
            if defect == "hole_defect" and fid == min(base_n - 1, 3 * cols + 3):
                # interior ring (hole) with no filling surface; CW (opposite
                # of the CCW exterior), on quarter offsets — exact doubles
                r2, c2 = divmod(fid, cols)
                hx0, hy0 = ox + c2 + 0.25, oy + r2 + 0.25
                recs.append(
                    (
                        fid,
                        theme,
                        1,
                        False,
                        [hx0, hx0, hx0 + 0.5, hx0 + 0.5, hx0],
                        [hy0, hy0 + 0.5, hy0 + 0.5, hy0, hy0],
                    )
                )
        else:
            # defect features appended after the base grid
            if defect == "dup_boundary":
                dup_of = min(base_n - 1, 2 * cols + 2)
                r, c = divmod(dup_of, cols)
                xs, ys = _square(ox + c, oy + r)
                recs.append((fid, theme, 0, True, xs, ys))
            elif defect == "overlap_partial":
                xs, ys = _square(ox + 1.5, oy + 1.5)
                recs.append((fid, theme, 0, True, xs, ys))
            elif defect == "free_standing":
                xs, ys = _square(ox + 1000.0, oy + 1000.0)
                recs.append((fid, theme, 0, True, xs, ys))
    return pd.DataFrame(
        recs, columns=["feature_id", "theme", "ring_idx", "is_exterior", "xs", "ys"]
    )


def n_features(rows: int, cols: int, defect: str) -> int:
    return rows * cols + (1 if defect in ("dup_boundary", "overlap_partial", "free_standing") else 0)


def surface_mosaic(
    spark: SparkSession,
    rows: int = 8,
    cols: int = 8,
    defect: str = "valid_mosaic",
    origin: tuple[float, float] = (0.0, 0.0),
    theme: str = "theme0",
    partitions: int | None = None,
) -> DataFrame:
    """Distributed rings DataFrame for one mosaic fixture."""
    if defect not in DEFECTS:
        raise ValueError(f"unknown defect {defect!r}; one of {DEFECTS}")
    total = n_features(rows, cols, defect)
    ox, oy = origin
    rng = spark.range(0, total, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield mosaic_rings(
                pdf["id"].to_numpy(), rows, cols, defect, ox, oy, theme
            )

    return rng.mapInPandas(gen, RING_SCHEMA)


def mosaic_rings_pandas(
    rows: int,
    cols: int,
    defect: str = "valid_mosaic",
    origin: tuple[float, float] = (0.0, 0.0),
    theme: str = "theme0",
) -> pd.DataFrame:
    """Single-process twin of surface_mosaic for the numpy oracle tests —
    must produce byte-identical rings for any partitioning of the Spark
    version (it's the same pure function)."""
    ids = np.arange(n_features(rows, cols, defect), dtype=np.int64)
    return mosaic_rings(ids, rows, cols, defect, origin[0], origin[1], theme)
