"""Coordinate hashing — the engine's analog of the reference's point
identity (SURVEY.md §2.A R4: TopoX hashes each 2-D coordinate into a 64-bit
long; topology equality is hash equality, exact match, no fp tolerance).

Unlike a lossy hash, this packing is *reversible*: coordinates are scaled to
a 2^-SCALE_BITS grid and bit-packed (xi << 32 | yi), so a hash collision is
impossible within the supported domain and error coordinates can be
recovered from the hash alone. Mirrors the reference's (db, pre)→long
object-ref packing style (R5).

Domain: |coord| < 2^(31 - SCALE_BITS) units. With SCALE_BITS=20 that is
±2048 degrees/units at ~1e-6 resolution — ample for lon/lat and for the
unit-grid mosaic fixtures (FIXTURES.md §2).
"""

from __future__ import annotations

import numpy as np

SCALE_BITS = 20
SCALE = float(1 << SCALE_BITS)
_MASK32 = np.uint64(0xFFFFFFFF)


# --- Catalyst twins of the numpy pack/unpack (same bit layout, JVM-side) ---
#
# rint (Java Math.rint) is round-half-even, identical to np.rint;
# shiftleft on BIGINT wraps mod 2^64, which equals the numpy uint64
# masking; shiftright is arithmetic, so the top 32 bits sign-extend back
# to the signed scaled-int x, and (h << 32) >> 32 sign-extends the low 32
# bits back to the signed scaled-int y. Division by the power-of-two SCALE
# is exact in IEEE double. These let plans keep topology identities and
# coordinates in whole-stage codegen with zero Python round-trips.

def pack_point_col(x, y):
    """Column form of pack_point: bit-identical to the numpy kernel."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    def snap(c) -> Column:
        return F.call_function("rint", c * F.lit(SCALE)).cast("long")

    return F.shiftleft(snap(x), 32).bitwiseOR(
        snap(y).bitwiseAND(F.lit(0xFFFFFFFF))
    )


def unpack_x_col(h):
    from pyspark.sql import functions as F

    return F.shiftright(h, 32).cast("double") / F.lit(SCALE)


def unpack_y_col(h):
    from pyspark.sql import functions as F

    return F.shiftright(F.shiftleft(h, 32), 32).cast("double") / F.lit(SCALE)


def coord_to_int(v: np.ndarray) -> np.ndarray:
    """Snap a coordinate to the identity grid. rint = round-half-even,
    deterministic across platforms."""
    return np.rint(np.asarray(v, np.float64) * SCALE).astype(np.int64)


def int_to_coord(i: np.ndarray) -> np.ndarray:
    return np.asarray(i, np.int64).astype(np.float64) / SCALE


def pack_point(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(x, y) → injective int64 point hash (the reference's coordinate
    compression, but reversible). Raises on out-of-domain coordinates
    rather than silently wrapping — the reference's hash is likewise exact
    over its working domain."""
    ix = coord_to_int(x)
    iy = coord_to_int(y)
    lim = np.int64(1) << np.int64(31)
    if len(ix) and (
        max(abs(int(ix.max(initial=0))), abs(int(ix.min(initial=0)))) >= lim
        or max(abs(int(iy.max(initial=0))), abs(int(iy.min(initial=0)))) >= lim
    ):
        raise ValueError(
            f"coordinate outside packing domain |v| < 2^{31 - SCALE_BITS} units"
        )
    xi = ix.astype(np.uint64) & _MASK32
    yi = iy.astype(np.uint64) & _MASK32
    return ((xi << np.uint64(32)) | yi).astype(np.int64)


def unpack_point(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h = np.asarray(h).astype(np.uint64)
    xi = ((h >> np.uint64(32)) & _MASK32).astype(np.uint32).astype(np.int32)
    yi = (h & _MASK32).astype(np.uint32).astype(np.int32)
    return int_to_coord(xi.astype(np.int64)), int_to_coord(yi.astype(np.int64))


def pack_obj_ref(feature_id: np.ndarray, ring_idx: np.ndarray, seq: np.ndarray) -> np.ndarray:
    """(feature, ring, edge-seq) → one long, like TopoX's (dbIndex, pre)
    packing: 34 bits feature | 10 bits ring | 20 bits seq."""
    f = np.asarray(feature_id, np.int64).astype(np.uint64)
    r = np.asarray(ring_idx, np.int64).astype(np.uint64) & np.uint64(0x3FF)
    s = np.asarray(seq, np.int64).astype(np.uint64) & np.uint64(0xFFFFF)
    return ((f << np.uint64(30)) | (r << np.uint64(20)) | s).astype(np.int64)


def unpack_obj_ref(ref: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = np.asarray(ref).astype(np.uint64)
    return (
        (r >> np.uint64(30)).astype(np.int64),
        ((r >> np.uint64(20)) & np.uint64(0x3FF)).astype(np.int64),
        (r & np.uint64(0xFFFFF)).astype(np.int64),
    )
