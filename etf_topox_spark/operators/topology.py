"""Distributed half-edge topology validation (SURVEY.md §2.A R3-R14,
BASELINE.json:6).

The reference builds ONE in-memory hashmap of directed edges keyed by
coordinate hashes and detects conflicts at insert time (TopologyBuilder,
single JVM). At 100 TB that store cannot exist; the architectural
translation (SURVEY.md §4.1 last row) is:

  rings ── mapInPandas ──► directed edges (coordinate-hashed, bit-packed
        refs, planar cell cover)                                [stage A]
  edges ── groupBy(edge key) ──► duplicate / overlapping boundary +
        boundary classification: the "hashmap lookup" becomes a shuffle
        on (lo_h, hi_h) — Spark's hash exchange IS the hashmap   [stage B]
  edges ── explode(cover cells) → groupBy(cell).applyInPandas ──►
        pairwise intersection kernel per cell; reports deduped by
        point-ownership (a report survives only in the cell that owns the
        intersection point), which makes the result partition-invariant
                                                                 [stage C]
  feature adjacency ── alternating large-star/small-star CC (O(log n)
        rounds of joins) ──► free-standing surfaces              [stage D]
  interior-ring edge match + ring orientation ──► invalid interiors
                                                                 [stage E]

Every decision is exact int64 arithmetic (functions.geom); every kernel is
Arrow-batched (no per-row Python, BASELINE.json:15).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etf_topox_spark.functions import cells as C
from etf_topox_spark.functions import coords as X
from etf_topox_spark.functions import geom
from etf_topox_spark.operators import topology_codes as codes

EDGE_SCHEMA = (
    "theme string, feature_id long, ring_idx int, is_exterior boolean, seq int, "
    "x1 double, y1 double, x2 double, y2 double, "
    "h1 long, h2 long, lo_h long, hi_h long, fwd boolean, obj_ref long"
)

RING_META_SCHEMA = (
    "theme string, feature_id long, ring_idx int, is_exterior boolean, "
    "area2 long, min_x double, min_y double"
)

ERROR_SCHEMA = (
    "theme string, error_code string, x double, y double, "
    "feature_a long, feature_b long"
)


# --------------------------------------------------------------------------
# Stage A: rings → directed edges (the posList-parse + hash analog, R3/R4/R5)
# --------------------------------------------------------------------------

def rings_to_edges(rings: DataFrame, cell_size: float = 2.0) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            counts = pdf["xs"].map(len).to_numpy() - 1  # closed rings: n-1 edges
            rep = np.repeat(np.arange(len(pdf)), counts)
            xs = np.concatenate(pdf["xs"].to_list()).astype(np.float64)
            ys = np.concatenate(pdf["ys"].to_list()).astype(np.float64)
            # per-ring consecutive pairs
            starts = np.concatenate(([0], np.cumsum(counts + 1)))[:-1]
            seq = np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.empty(0, np.int64)
            idx1 = np.repeat(starts, counts) + seq
            x1, y1, x2, y2 = xs[idx1], ys[idx1], xs[idx1 + 1], ys[idx1 + 1]
            h1 = X.pack_point(x1, y1)
            h2 = X.pack_point(x2, y2)
            fid = pdf["feature_id"].to_numpy()[rep]
            ridx = pdf["ring_idx"].to_numpy()[rep]
            yield pd.DataFrame(
                {
                    "theme": pdf["theme"].to_numpy()[rep],
                    "feature_id": fid,
                    "ring_idx": ridx.astype(np.int32),
                    "is_exterior": pdf["is_exterior"].to_numpy()[rep],
                    "seq": seq.astype(np.int32),
                    "x1": x1, "y1": y1, "x2": x2, "y2": y2,
                    "h1": h1, "h2": h2,
                    "lo_h": np.minimum(h1, h2), "hi_h": np.maximum(h1, h2),
                    "fwd": h1 <= h2,
                    "obj_ref": X.pack_obj_ref(fid, ridx, seq),
                }
            )

    return rings.mapInPandas(kernel, EDGE_SCHEMA)


def ring_meta(rings: DataFrame) -> DataFrame:
    """Per-ring exact signed area + min vertex (error anchor points)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xs_vals = pdf["xs"].to_numpy()
            ys_vals = pdf["ys"].to_numpy()
            lens = np.fromiter((len(v) for v in xs_vals), np.int64, len(xs_vals))
            starts = np.zeros(len(lens), np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            xf = np.concatenate(xs_vals).astype(np.float64, copy=False)
            yf = np.concatenate(ys_vals).astype(np.float64, copy=False)
            yield pd.DataFrame(
                {
                    "theme": pdf["theme"],
                    "feature_id": pdf["feature_id"],
                    "ring_idx": pdf["ring_idx"].astype(np.int32),
                    "is_exterior": pdf["is_exterior"],
                    "area2": geom.ring_area2_batch(xf, yf, starts, lens),
                    "min_x": np.minimum.reduceat(xf, starts),
                    "min_y": np.minimum.reduceat(yf, starts),
                }
            )

    return rings.mapInPandas(kernel, RING_META_SCHEMA)


def ring_meta_from_edges(edges: DataFrame) -> DataFrame:
    """RING_META_SCHEMA derived from the (already checkpointed) edges frame
    instead of a second pass over the rings source — pure Catalyst.

    The packed h1 int64 IS the exact grid coordinate pair (R4:
    xi<<32 | yi&mask with xi = rint(x·2^20)), so the int shoelace the
    Python kernel computes is re-expressible as one partial-aggregated
    JVM shuffle: area2 = Σ_edges (xi1·yi2 − xi2·yi1) over the ring's
    directed edges, with the products in decimal(38,0) so absolute
    (untranslated) grid coords cannot overflow — translation invariance of
    the integer shoelace makes this bit-equal to ring_meta's translated
    int64 form (pinned by tests/test_topology.py). min_x/min_y are plain
    MIN aggregates over x1/y1 (every vertex of a closed ring starts
    exactly one directed edge, so x1 ranges over all vertices).

    Scale shape: ONE map-side-combinable exchange on the ring key,
    carrying one row per ring — replaces re-running the rings
    scan/generator plus a per-ring Python concat pass. Zero Python."""
    d = "decimal(19,0)"
    xi1 = F.shiftright(F.col("h1"), 32).cast(d)
    yi1 = F.shiftright(F.shiftleft(F.col("h1"), 32), 32).cast(d)
    xi2 = F.shiftright(F.col("h2"), 32).cast(d)
    yi2 = F.shiftright(F.shiftleft(F.col("h2"), 32), 32).cast(d)
    return edges.groupBy("theme", "feature_id", "ring_idx", "is_exterior").agg(
        F.sum(xi1 * yi2 - xi2 * yi1).cast("long").alias("area2"),
        F.min("x1").alias("min_x"),
        F.min("y1").alias("min_y"),
    )


# --------------------------------------------------------------------------
# Stage B: duplicate / overlapping boundaries (R8) + boundary classes (R12)
# --------------------------------------------------------------------------

def undirected_edge_stats(
    edges: DataFrame, themes: list[str] | None = None, with_holes: bool = False
) -> DataFrame:
    """The reference's insert-time hashmap conflict check as one shuffle:
    groupBy on the undirected coordinate-hash key.

    Exchange-slim by construction: the input projects to (theme, lo_h,
    hi_h, fwd, feature_id) only, and the error-anchor midpoints derive
    from the packed endpoint hashes AFTER aggregation — they are exact
    functions of the snapped endpoints (R4 identity; also immune to the
    min-of-independent-columns coordinate mixing a raw-coord aggregate
    would risk), so no coordinate doubles cross the exchange at all.

    When the Theme session provides its name list (R2 — a validation run
    knows its themes up front), the theme string is dictionary-encoded to
    a small int for the shuffle and decoded after: the exchange then
    carries three longs + two ints per partial row and zero strings.

    with_holes=True additionally aggregates, per key, how many of its
    directed edges come from interior rings (n_hole) and — for keys that
    could be an unshared hole edge — the packed (feature, ring) ref of one
    such edge (hole_ref). This lets interior_errors read hole-sharing
    straight off this one exchange instead of re-shuffling every stats row
    through a second (lo_h, hi_h) join: +~12 bytes/partial-row here buys
    the removal of a full second exchange+sort over the stats table, the
    shape that matters at 10^12 edges."""
    mid_x = (X.unpack_x_col(F.col("lo_h")) + X.unpack_x_col(F.col("hi_h"))) / 2
    mid_y = (X.unpack_y_col(F.col("lo_h")) + X.unpack_y_col(F.col("hi_h"))) / 2
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("fwd").cast("int")).alias("n_fwd"),
        F.array_sort(F.collect_set("feature_id")).alias("features"),
    ]
    cols = ["theme", "lo_h", "hi_h", "fwd", "feature_id"]
    if with_holes:
        # obj_ref >> 20 drops the edge seq: the packed (feature, ring) pair
        hole_ref = F.when(
            ~F.col("is_exterior"), F.shiftright(F.col("obj_ref"), 20)
        )
        edges = edges.withColumn("hole_ref", hole_ref)
        cols.append("hole_ref")
        aggs += [
            F.count("hole_ref").alias("n_hole"),
            F.max("hole_ref").alias("hole_ref"),
        ]
    base = edges.select(*cols)
    if themes:
        enc = F.create_map(
            *[c for i, t in enumerate(sorted(themes)) for c in (F.lit(t), F.lit(i))]
        )
        dec = F.create_map(
            *[c for i, t in enumerate(sorted(themes)) for c in (F.lit(i), F.lit(t))]
        )
        out_cols = ["lo_h", "hi_h", "n", "n_fwd", "features"] + (
            ["n_hole", "hole_ref"] if with_holes else []
        )
        g = (
            base.select(
                F.element_at(enc, F.col("theme")).alias("tid"),
                *[c for c in cols if c != "theme"],
            )
            .groupBy("tid", "lo_h", "hi_h")
            .agg(*aggs)
            .select(F.element_at(dec, F.col("tid")).alias("theme"), *out_cols)
        )
    else:
        g = base.groupBy("theme", "lo_h", "hi_h").agg(*aggs)
    return g.withColumn("mid_x", mid_x).withColumn("mid_y", mid_y)


def boundary_errors(stats: DataFrame) -> DataFrame:
    fa = F.element_at("features", 1)
    fb = F.coalesce(F.element_at("features", 2), F.element_at("features", 1))
    dup = stats.filter(F.col("n") > 2).select(
        "theme",
        F.lit(codes.DUPLICATE_BOUNDARY).alias("error_code"),
        F.col("mid_x").alias("x"),
        F.col("mid_y").alias("y"),
        fa.alias("feature_a"),
        fb.alias("feature_b"),
    )
    over = stats.filter(
        (F.col("n") == 2) & ((F.col("n_fwd") == 2) | (F.col("n_fwd") == 0))
    ).select(
        "theme",
        F.lit(codes.OVERLAPPING_BOUNDARY).alias("error_code"),
        F.col("mid_x").alias("x"),
        F.col("mid_y").alias("y"),
        fa.alias("feature_a"),
        fb.alias("feature_b"),
    )
    return dup.unionByName(over)


def classify_boundaries(stats: DataFrame) -> DataFrame:
    """R12: 1 incidence = outer/theme boundary, 2 = interior, >2 = invalid."""
    return stats.select(
        "theme",
        "lo_h",
        "hi_h",
        F.when(F.col("n") == 1, "boundary")
        .when(F.col("n") == 2, "interior")
        .otherwise("invalid")
        .alias("edge_class"),
    )


# --------------------------------------------------------------------------
# Stage C: per-cell intersection kernel (R9) — the X2 grouped-map host
# --------------------------------------------------------------------------

def explode_cover(
    edges: DataFrame, cell_size: float = 2.0, themes: list[str] | None = None
) -> DataFrame:
    """One row per (edge, overlapped planar cell) — fully vectorized; the
    exploded form feeds the per-cell kernel without array columns.

    Endpoints ship as TWO packed int64 point hashes (coords.pack_point)
    instead of four doubles, and (feature, ring, seq) as the single
    obj_ref long the edge kernel already carries (R5) — ~40% fewer
    coordinate/id bytes through the exchange. The pack is exactly the
    engine's identity model: topology decisions are made on the
    2^-SCALE_BITS grid (R4), so the snap it applies is the snap the kernel
    would apply anyway. The bbox cover is computed from the SNAPPED coords
    so cover and pair-ownership can never disagree about a cell boundary.
    With a Theme name list (R2), the theme string is dictionary-encoded to
    a small int for the exchange (`tid`) — the downstream kernel decodes
    it; the exploded rows are then 5 fixed-width columns, zero strings."""
    dict_enc = sorted(themes) if themes else None
    tmap = {t: i for i, t in enumerate(dict_enc)} if dict_enc else None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            p1 = X.pack_point(pdf["x1"].to_numpy(), pdf["y1"].to_numpy())
            p2 = X.pack_point(pdf["x2"].to_numpy(), pdf["y2"].to_numpy())
            x1, y1 = X.unpack_point(p1)
            x2, y2 = X.unpack_point(p2)
            rows, cells = C.planar_cover_flat(
                np.minimum(x1, x2), np.minimum(y1, y2),
                np.maximum(x1, x2), np.maximum(y1, y2), cell_size,
            )
            th = pdf["theme"].map(tmap).to_numpy() if tmap else pdf["theme"].to_numpy()
            yield pd.DataFrame(
                {
                    "theme": th[rows],
                    "obj_ref": pdf["obj_ref"].to_numpy()[rows],
                    "p1": p1[rows],
                    "p2": p2[rows],
                    "cell": cells.astype(np.int64),
                }
            )

    ttype = "int" if dict_enc else "string"
    return edges.select("theme", "obj_ref", "x1", "y1", "x2", "y2").mapInPandas(
        kernel,
        f"theme {ttype}, obj_ref long, p1 long, p2 long, cell long",
    )


def intersection_errors_sql(
    edges: DataFrame, cell_size: float = 2.0, themes: list[str] | None = None
) -> DataFrame:
    """R9 edge-intersection errors as ONE pure-JVM Catalyst plan — zero
    Python anywhere. Kept as the CROSS-VALIDATION twin of the default
    Arrow-kernel intersection_errors (tests pin the two bit-equal), and
    as the fallback for a deploy whose Python lane is constrained.

    Why it is NOT the default: Catalyst evaluates the exact sign tests
    per candidate pair with no common-subexpression reuse — inlined into
    the join condition they run interpreted (29 s on the 300×300 mosaic);
    even restructured behind the pushdown barrier below, Project-pushdown
    re-inlines the staged aliases and the post-join Filter still costs
    ~10 s vs ~1.1 s for the grouped numpy kernel on the same input. The
    batch-vectorized kernel evaluates each subexpression once per ARRAY,
    not once per row×reference — a 10× gap no join hint closed
    (broadcast 1.9 s vs shuffle_hash 1.2 s for the bare pair join; the
    filter dominates either way).

      snap → int64 coords (rint, the R4 grid) → cell-range cover via two
      sequence()+explode —► shuffle-free map side
      self-equi-join on (cx, cy) with bbox-overlap + obj_ref< +
      owner-corner residuals —► the ONE exchange, keyed exactly like the
      kernel's repartition
      exact int64 sign tests (cross products < 2^45, no overflow) +
      DISTINCT —► tiny error relation

    Every decision replicates functions.geom bit-for-bit: same rint snap,
    same floor(int/SCALE/cell) cover, same sign tests on int64 differences
    (translation-free: only same-cell differences are multiplied), same
    reported-point formulas evaluated in IEEE double with the same op
    order. Pair orientation (p, q) is obj_ref order — deterministic,
    unlike the kernel's shuffle-arrival order; both are exact on the
    snap grid (tests/test_topology.py pins arrow≡sql equality).

    Skew note: a pathological cell with k edges probes k² pairs; AQE skew
    splitting handles moderate cases and cell_size is the tunable, same
    as the kernel path's _BIG_CELL block loop.
    """
    S = F.lit(X.SCALE)
    cs = F.lit(float(cell_size))

    def snap(c):
        return F.call_function("rint", F.col(c) * S).cast("long")

    base = edges.select(
        "theme",
        "obj_ref",
        snap("x1").alias("xi1"),
        snap("y1").alias("yi1"),
        snap("x2").alias("xi2"),
        snap("y2").alias("yi2"),
    )
    if themes:
        enc = F.create_map(
            *[c for i, t in enumerate(sorted(themes)) for c in (F.lit(t), F.lit(i))]
        )
        base = base.withColumn("theme", F.element_at(enc, F.col("theme")))

    def cell_of(v):  # same float path as the kernel: int → /SCALE → /cell → floor
        return F.floor((v.cast("double") / S) / cs).cast("long")

    bb = base.select(
        "*",
        F.least("xi1", "xi2").alias("bxmin"),
        F.greatest("xi1", "xi2").alias("bxmax"),
        F.least("yi1", "yi2").alias("bymin"),
        F.greatest("yi1", "yi2").alias("bymax"),
    )
    ex = (
        bb.withColumn(
            "cx", F.explode(F.sequence(cell_of(F.col("bxmin")), cell_of(F.col("bxmax"))))
        )
        .withColumn(
            "cy", F.explode(F.sequence(cell_of(F.col("bymin")), cell_of(F.col("bymax"))))
        )
    )

    a, b = ex.alias("a"), ex.alias("b")
    A, B = (lambda c: F.col(f"a.{c}")), (lambda c: F.col(f"b.{c}"))

    def cheap_own():
        # owner-corner residual: report only in the cell of the bbox-
        # intersection min corner (selected ints, no float arithmetic
        # before the shared floor(int/SCALE/cell) path — partition-
        # invariance guard). Cheap (4 floors), so it lives IN the join
        # condition and prunes duplicate-cell pairs before the exact tests.
        return (
            (cell_of(F.greatest(A("bxmin"), B("bxmin"))) == A("cx"))
            & (cell_of(F.greatest(A("bymin"), B("bymin"))) == A("cy"))
        )

    pairs = a.join(
        b,
        on=(
            (A("cx") == B("cx")) & (A("cy") == B("cy"))
            & (A("obj_ref") < B("obj_ref"))
            & (A("bxmin") <= B("bxmax")) & (A("bxmax") >= B("bxmin"))
            & (A("bymin") <= B("bymax")) & (A("bymax") >= B("bymin"))
            & cheap_own()
        ),
    )

    # p = a, q = b — functions.geom._pair_tests in Catalyst expressions.
    # The pair is flattened and every shared subexpression (the four cross
    # products, the axis-projected collinear interval) is computed ONCE as
    # a NAMED column: CollapseProject refuses to inline a non-cheap alias
    # referenced more than once, so each survives as a single evaluation
    # in one codegen'd Project instead of being re-derived per reference
    # (the inlined form re-evaluates d1r ~30× per candidate pair).
    c = F.col
    flat = pairs.select(
        A("cx").alias("cx"), A("cy").alias("cy"), A("theme").alias("theme"),
        A("obj_ref").alias("ref_a"), B("obj_ref").alias("ref_b"),
        A("xi1").alias("ax1"), A("yi1").alias("ay1"),
        A("xi2").alias("ax2"), A("yi2").alias("ay2"),
        B("xi1").alias("bx1"), B("yi1").alias("by1"),
        B("xi2").alias("bx2"), B("yi2").alias("by2"),
    )
    dxp, dyp = c("ax2") - c("ax1"), c("ay2") - c("ay1")
    dxq, dyq = c("bx2") - c("bx1"), c("by2") - c("by1")
    use_x = F.abs(dxp) >= F.abs(dyp)
    staged = flat.select(
        "*",
        (dxp * (c("by1") - c("ay1")) - dyp * (c("bx1") - c("ax1"))).alias("d1r"),
        (dxp * (c("by2") - c("ay1")) - dyp * (c("bx2") - c("ax1"))).alias("d2r"),
        (dxq * (c("ay1") - c("by1")) - dyq * (c("ax1") - c("bx1"))).alias("d3r"),
        (dxq * (c("ay2") - c("by1")) - dyq * (c("ax2") - c("bx1"))).alias("d4r"),
        F.when(use_x, c("ax1")).otherwise(c("ay1")).alias("pa"),
        F.when(use_x, c("ax2")).otherwise(c("ay2")).alias("pb"),
        F.when(use_x, c("bx1")).otherwise(c("by1")).alias("qa"),
        F.when(use_x, c("bx2")).otherwise(c("by2")).alias("qb"),
    )
    staged = staged.select(
        "*",
        F.greatest(F.least(c("pa"), c("pb")), F.least(c("qa"), c("qb"))).alias("lo"),
        F.least(F.greatest(c("pa"), c("pb")), F.greatest(c("qa"), c("qb"))).alias("hi"),
    )
    d1r, d2r, d3r, d4r = c("d1r"), c("d2r"), c("d3r"), c("d4r")
    pa, pb, lo, hi = c("pa"), c("pb"), c("lo"), c("hi")

    def opp(u, v):  # sign(u) * sign(v) < 0 without forming the product
        return ((u > 0) & (v < 0)) | ((u < 0) & (v > 0))

    proper = opp(d1r, d2r) & opp(d3r, d4r)
    identical = (
        ((c("ax1") == c("bx1")) & (c("ay1") == c("by1"))
         & (c("ax2") == c("bx2")) & (c("ay2") == c("by2")))
        | ((c("ax1") == c("bx2")) & (c("ay1") == c("by2"))
           & (c("ax2") == c("bx1")) & (c("ay2") == c("by1")))
    )
    col0 = (d1r == 0) & (d2r == 0)
    coll_ov = col0 & ~identical & (hi > lo)

    def between(ax, ay, bx, by, cx_, cy_):
        return (
            (F.least(ax, bx) <= cx_) & (cx_ <= F.greatest(ax, bx))
            & (F.least(ay, by) <= cy_) & (cy_ <= F.greatest(ay, by))
            & ~((cx_ == ax) & (cy_ == ay)) & ~((cx_ == bx) & (cy_ == by))
        )

    noncol = ~col0
    t1 = noncol & (d1r == 0) & between(
        c("ax1"), c("ay1"), c("ax2"), c("ay2"), c("bx1"), c("by1"))
    t2 = noncol & (d2r == 0) & between(
        c("ax1"), c("ay1"), c("ax2"), c("ay2"), c("bx2"), c("by2"))
    t3 = noncol & (d3r == 0) & between(
        c("bx1"), c("by1"), c("bx2"), c("by2"), c("ax1"), c("ay1"))
    t4 = noncol & (d4r == 0) & between(
        c("bx1"), c("by1"), c("bx2"), c("by2"), c("ax2"), c("ay2"))
    hit = proper | coll_ov | t1 | t2 | t3 | t4

    # pushdown barrier: OR-taint the exact-test predicate with an always-
    # false nondeterministic term so Catalyst can neither fold it back
    # INTO the join condition (where it is evaluated interpreted, per
    # candidate pair: measured 29 s vs 1.2 s Arrow on the 300×300 mosaic)
    # nor push it below the staged Projects that hold the named
    # subexpressions. Spark 4.1 pushes EVERY deterministic conjunct into
    # an inner join's condition regardless of position (and folds
    # `rand(7) > -1` away entirely), so the taint must live inside the
    # single conjunct.
    barrier = F.monotonically_increasing_id() < F.lit(0)
    kept = staged.where(hit | barrier)

    # reporting point — evaluated only on surviving pairs (a handful)
    dbl = lambda v: v.cast("double")  # noqa: E731 — exact for |v| < 2^53
    tprop = dbl(d1r) / dbl(d1r - d2r)
    px_prop = dbl(c("bx1")) + tprop * (dbl(c("bx2")) - dbl(c("bx1")))
    py_prop = dbl(c("by1")) + tprop * (dbl(c("by2")) - dbl(c("by1")))
    tcol = (dbl(lo + hi) / F.lit(2.0) - dbl(pa)) / (dbl(pb) - dbl(pa))
    px_col = dbl(c("ax1")) + tcol * (dbl(c("ax2")) - dbl(c("ax1")))
    py_col = dbl(c("ay1")) + tcol * (dbl(c("ay2")) - dbl(c("ay1")))
    px = (
        F.when(proper, px_prop).when(coll_ov, px_col)
        .when(t1, dbl(c("bx1"))).when(t2, dbl(c("bx2")))
        .when(t3, dbl(c("ax1"))).otherwise(dbl(c("ax2")))
    ) / S
    py = (
        F.when(proper, py_prop).when(coll_ov, py_col)
        .when(t1, dbl(c("by1"))).when(t2, dbl(c("by2")))
        .when(t3, dbl(c("ay1"))).otherwise(dbl(c("ay2")))
    ) / S

    feat_a = F.shiftright(c("ref_a"), 30)
    feat_b = F.shiftright(c("ref_b"), 30)
    ring_a = F.shiftright(c("ref_a"), 20).bitwiseAND(F.lit(0x3FF))
    ring_b = F.shiftright(c("ref_b"), 20).bitwiseAND(F.lit(0x3FF))
    same_ring = (feat_a == feat_b) & (ring_a == ring_b)

    out = (
        kept.select(
            "cx",
            "cy",
            "theme",
            F.when(same_ring, F.lit(codes.RING_SELF_INTERSECTION))
            .otherwise(F.lit(codes.EDGE_INTERSECTION))
            .alias("error_code"),
            px.alias("x"),
            py.alias("y"),
            F.least(feat_a, feat_b).alias("feature_a"),
            F.greatest(feat_a, feat_b).alias("feature_b"),
        )
        .distinct()  # duplicate directed edges recur inside one owner cell
        .drop("cx", "cy")
    )
    if themes:
        dec = F.create_map(
            *[c for i, t in enumerate(sorted(themes)) for c in (F.lit(i), F.lit(t))]
        )
        out = out.withColumn("theme", F.element_at(dec, F.col("theme")))
    return out.select("theme", "error_code", "x", "y", "feature_a", "feature_b")


def intersection_errors(
    edges: DataFrame, cell_size: float = 2.0, themes: list[str] | None = None
) -> DataFrame:
    """R9 edge-intersection errors: batch-grouped numpy kernel behind one
    cell-keyed exchange — the default path (~10× the pure-Catalyst twin
    intersection_errors_sql, whose docstring carries the measurements;
    tests pin the two bit-equal).

    Reference parity: TopoX detects improper edge meetings during its
    single-threaded TopologyBuilder insert walk (SURVEY.md §2.A R9,
    [ref-pub MED] TopologyBuilder.java); here the same exact-grid tests
    run per cell, all cells of a partition in one vectorized call."""
    exploded = explode_cover(edges, cell_size, themes)
    decode = np.array(sorted(themes), object) if themes else None

    empty = pd.DataFrame(
        {c: pd.Series(dtype=d) for c, d in (
            ("theme", "object"), ("error_code", "object"),
            ("x", "float64"), ("y", "float64"),
            ("feature_a", "int64"), ("feature_b", "int64"),
        )}
    )

    # hash-partition on cell, then run ALL of a partition's cells in ONE
    # vectorized kernel call: groupBy().applyInPandas pays ~1 ms of
    # Arrow/invocation overhead PER GROUP, and even a python loop of
    # per-cell numpy slices pays ~2 ms of small-array call overhead per
    # cell (measured 14 s single-proc on the 800×800 scaling mosaic, vs
    # < 2 s of actual element work) — at millions of cells that per-group
    # overhead IS the stage. segment_intersections_grouped generates every
    # cell's candidate pairs in one sort + searchsorted sweep, so the
    # partition cost is a handful of large-array numpy passes regardless
    # of how many cells it holds.
    def part_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [b for b in batches if len(b)]
        if not chunks:
            yield empty
            return
        # a partition can arrive as several Arrow batches that split a
        # cell — concatenate before grouping (partition-level memory is
        # bounded by the shuffle-partition size we sized upstream)
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        cells = pdf["cell"].to_numpy()
        # rehydrate endpoint doubles / ids from the packed forms (exact:
        # the packs ARE the engine's coordinate + ref identity, R4/R5)
        x1, y1 = X.unpack_point(pdf["p1"].to_numpy())
        x2, y2 = X.unpack_point(pdf["p2"].to_numpy())
        fi, ri, _ = X.unpack_obj_ref(pdf["obj_ref"].to_numpy())
        theme = pdf["theme"].to_numpy()
        if decode is not None:  # tid → theme string (no strings crossed the wire)
            theme = decode[theme]
        I, J, px, py, same_ring, cellv = geom.segment_intersections_grouped(
            x1, y1, x2, y2, fi, ri, cells
        )
        if len(I) == 0:
            yield empty
            return
        # pair-canonical ownership: the pair is reported only by the cell of
        # the min corner of the two edges' bbox intersection. Corner coords
        # are SELECTED from exact endpoint values (no float arithmetic), so
        # every cell's kernel instance — and only one — claims the pair:
        # partition-invariance (SURVEY.md §7 risk #2 guard).
        bxmin = np.minimum(x1, x2)
        bymin = np.minimum(y1, y2)
        own = (
            C.planar_owner_corner(bxmin[I], bymin[I], bxmin[J], bymin[J], cell_size)
            == cellv
        )
        I, J, px, py, same_ring, cellv = (
            I[own], J[own], px[own], py[own], same_ring[own], cellv[own]
        )
        if len(I) == 0:
            yield empty
            return
        fa = np.minimum(fi[I], fi[J])
        fb = np.maximum(fi[I], fi[J])
        code = np.where(same_ring, codes.RING_SELF_INTERSECTION, codes.EDGE_INTERSECTION)
        out = pd.DataFrame(
            {
                "cell": cellv,  # keeps the dedup per-cell, as the cell loop had it
                "theme": theme[I],
                "error_code": code,
                "x": px, "y": py,
                "feature_a": fa, "feature_b": fb,
            }
        )
        # a pair can recur inside one cell via duplicate directed edges
        yield out.drop_duplicates().drop(columns=["cell"])

    # Task granularity: this exchange feeds a CPU-heavy Arrow kernel, so it
    # wants 3-4 tasks PER CORE (work-stealing smooths cell-hash imbalance
    # and Arrow-batch concat variance), not the byte-sized global
    # spark.sql.shuffle.partitions the tiny aggregate exchanges use.
    # Measured on the 800×800 scaling mosaic (tools/profile_topo probes,
    # best-of-2 per point): at 8 cores 8→32 partitions cuts the stage
    # 7.98→3.51 s (the 2→8 scaling pair's missing efficiency was exactly
    # this — 8 tasks on 8 cores let the slowest task set the wall); at 32
    # cores 32/64/128 partitions are equivalent within the box's noise; at
    # 2 cores the shuffle-partition floor keeps today's behavior. On a real
    # cluster defaultParallelism is total executor cores, so the same rule
    # scales the fan-out with the cluster.
    spark = exploded.sparkSession
    n_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        4 * spark.sparkContext.defaultParallelism,
    )
    return exploded.repartition(n_parts, "cell").mapInPandas(
        part_kernel, ERROR_SCHEMA
    )


# --------------------------------------------------------------------------
# Stage D: free-standing surfaces (R10) — O(log n)-round connected components
# --------------------------------------------------------------------------

def _symmetrize(e: DataFrame) -> DataFrame:
    return e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _large_star(e: DataFrame) -> DataFrame:
    sym = _symmetrize(e)
    m = sym.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # orient every edge large→small, then point all small neighbors (and the
    # hub) at the minimum
    o = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = o.groupBy("src").agg(F.min("dst").alias("m"))
    hub = m.select(F.col("src"), F.col("m").alias("dst"))
    spokes = (
        o.join(m, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    return hub.unionByName(spokes).distinct()


# crossover measured on a 3.24M-node / 6.4M-pair grid graph: driver
# label-prop 8.8s vs star loop 98.7s (identical labelings). 20M pairs is
# ~320 MB on the driver — far under the driver heap; beyond that the
# distributed star loop is the only option anyway.
DRIVER_CC_MAX_PAIRS = 20_000_000


def connected_components_local(pairs: DataFrame) -> pd.DataFrame | None:
    """Driver-path CC: returns a pandas (node, root) labeling, or None when
    the deduped pair set exceeds DRIVER_CC_MAX_PAIRS (callers then take the
    distributed star loop). One Spark action: the limit caps driver memory
    and the overflow row flips the strategy."""
    e = pairs.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    pdf = e.limit(DRIVER_CC_MAX_PAIRS + 1).toPandas()
    if len(pdf) > DRIVER_CC_MAX_PAIRS:
        return None
    src = pdf["src"].to_numpy()
    dst = pdf["dst"].to_numpy()
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si = inv[: len(src)]
    di = inv[len(src):]
    # vectorized min-label propagation with full pointer-jumping
    # compression per round (hash-to-min in numpy; O(log n) rounds, no
    # per-edge Python loop)
    labels = np.arange(len(nodes), dtype=np.int64)
    while True:
        prev = labels
        nxt = labels.copy()
        np.minimum.at(nxt, si, labels[di])
        np.minimum.at(nxt, di, labels[si])
        while True:
            jumped = nxt[nxt]
            if np.array_equal(jumped, nxt):
                break
            nxt = jumped
        if np.array_equal(nxt, prev):
            break
        labels = nxt
    return pd.DataFrame({"node": nodes, "root": nodes[labels]})


def connected_components(pairs: DataFrame, max_rounds: int = 30) -> DataFrame:
    """pairs(src, dst) undirected → (node, root) with root = component min.

    Hybrid strategy (AQE-style size switch): below DRIVER_CC_MAX_PAIRS the
    deduped pair set is collected and solved with a vectorized union-find —
    the star loop's per-round latency (a fixed number of shuffles) would
    dwarf the work. Above it, alternating large-star/small-star (public
    algorithm: Kiveris et al., 'Connected Components in MapReduce and
    Beyond') converges in O(log n) rounds of bounded joins with no
    driver-side graph — the 100 TB path."""
    local = connected_components_local(pairs)
    if local is not None:
        return pairs.sparkSession.createDataFrame(local)
    e = pairs.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    # distributed path: truncate lineage once before iterating
    e = e.localCheckpoint(eager=True)
    prev_sig = None
    prev_df = None
    for _ in range(max_rounds):
        # localCheckpoint truncates lineage each round — without it the
        # join-of-join plan grows exponentially across iterations
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        if prev_df is not None:
            prev_df.unpersist()
        prev_df, e = e, new_e
        sig = e.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("src", "dst").cast("long")).alias("h"),
        ).collect()[0]
        cur = (sig["n"], sig["h"])
        if cur == prev_sig:
            break
        prev_sig = cur
    # converged: every edge is (node, root)
    roots = e.select(F.col("src").alias("node"), F.col("dst").alias("root"))
    return roots


def free_standing_errors(
    stats: DataFrame, meta: DataFrame
) -> DataFrame:
    """Components of the feature-adjacency graph not in the main body."""
    shared = stats.filter(F.size("features") >= 2)
    pairs = shared.select(
        "theme",
        F.element_at("features", 1).alias("src"),
        F.explode(F.slice("features", 2, 1_000_000)).alias("dst"),
    )
    feats = meta.select("theme", "feature_id").distinct()
    # per theme: isolate via theme-scoped node ids? themes are few; loop-free
    # approach: run CC on (theme, src, dst) by packing theme into the id is
    # overkill here — feature_ids are globally unique in this engine.
    spark = stats.sparkSession
    # ONE tagged-union action fetches the deduped pair set AND the feature
    # universe under a single combined cap: the feature leg is bounded too
    # (a graph with few shared edges but billions of features must not
    # collect them), and the driver path costs one Spark job, not two.
    tagged = (
        pairs.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .select(
            F.lit(0).alias("tag"),
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            F.lit(None).cast("string").alias("theme"),
        )
        .unionByName(
            feats.select(
                F.lit(1).alias("tag"),
                F.col("feature_id").alias("a"),
                F.lit(None).cast("long").alias("b"),
                "theme",
            )
        )
    )
    pdf = tagged.limit(DRIVER_CC_MAX_PAIRS + 1).toPandas()
    if len(pdf) <= DRIVER_CC_MAX_PAIRS:
        # CC fit on the driver → finish the tiny label algebra there too
        # (comp sizes, per-theme main root, stray set) instead of a chain
        # of small-shuffle Spark jobs
        pp = pdf[pdf["tag"] == 0]
        src = pp["a"].to_numpy().astype(np.int64)
        dst = pp["b"].to_numpy().astype(np.int64)
        if len(src):
            nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
            labels = _minlabel_prop(inv[: len(src)], inv[len(src):], len(nodes))
            local = pd.DataFrame({"feature_id": nodes, "root": nodes[labels]})
        else:
            local = pd.DataFrame({"feature_id": [], "root": []}, dtype=np.int64)
        fpdf = pdf[pdf["tag"] == 1][["theme", "a"]].rename(columns={"a": "feature_id"})
        m = fpdf.merge(local, on="feature_id", how="left")
        m["root"] = m["root"].fillna(m["feature_id"]).astype(np.int64)
        sizes = m.groupby(["theme", "root"]).size().reset_index(name="sz")
        main_rows = (
            sizes.sort_values(["theme", "sz", "root"], ascending=[True, False, True])
            .groupby("theme", as_index=False)
            .first()[["theme", "root"]]
            .rename(columns={"root": "main_root"})
        )
        stray_pdf = m.merge(main_rows, on="theme")
        stray_pdf = stray_pdf[stray_pdf["root"] != stray_pdf["main_root"]][
            ["theme", "feature_id"]
        ]
        stray = spark.createDataFrame(stray_pdf, "theme string, feature_id long")
    else:
        roots = connected_components(pairs.select("src", "dst"))
        labeled = (
            feats.join(roots, feats.feature_id == roots.node, "left")
            .select(
                "theme",
                "feature_id",
                F.coalesce("root", "feature_id").alias("root"),
            )
        )
        comp_sizes = labeled.groupBy("theme", "root").agg(F.count(F.lit(1)).alias("sz"))
        main = (
            comp_sizes.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("theme").orderBy(F.col("sz").desc(), F.col("root"))
                ),
            )
            .filter(F.col("rk") == 1)
            .select("theme", F.col("root").alias("main_root"))
        )
        stray = (
            labeled.join(main, "theme")
            .filter(F.col("root") != F.col("main_root"))
            .select("theme", "feature_id")
        )
    anchor = meta.filter(F.col("is_exterior")).groupBy("theme", "feature_id").agg(
        F.min("min_x").alias("x"), F.min("min_y").alias("y")
    )
    # stray is (nearly always) tiny relative to the anchor table
    return F.broadcast(stray).join(anchor, ["theme", "feature_id"]).select(
        "theme",
        F.lit(codes.FREE_STANDING_SURFACE).alias("error_code"),
        "x",
        "y",
        F.col("feature_id").alias("feature_a"),
        F.col("feature_id").alias("feature_b"),
    )


# --------------------------------------------------------------------------
# R7: per-node CCW half-edge cycles (the TopologyBuilder angular ordering)
# --------------------------------------------------------------------------

def node_edge_cycles(edges: DataFrame) -> DataFrame:
    """CCW angular ordering of the incident edges around every node — the
    angular-cycle / next-edge-pointer structure the reference's
    TopologyBuilder maintains per node (SURVEY.md §2.A R7), materialized
    distributively with ONE shuffle (the node-hash exchange; the window
    reuses the same partitioning).

    Each distinct undirected edge contributes one half-edge at each
    endpoint. Incident half-edges sort by the diamond pseudo-angle

        t = dy / (|dx| + |dy|);  a = t if dx >= 0 else 2 - t;  a += 4 if a < 0

    which is strictly monotone in the true angle over [0, 4) starting east
    going CCW, uses only +, -, /, abs (correctly-rounded IEEE ops — no
    libm, so engine and oracle compute bit-identical keys), and cannot
    collide for distinct directions while |dx|+|dy| < 2^25 scaled units:
    two distinct rationals with denominators below 2^25 differ by more
    than the double rounding radius. Geometric ties (collinear same-side
    neighbors) break on neighbor coordinates.

    Returns one row per half-edge: node coords, CCW position, node degree,
    neighbor coords, and the CCW successor's neighbor coords (the
    next-edge pointer, wrapping at degree).

    Endpoint coords are UNPACKED from the canonical lo_h/hi_h point hashes
    (R4), not min-aggregated from the raw doubles: two duplicate directed
    edges whose raw coords differ within one snap quantum share a packed
    identity, and independent per-column mins could mix x from one row
    with y from another — a point no input row contains. The snapped
    identity IS the topology's coordinate system, so unpacking is exact,
    and the distinct() exchange ships two longs instead of four doubles.
    """
    und = (
        edges.filter(F.col("lo_h") != F.col("hi_h"))  # zero-length: no angle
        .select("theme", "lo_h", "hi_h")
        .distinct()
        .select(
            "theme",
            "lo_h",
            "hi_h",
            X.unpack_x_col(F.col("lo_h")).alias("ax"),
            X.unpack_y_col(F.col("lo_h")).alias("ay"),
            X.unpack_x_col(F.col("hi_h")).alias("bx"),
            X.unpack_y_col(F.col("hi_h")).alias("by"),
        )
    )
    half = und.select(
        "theme",
        F.col("lo_h").alias("node_h"),
        F.col("ax").alias("node_x"),
        F.col("ay").alias("node_y"),
        F.col("bx").alias("nbr_x"),
        F.col("by").alias("nbr_y"),
    ).unionByName(
        und.select(
            "theme",
            F.col("hi_h").alias("node_h"),
            F.col("bx").alias("node_x"),
            F.col("by").alias("node_y"),
            F.col("ax").alias("nbr_x"),
            F.col("ay").alias("nbr_y"),
        )
    )
    dx = F.col("nbr_x") - F.col("node_x")
    dy = F.col("nbr_y") - F.col("node_y")
    t = dy / (F.abs(dx) + F.abs(dy))
    a0 = F.when(dx >= 0, t).otherwise(F.lit(2.0) - t)
    angle = F.when(a0 < 0, a0 + F.lit(4.0)).otherwise(a0)
    w = Window.partitionBy("theme", "node_h").orderBy("a", "nbr_x", "nbr_y")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        half.withColumn("a", angle)
        .select(
            "theme",
            "node_x",
            "node_y",
            (F.row_number().over(w) - 1).alias("pos"),
            F.count(F.lit(1)).over(w_all).alias("degree"),
            "nbr_x",
            "nbr_y",
            F.coalesce(F.lead("nbr_x").over(w), F.first("nbr_x").over(w_all)).alias("nxt_x"),
            F.coalesce(F.lead("nbr_y").over(w), F.first("nbr_y").over(w_all)).alias("nxt_y"),
        )
    )


def face_successor_pairs(edges: DataFrame) -> DataFrame:
    """The DCEL successor permutation over half-edges, keyed by packed
    endpoint-hash pairs (R4) — no global ids, no joins at all.

    Every row of node_edge_cycles at node b, (b→c) with CCW-successor
    pointer (b→a), directly states: the face-successor of half-edge (a→b)
    is (b→c). A half-edge's identity is the pair of its packed endpoint
    hashes, so the whole permutation is one map-side projection of the
    cycle frame — the previous implementation's global single-partition
    ROW_NUMBER rank (the one non-scalable plan in the engine) and its two
    geometry self-joins are gone entirely."""
    cyc = node_edge_cycles(edges)
    pa = X.pack_point_col(F.col("nxt_x"), F.col("nxt_y"))
    pb = X.pack_point_col(F.col("node_x"), F.col("node_y"))
    pc = X.pack_point_col(F.col("nbr_x"), F.col("nbr_y"))
    return cyc.select(
        "theme",
        pa.alias("src_a"),
        pb.alias("src_b"),
        pb.alias("dst_a"),
        pc.alias("dst_b"),
    )


def _minlabel_prop(si: np.ndarray, di: np.ndarray, n_nodes: int) -> np.ndarray:
    """Vectorized min-label propagation with pointer-jumping compression
    (the numpy core shared by connected_components_local and the local
    face labeler). Returns the component-min label per node."""
    labels = np.arange(n_nodes, dtype=np.int64)
    while True:
        prev = labels
        nxt = labels.copy()
        np.minimum.at(nxt, si, labels[di])
        np.minimum.at(nxt, di, labels[si])
        while True:
            jumped = nxt[nxt]
            if np.array_equal(jumped, nxt):
                break
            nxt = jumped
        if np.array_equal(nxt, prev):
            break
        labels = nxt
    return labels


def _faces_local(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-path face labeling: encode (theme, packed pair) half-edge
    keys to dense local ids, run the shared min-propagation, then pick
    each face's lexicographically-least half-edge BY COORDINATES
    (np.lexsort — NOT the signed packed order, which diverges from
    coordinate order for negative y)."""
    tid, themes = pd.factorize(pdf["theme"], sort=True)
    src = np.column_stack([tid, pdf["src_a"].to_numpy(), pdf["src_b"].to_numpy()])
    dst = np.column_stack([tid, pdf["dst_a"].to_numpy(), pdf["dst_b"].to_numpy()])
    nodes, inv = np.unique(np.concatenate([src, dst]), axis=0, return_inverse=True)
    inv = inv.ravel()  # numpy 2.x returns (n, 1) for axis-unique inverse
    n = len(src)
    labels = _minlabel_prop(inv[:n], inv[n:], len(nodes))
    ax, ay = X.unpack_point(nodes[:, 1])
    bx, by = X.unpack_point(nodes[:, 2])
    order = np.lexsort((by, bx, ay, ax))
    sorted_roots = labels[order]
    uniq_roots, first_pos = np.unique(sorted_roots, return_index=True)
    rep = order[first_pos]  # lexic-min member per face
    counts = np.bincount(labels, minlength=len(nodes))[uniq_roots]
    return pd.DataFrame(
        {
            "theme": themes[nodes[rep, 0]],
            "face_ax": ax[rep],
            "face_ay": ay[rep],
            "face_bx": bx[rep],
            "face_by": by[rep],
            "n_edges": counts.astype(np.int64),
        }
    )


def _face_labels_distributed(pairs: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Pointer-doubling min-label over the successor permutation — the
    100× path: each round is ONE self-equi-join on the packed keys
    (hash-partitioned exchange, no single-partition stage) that halves
    the remaining cycle distance, so faces label in O(log max-cycle-len)
    rounds. Labels are structs of the half-edge's endpoint COORDS, so the
    face id (the least struct) is the lexicographically-least half-edge —
    identical to the local path's np.lexsort pick."""
    lbl = F.struct(
        X.unpack_x_col(F.col("src_a")).alias("fax"),
        X.unpack_y_col(F.col("src_a")).alias("fay"),
        X.unpack_x_col(F.col("src_b")).alias("fbx"),
        X.unpack_y_col(F.col("src_b")).alias("fby"),
    )
    st = pairs.select(
        "theme",
        F.col("src_a").alias("ka"),
        F.col("src_b").alias("kb"),
        lbl.alias("lbl"),
        F.col("dst_a").alias("na"),
        F.col("dst_b").alias("nb"),
    ).localCheckpoint(eager=True)
    prev_sig = None
    prev_df = None
    for _ in range(max_rounds):
        succ = st.select(
            F.col("theme").alias("t2"),
            F.col("ka").alias("ja"),
            F.col("kb").alias("jb"),
            F.col("lbl").alias("jlbl"),
            F.col("na").alias("jna"),
            F.col("nb").alias("jnb"),
        )
        new_st = (
            st.join(
                succ,
                (F.col("theme") == F.col("t2"))
                & (F.col("na") == F.col("ja"))
                & (F.col("nb") == F.col("jb")),
            )
            .select(
                "theme",
                "ka",
                "kb",
                F.least("lbl", "jlbl").alias("lbl"),
                F.col("jna").alias("na"),
                F.col("jnb").alias("nb"),
            )
            .localCheckpoint(eager=True)
        )
        if prev_df is not None:
            prev_df.unpersist()
        prev_df, st = st, new_st
        sig = st.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("ka", "kb", "lbl.fax", "lbl.fay", "lbl.fbx", "lbl.fby").cast("long")).alias("h"),
        ).collect()[0]
        cur = (sig["n"], sig["h"])
        if cur == prev_sig:
            break
        prev_sig = cur
    return st.select("theme", "ka", "kb", "lbl")


FACE_SCHEMA = (
    "theme string, face_ax double, face_ay double, "
    "face_bx double, face_by double, n_edges long"
)


def face_cycles(edges: DataFrame) -> DataFrame:
    """DCEL face traversal on top of the R7 angular cycles: the structure
    the reference's TopologyBuilder walks for interior checks (SURVEY.md
    §2.A R7 'next-edge pointers').

    next(a→b) = (b→c) where half-edge (b→c) is the CW-predecessor of the
    back-direction (b→a) in b's CCW cycle — i.e. the cycle row at b whose
    next-edge pointer IS (b→a). Faces are the cycles of this successor
    permutation. Half-edge identity is the packed endpoint-hash pair
    (R4) — fully distributed, no global rank anywhere — and the face id is
    the face's lexicographically-least half-edge, reported as its endpoint
    coordinates (face_ax..face_by). Returns one row per face with its
    half-edge count; on a clean subdivision the result satisfies Euler's
    formula V − E + F = 1 + C (pytest-pinned).

    Hybrid strategy mirroring connected_components: below
    DRIVER_CC_MAX_PAIRS the permutation is collected and labeled with the
    shared numpy min-propagation; above it, distributed pointer doubling
    (O(log cycle-length) equi-join rounds, no single-partition stage)."""
    pairs = face_successor_pairs(edges)
    pdf = pairs.limit(DRIVER_CC_MAX_PAIRS + 1).toPandas()
    if len(pdf) <= DRIVER_CC_MAX_PAIRS:
        return pairs.sparkSession.createDataFrame(_faces_local(pdf), FACE_SCHEMA)
    labeled = _face_labels_distributed(pairs)
    return labeled.groupBy(
        "theme",
        F.col("lbl.fax").alias("face_ax"),
        F.col("lbl.fay").alias("face_ay"),
        F.col("lbl.fbx").alias("face_bx"),
        F.col("lbl.fby").alias("face_by"),
    ).agg(F.count(F.lit(1)).alias("n_edges"))


# --------------------------------------------------------------------------
# Stage E: invalid interiors (R11) + ring orientation
# --------------------------------------------------------------------------

def interior_errors(edges: DataFrame, stats: DataFrame, meta: DataFrame) -> DataFrame:
    """R11 empty interiors (a hole none of whose edges is shared with a
    filling surface) + ring orientation.

    Fast path (stats built with with_holes=True): a hole ring is "empty"
    iff every one of its edges sits on a key with n == 1 — equivalently,
    the count of n==1 keys owned by the ring equals the ring's edge count.
    Both counts come from tiny map-side-combinable aggregates (stats rows
    with n==1 & n_hole==1; hole edges per ring), so NO full-width join of
    the stats table is needed — the legacy path re-shuffled every stats
    row through a (lo_h, hi_h) exchange+sort just to probe the few hole
    keys, a cost proportional to ALL edges rather than hole edges."""
    if "n_hole" in stats.columns:
        unshared = (
            stats.filter((F.col("n") == 1) & (F.col("n_hole") == 1))
            .groupBy("theme", "hole_ref")
            .agg(F.count(F.lit(1)).alias("n_unshared"))
        )
        ring_sizes = (
            edges.filter(~F.col("is_exterior"))
            .groupBy("theme", F.shiftright(F.col("obj_ref"), 20).alias("hole_ref"))
            .agg(F.count(F.lit(1)).alias("n_edges"))
        )
        empty = (
            ring_sizes.join(unshared, ["theme", "hole_ref"])
            .filter(F.col("n_unshared") == F.col("n_edges"))
            .select(
                "theme",
                F.shiftright(F.col("hole_ref"), 10).alias("feature_id"),
                (F.col("hole_ref") % 1024).cast("int").alias("ring_idx"),
            )
        )
    else:
        hole_edges = edges.filter(~F.col("is_exterior")).select(
            "theme", "feature_id", "ring_idx", "lo_h", "hi_h"
        )
        matched = hole_edges.join(
            stats.select("theme", "lo_h", "hi_h", "n"), ["theme", "lo_h", "hi_h"]
        )
        empty = (
            matched.groupBy("theme", "feature_id", "ring_idx")
            .agg(F.max("n").alias("max_n"))
            .filter(F.col("max_n") == 1)  # no edge of the hole is shared: gap
            .select("theme", "feature_id", "ring_idx")
        )
    anchor = meta.select("theme", "feature_id", "ring_idx", "min_x", "min_y")
    empty_err = empty.join(anchor, ["theme", "feature_id", "ring_idx"]).select(
        "theme",
        F.lit(codes.EMPTY_INTERIOR).alias("error_code"),
        F.col("min_x").alias("x"),
        F.col("min_y").alias("y"),
        F.col("feature_id").alias("feature_a"),
        F.col("feature_id").alias("feature_b"),
    )
    orient_err = meta.filter(
        (F.col("is_exterior") & (F.col("area2") <= 0))
        | (~F.col("is_exterior") & (F.col("area2") >= 0))
    ).select(
        "theme",
        F.lit(codes.RING_ORIENTATION).alias("error_code"),
        F.col("min_x").alias("x"),
        F.col("min_y").alias("y"),
        F.col("feature_id").alias("feature_a"),
        F.col("feature_id").alias("feature_b"),
    )
    return empty_err.unionByName(orient_err)


# --------------------------------------------------------------------------
# Full pipeline (the Theme lifecycle, SURVEY.md §3.2)
# --------------------------------------------------------------------------

def validate_topology(
    spark: SparkSession,
    rings: DataFrame,
    cell_size: float = 2.0,
    themes: list[str] | None = None,
) -> DataFrame:
    """rings → topology_errors DataFrame (ERROR_SCHEMA). The engine's analog
    of TopoX new-topology → parse-surface → detect-* → error doc. `themes`
    is the Theme session's name list (R2); when given, the edge-stats
    exchange dictionary-encodes the theme string (see
    undirected_edge_stats)."""
    # edges feed five consumers (zero-length, stats, intersections,
    # interiors, ring meta): a lazy local checkpoint materializes the
    # kernel output once instead of re-running the rings→edges pass per
    # consumer. rings now feeds ONLY that one kernel chain — per-ring meta
    # is derived JVM-side from the checkpointed edges (ring_meta_from_edges,
    # bit-equal to the Python pass: tests/test_topology.py), so the rings
    # source is scanned exactly once and needs no checkpoint of its own.
    edges = rings_to_edges(rings, cell_size).localCheckpoint(eager=False)
    # meta feeds three consumers (free-standing feats + anchors, interior
    # orientation) — materialize the small per-ring frame once
    meta = ring_meta_from_edges(edges).localCheckpoint(eager=False)

    zero = edges.filter(F.col("h1") == F.col("h2")).select(
        "theme",
        F.lit(codes.INVALID_EDGE).alias("error_code"),
        F.col("x1").alias("x"),
        F.col("y1").alias("y"),
        F.col("feature_id").alias("feature_a"),
        F.col("feature_id").alias("feature_b"),
    )
    ok = edges.filter(F.col("h1") != F.col("h2"))
    stats = undirected_edge_stats(ok, themes, with_holes=True).cache()

    return (
        zero
        .unionByName(boundary_errors(stats))
        .unionByName(intersection_errors(ok, cell_size, themes))
        .unionByName(free_standing_errors(stats, meta))
        .unionByName(interior_errors(ok, stats, meta))
    )
