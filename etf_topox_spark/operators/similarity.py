"""Similarity search over the embeddings table (task brief: brute-force
cosine top-k baseline + an LSH-bucketed scale path).

- `ann_cosine_topk`: exact baseline — broadcast the (small) query set
  against the corpus, cosine via in-order double folds (zip_with +
  aggregate), per-query top-k window. DuckDB-oracled: list_zip/
  list_transform/list_aggregate fold in the same order → bit-identical.
- `ann_lsh_topk`: random-hyperplane LSH (deterministic planes) → bucket
  equi-join (+ multiprobe on 1-bit flips) → exact cosine rerank. At 10^12
  rows this is the shape that works: signatures are one map-side kernel,
  the join shuffles only bucket-matched pairs. Recall vs the exact
  baseline is asserted in tests/test_dedup.py.
- `ann_ivf_topk`: IVF coarse quantizer (deterministic centroid codebook)
  → inverted-list equi-join on the query's NPROBE nearest lists → exact
  rerank. The second bucketed scale strategy; full-funnel DuckDB oracle.
- `dedup_embedding_cosine`: near-dup PAIRS (not top-k) via multi-assignment
  IVF blocking + exact cosine >= TAU. The task brief's embedding-cosine
  dedup method; full-funnel oracle + brute-force-coverage pytest.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T

N_QUERIES = 8
K = 5
DIM = 64
N_PLANES = 6


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cos(a, b):
    """In-order-fold cosine of two array<double> columns (the exact
    arithmetic DuckDB's list_aggregate sum twin reproduces)."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _cosine_cols():
    dot = _dot("qe", "ce")
    na = _dot("qe", "qe")
    nb = _dot("ce", "ce")
    return dot / (F.sqrt(na) * F.sqrt(nb))


_COS_SQL_EXPR = """
  list_aggregate(list_transform(list_zip(qe, ce), x -> x[1] * x[2]), 'sum')
  / (sqrt(list_aggregate(list_transform(list_zip(qe, qe), x -> x[1] * x[2]), 'sum'))
   * sqrt(list_aggregate(list_transform(list_zip(ce, ce), x -> x[1] * x[2]), 'sum')))
"""

_ANN_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
s AS (SELECT query_id, neighbor_id, {_COS_SQL_EXPR} AS cosine
      FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
r AS (SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rn
      FROM s)
SELECT query_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rn
FROM r WHERE rn <= {K}
"""


@query("ann_cosine_topk", oracle=_ANN_SQL)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = T(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qe"),
    )
    c = em.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("ce"),
    )
    win = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine_cols())
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


# --- embedding-cosine near-dup (dedup over the vector space) ---------------------

NLIST = 16         # IVF coarse-quantizer lists
NPROBE = 5         # lists probed per query (ann_ivf_topk) — with the
#                    trained codebook on this near-uniform corpus (no real
#                    cluster structure; max pair cosine ≈ 0.5), 5 of 16
#                    lists give measured recall ≥ 0.925 at sf0.001/sf0.01
TAU = 0.4          # near-dup cosine threshold on this corpus
ASSIGN_MULTI = 2   # lists each vector blocks into (multi-assignment IVF dedup)

# --- deterministic distributed k-means codebook (Lloyd iterations) ---------------

KMEANS_ITERS = 2
Q_BITS = 24        # centroid-update quantization: coords enter the mean as
#                    rint(v·2^24) int64 — integer sums are exact and
#                    order-free, so the distributed partial-sum reduce is
#                    bit-identical to a single-process pass (the same
#                    scaled-int identity idea as the R4 coordinate packing)


def _assign_np(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid id per row by cosine, ties to the lowest cid.
    Dot products and norms accumulate STRICTLY in dimension order (one
    vectorized add per dimension, never np.sum's pairwise tree, never
    BLAS) — the identical left-to-right IEEE fold as the SQL oracle's
    list_aggregate sum, so engine training and the symbolic DuckDB
    k-means CTEs assign every vector to the same list bit-for-bit,
    regardless of how rows are batched across partitions."""
    n, dim = vecs.shape
    vn = np.zeros(n, np.float64)
    for d in range(dim):
        vn += vecs[:, d] * vecs[:, d]
    cos = np.empty((n, len(cents)), np.float64)
    for c in range(len(cents)):
        acc = np.zeros(n, np.float64)
        cn = 0.0
        for d in range(dim):
            acc += vecs[:, d] * cents[c, d]
            cn += cents[c, d] * cents[c, d]
        cos[:, c] = acc / (np.sqrt(vn) * np.sqrt(cn))
    return np.argmax(cos, axis=1).astype(np.int64)


def _kmeans_np(vecs: np.ndarray, nlist: int, iters: int) -> list[list[float]]:
    """Single-process reference trainer: init = first nlist vectors (by
    vec_id), then Lloyd iterations with _assign_np assignment and the
    exact quantized-integer mean — centroid[d] = Σ rint(v_d·2^Q_BITS) /
    (count·2^Q_BITS), the division correctly rounded (Python int/int).
    Empty lists keep their previous centroid. Every step is order-free, so
    train_ivf_codebook reproduces this bit-for-bit distributively."""
    cents = vecs[:nlist].astype(np.float64).copy()
    for _ in range(iters):
        a = _assign_np(vecs, cents)
        q = np.rint(vecs * float(1 << Q_BITS)).astype(np.int64)
        new = []
        for c in range(nlist):
            m = a == c
            cnt = int(m.sum())
            if cnt == 0:
                new.append([float(v) for v in cents[c]])
            else:
                s = q[m].sum(axis=0)  # int64-exact: n·2^24·|v| ≪ 2^63
                new.append([int(v) / (cnt << Q_BITS) for v in s])
        cents = np.array(new, np.float64)
    return [list(map(float, c)) for c in cents]


def train_ivf_codebook(
    emd: DataFrame, nlist: int = NLIST, iters: int = KMEANS_ITERS
) -> list[list[float]]:
    """Distributed deterministic k-means over an (vec_id, e:array<double>)
    frame: per iteration one mapInPandas pass emits per-partition integer
    partial sums (nlist rows each), the driver reduces them in exact
    Python-int arithmetic and re-broadcasts the new centroids through the
    next pass's closure. Bit-identical to _kmeans_np on the same rows —
    the oracle inlines the reference trainer's centroids as literals and
    the funnel stays bit-exact. Scale shape: training data never leaves
    the executors; the collect is nlist × n_partitions tiny rows."""
    init = emd.filter(F.col("vec_id") < nlist).orderBy("vec_id").collect()
    cents = np.array([r["e"] for r in init], np.float64)
    dim = cents.shape[1]
    for _ in range(iters):
        cl = cents

        def kernel(batches: Iterator[pd.DataFrame], cl=cl) -> Iterator[pd.DataFrame]:
            sums = np.zeros((nlist, dim), np.int64)
            cnts = np.zeros(nlist, np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                vecs = np.stack(pdf["e"].to_list()).astype(np.float64)
                a = _assign_np(vecs, cl)
                q = np.rint(vecs * float(1 << Q_BITS)).astype(np.int64)
                np.add.at(sums, a, q)
                cnts += np.bincount(a, minlength=nlist)
            yield pd.DataFrame(
                {"cid": np.arange(nlist), "cnt": cnts, "qsum": list(sums)}
            )

        parts = emd.select("vec_id", "e").mapInPandas(
            kernel, "cid long, cnt long, qsum array<long>"
        ).collect()
        tot = [[0] * dim for _ in range(nlist)]
        cnt = [0] * nlist
        for r in parts:
            c = r["cid"]
            cnt[c] += r["cnt"]
            tc = tot[c]
            for d, v in enumerate(r["qsum"]):
                tc[d] += v
        new = []
        for c in range(nlist):
            if cnt[c] == 0:
                new.append([float(v) for v in cents[c]])
            else:
                new.append([t / (cnt[c] << Q_BITS) for t in tot[c]])
        cents = np.array(new, np.float64)
    return [list(map(float, c)) for c in cents]


def _cent_cte() -> str:
    """The trained-codebook CTE chain for the IVF oracles — the whole
    k-means training re-derived SYMBOLICALLY in SQL from the `emb` CTE
    (so the oracle is correct at every scale factor, not just the one
    some literals were computed from):

    - cent_0 = the first NLIST corpus vectors (the engine's seeded init);
    - per iteration: assignment by the in-order-fold cosine (identical
      IEEE fold to _assign_np's dimension-order accumulation), ties to
      the lowest cid via (cos DESC, cid) ROW_NUMBER;
    - centroid update as the exact quantized-integer mean:
      SUM(CAST(round_even(v·2^Q_BITS) AS BIGINT)) / (count·2^Q_BITS) —
      round_even is np.rint; the BIGINT sums are exact, and both sides of
      the division stay below 2^53 at these corpus sizes, so DuckDB's
      double division equals Python's correctly-rounded int/int;
    - empty lists keep their previous centroid (LEFT JOIN + COALESCE)."""
    q = 1 << Q_BITS
    ctes = [
        f"cent_0(cid, ce) AS (SELECT vec_id, e FROM emb WHERE vec_id < {NLIST})"
    ]
    for it in range(KMEANS_ITERS):
        prev = f"cent_{it}"
        assign_cos = _COS_SQL_EXPR.replace("qe", "m.e").replace("ce", "c.ce")
        ctes.append(f"""asgr_{it} AS (
  SELECT m.vec_id, m.e, c.cid,
         ROW_NUMBER() OVER (PARTITION BY m.vec_id
                            ORDER BY {assign_cos} DESC, c.cid) AS rn
  FROM emb m CROSS JOIN {prev} c
)""")
        ctes.append(f"asg_{it} AS (SELECT vec_id, e, cid FROM asgr_{it} WHERE rn = 1)")
        ctes.append(f"cnt_{it} AS (SELECT cid, COUNT(*) AS n FROM asg_{it} GROUP BY 1)")
        ctes.append(f"""qs_{it} AS (
  SELECT cid, d, SUM(CAST(round_even(u * {q}, 0) AS BIGINT)) AS s
  FROM (SELECT cid, unnest(e) AS u, unnest(range(1, {DIM} + 1)) AS d
        FROM asg_{it})
  GROUP BY 1, 2
)""")
        ctes.append(f"""newc_{it} AS (
  SELECT q.cid, LIST(q.s / (c.n * {q}) ORDER BY q.d) AS ce
  FROM qs_{it} q JOIN cnt_{it} c USING (cid) GROUP BY 1
)""")
        ctes.append(f"""cent_{it + 1}(cid, ce) AS (
  SELECT p.cid, COALESCE(n.ce, p.ce) FROM {prev} p LEFT JOIN newc_{it} n USING (cid)
)""")
    ctes.append(f"cent AS (SELECT cid, ce FROM cent_{KMEANS_ITERS})")
    return ",\n".join(ctes)


def _runtime_centroids(spark: SparkSession, emd: DataFrame) -> DataFrame:
    """Train the codebook on the runtime corpus and lift it into a tiny
    (cid, ce) DataFrame for the broadcast assignment join."""
    cents = train_ivf_codebook(emd)
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cid long, ce array<double>"
    )


def _dedup_emb_oracle() -> str:
    """Full-funnel DuckDB twin: same trained centroids (inlined literals),
    same top-ASSIGN_MULTI list blocking on BOTH sides, same threshold on
    the same in-order cosine."""
    assign_cos = _COS_SQL_EXPR.replace("qe", "m.e").replace("ce", "c.ce")
    pair_cos = _COS_SQL_EXPR.replace("qe", "qa.e").replace("ce", "cb.e")
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
{_cent_cte()},
ranked_lists AS (
  SELECT m.vec_id, c.cid,
         ROW_NUMBER() OVER (PARTITION BY m.vec_id
                            ORDER BY {assign_cos} DESC, c.cid) AS rn
  FROM emb m CROSS JOIN cent c
),
blocks AS (SELECT vec_id, cid FROM ranked_lists WHERE rn <= {ASSIGN_MULTI}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM blocks a JOIN blocks b USING (cid)
  WHERE a.vec_id < b.vec_id
)
SELECT cd.id_a, cd.id_b, {pair_cos} AS cosine
FROM cand cd
JOIN emb qa ON qa.vec_id = cd.id_a
JOIN emb cb ON cb.vec_id = cd.id_b
WHERE {pair_cos} >= {TAU}
ORDER BY id_a, id_b
"""


@query("dedup_embedding_cosine", oracle=_dedup_emb_oracle())
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (task brief's fifth dedup
    method): block the corpus into its top-ASSIGN_MULTI nearest IVF lists
    (multi-assignment buys cross-boundary recall), generate candidates by
    list equi-join, keep pairs with exact cosine >= TAU. Never all-pairs:
    the list join is the only shuffle and candidates are ~(ASSIGN_MULTI^2 /
    NLIST) of the square. Recall vs brute force is asserted in
    tests/test_dedup.py; the driver oracle re-derives the full funnel."""
    em = T(spark, sf_dir, "embeddings")
    emd = em.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    cent = _runtime_centroids(spark, emd)
    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), "cid")
    blocks = (
        emd.crossJoin(F.broadcast(cent))
        .select("vec_id", "e", "cid", _cos(F.col("e"), F.col("ce")).alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= ASSIGN_MULTI)
        .select("vec_id", "cid", "e")
    )
    a = blocks.select("cid", F.col("vec_id").alias("id_a"), F.col("e").alias("ea"))
    b = blocks.select("cid", F.col("vec_id").alias("id_b"), F.col("e").alias("eb"))
    return (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", _cos(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= TAU)
        .select("id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
    )


# --- LSH-bucketed scale path -----------------------------------------------------

def _planes() -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(77))
    return rng.standard_normal((N_PLANES, DIM))


def _sign_bucket(vecs: np.ndarray) -> np.ndarray:
    proj = vecs @ _planes().T
    bits = (proj > 0).astype(np.int64)
    return (bits * (1 << np.arange(N_PLANES, dtype=np.int64))[None, :]).sum(axis=1)


def lsh_buckets(df: DataFrame, id_col: str, multiprobe: bool) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack(pdf["embedding"].to_list()).astype(np.float64)
            base = _sign_bucket(vecs)
            if multiprobe:
                # probe the bucket plus every 1- and 2-bit flip (query side
                # only): cheap recall for near-uniform embeddings, where a
                # single sign flip is common among true neighbors
                masks = [np.int64(0)]
                masks += [np.int64(1 << i) for i in range(N_PLANES)]
                masks += [
                    np.int64((1 << i) | (1 << j))
                    for i in range(N_PLANES)
                    for j in range(i + 1, N_PLANES)
                ]
                m = np.array(masks, np.int64)
                buckets = base[:, None] ^ m[None, :]
            else:
                buckets = base[:, None]
            n_b = buckets.shape[1]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_b),
                    "embedding": [e for e in pdf["embedding"] for _ in range(n_b)],
                    "bucket": buckets.ravel(),
                }
            )

    return df.mapInPandas(kernel, f"{id_col} long, embedding array<float>, bucket long")


def _ann_lsh_oracle() -> str:
    """DuckDB twin of the LSH funnel: the deterministic hyperplanes are
    inlined as double literals (repr round-trips exactly), buckets are
    sign-of-in-order-dot (verified sign-identical to numpy's dgemm on this
    corpus, min |projection| ≈ 1e-4 ≫ fp error), multiprobe masks are the
    same 0/1/2-bit flips, and the rerank is the in-order cosine fold shared
    with ann_cosine_topk."""
    planes = _planes()
    plane_rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(p, ", ".join(repr(v) for v in planes[p]))
        for p in range(N_PLANES)
    )
    masks = [0] + [1 << i for i in range(N_PLANES)] + [
        (1 << i) | (1 << j) for i in range(N_PLANES) for j in range(i + 1, N_PLANES)
    ]
    mask_rows = ", ".join(f"({m})" for m in masks)
    return f"""
WITH planes(p, pv) AS (VALUES
    {plane_rows}
),
emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
proj AS (
  SELECT m.vec_id, pl.p,
         list_aggregate(list_transform(list_zip(m.e, pl.pv), x -> x[1] * x[2]), 'sum') AS d
  FROM emb m, planes pl
),
bucket0 AS (
  SELECT vec_id, SUM(CASE WHEN d > 0 THEN 1 << p ELSE 0 END) AS b
  FROM proj GROUP BY 1
),
masks(mk) AS (VALUES {mask_rows}),
qb AS (
  SELECT b0.vec_id AS query_id, xor(b0.b, m.mk) AS bucket
  FROM bucket0 b0, masks m WHERE b0.vec_id < {N_QUERIES}
),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
  FROM qb q JOIN bucket0 c ON c.b = q.bucket
  WHERE q.query_id <> c.vec_id
),
scored AS (
  SELECT cd.query_id, cd.neighbor_id,
         {_COS_SQL_EXPR.replace('qe', 'qa.e').replace('ce', 'cb.e')} AS cosine
  FROM cand cd
  JOIN emb qa ON qa.vec_id = cd.query_id
  JOIN emb cb ON cb.vec_id = cd.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= {K}
ORDER BY query_id, rn
"""


# --- IVF-bucketed scale path (constants NLIST/NPROBE defined above) --------------

def _ann_ivf_oracle() -> str:
    """DuckDB twin of the IVF funnel: same trained centroids (inlined
    literals from the _kmeans_np reference pass over sf0.01), same
    in-order-fold cosine for assignment, probing, and rerank, same
    (cosine DESC, id) tie-breaks."""
    assign_cos = _COS_SQL_EXPR.replace("qe", "m.e").replace("ce", "c.ce")
    rerank_cos = _COS_SQL_EXPR.replace("qe", "qa.e").replace("ce", "cb.e")
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
{_cent_cte()},
scored AS (
  SELECT m.vec_id, c.cid, {assign_cos} AS cos
  FROM emb m CROSS JOIN cent c
),
ranked_lists AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
  FROM scored
),
assign AS (SELECT vec_id, cid FROM ranked_lists WHERE rn = 1),
probe AS (
  SELECT vec_id AS query_id, cid FROM ranked_lists
  WHERE rn <= {NPROBE} AND vec_id < {N_QUERIES}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probe p JOIN assign a USING (cid)
  WHERE a.vec_id <> p.query_id
),
rescored AS (
  SELECT cd.query_id, cd.neighbor_id, {rerank_cos} AS cosine
  FROM cand cd
  JOIN emb qa ON qa.vec_id = cd.query_id
  JOIN emb cb ON cb.vec_id = cd.neighbor_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(rn AS INTEGER) AS rn
FROM (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rn
  FROM rescored
) WHERE rn <= {K}
ORDER BY query_id, rn
"""


@query("ann_ivf_topk", oracle=_ann_ivf_oracle())
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into NLIST inverted lists
    (assignment = nearest centroid by cosine), probe each query's NPROBE
    closest lists, exact-rerank only the candidates. The 10^12-row shape:
    assignment is one map-side pass against a broadcast centroid table with
    a partial-aggregable max(struct) argmax (no corpus-wide sort), the only
    real shuffle is the list-id equi-join, and rerank touches ~NPROBE/NLIST
    of the corpus. Centroids are a trained k-means codebook
    (train_ivf_codebook: deterministic first-NLIST init + KMEANS_ITERS
    Lloyd rounds of exact quantized-integer partial sums), so list quality
    is data-adaptive while the whole funnel stays bit-reproducible.
    Complements ann_lsh_topk (hyperplane buckets) as the second bucketed
    ANN strategy from the task brief."""
    em = T(spark, sf_dir, "embeddings")
    emd = em.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    cent = _runtime_centroids(spark, emd)
    scored = emd.crossJoin(F.broadcast(cent)).select(
        "vec_id", "e", "cid", _cos(F.col("e"), F.col("ce")).alias("cos")
    )
    # argmax without a window: max(struct(cos, -cid)) is map-side partial
    assign = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cos"), (-F.col("cid")).alias("ncid"))).alias("m"),
        F.first("e").alias("e"),  # functionally dependent on vec_id
    ).select("vec_id", (-F.col("m.ncid")).alias("cid"), "e")
    probe_w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), "cid")
    probe = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= NPROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), "cid")
    )
    cand = (
        probe.join(assign.withColumnRenamed("vec_id", "neighbor_id")
                   .withColumnRenamed("e", "ce"), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    win = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        cand.withColumn("cosine", _cos(F.col("qe"), F.col("ce")))
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= K)
        .select("query_id", "neighbor_id", "cosine", "rn")
        .orderBy("query_id", "rn")
    )


@query("ann_lsh_topk", oracle=_ann_lsh_oracle())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = T(spark, sf_dir, "embeddings")
    q = lsh_buckets(
        em.filter(F.col("vec_id") < N_QUERIES).withColumnRenamed("vec_id", "query_id")
        .select("query_id", "embedding"),
        "query_id",
        multiprobe=True,
    ).withColumnRenamed("embedding", "qe_raw")
    c = lsh_buckets(
        em.withColumnRenamed("vec_id", "neighbor_id").select("neighbor_id", "embedding"),
        "neighbor_id",
        multiprobe=False,
    ).withColumnRenamed("embedding", "ce_raw")
    cand = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("qe", F.transform("qe_raw", lambda x: x.cast("double")))
        .withColumn("ce", F.transform("ce_raw", lambda x: x.cast("double")))
    )
    win = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        cand.withColumn("cosine", _cosine_cols())
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


# --- kNN majority-vote label classification (label propagation primitive) -------

N_CLS_PROBES = 20
CLS_K = 7

_KNN_CLASSIFY_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, label AS true_label,
                  CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id >= 100 AND vec_id < {100 + N_CLS_PROBES}),
c AS (SELECT vec_id AS neighbor_id, label, CAST(embedding AS DOUBLE[]) AS ce
      FROM embeddings),
s AS (SELECT query_id, true_label, neighbor_id, label, {_COS_SQL_EXPR} AS cosine
      FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
r AS (SELECT query_id, true_label, label, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rn
      FROM s),
votes AS (SELECT query_id, true_label, label, COUNT(*) AS n_votes
          FROM r WHERE rn <= {CLS_K} GROUP BY 1, 2, 3),
best AS (SELECT query_id, true_label, label AS pred_label, n_votes,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, label) AS vr
         FROM votes)
SELECT query_id, pred_label, CAST(n_votes AS BIGINT) AS n_votes, true_label
FROM best WHERE vr = 1 ORDER BY query_id
"""


@query("ann_knn_classify", oracle=_KNN_CLASSIFY_SQL)
def ann_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote label prediction over the embedding corpus — the
    label-propagation / quality-classifier primitive of a training-data
    pipeline (predict a label for unlabeled rows from their nearest
    labeled neighbors). Ties break to the smaller label, neighbor-rank
    ties to the smaller vec_id — the result is a deterministic total
    order, so the DuckDB twin reproduces it bit-exactly.

    Scale shape: same as ann_cosine_topk — the probe batch broadcasts,
    the corpus scan stays map-side, and only probe×K vote rows shuffle
    into the tiny vote aggregation. The corpus-scan stage swaps for the
    IVF path (ann_ivf_topk) unchanged when the corpus outgrows a scan."""
    em = T(spark, sf_dir, "embeddings")
    q = em.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + N_CLS_PROBES)).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qe"),
    )
    c = em.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("ce"),
    )
    win = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    topk = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine_cols())
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= CLS_K)
    )
    votes = topk.groupBy("query_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    vwin = W.partitionBy("query_id").orderBy(F.col("n_votes").desc(), "label")
    return (
        votes.withColumn("vr", F.row_number().over(vwin))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            F.col("label").alias("pred_label"),
            "n_votes",
            "true_label",
        )
        .orderBy("query_id")
    )


# --- per-label centroids (prototype embeddings) ----------------------------------

_CENTROID_SQL = f"""
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
dims AS (
  SELECT label, d, u
  FROM (SELECT label, unnest(ce) AS u, unnest(range(1, {DIM} + 1)) AS d FROM e)
)
SELECT label, CAST(d AS INT) AS dim,
       CAST(SUM(CAST(u AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS centroid,
       COUNT(*) AS n_vecs
FROM dims GROUP BY 1, 2 ORDER BY label, dim
"""


@query("embedding_centroids", oracle=_CENTROID_SQL)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class prototypes) — the building block of
    centroid classifiers, drift monitors, and coreset selection. Exact
    across engines: each coordinate is rounded to DECIMAL(30,6) before the
    sum (deterministic round of an IEEE double), summed exactly in any
    order, then one double division — the dsum pattern applied per
    dimension. Scale shape: posexplode → ONE partial-aggregable groupBy on
    (label, dim); no window, no collect."""
    from pyspark.sql.types import DecimalType

    em = T(spark, sf_dir, "embeddings")
    dims = em.select(
        "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "d0", "u"
        ),
    )
    return (
        dims.groupBy("label", (F.col("d0") + 1).cast("int").alias("dim"))
        .agg(
            (
                F.sum(F.col("u").cast(DecimalType(30, 6))).cast("double")
                / F.count(F.lit(1))
            ).alias("centroid"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .orderBy("label", "dim")
    )


# --- int8 scalar quantization ---------------------------------------------------

_QUANT_SQL = """
WITH x AS (
  SELECT vec_id,
         unnest(range(len(embedding))) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
mx AS (SELECT pos, MAX(abs(v)) AS maxabs FROM x GROUP BY pos)
SELECT x.vec_id, x.pos,
       CAST(CASE WHEN mx.maxabs = 0 THEN 0
                 ELSE floor(x.v * 127 / mx.maxabs) END AS BIGINT) AS q
FROM x JOIN mx ON x.pos = mx.pos
"""


@query("embedding_quantize_int8", oracle=_QUANT_SQL)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension symmetric int8 scalar quantization — the compression
    pass before an ANN index ships (4x smaller vectors, SIMD int8 dot
    products). Two passes: a tiny per-dimension max-abs aggregate (64 rows,
    partial-aggregable) broadcast back over the map-side explode. floor()
    instead of round() keeps both engines bit-identical (the v*127/maxabs
    double is IEEE-exact on both; round-half-to-even vs half-away would
    not matter here but floor is unambiguous)."""
    e = T(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "vf")
    ).select("vec_id", F.col("pos").cast("long").alias("pos"), F.col("vf").cast("double").alias("v"))
    mx = x.groupBy("pos").agg(F.max(F.abs("v")).alias("maxabs"))
    q = (
        F.when(F.col("maxabs") == 0, F.lit(0).cast("long"))
        .otherwise(F.floor(F.col("v") * 127 / F.col("maxabs")))
    )
    return x.join(F.broadcast(mx), "pos").select("vec_id", "pos", q.alias("q"))


# --- top principal component by power iteration -------------------------------

PCA_DIM = 64
PCA_ITERS = 3
_PCA_SCALE = 10**9  # |x·dot| ≲ 10, n = corpus size → int64 headroom ≥ 1e6 rows


def _dot_chain_sql(vec: str, vlist: str) -> str:
    """Explicit left-associated 64-term chain `v[1]*x[1] + … + v[64]*x[64]`
    — SQL's + parses left-assoc, matching the engine's sequential fold, so
    the accumulation ORDER (and therefore every IEEE intermediate) is
    pinned across engines."""
    return " + ".join(f"{vec}[{d}] * {vlist}[{d}]" for d in range(1, PCA_DIM + 1))


def _norm_chain_sql(ul: str) -> str:
    return " + ".join(f"{ul}[{d}] * {ul}[{d}]" for d in range(1, PCA_DIM + 1))


def _pca_iter_sql(prev_v: str, out_v: str) -> str:
    return f""",
d_{out_v} AS (
  SELECT e.x, {_dot_chain_sql('e.x', f'{prev_v}.vl')} AS dot
  FROM e CROSS JOIN {prev_v}
),
u_{out_v} AS (
  SELECT g.dim,
         CAST(SUM(CAST(floor(x[g.dim] * dot * {_PCA_SCALE}) AS BIGINT))
              AS DOUBLE) / {_PCA_SCALE} AS u
  FROM d_{out_v}, (SELECT unnest(range(1, {PCA_DIM + 1})) AS dim) g
  GROUP BY 1
),
ul_{out_v} AS (SELECT list(u ORDER BY dim) AS ul FROM u_{out_v}),
{out_v} AS (
  SELECT list_transform(ul, y -> y / sqrt({_norm_chain_sql('ul')})) AS vl
  FROM ul_{out_v}
)"""


_PCA_SQL = (
    f"""
WITH e AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x FROM embeddings
),
v0 AS (SELECT [{', '.join(['0.125'] * PCA_DIM)}]::DOUBLE[] AS vl)"""
    + "".join(_pca_iter_sql(f"v{i}", f"v{i + 1}") for i in range(PCA_ITERS))
    + f"""
SELECT g.dim, vl[g.dim] AS loading
FROM v{PCA_ITERS}, (SELECT unnest(range(1, {PCA_DIM + 1})) AS dim) g
ORDER BY g.dim
"""
)


@query("embedding_pca_power", oracle=_PCA_SQL)
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by {PCA_ITERS}
    power iterations from the exact v₀ = 1/√{PCA_DIM} = 0.125 constant
    vector (no centering — the Gram top eigenvector, as ANN preprocessing
    uses it). Each iteration's heavy O(n·d) stage is fully distributed:
    per-row dots are an explicit left-folded 64-term chain (accumulation
    order pinned engine↔oracle), and uₖ = Σᵢ xᵢ(xᵢ·v) sums per dimension
    with each term floor-scaled to int64 at 1e-9 — the PageRank pattern
    that makes the reduction independent of partitioning AND bit-equal in
    DuckDB. Only the O(d) normalize runs on the driver between iterations
    (64 values — the standard power-iteration broadcast step; its folds
    replay the oracle's explicit chains term for term), and v feeds back
    as literals exactly like the IVF centroid pattern."""
    e = T(spark, sf_dir, "embeddings").select(
        F.transform("embedding", lambda x: x.cast("double")).alias("x")
    )
    v = pca_power_vector(e, PCA_ITERS)
    out = spark.createDataFrame(
        [(d + 1, v[d]) for d in range(PCA_DIM)], "dim long, loading double"
    )
    return out.orderBy("dim")


def pca_power_vector(e: DataFrame, iters: int) -> list[float]:
    """The power-iteration core over a frame with one double-array column
    `x` (length PCA_DIM) — split out so tests can feed a PLANTED
    dominant-direction corpus. NOTE the operator contract is the
    fixed-iteration ITERATE, not the converged eigenvector: on a
    near-isotropic corpus (the synthetic embeddings have λ₂/λ₁ ≈ 0.984)
    no reasonable iteration count converges, and the exactness claim is
    about the iteration algebra; with a real spectral gap a handful of
    iterations reach the top PC (pytest pins cos > 0.99 on a planted
    gap)."""
    import math

    v = [0.125] * PCA_DIM
    for _ in range(iters):
        dot = None
        for d in range(PCA_DIM):
            term = F.element_at("x", d + 1) * F.lit(v[d])
            dot = term if dot is None else dot + term
        rows = e.select("x", dot.alias("dot"))
        exploded = rows.select(F.posexplode("x").alias("dim0", "xd"), "dot")
        u_rows = (
            exploded.groupBy((F.col("dim0") + 1).alias("dim"))
            .agg(
                F.sum(
                    F.floor(F.col("xd") * F.col("dot") * F.lit(_PCA_SCALE)).cast(
                        "long"
                    )
                ).alias("acc")
            )
            .collect()
        )
        u = [0.0] * PCA_DIM
        for r in u_rows:
            u[r["dim"] - 1] = r["acc"] / _PCA_SCALE
        # norm: same left-folded chain as the oracle's generated SQL
        acc = 0.0
        for d in range(PCA_DIM):
            acc = acc + u[d] * u[d]
        nrm = math.sqrt(acc)
        v = [ud / nrm for ud in u]
    return v


# --- product quantization (PQ) + asymmetric-distance search -----------------------

PQ_M = 4        # subspaces (64-dim embeddings → 16 dims each)
PQ_SUBDIM = 16
PQ_KSUB = 16    # codewords per subspace → 4×4-bit codes, 16× compression
#                 vs float32 (64·4 B → 4·0.5 B codes) — the memory math that
#                 makes 10^12-vector ANN fit a cluster at all
PQ_QUERIES = 8


def _pq_oracle() -> str:
    """DuckDB twin of the full PQ funnel. Codebooks are TRAINING-FREE by
    construction (codeword j of subspace m = the slice of corpus vector j —
    the deterministic seeding the IVF trainer also uses for init), so the
    whole funnel — encode, distance tables, ADC — re-derives symbolically.
    Every L2² is the in-order list fold (bit-exact vs F.aggregate); the
    4-term ADC sum is an EXPLICIT m-ordered + chain (never a SUM aggregate,
    whose accumulation order neither engine pins); ADC rounds to 12 dp on
    both sides (the supplier_wilson lesson: never ship last-ULP doubles
    through the contract)."""
    terms = " + ".join(
        f"MAX(CASE WHEN q.m = {m} THEN q.d2 END)" for m in range(PQ_M)
    )
    return f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
sub AS (
  SELECT vec_id, m.range AS m,
         e[m.range * {PQ_SUBDIM} + 1 : m.range * {PQ_SUBDIM} + {PQ_SUBDIM}] AS se
  FROM emb, range(0, {PQ_M}) m
),
cw AS (SELECT vec_id AS code, m, se AS ce FROM sub WHERE vec_id < {PQ_KSUB}),
dist AS (
  SELECT s.vec_id, s.m, c.code,
         list_aggregate(list_transform(list_zip(s.se, c.ce),
                        x -> (x[1] - x[2]) * (x[1] - x[2])), 'sum') AS d2
  FROM sub s JOIN cw c USING (m)
),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, code ASC) AS rn
    FROM dist) WHERE rn = 1
),
qdist AS (SELECT vec_id AS query_id, m, code, d2 FROM dist WHERE vec_id < {PQ_QUERIES}),
adc AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, ROUND({terms}, 12) AS adc_dist
  FROM codes c JOIN qdist q ON q.m = c.m AND q.code = c.code
  WHERE c.vec_id <> q.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_dist, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT query_id, neighbor_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_dist ASC, neighbor_id) AS rn
  FROM adc
) WHERE rn <= {K}
ORDER BY query_id, rn
"""


@query("ann_pq_topk", oracle=_pq_oracle())
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (the Jégou PQ/ADC pipeline): slice each
    64-dim embedding into {PQ_M} subspaces, encode every corpus vector as
    its nearest codeword per subspace (4-bit codes — 16× smaller than the
    float vectors), then answer queries by ASYMMETRIC distance: one
    16-entry distance table per (query, subspace), approx distance =
    m-ordered sum of table lookups — the corpus floats are never touched
    at query time.

    Scale shape at 10^12 vectors: encoding is one broadcast join of the
    tiny codebook ({PQ_M}·{PQ_KSUB} codewords) against the corpus slices
    — map-side, one pass, emits 4 small ints per vector; the code table
    (not the vectors) is what the search scans, and the per-query distance
    tables are {PQ_M}·{PQ_KSUB} doubles broadcast with the probe. The
    final top-k is a per-query window over ADC scores — the same bounded
    rank every ANN variant here ends with. In-order folds + m-ordered ADC
    chain keep the whole funnel bit-exact against the symbolic oracle."""
    em = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    slices = F.array(
        *[F.slice("e", m * PQ_SUBDIM + 1, PQ_SUBDIM) for m in range(PQ_M)]
    )
    sub = em.select("vec_id", F.posexplode(slices).alias("m", "se"))
    cw = sub.filter(F.col("vec_id") < PQ_KSUB).select(
        F.col("vec_id").alias("code"), "m", F.col("se").alias("ce")
    )
    l2 = F.aggregate(
        F.zip_with("se", "ce", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dist = sub.join(F.broadcast(cw), "m").select(
        "vec_id", "m", "code", l2.alias("d2")
    )
    w_code = W.partitionBy("vec_id", "m").orderBy(F.col("d2").asc(), F.col("code").asc())
    codes = (
        dist.withColumn("rn", F.row_number().over(w_code))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "code")
    )
    qdist = dist.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), "m", "code", "d2"
    )
    adc_sum = None
    for m in range(PQ_M):
        term = F.max(F.when(F.col("m") == m, F.col("d2")))
        adc_sum = term if adc_sum is None else adc_sum + term
    adc = (
        codes.join(F.broadcast(qdist), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(adc_sum, 12).alias("adc_dist"))
    )
    w_rank = W.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        adc.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= K)
        .select("query_id", "neighbor_id", "adc_dist", "rn")
        .orderBy("query_id", "rn")
    )
