"""Deduplication operators over documents — the training-data pipeline's
core sweep (task brief): exact hash-dedup (DuckDB-oracled), MinHash+LSH,
SimHash, and char-n-gram Jaccard near-dup scoring.

Near-dup fixtures are built by unioning documents with deterministically
mutated copies (doc_id + MUT_OFFSET, a few tokens appended), so every
candidate-pair method has known ground truth that pytest checks against a
pandas oracle (tests/test_dedup.py).

Scale shape: shingle→minhash is a per-row Arrow kernel (no shuffle);
banding explodes each doc into BANDS rows and groups by (band, band_hash) —
the classic LSH bucket join whose shuffle keys are uniformly distributed by
construction, so no salting is needed here.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T

MUT_OFFSET = 1_000_000
N_MUTATED = 50

N_PERM = 64
BANDS = 16  # 16 bands × 4 rows/band
ROWS_PER_BAND = N_PERM // BANDS
SHINGLE = 5

_MERS = np.uint64((1 << 61) - 1)


def _mutated_corpus(d: DataFrame) -> DataFrame:
    """documents ∪ near-dup copies of doc_id < N_MUTATED (suffix appended)."""
    mut = (
        d.filter(F.col("doc_id") < N_MUTATED)
        .select(
            (F.col("doc_id") + MUT_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" mutated suffix token")).alias("text"),
        )
    )
    return d.select("doc_id", "text").unionByName(mut)


# --- exact dedup (oracled) ---------------------------------------------------

@query(
    "dedup_exact",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {MUT_OFFSET}, text FROM documents WHERE doc_id < {N_MUTATED}
    )
    SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM corpus GROUP BY md5(text) ORDER BY keep_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    dup = d.filter(F.col("doc_id") < N_MUTATED).select(
        (F.col("doc_id") + MUT_OFFSET).alias("doc_id"), "text"
    )
    corpus = d.select("doc_id", "text").unionByName(dup)
    return (
        corpus.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keep_id")
    )


# --- MinHash -------------------------------------------------------------------

def _shingle_hashes(text: str) -> np.ndarray:
    """Distinct 5-char shingle hashes (FNV-1a 64) of one document."""
    b = text.encode("utf-8")
    if len(b) < SHINGLE:
        b = b + b"\x00" * (SHINGLE - len(b))
    arr = np.frombuffer(b, np.uint8)
    n = len(arr) - SHINGLE + 1
    h = np.full(n, 0xCBF29CE484222325, np.uint64)
    prime = np.uint64(0x100000001B3)
    for k in range(SHINGLE):
        h = (h ^ arr[k : k + n].astype(np.uint64)) * prime
    return np.unique(h)


_PERM_A = None
_PERM_B = None


def _perms() -> tuple[np.ndarray, np.ndarray]:
    global _PERM_A, _PERM_B
    if _PERM_A is None:
        rng = np.random.Generator(np.random.PCG64(20260816))
        _PERM_A = rng.integers(1, (1 << 61) - 1, N_PERM, dtype=np.int64).astype(np.uint64)
        _PERM_B = rng.integers(0, (1 << 61) - 1, N_PERM, dtype=np.int64).astype(np.uint64)
    return _PERM_A, _PERM_B


def minhash_signature(text: str) -> np.ndarray:
    """64 minhash values via universal hashing (a·x+b mod 2^61-1)."""
    sh = _shingle_hashes(text) % _MERS
    a, b = _perms()
    # (n_shingles, n_perm) would be large; fold per-perm with running min
    sig = np.empty(N_PERM, np.uint64)
    for p in range(N_PERM):
        v = (sh * a[p] + b[p]) % _MERS
        sig[p] = v.min()
    return sig


def minhash_candidates(corpus: DataFrame, spark: SparkSession) -> DataFrame:
    """LSH banding: docs sharing any band become candidate pairs with their
    estimated jaccard (fraction of matching minhash rows)."""

    def sig_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [minhash_signature(t).astype(np.int64).tolist() for t in pdf["text"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    sigs = corpus.mapInPandas(sig_kernel, "doc_id long, sig array<long>")
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.slice("sig", b * ROWS_PER_BAND + 1, ROWS_PER_BAND).cast("string")
            ).alias("bh"),
        )
        for b in range(BANDS)
    ]
    bands = sigs.select(
        "doc_id", "sig", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("double") / F.lit(float(N_PERM))
    return pairs.select("doc_a", "doc_b", est.alias("est_jaccard"))


@query("dedup_minhash_lsh")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mutated_corpus(T(spark, sf_dir, "documents"))
    return (
        minhash_candidates(corpus, spark)
        .filter(F.col("est_jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


# --- SimHash ---------------------------------------------------------------------

def simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    hs = np.array(
        [np.uint64(abs(hash_tok(t))) for t in toks], np.uint64
    )
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    acc = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def hash_tok(t: str) -> int:
    """Deterministic 64-bit token hash (FNV-1a; python's hash() is salted)."""
    h = 0xCBF29CE484222325
    for ch in t.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


@query("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by simhash hamming distance ≤ 6, blocked on 4 16-bit
    chunks (a pair within distance 6 can differ in at most 3 chunks... but
    4 chunks guarantee one EQUAL chunk only up to distance 3 per pigeonhole;
    we block on any-of-4-chunks equality which is exact for distance ≤ 3 and
    high-recall above)."""
    corpus = _mutated_corpus(T(spark, sf_dir, "documents"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "sh": [simhash64(t) for t in pdf["text"]]}
            )

    sh = corpus.mapInPandas(kernel, "doc_id long, sh long")
    chunk_structs = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright(F.col("sh"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("ch"),
        )
        for c in range(4)
    ]
    chunks = sh.select(
        "doc_id", "sh", F.explode(F.array(*chunk_structs)).alias("cc")
    ).select("doc_id", "sh", F.col("cc.chunk").alias("chunk"), F.col("cc.ch").alias("ch"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(b, ["chunk", "ch"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= 6)
        .orderBy("doc_a", "doc_b")
    )


# --- char n-gram jaccard (exact, on LSH candidates) --------------------------------

@query("dedup_ngram_jaccard")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-char-shingle jaccard, computed only for LSH candidate pairs —
    the verify stage of the dedup funnel (candidates → exact score)."""
    d = T(spark, sf_dir, "documents")
    corpus = _mutated_corpus(d)
    cand = minhash_candidates(corpus, spark).filter(F.col("est_jaccard") >= 0.35)
    texts = corpus.withColumnRenamed("doc_id", "tid")
    j = (
        cand.join(texts, cand.doc_a == texts.tid)
        .withColumnRenamed("text", "text_a")
        .drop("tid")
        .join(texts, cand.doc_b == texts.tid)
        .withColumnRenamed("text", "text_b")
        .drop("tid")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            jac = np.empty(len(pdf), np.float64)
            for k, (ta, tb) in enumerate(zip(pdf["text_a"], pdf["text_b"])):
                sa = _shingle_hashes(ta)
                sb = _shingle_hashes(tb)
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                jac[k] = inter / (len(sa) + len(sb) - inter)
            out = pdf[["doc_a", "doc_b"]].copy()
            out["jaccard"] = jac
            yield out

    return j.mapInPandas(kernel, "doc_a long, doc_b long, jaccard double").orderBy(
        "doc_a", "doc_b"
    )
