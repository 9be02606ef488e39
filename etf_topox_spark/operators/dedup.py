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


def minhash_batch(texts) -> np.ndarray:
    """(n_docs, N_PERM) minhash signatures via universal hashing
    (a·x+b mod 2^61-1), vectorized across the WHOLE batch — the
    simhash_batch pattern, no per-document Python loop.

    Docs concatenate into one flat byte stream (short docs zero-padded to
    SHINGLE bytes, as in the scalar definition); all shingle FNV-1a hashes
    advance one column per step over the flat stream; cross-document
    window positions are masked to a sentinel above every real value; each
    permutation's minima then fall out of ONE np.minimum.reduceat over the
    per-doc position segments. uint64 products wrap mod 2^64 before the
    `% MERS` — the HUGEINT oracle emulates exactly that wraparound.
    Duplicate shingles need no dedup: the min is multiset-invariant.
    Value-identical to the per-document scalar path (pytest-pinned).

    Measured vs the per-doc loop on this box: 1.5× at 300-char docs (the
    driver corpus shape), ~1.1× at 2000-char; SLOWER (0.6×) at 40-char —
    tiny docs keep the per-doc (36×64) broadcast in L1 while the flat
    per-permutation passes stream megabytes, so the win is Python-overhead
    removal, not arithmetic."""
    a, b = _perms()
    bs = [t.encode("utf-8") for t in texts]
    bs = [x if len(x) >= SHINGLE else x + b"\x00" * (SHINGLE - len(x)) for x in bs]
    n = len(bs)
    if n == 0:
        return np.empty((0, N_PERM), np.uint64)
    lens = np.fromiter((len(x) for x in bs), np.int64, n)
    flat = np.frombuffer(b"".join(bs), np.uint8)
    ends = np.cumsum(lens)
    starts = ends - lens
    n_pos = len(flat) - SHINGLE + 1
    h = np.full(n_pos, 0xCBF29CE484222325, np.uint64)
    prime = np.uint64(0x100000001B3)
    for k in range(SHINGLE):
        h = (h ^ flat[k : k + n_pos].astype(np.uint64)) * prime
    pos = np.arange(n_pos)
    doc_of_pos = np.searchsorted(starts, pos, side="right") - 1
    valid = pos <= ends[doc_of_pos] - SHINGLE  # window inside one doc
    sh = h[valid] % _MERS
    n_valid = lens - SHINGLE + 1  # ≥ 1 per doc (padding guarantees it)
    vstarts = np.cumsum(n_valid) - n_valid
    sig = np.empty((n, N_PERM), np.uint64)
    for j in range(N_PERM):
        v = (sh * a[j] + b[j]) % _MERS  # wraps mod 2^64 first, like the scalar
        sig[:, j] = np.minimum.reduceat(v, vstarts)
    return sig


def minhash_signature(text: str) -> np.ndarray:
    """Scalar convenience wrapper over minhash_batch (tests, oracles)."""
    return minhash_batch([text])[0]


def minhash_candidates(corpus: DataFrame, spark: SparkSession) -> DataFrame:
    """LSH banding: docs sharing any band become candidate pairs with their
    estimated jaccard (fraction of matching minhash rows)."""

    def sig_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sig = minhash_batch(pdf["text"]).astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": list(sig)})

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


def _minhash_sql_body() -> str:
    """Shared DuckDB WITH-body re-deriving the whole MinHash funnel: 5-char
    shingles (FNV-1a over ASCII chars — driver corpus verified ASCII),
    64 universal-hash minima with numpy's uint64 WRAPAROUND emulated in
    HUGEINT (the engine computes (sh*a mod 2^64 + b mod 2^64) mod M, not
    exact modular arithmetic), LSH banding by band-slice VALUE equality
    (the engine groups on xxhash64 of the slice — value-join is the same
    candidate set absent a 2^-64 hash collision)."""
    a, b = _perms()
    perm_rows = ",\n    ".join(
        f"({p}, CAST({int(a[p])} AS HUGEINT), CAST({int(b[p])} AS HUGEINT))"
        for p in range(N_PERM)
    )
    mers = int(_MERS)
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {MUT_OFFSET}, text || ' mutated suffix token'
  FROM documents WHERE doc_id < {N_MUTATED}
),
sh5 AS (
  SELECT doc_id,
         unnest(list_transform(range(length(text) - {SHINGLE - 1}),
                               i -> substr(text, i + 1, {SHINGLE}))) AS s
  FROM corpus
),
shash_full AS (
  SELECT DISTINCT doc_id,
    list_reduce(
      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        list_transform(string_split(s, ''), c -> CAST(unicode(c) AS HUGEINT))),
      (h, ch) -> (xor(h, ch) * 1099511628211) % 18446744073709551616
    ) AS h
  FROM sh5
),
shash AS (SELECT DISTINCT doc_id, h % {mers} AS sh FROM shash_full),
perms(p, pa, pb) AS (VALUES
    {perm_rows}
),
sig AS (
  SELECT s.doc_id, pm.p,
         MIN((((s.sh * pm.pa) % 18446744073709551616 + pm.pb)
              % 18446744073709551616) % {mers}) AS mv
  FROM shash s, perms pm
  GROUP BY 1, 2
),
bandsig AS (
  SELECT doc_id, p // {ROWS_PER_BAND} AS band, LIST(mv ORDER BY p) AS bs
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandsig a JOIN bandsig b ON a.band = b.band AND a.bs = b.bs
  WHERE a.doc_id < b.doc_id
),
est AS (
  SELECT c.doc_a, c.doc_b,
         CAST(SUM(CASE WHEN sa.mv = sb.mv THEN 1 ELSE 0 END) AS DOUBLE)
           / {N_PERM} AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.p = sa.p
  GROUP BY 1, 2
)
"""


_MINHASH_LSH_SQL = (
    _minhash_sql_body()
    + "SELECT doc_a, doc_b, est_jaccard FROM est "
    "WHERE est_jaccard >= 0.5 ORDER BY doc_a, doc_b"
)

_NGRAM_JACCARD_SQL = (
    _minhash_sql_body()
    + f""",
counts AS (SELECT doc_id, COUNT(*) AS n FROM shash_full GROUP BY 1),
inter AS (
  SELECT e.doc_a, e.doc_b, COUNT(xb.h) AS i
  FROM est e
  LEFT JOIN shash_full xa ON xa.doc_id = e.doc_a
  LEFT JOIN shash_full xb ON xb.doc_id = e.doc_b AND xb.h = xa.h
  WHERE e.est_jaccard >= 0.35
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.i AS DOUBLE) / (ca.n + cb.n - i.i) AS jaccard
FROM inter i
JOIN counts ca ON ca.doc_id = i.doc_a
JOIN counts cb ON cb.doc_id = i.doc_b
ORDER BY i.doc_a, i.doc_b
"""
)


@query("dedup_minhash_lsh", oracle=_MINHASH_LSH_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _mutated_corpus(T(spark, sf_dir, "documents"))
    return (
        minhash_candidates(corpus, spark)
        .filter(F.col("est_jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


# --- SimHash ---------------------------------------------------------------------

def _fnv_bytes_matrix(bs: list) -> np.ndarray:
    """FNV-1a 64 of each byte string, vectorized across strings: the bytes
    are packed into a zero-padded (n, max_len) uint8 matrix and the hash
    state advances one *column* per step (masked past each string's end),
    so the Python-level loop is over max_len, not total bytes."""
    n = len(bs)
    lens = np.fromiter((len(x) for x in bs), np.int64, n)
    h = np.full(n, 0xCBF29CE484222325, np.uint64)
    L = int(lens.max(initial=0))
    if L == 0:
        return h
    mat = np.zeros((n, L), np.uint8)
    flat = np.frombuffer(b"".join(bs), np.uint8)
    rows = np.repeat(np.arange(n), lens)
    cols = np.arange(len(flat)) - np.repeat(np.cumsum(lens) - lens, lens)
    mat[rows, cols] = flat
    prime = np.uint64(0x100000001B3)
    for k in range(L):
        h = np.where(lens > k, (h ^ mat[:, k]) * prime, h)
    return h


_WS_TAB = np.zeros(256, bool)
# RE2's \s class: [\t\n\f\r ] — deliberately WITHOUT VT (0x0B), so the
# engine splits exactly where the DuckDB \s+ oracles split for any input,
# not just the VT-free driver corpus (Java's \s would include VT)
_WS_TAB[[9, 10, 12, 13, 32]] = True


def simhash_batch(texts) -> np.ndarray:
    """Simhash64 of each text, vectorized across the batch with no Python
    per-token objects: docs concatenate into one flat uint8 stream, token
    boundaries come from a whitespace mask (ASCII ws — identical to
    str.split() except exotic Unicode whitespace, which the RE2 \\s+ oracle
    doesn't split on either), all tokens FNV-1a-hash column-stepwise in one
    padded matrix, and the per-doc majority vote uses prefix sums of the
    unpacked hash bits (±1 vote sum > 0 ⟺ 2·ones > n_tokens).
    Value-identical to the scalar definition; empty doc → 0."""
    bs = [t.encode("utf-8") for t in texts]
    n = len(bs)
    out = np.zeros(n, np.int64)
    doc_lens = np.fromiter((len(x) for x in bs), np.int64, n)
    total = int(doc_lens.sum())
    if total == 0:
        return out
    flat = np.frombuffer(b"".join(bs), np.uint8)
    ws = _WS_TAB[flat]
    doc_ends = np.cumsum(doc_lens)
    doc_starts = doc_ends - doc_lens
    prev_ws = np.empty(total, bool)
    prev_ws[0] = True
    prev_ws[1:] = ws[:-1]
    prev_ws[doc_starts[doc_lens > 0]] = True  # doc boundary breaks a token
    next_ws = np.empty(total, bool)
    next_ws[-1] = True
    next_ws[:-1] = ws[1:]
    next_ws[doc_ends[doc_lens > 0] - 1] = True
    tstarts = np.nonzero(~ws & prev_ws)[0]
    if len(tstarts) == 0:
        return out
    tok_lens = np.nonzero(~ws & next_ws)[0] - tstarts + 1
    n_tok = len(tstarts)
    lt = int(tok_lens.max())
    mat = np.zeros((n_tok, lt), np.uint8)
    cols = np.arange(int(tok_lens.sum())) - np.repeat(
        np.cumsum(tok_lens) - tok_lens, tok_lens
    )
    mat[np.repeat(np.arange(n_tok), tok_lens), cols] = flat[
        np.repeat(tstarts, tok_lens) + cols
    ]
    h = np.full(n_tok, 0xCBF29CE484222325, np.uint64)
    prime = np.uint64(0x100000001B3)
    for k in range(lt):
        h = np.where(tok_lens > k, (h ^ mat[:, k]) * prime, h)
    # token → owning doc: last doc whose start ≤ token start (empty docs
    # share the next doc's start but never own a token)
    counts = np.bincount(
        np.searchsorted(doc_starts, tstarts, side="right") - 1, minlength=n
    )
    # bit-transposed layout (64, n_tok): the per-doc segment sums then run
    # along contiguous memory (axis-0 reductions on (n_tok, 64) are ~10×
    # slower — strided column scans)
    bits_t = np.unpackbits(
        np.ascontiguousarray(h.view(np.uint8).reshape(n_tok, 8).T),
        axis=0,
        bitorder="little",
    ).astype(np.int32)
    nonempty = counts > 0
    seg_starts = (np.cumsum(counts) - counts)[nonempty]
    ones = np.add.reduceat(bits_t, seg_starts, axis=1)
    maj = np.zeros((64, n), np.uint8)
    maj[:, nonempty] = 2 * ones > counts[nonempty][None, :]
    return (
        np.ascontiguousarray(
            np.packbits(maj, axis=0, bitorder="little").T
        )
        .view(np.int64)[:, 0]
    )


def simhash64(text: str) -> int:
    return int(simhash_batch([text])[0])


def hash_tok(t: str) -> int:
    """Deterministic 64-bit token hash (FNV-1a; python's hash() is salted).
    Scalar reference twin of _fnv_bytes_matrix — the SQL oracle mirrors this
    definition in HUGEINT."""
    return int(_fnv_bytes_matrix([t.encode("utf-8")])[0])


_SIMHASH_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {MUT_OFFSET}, text || ' mutated suffix token'
  FROM documents WHERE doc_id < {N_MUTATED}
),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM corpus WHERE length(trim(text)) > 0
),
tok_h AS (
  -- FNV-1a over (ASCII) bytes in HUGEINT with explicit 2^64 wraparound:
  -- the exact twin of dedup.hash_tok
  SELECT doc_id,
    list_reduce(
      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS HUGEINT))),
      (h, ch) -> (xor(h, ch) * 1099511628211) % 18446744073709551616
    ) AS fnv
  FROM toks
),
bit_acc AS (
  SELECT doc_id, b.range AS bit,
         SUM(CASE WHEN (fnv >> CAST(b.range AS HUGEINT)) % 2 = 1 THEN 1 ELSE -1 END) AS acc
  FROM tok_h, range(0, 64) b
  GROUP BY 1, 2
),
sh_u AS (
  SELECT c.doc_id,
         COALESCE(SUM(CASE WHEN a.acc > 0
                           THEN CAST(1 AS HUGEINT) << CAST(a.bit AS HUGEINT)
                           ELSE 0 END), 0) AS shu
  FROM corpus c LEFT JOIN bit_acc a ON a.doc_id = c.doc_id
  GROUP BY 1
),
sh AS (
  SELECT doc_id,
         CAST(CASE WHEN shu >= CAST(1 AS HUGEINT) << 63
                   THEN shu - (CAST(1 AS HUGEINT) << 64)
                   ELSE shu END AS BIGINT) AS sh
  FROM sh_u
),
chunks AS (
  SELECT doc_id, sh, c.range AS chunk,
         (sh >> CAST(c.range * 16 AS BIGINT)) & 65535 AS ch
  FROM sh, range(0, 4) c
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.sh, b.sh)) AS hamming
  FROM chunks a JOIN chunks b ON a.chunk = b.chunk AND a.ch = b.ch
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 6 ORDER BY doc_a, doc_b
"""


@query("dedup_simhash", oracle=_SIMHASH_SQL)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by simhash hamming distance ≤ 6, blocked on 4 16-bit
    chunks (a pair within distance 6 can differ in at most 3 chunks... but
    4 chunks guarantee one EQUAL chunk only up to distance 3 per pigeonhole;
    we block on any-of-4-chunks equality which is exact for distance ≤ 3 and
    high-recall above)."""
    corpus = _mutated_corpus(T(spark, sf_dir, "documents"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # chunk the Arrow batch so the (n_tokens, 64) vote matrix stays
        # bounded (~2048 docs * ~60 toks * 64 * 8B ≈ 60 MB peak per worker)
        for pdf in batches:
            for lo in range(0, len(pdf), 2048):
                part = pdf.iloc[lo : lo + 2048]
                yield pd.DataFrame(
                    {"doc_id": part["doc_id"], "sh": simhash_batch(part["text"])}
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

def ngram_jaccard_pairs(corpus: DataFrame, spark: SparkSession) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact 5-char-shingle jaccard on the LSH
    candidate pairs (est ≥ 0.35). The verify stage shared by the
    pair-scoring query and the cluster builder."""
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

    return j.mapInPandas(kernel, "doc_a long, doc_b long, jaccard double")


@query("dedup_ngram_jaccard", oracle=_NGRAM_JACCARD_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-char-shingle jaccard, computed only for LSH candidate pairs —
    the verify stage of the dedup funnel (candidates → exact score)."""
    corpus = _mutated_corpus(T(spark, sf_dir, "documents"))
    return ngram_jaccard_pairs(corpus, spark).orderBy("doc_a", "doc_b")


# --- near-dup clusters (the keep-set stage of the funnel) --------------------

CLUSTER_J = 0.6

# shared tail: verified-edge → component-label CTEs (used by dedup_clusters
# and dedup_keep_best); expects the _minhash_sql_body() CTE chain with the
# RECURSIVE marker already on the WITH head
_CLUSTER_LABELS_CTES = f""",
counts AS (SELECT doc_id, COUNT(*) AS n FROM shash_full GROUP BY 1),
inter AS (
  SELECT e.doc_a, e.doc_b, COUNT(xb.h) AS i
  FROM est e
  LEFT JOIN shash_full xa ON xa.doc_id = e.doc_a
  LEFT JOIN shash_full xb ON xb.doc_id = e.doc_b AND xb.h = xa.h
  WHERE e.est_jaccard >= 0.35
  GROUP BY 1, 2
),
cedges AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN counts ca ON ca.doc_id = i.doc_a
  JOIN counts cb ON cb.doc_id = i.doc_b
  WHERE CAST(i.i AS DOUBLE) / (ca.n + cb.n - i.i) >= {CLUSTER_J}
),
sym AS (
  SELECT doc_a AS s, doc_b AS d FROM cedges
  UNION ALL
  SELECT doc_b, doc_a FROM cedges
),
walk(node, lbl) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT p.d, w.lbl FROM walk w JOIN sym p ON p.s = w.node
),
labels AS (SELECT node, MIN(lbl) AS root FROM walk GROUP BY node)"""

_DEDUP_CLUSTERS_SQL = (
    # the walk CTE needs the RECURSIVE marker on the (shared) WITH head
    _minhash_sql_body().replace("WITH corpus", "WITH RECURSIVE corpus", 1)
    + _CLUSTER_LABELS_CTES
    + """
SELECT root AS keep_id, COUNT(*) AS n_docs,
       array_to_string(list_sort(list(node)), ',') AS members
FROM labels GROUP BY root HAVING COUNT(*) >= 2 ORDER BY keep_id
"""
)


@query("dedup_clusters", oracle=_DEDUP_CLUSTERS_SQL)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: the keep-set stage that turns verified pair edges
    (exact n-gram jaccard ≥ CLUSTER_J on the MinHash-LSH candidates) into
    connected components, keeping the min doc_id per cluster — the final
    step of a training-data dedup sweep ("drop all but one per cluster").

    Scale shape: the edge set is the already-bucketed LSH candidate output
    (never all-pairs), and components run through the shared hybrid CC
    machinery (driver label-prop under DRIVER_CC_MAX_PAIRS, distributed
    large-star/small-star beyond — operators.topology.connected_components).
    Full-funnel DuckDB oracle: shingle→minhash→banding→exact-jaccard edges,
    then a recursive-CTE min-label reachability walk, exactly the engine's
    component-min root rule."""
    from etf_topox_spark.operators.topology import connected_components

    corpus = _mutated_corpus(T(spark, sf_dir, "documents"))
    edges = ngram_jaccard_pairs(corpus, spark).filter(
        F.col("jaccard") >= CLUSTER_J
    )
    roots = connected_components(
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    labeled = (
        corpus.select("doc_id")
        .join(roots, corpus.doc_id == roots.node, "left")
        .select("doc_id", F.coalesce("root", "doc_id").alias("root"))
    )
    return (
        labeled.groupBy("root")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("members"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(F.col("root").alias("keep_id"), "n_docs", "members")
        .orderBy("keep_id")
    )


# --- survivor selection (keep-best-quality per near-dup cluster) -------------

_QUALITY_CTES = r""",
qual AS (
  SELECT doc_id,
         LEAST(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
           * (CAST(n_uniq AS DOUBLE) / n_tokens) AS q
  FROM (SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens,
               len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_uniq
        FROM corpus)
),
sized AS (SELECT root, COUNT(*) AS n FROM labels GROUP BY 1 HAVING COUNT(*) >= 2),
ranked AS (
  SELECT l.root, l.node, q.q,
         ROW_NUMBER() OVER (PARTITION BY l.root ORDER BY q.q DESC, l.node) AS rn
  FROM labels l JOIN sized s ON s.root = l.root JOIN qual q ON q.doc_id = l.node
)"""

_KEEP_BEST_SQL = (
    _minhash_sql_body().replace("WITH corpus", "WITH RECURSIVE corpus", 1)
    + _CLUSTER_LABELS_CTES
    + _QUALITY_CTES
    + """
SELECT r.root AS cluster_id, r.node AS survivor_id, r.q AS survivor_quality,
       CAST(s.n - 1 AS BIGINT) AS n_dropped
FROM ranked r JOIN sized s ON s.root = r.root
WHERE rn = 1 ORDER BY cluster_id
"""
)


@query("dedup_keep_best", oracle=_KEEP_BEST_SQL)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection — the step after clustering in a training-data
    dedup sweep: per near-dup cluster keep the HIGHEST-QUALITY member (the
    text_quality score: length-capped type-token ratio), not just the min
    id, with doc_id as the deterministic tiebreak. Returns one row per
    ≥2-member cluster with the survivor and how many members drop.

    Scale shape: clusters come from the shared LSH-candidate → exact-verify
    → connected-components funnel (never all-pairs); the quality score is a
    map-side Catalyst expression on each member's text; the per-cluster
    argmax is a window over the root key — partial-aggregable and skew-free
    because near-dup cluster sizes are bounded in practice (and a pathological
    giant cluster degrades to one fat window partition, not a cross join).
    Quality doubles are bit-identical across engines (integer token counts,
    one division, one multiply), so the argmax — and thus the survivor set —
    is exactly reproducible; full-funnel DuckDB oracle."""
    from pyspark.sql.window import Window

    from etf_topox_spark.operators.text import _WS_RE
    from etf_topox_spark.operators.topology import connected_components

    corpus = _mutated_corpus(T(spark, sf_dir, "documents"))
    edges = ngram_jaccard_pairs(corpus, spark).filter(F.col("jaccard") >= CLUSTER_J)
    roots = connected_components(
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    labeled = corpus.join(roots, corpus.doc_id == roots.node, "left").select(
        "doc_id", "text", F.coalesce("root", F.col("doc_id")).alias("root")
    )
    sized = (
        labeled.groupBy("root")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )
    toks = F.split(F.trim("text"), _WS_RE)
    q = F.least(F.size(toks).cast("double") / 64.0, F.lit(1.0)) * (
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    )
    scored = labeled.join(F.broadcast(sized), "root").withColumn("q", q)
    w = Window.partitionBy("root").orderBy(F.col("q").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("root").alias("cluster_id"),
            F.col("doc_id").alias("survivor_id"),
            F.col("q").alias("survivor_quality"),
            (F.col("n") - 1).cast("long").alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )
