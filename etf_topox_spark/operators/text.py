"""Text-analysis operators over the documents table — the training-data
pipeline surface (task brief: language-ID heuristic, quality scoring, token
counting, document fingerprinting). All JVM-side expressions where possible
(whole-stage codegen); the rolling-hash fingerprint is the one Arrow kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query
from etf_topox_spark.sources.tables import load_table as T

# RE2's \s class, spelled out: Java regex \s would also match VT (0x0B),
# which DuckDB/RE2 \s+ in the oracles does NOT split on — the explicit
# class keeps engine and oracle tokenization identical for ANY input, not
# just the VT-free driver corpus.
_WS_RE = "[ \\t\\n\\f\\r]+"


# --- token counting (whitespace tokenizer; BPE-ish subword estimate) ---------

@query(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_uniq,
           n_chars,
           CAST(n_chars AS DOUBLE) /
             len(string_split_regex(trim(text), '\s+')) AS chars_per_token
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), _WS_RE)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        "n_chars",
        (F.col("n_chars").cast("double") / F.size(toks)).alias("chars_per_token"),
    )


# --- quality scoring ----------------------------------------------------------

@query(
    "text_quality",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, n_chars,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_uniq,
             (length(text) - length(replace(text, ' the ', ''))) / 5 AS n_stop
      FROM documents)
    SELECT doc_id,
           CAST(n_uniq AS DOUBLE) / n_tokens AS type_token_ratio,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           LEAST(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
             * (CAST(n_uniq AS DOUBLE) / n_tokens) AS quality_score
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), _WS_RE)
    n_tokens = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_stop = (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" the ")))) / 5
    return d.select(
        "doc_id",
        (n_uniq.cast("double") / n_tokens).alias("type_token_ratio"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        (
            F.least(n_tokens.cast("double") / 64.0, F.lit(1.0))
            * (n_uniq.cast("double") / n_tokens)
        ).alias("quality_score"),
    )


# --- language-ID heuristic (marker-token counts via replace-length trick) ------

_MARKERS = {"en": " the ", "es": " la ", "de": " der ", "fr": " le "}


def _occ_sql(m: str) -> str:
    return f"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', '{m}', ''))) / {len(m)}"


@query(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang AS lang_label,
           CASE WHEN {_occ_sql(' the ')} > 0 THEN 'en'
                WHEN {_occ_sql(' la ')} > 0 THEN 'es'
                WHEN {_occ_sql(' der ')} > 0 THEN 'de'
                WHEN {_occ_sql(' le ')} > 0 THEN 'fr'
                ELSE 'unk' END AS lang_pred
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))

    def occ(m: str):
        return (F.length(padded) - F.length(F.replace(padded, F.lit(m)))) / len(m)

    pred = (
        F.when(occ(" the ") > 0, "en")
        .when(occ(" la ") > 0, "es")
        .when(occ(" der ") > 0, "de")
        .when(occ(" le ") > 0, "fr")
        .otherwise("unk")
    )
    return d.select("doc_id", F.col("lang").alias("lang_label"), pred.alias("lang_pred"))


# --- fingerprints ---------------------------------------------------------------

@query(
    "text_fingerprint_md5",
    oracle="SELECT doc_id, md5(text) AS fp FROM documents",
)
def text_fingerprint_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5("text").alias("fp"))


ROLL_BASE = 257
ROLL_MOD = (1 << 61) - 1


_ROLL_MASK29 = np.uint64((1 << 29) - 1)


def rolling_hash_np(texts: pd.Series) -> np.ndarray:
    """Polynomial rolling hash over UTF-8 bytes, mod 2^61-1, vectorized
    across documents: bytes right-align into a zero-padded (n, L) uint8
    matrix (left padding contributes 0·BASE^k = 0), and column k adds
    byte·BASE^(L-1-k) with a 32-bit-split modmul — byte·p_lo < 2^40 and the
    byte·p_hi·2^32 term folds through 2^61 ≡ 1 (mod 2^61−1), so every
    intermediate fits uint64 exactly. Value-identical to the per-byte
    Horner definition the SQL oracle mirrors."""
    bs = [t.encode("utf-8") for t in texts]
    n = len(bs)
    lens = np.fromiter((len(x) for x in bs), np.int64, n)
    L = int(lens.max(initial=0))
    if L == 0:
        return np.zeros(n, np.int64)
    flat = np.frombuffer(b"".join(bs), np.uint8).astype(np.uint64)
    ends = np.cumsum(lens)
    starts = ends - lens
    # exponent of BASE for each flat byte: len(doc) - 1 - offset_in_doc
    exps = np.repeat(ends, lens) - 1 - np.arange(len(flat))
    pw_tab = np.empty(L, np.uint64)
    p = 1
    for k in range(L):
        pw_tab[k] = p
        p = (p * ROLL_BASE) % ROLL_MOD
    pw = pw_tab[exps]
    # byte·pw in two 32-bit halves so nothing overflows uint64:
    # b·p_lo < 2^40; (b·p_hi)·2^32 folds via 2^61 ≡ 1 (mod 2^61−1)
    t_hi = flat * (pw >> np.uint64(32))
    contrib = (
        flat * (pw & np.uint64(0xFFFFFFFF))
        + ((t_hi & _ROLL_MASK29) << np.uint64(32))
        + (t_hi >> np.uint64(29))
    ) % np.uint64(ROLL_MOD)
    # segment-sum contributions (<2^61 each) in two halves as int64 —
    # sums stay < 2^55 for docs up to 2^23 bytes — then refold mod M
    lo_sum = np.zeros(n, np.int64)
    hi_sum = np.zeros(n, np.int64)
    ne = lens > 0
    lo_sum[ne] = np.add.reduceat((contrib & np.uint64(0xFFFFFFFF)).astype(np.int64), starts[ne])
    hi_sum[ne] = np.add.reduceat((contrib >> np.uint64(32)).astype(np.int64), starts[ne])
    hs = hi_sum.astype(np.uint64)
    folded = ((hs & _ROLL_MASK29) << np.uint64(32)) + (hs >> np.uint64(29))
    return ((lo_sum.astype(np.uint64) + folded) % np.uint64(ROLL_MOD)).astype(np.int64)


@query(
    "text_fingerprint_rolling",
    # DuckDB twin of rolling_hash_np via HUGEINT list_reduce. unicode(c) ==
    # utf-8 byte only for ASCII — valid for the driver corpus (max
    # codepoint 121 verified at sf0.01/0.1); the engine side handles full
    # UTF-8.
    oracle=f"""
    SELECT doc_id,
      CASE WHEN length(text) = 0 THEN 0
      ELSE CAST(list_reduce(
        list_prepend(CAST(0 AS HUGEINT),
          list_transform(string_split(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
        (h, b) -> (h * {ROLL_BASE} + b) % {ROLL_MOD}) AS BIGINT) END AS fp
    FROM documents
    """,
)
def text_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "fp": rolling_hash_np(pdf["text"])}
            )

    return d.select("doc_id", "text").mapInPandas(kernel, "doc_id long, fp long")


# --- per-document salient terms (TF-IDF, log-free rational idf) -----------------

TFIDF_K = 5

_TFIDF_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
           AS score
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, term, tf, df, score, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rn
  FROM scored
) WHERE rn <= {TFIDF_K}
ORDER BY doc_id, rn
"""


@query("text_tfidf_topk", oracle=_TFIDF_SQL)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K salient terms per document by tf × (N/df) — the log-free
    rational-idf variant: one division instead of ln(N/df), so Spark and
    DuckDB compute bit-identical scores (libm log implementations are NOT
    guaranteed identical across engines; correctly-rounded IEEE divide
    is). Pure Catalyst: tokenize → two hash aggregations (tf, df) → term
    equi-join (df side is small; Spark broadcasts it) → per-doc top-K
    window. At corpus scale df is a tiny dimension (vocabulary), tf
    shuffles once on (doc, term) with map-side partial aggregation."""
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), _WS_RE)).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size as a broadcast 1-row aggregate, NOT an eager d.count():
    # the whole query stays one lazy plan (no separate action per call)
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    from pyspark.sql.window import Window as W

    win = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("n_docs") / F.col("df").cast("double")),
        )
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= TFIDF_K)
        .select("doc_id", "term", "tf", "df", "score", "rn")
        .orderBy("doc_id", "rn")
    )


# --- winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS) -------------------

FP_K = 16  # k-gram size (bytes) — calibrated on the driver corpus: 8-byte
#            grams of the template-generated text are boilerplate (median
#            doc-frequency 24), 16-byte grams are distinctive (median 1),
#            which the MOSS copy-pair funnel below depends on
FP_W = 5   # winnowing window (positions)


def winnow_np(texts: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Winnowing fingerprints per document: k-gram rolling hashes at every
    byte position, then the RIGHTMOST minimal hash of each W-position
    window, deduped. Returns flat (row_idx, pos_1based, fp) arrays.

    Vectorized across the batch: left-aligned zero-padded byte matrix, K
    modmul passes for the position hashes (same 32-bit-split arithmetic as
    rolling_hash_np), one sliding_window_view + reversed-argmin for the
    rightmost-min picks. Docs with fewer than W k-grams get one window over
    all their positions; docs shorter than K get none — both rules mirrored
    in the SQL oracle."""
    bs = [t.encode("utf-8") for t in texts]
    n = len(bs)
    lens = np.fromiter((len(x) for x in bs), np.int64, n)
    L = int(lens.max(initial=0))
    if L < FP_K:
        e = np.empty(0, np.int64)
        return e, e, e
    B = np.zeros((n, L), np.uint64)
    flat = np.frombuffer(b"".join(bs), np.uint8)
    ends = np.cumsum(lens)
    starts = ends - lens
    cols = np.arange(len(flat)) - np.repeat(starts, lens)
    B[np.repeat(np.arange(n), lens), cols] = flat

    P = L - FP_K + 1
    H = np.zeros((n, P), np.uint64)
    pw = np.uint64(1)
    # term order j = K-1 .. 0 pairs byte j with BASE^(K-1-j)
    for j in range(FP_K - 1, -1, -1):
        b = B[:, j:j + P]
        t_hi = b * (pw >> np.uint64(32))
        contrib = (
            b * (pw & np.uint64(0xFFFFFFFF))
            + ((t_hi & _ROLL_MASK29) << np.uint64(32))
            + (t_hi >> np.uint64(29))
        ) % np.uint64(ROLL_MOD)
        # fold every pass: contrib < 2^61, so H + contrib < 2^62 — never
        # overflows uint64 for any K (the K ≤ 8 deferred-fold shortcut died
        # with the move to 16-byte grams)
        H = (H + contrib) % np.uint64(ROLL_MOD)
        if j:
            pw = np.uint64((int(pw) * ROLL_BASE) % ROLL_MOD)

    nk = np.maximum(lens - FP_K + 1, 0)  # valid k-gram positions per doc
    posmat = np.arange(P)[None, :]
    H[posmat >= nk[:, None]] = np.uint64(ROLL_MOD)  # sentinel > any hash

    out_r: list[np.ndarray] = []
    out_p: list[np.ndarray] = []
    out_h: list[np.ndarray] = []
    std = nk >= FP_W
    if std.any() and P >= FP_W:
        V = np.lib.stride_tricks.sliding_window_view(H[std], FP_W, axis=1)
        rm = FP_W - 1 - np.argmin(V[:, :, ::-1], axis=2)
        s_idx = np.arange(V.shape[1])[None, :]
        valid = s_idx <= (nk[std] - FP_W)[:, None]
        rows_std = np.nonzero(std)[0]
        r, s = np.nonzero(valid)
        picks_pos = s + rm[r, s]
        out_r.append(rows_std[r])
        out_p.append(picks_pos)
        out_h.append(H[std][r, picks_pos])
    short = (nk > 0) & ~std
    if short.any():
        Hs = H[short]
        rm = Hs.shape[1] - 1 - np.argmin(Hs[:, ::-1], axis=1)
        out_r.append(np.nonzero(short)[0])
        out_p.append(rm)
        out_h.append(Hs[np.arange(len(rm)), rm])
    if not out_r:
        e = np.empty(0, np.int64)
        return e, e, e
    R = np.concatenate(out_r)
    Pp = np.concatenate(out_p)
    Hh = np.concatenate(out_h).astype(np.int64)
    # dedupe (doc, pos) — adjacent windows often pick the same position
    key = R * np.int64(P + 1) + Pp
    _, first = np.unique(key, return_index=True)
    return R[first], (Pp[first] + 1).astype(np.int64), Hh[first]


def _winnow_sql_ctes(src: str) -> str:
    """The winnowing funnel as DuckDB CTEs over source relation `src`
    (doc_id, text): same k-gram hash as winnow_np (HUGEINT fold over bytes
    — ASCII corpus, unicode(c) == byte), same W-window rightmost-min pick
    (ORDER BY h, i DESC), same short-doc single-window rule. The final CTE
    `winnowed` is DISTINCT (doc_id, pos, fp). Public algorithm:
    Schleimer/Wilkerson/Aiken, SIGMOD'03."""
    return f"""
pos AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
    CAST(list_reduce(
      list_prepend(CAST(0 AS HUGEINT),
        list_transform(string_split(substring(text, CAST(i AS INTEGER), {FP_K}), ''),
                       c -> CAST(unicode(c) AS HUGEINT))),
      (h, b) -> (h * {ROLL_BASE} + b) % {ROLL_MOD}) AS BIGINT) AS h
  FROM {src}, LATERAL unnest(range(1, length(text) - {FP_K} + 2)) AS u(i)
  WHERE length(text) >= {FP_K}
),
nk AS (SELECT doc_id, COUNT(*) AS n FROM pos GROUP BY doc_id),
wins AS (
  SELECT doc_id, CAST(s AS BIGINT) AS s
  FROM nk, LATERAL unnest(range(1, CASE WHEN n >= {FP_W} THEN n - {FP_W} + 2
                                        ELSE 2 END)) AS v(s)
),
wp AS (
  SELECT w.doc_id, w.s, p.i, p.h,
         ROW_NUMBER() OVER (PARTITION BY w.doc_id, w.s
                            ORDER BY p.h, p.i DESC) AS rn
  FROM wins w JOIN pos p
    ON p.doc_id = w.doc_id AND p.i >= w.s AND p.i < w.s + {FP_W}
),
winnowed AS (
  SELECT DISTINCT doc_id, i AS pos, h AS fp FROM wp WHERE rn = 1
)"""


@query(
    "text_fingerprint_winnow",
    oracle=f"""
WITH {_winnow_sql_ctes("documents")}
SELECT doc_id, pos, fp FROM winnowed ORDER BY doc_id, pos
""",
)
def text_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local document fingerprints for copy-detection: winnowed k-gram
    hashes — guaranteed ≥1 shared fingerprint for any match of length
    ≥ W+K-1, position-robust (the property whole-doc hashes lack). Pure
    map-side Arrow kernel; at corpus scale the fingerprint table is the
    join key for plagiarism/near-dup candidate generation."""
    d = T(spark, sf_dir, "documents")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            r, p, h = winnow_np(pdf["text"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[r],
                    "pos": p,
                    "fp": h,
                }
            )

    return (
        d.select("doc_id", "text")
        .mapInPandas(kernel, "doc_id long, pos long, fp long")
        .orderBy("doc_id", "pos")
    )


# --- copy-pair detection over winnowed fingerprints (the MOSS payoff) ----------

COPY_OFFSET = 2_000_000
N_COPIED = 40
COPY_PAD = "copied with an offset >> "  # shifts every k-gram position
MAX_DOCS_PER_FP = 8   # MOSS boilerplate rule: over-shared fingerprints drop
MIN_SHARED_FP = 5     # pair-report threshold


_COPY_PAIRS_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {COPY_OFFSET}, '{COPY_PAD}' || text
  FROM documents WHERE doc_id < {N_COPIED}
),
{_winnow_sql_ctes("corpus")},
fpd AS (SELECT DISTINCT doc_id, fp FROM winnowed),
keep AS (SELECT fp FROM fpd GROUP BY fp HAVING COUNT(*) <= {MAX_DOCS_PER_FP}),
kept AS (SELECT f.doc_id, f.fp FROM fpd f JOIN keep USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
FROM kept a JOIN kept b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_SHARED_FP}
ORDER BY doc_a, doc_b
"""


@query("text_copy_pairs", oracle=_COPY_PAIRS_SQL)
def text_copy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document copy-pair detection — the winnowing payoff (MOSS,
    Schleimer/Wilkerson/Aiken SIGMOD'03): join fingerprints to
    fingerprints, rank document pairs by shared-fingerprint count. The
    fixture corpus plants offset copies (a pad prefix shifts every byte
    position), which whole-document hashing provably misses and winnowing
    provably catches (any shared run ≥ W+K-1 bytes guarantees a shared
    fingerprint).

    Scale shape: the only exchanges are on the fingerprint value (a long).
    Fingerprints shared by more than MAX_DOCS_PER_FP documents are dropped
    first — the MOSS boilerplate rule — which also caps the join fanout at
    MAX_DOCS_PER_FP² pairs per key, so no hot-key blowup exists by
    construction; the per-pair count then aggregates with map-side
    combine."""
    d = T(spark, sf_dir, "documents")
    copies = d.filter(F.col("doc_id") < N_COPIED).select(
        (F.col("doc_id") + COPY_OFFSET).alias("doc_id"),
        F.concat(F.lit(COPY_PAD), F.col("text")).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(copies)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            r, p, h = winnow_np(pdf["text"])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy()[r], "fp": h}
            )

    fpd = (
        corpus.mapInPandas(kernel, "doc_id long, fp long")
        .dropDuplicates(["doc_id", "fp"])
    )
    keep = fpd.groupBy("fp").agg(F.count(F.lit(1)).alias("nd")).filter(
        F.col("nd") <= MAX_DOCS_PER_FP
    )
    kept = fpd.join(keep.select("fp"), "fp")
    a = kept.select("fp", F.col("doc_id").alias("doc_a"))
    b = kept.select("fp", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED_FP)
        .orderBy("doc_a", "doc_b")
    )


# --- word-level jaccard similarity (the n-gram variant lives in dedup.py) -------

@query(
    "text_token_jaccard",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS toks
      FROM documents WHERE doc_id < 40)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
             (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
             AS jaccard
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    """,
)
def text_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    t = d.select(
        "doc_id", F.array_distinct(F.split(F.trim("text"), _WS_RE)).alias("toks")
    )
    a = t.alias("a")
    b = t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (
                inter.cast("double")
                / (F.size("a.toks") + F.size("b.toks") - inter)
            ).alias("jaccard"),
        )
    )


# --- corpus n-gram statistics (top-k bigrams) --------------------------------

NGRAM_K = 30

_NGRAM_TOPK_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
),
grams AS (
  -- range(10000) is only the unnest-index idiom; the driver corpus caps
  -- at ~100 tokens/doc (verified), so no bigram is ever dropped
  SELECT lower(t[CAST(i.range + 1 AS BIGINT)]) || ' ' ||
         lower(t[CAST(i.range + 2 AS BIGINT)]) AS bigram
  FROM toks, range(0, 10000) i
  WHERE i.range < len(t) - 1
),
counts AS (SELECT bigram, COUNT(*) AS n FROM grams GROUP BY 1),
ranked AS (
  SELECT bigram, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, bigram) AS rk
  FROM counts
)
SELECT bigram, n, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= {NGRAM_K} ORDER BY rk
"""


@query("text_ngram_topk", oracle=_NGRAM_TOPK_SQL)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-K word bigrams — the n-gram language-model /
    contamination-check statistic of a training-data pipeline.

    Scale shape: tokens never materialize as rows per token-pair anywhere
    except the one hash-aggregable gram exchange (map-side partial counts
    do the heavy lifting); the final top-K is a single small sort. The
    bigram column uses the shared [ \\t\\n\\f\\r] tokenizer so engine and
    RE2-based oracle split identically for any input."""
    from pyspark.sql.window import Window

    d = T(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = F.split(F.trim("text"), _WS_RE)
    grams = (
        d.select(toks.alias("t"))
        .filter(F.size("t") >= 2)  # a one-token doc has no bigram (slice(len 0) is an error)
        .select(
            F.explode(
                F.zip_with(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                    lambda a, b: F.concat(F.lower(a), F.lit(" "), F.lower(b)),
                )
            ).alias("bigram")
        )
    )
    counts = grams.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), "bigram")
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= NGRAM_K)
        .orderBy("rk")
    )


# --- repetition filter (Gopher-style quality gate) ----------------------------
# Rae et al. 2021 ("Scaling Language Models: ... Gopher") filter heuristics,
# re-derived: documents dominated by repeated n-grams or by a single token
# are low-quality for LM training. Signals here: duplicate-trigram fraction
# and top-token share. Public-knowledge thresholds, engine-invented spelling.

REP_DUP3_MAX = 0.20
REP_TOP_SHARE_MAX = 0.30

_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_transform(string_split_regex(trim(text), '\\s+'),
                                x -> lower(x)) AS t
  FROM documents WHERE length(trim(text)) > 0
),
tri AS (
  SELECT doc_id,
         [t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]
          for i in range(0, greatest(len(t) - 2, 0))] AS g,
         len(t) AS n_tokens
  FROM toks
),
top AS (
  SELECT doc_id, MAX(c) AS top_n FROM (
    SELECT doc_id, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY doc_id, tok
  ) GROUP BY doc_id
)
SELECT tri.doc_id,
       CAST(tri.n_tokens AS INT) AS n_tokens,
       CASE WHEN len(g) > 0
            THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
            ELSE 0.0 END AS dup_trigram_frac,
       CAST(top.top_n AS DOUBLE) / tri.n_tokens AS top_token_share,
       (CASE WHEN len(g) > 0
             THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
             ELSE 0.0 END) <= {REP_DUP3_MAX}
         AND CAST(top.top_n AS DOUBLE) / tri.n_tokens <= {REP_TOP_SHARE_MAX}
         AS keep
FROM tri JOIN top USING (doc_id)
"""


@query("text_repetition_filter", oracle=_REPETITION_SQL)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate: duplicate-trigram fraction +
    top-token dominance per document, with a keep flag.

    Scale shape: the trigram signal is computed INSIDE the row with
    higher-order array functions (no explode → no shuffle); only the
    top-token share needs one hash-aggregable (doc_id, token) exchange
    with map-side partial counts. Both divisions are int/int in IEEE
    doubles, so engine and oracle agree bit-exactly."""
    d = T(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = F.transform(F.split(F.trim("text"), _WS_RE), lambda x: F.lower(x))
    base = d.select("doc_id", toks.alias("t")).withColumn(
        "n_tokens", F.size("t")
    )
    n1 = F.size("t") - 2
    tri = base.withColumn(
        "g",
        F.when(
            n1 > 0,
            F.zip_with(
                F.slice("t", 1, n1),
                F.zip_with(
                    F.slice("t", 2, n1),
                    F.slice("t", 3, n1),
                    lambda b, c: F.concat(b, F.lit(" "), c),
                ),
                lambda a, bc: F.concat(a, F.lit(" "), bc),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    dup = F.when(
        F.size("g") > 0,
        F.lit(1.0) - F.size(F.array_distinct("g")).cast("double") / F.size("g"),
    ).otherwise(F.lit(0.0))
    top = (
        base.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_n"))
    )
    scored = tri.join(top, "doc_id").select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        dup.alias("dup_trigram_frac"),
        (F.col("top_n").cast("double") / F.col("n_tokens")).alias("top_token_share"),
    )
    return scored.withColumn(
        "keep",
        (F.col("dup_trigram_frac") <= REP_DUP3_MAX)
        & (F.col("top_token_share") <= REP_TOP_SHARE_MAX),
    )


# --- benchmark-contamination check (n-gram overlap vs a held-out set) ---------

CONTAM_N = 5          # word n-gram order
CONTAM_BENCH = 16     # doc_id < CONTAM_BENCH form the "benchmark" set
CONTAM_MIN_SHARED = 2

_CONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_transform(string_split_regex(trim(text), '\\s+'),
                                x -> lower(x)) AS t
  FROM documents WHERE length(trim(text)) > 0
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest([array_to_string(t[i + 1:i + {CONTAM_N}], ' ')
                 for i in range(0, greatest(len(t) - {CONTAM_N - 1}, 0))]) AS gram
  FROM toks
),
bench AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id < {CONTAM_BENCH}),
bench_sizes AS (SELECT bench_id, COUNT(*) AS bench_grams FROM bench GROUP BY 1),
corpus AS (SELECT doc_id, gram FROM grams WHERE doc_id >= {CONTAM_BENCH}),
hits AS (
  SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
  FROM corpus c JOIN bench b USING (gram)
  GROUP BY 1, 2
)
SELECT h.doc_id, h.bench_id, h.n_shared,
       CAST(h.n_shared AS DOUBLE) / s.bench_grams AS contaminated_frac
FROM hits h JOIN bench_sizes s USING (bench_id)
WHERE h.n_shared >= {CONTAM_MIN_SHARED}
"""


@query("text_contamination", oracle=_CONTAM_SQL)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination scan: distinct word 5-gram overlap between
    every corpus document and a benchmark set (here: doc_id < 16, standing
    in for an eval suite shipped as a small table).

    Scale shape: the benchmark side is tiny by construction → its distinct
    grams BROADCAST to the corpus gram stream (no corpus-side shuffle
    beyond the per-(doc, bench) count, which is hash-aggregable with
    map-side combine). The corpus side never materializes more than one
    row per (doc, distinct-gram)."""
    d = T(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = F.transform(F.split(F.trim("text"), _WS_RE), lambda x: F.lower(x))
    base = d.select("doc_id", toks.alias("t"))
    n1 = F.size("t") - (CONTAM_N - 1)
    gram_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at("t", i + k) for k in range(CONTAM_N)]
    )
    grams = (
        base.filter(n1 > 0)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(F.sequence(F.lit(1), n1), lambda i: gram_at(i))
                )
            ).alias("gram"),
        )
    )
    bench = grams.filter(F.col("doc_id") < CONTAM_BENCH).select(
        F.col("doc_id").alias("bench_id"), "gram"
    )
    bench_sizes = bench.groupBy("bench_id").agg(F.count(F.lit(1)).alias("bench_grams"))
    corpus = grams.filter(F.col("doc_id") >= CONTAM_BENCH)
    hits = (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= CONTAM_MIN_SHARED)
    )
    return hits.join(F.broadcast(bench_sizes), "bench_id").select(
        "doc_id",
        "bench_id",
        "n_shared",
        (F.col("n_shared").cast("double") / F.col("bench_grams")).alias(
            "contaminated_frac"
        ),
    )


# --- corpus length histogram --------------------------------------------------

_LENGTH_HIST_SQL = """
SELECT lang,
       CAST(length(printf('%b', n_chars)) AS INT) AS bucket,
       COUNT(*) AS n_docs,
       SUM(n_chars) AS sum_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents WHERE n_chars > 0
GROUP BY 1, 2
"""


@query("text_length_histogram", oracle=_LENGTH_HIST_SQL)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language log2 length histogram — the corpus-shape statistic every
    training-data pipeline reports. Bucket = bit length of n_chars
    (floor(log2)+1 computed exactly via the binary string, identical in
    both engines — no float log edge cases at powers of two)."""
    d = T(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return (
        d.groupBy(
            "lang", F.length(F.bin("n_chars")).cast("int").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        )
    )


# --- PII / sensitive-pattern scan ----------------------------------------------
# Patterns stay in the RE2 ∩ Java-regex common dialect so engine and oracle
# match identically (same discipline as the _WS_RE tokenizer).

PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_IPV4 = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
PII_DIGIT_RUN = "[0-9]{4,}"

_PII_SQL = f"""
WITH scans AS (
  SELECT 'documents' AS tbl, text AS s FROM documents
  UNION ALL
  SELECT 'events' AS tbl, props AS s FROM events
)
SELECT tbl,
       COUNT(*) AS n_rows,
       SUM(len(regexp_extract_all(s, '{PII_EMAIL}'))) AS n_emails,
       SUM(len(regexp_extract_all(s, '{PII_IPV4}'))) AS n_ipv4,
       SUM(len(regexp_extract_all(s, '{PII_DIGIT_RUN}'))) AS n_digit_runs,
       SUM(len(regexp_extract_all(s, '[0-9]'))) AS n_digit_chars
FROM scans GROUP BY tbl
"""


@query("text_pii_stats", oracle=_PII_SQL)
def text_pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / sensitive-pattern scan over every string surface (documents
    text + event props): emails, IPv4 literals, long digit runs, digit
    chars. Pure JVM regexp_count — map-side, one tiny aggregate row per
    table; the redaction pass of a training pipeline runs exactly this
    shape before masking."""
    docs = T(spark, sf_dir, "documents").select(
        F.lit("documents").alias("tbl"), F.col("text").alias("s")
    )
    ev = T(spark, sf_dir, "events").select(
        F.lit("events").alias("tbl"), F.col("props").alias("s")
    )
    return (
        docs.unionByName(ev)
        .groupBy("tbl")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.regexp_count("s", F.lit(PII_EMAIL))).alias("n_emails"),
            F.sum(F.regexp_count("s", F.lit(PII_IPV4))).alias("n_ipv4"),
            F.sum(F.regexp_count("s", F.lit(PII_DIGIT_RUN))).alias("n_digit_runs"),
            F.sum(F.regexp_count("s", F.lit("[0-9]"))).alias("n_digit_chars"),
        )
    )


# --- chunk-level exact dedup (paragraph dedup for single-line corpora) --------

CHUNK_TOKS = 8  # fixed token-window "paragraph" unit (corpus is single-line)

_CHUNK_DEDUP_SQL = rf"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0),
ch AS (
  SELECT doc_id,
         unnest(list_transform(range((len(t) + {CHUNK_TOKS - 1}) // {CHUNK_TOKS}),
                i -> array_to_string(t[(i*{CHUNK_TOKS}+1):(i*{CHUNK_TOKS}+{CHUNK_TOKS})], ' '))) AS chunk
  FROM d),
cnt AS (SELECT chunk, COUNT(*) AS n_occ FROM ch GROUP BY 1)
SELECT ch.doc_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN cnt.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       CAST(SUM(CASE WHEN cnt.n_occ > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS dup_ratio
FROM ch JOIN cnt USING (chunk)
GROUP BY ch.doc_id
"""


@query("text_chunk_dedup", oracle=_CHUNK_DEDUP_SQL)
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup: split each document into fixed 8-token
    chunks (the paragraph unit for this single-line corpus), count each
    chunk string globally, and report per document how much of it is
    boilerplate duplicated elsewhere in the corpus. This is the
    paragraph-dedup pass of a training pipeline (drop/keep decisions key on
    dup_ratio). Scale shape: explode is map-side with bounded fan-out
    (n_tokens/8 per doc); ONE hash aggregate on the chunk string + ONE
    equi-join back — at 10^12 docs the chunk key would be md5(chunk) to
    shrink the exchange, identical semantics."""
    d = T(spark, sf_dir, "documents").where(F.length(F.trim("text")) > 0)
    toks = F.split(F.trim("text"), _WS_RE)
    n_chunks = (F.floor((F.size(toks) - 1) / CHUNK_TOKS) + 1).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * CHUNK_TOKS + 1, CHUNK_TOKS), " "),
    )
    ch = d.select("doc_id", F.explode(chunk_arr).alias("chunk"))
    cnt = ch.groupBy("chunk").agg(F.count(F.lit(1)).alias("n_occ"))
    dup = F.when(F.col("n_occ") > 1, 1).otherwise(0)
    return (
        ch.join(cnt, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(dup).alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            (F.col("n_dup_chunks").cast("double") / F.col("n_chunks")).alias(
                "dup_ratio"
            ),
        )
    )


# --- deterministic quality-weighted sampling ----------------------------------

# Ticket = first 32 bits of md5(doc_id-string) % 10000: uniform, content-
# independent, and replayable on any engine with md5 (ANSI-mode Spark bans
# wraparound multiplies, so a hex fold beats an FNV here). Keep-rate policy
# in basis points by length bucket (documented, arbitrary): short docs are
# mostly boilerplate -> 25%, mid 50%, long kept whole.
SAMPLE_BUCKETS = (("low", 150, 2500), ("mid", 350, 5000), ("high", None, 10000))

_SAMPLE_SQL = """
WITH h AS (
  SELECT doc_id, source, n_chars,
    list_reduce(
      list_transform(string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
                     c -> strpos('0123456789abcdef', c) - 1),
      (a, c) -> a * 16 + c
    ) % 10000 AS ticket
  FROM documents),
t AS (
  SELECT doc_id, source, n_chars, ticket,
         CASE WHEN n_chars < 150 THEN 'low'
              WHEN n_chars < 350 THEN 'mid'
              ELSE 'high' END AS bucket,
         CASE WHEN n_chars < 150 THEN 2500
              WHEN n_chars < 350 THEN 5000
              ELSE 10000 END AS rate_bp
  FROM h)
SELECT doc_id, source, n_chars, bucket, ticket
FROM t WHERE ticket < rate_bp
ORDER BY doc_id
"""


def ticket32_col(col) -> F.Column:
    """Uniform deterministic ticket in [0, 10000) from a string column:
    md5 -> first 8 hex chars -> 32-bit int -> mod. Pure Catalyst (conv is
    JVM-side), no overflow under ANSI mode (value < 2^32)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"), F.lit(10000)
    )


@query("sample_quality_weighted", oracle=_SAMPLE_SQL)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality-weighted downsampling: every doc draws a
    reproducible ticket in [0,10000) from an md5 hash of its id and is
    kept iff ticket < the keep-rate of its length bucket. Map-only (no
    shuffle, no RNG state): re-running the pipeline, resuming from
    checkpoint, or moving a doc between partitions can never change the
    sample — the property Spark's sample() cannot give across retries at
    10^12 rows."""
    d = T(spark, sf_dir, "documents")
    ticket = ticket32_col(F.col("doc_id").cast("string"))
    bucket = (
        F.when(F.col("n_chars") < 150, "low")
        .when(F.col("n_chars") < 350, "mid")
        .otherwise("high")
    )
    rate = (
        F.when(F.col("n_chars") < 150, 2500)
        .when(F.col("n_chars") < 350, 5000)
        .otherwise(10000)
    )
    return (
        d.select(
            "doc_id",
            "source",
            "n_chars",
            bucket.alias("bucket"),
            ticket.alias("ticket"),
            rate.alias("rate_bp"),
        )
        .where(F.col("ticket") < F.col("rate_bp"))
        .drop("rate_bp")
        .orderBy("doc_id")
    )


# --- source-mix rebalance weights ----------------------------------------------

_MIX_SQL = """
WITH s AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total, COUNT(*) AS n_sources FROM s)
SELECT source, n_docs,
       n_docs * 10000 // total AS share_bp,
       total * 10000 // (n_sources * n_docs) AS weight_bp,
       total * 10000 // (n_sources * n_docs) // 10000 AS n_repeat_full,
       (total * 10000 // (n_sources * n_docs)) % 10000 AS resid_bp
FROM s, t ORDER BY source
"""


@query("source_mix_rebalance", oracle=_MIX_SQL)
def source_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source resampling weights toward a uniform source mix — the
    dataset-mixing step of a training pipeline. weight = total /
    (n_sources * n_docs), carried as EXACT integer basis points (no float
    division, so both engines agree bit-for-bit): repeat each doc
    n_repeat_full times plus keep a further resid_bp/10000 deterministic
    sample (composable with sample_quality_weighted's ticket). One tiny
    hash aggregate + a broadcast of the one-row totals."""
    s = (
        T(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    t = s.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_sources")
    )
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            F.expr("n_docs * 10000 div total").alias("share_bp"),
            F.expr("total * 10000 div (n_sources * n_docs)").alias("weight_bp"),
            F.expr("total * 10000 div (n_sources * n_docs) div 10000").alias(
                "n_repeat_full"
            ),
            F.expr("(total * 10000 div (n_sources * n_docs)) % 10000").alias(
                "resid_bp"
            ),
        )
        .orderBy("source")
    )


# --- sequence packing (next-fit) ------------------------------------------------

PACK_BUDGET = 256  # context-window token budget per packed sequence

_PACK_SQL = rf"""
WITH RECURSIVE d AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents WHERE length(trim(text)) > 0),
pack AS (
  SELECT doc_id, source, n_tokens, rn, 1 AS bin, n_tokens AS acc
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.doc_id, d.source, d.n_tokens, d.rn,
         CASE WHEN p.acc + d.n_tokens <= {PACK_BUDGET}
              THEN p.bin ELSE p.bin + 1 END,
         CASE WHEN p.acc + d.n_tokens <= {PACK_BUDGET}
              THEN p.acc + d.n_tokens ELSE d.n_tokens END
  FROM pack p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
SELECT doc_id, source, n_tokens, bin FROM pack ORDER BY doc_id
"""


@query("text_sequence_packing", oracle=_PACK_SQL)
def text_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit sequence packing for LLM training: within each source,
    docs in doc_id order fill a 256-token context window; when the next doc
    would overflow, a new bin starts. The packing recurrence is inherently
    sequential, so it runs as ONE Arrow kernel per source group (numpy
    running state, no per-row Python); the oracle is the same recurrence as
    a recursive CTE. Scale shape: at 10^12 docs the group key becomes
    (source, shard = doc_id div K) so every executor packs an independent
    shard — same kernel, bounded group size; bin ids then offset by shard."""
    d = T(spark, sf_dir, "documents").where(F.length(F.trim("text")) > 0)
    base = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim("text"), _WS_RE)).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        n = pdf["n_tokens"].to_numpy(np.int64)
        bins = np.empty(len(n), np.int32)
        b, acc = 1, 0
        for k in range(len(n)):
            if acc + n[k] <= PACK_BUDGET and k > 0:
                acc += n[k]
            else:
                if k > 0:
                    b += 1
                acc = n[k]
            bins[k] = b
        pdf["bin"] = bins
        return pdf

    return (
        base.groupBy("source")
        .applyInPandas(pack, "doc_id bigint, source string, n_tokens bigint, bin int")
        .orderBy("doc_id")
    )


# --- PII redaction rewrite (the masking pass text_pii_stats scopes) -----------

_RED_EMAIL, _RED_IPV4, _RED_DIGITS = "[EMAIL]", "[IPV4]", "[DIGITS]"

_PII_REDACT_SQL = f"""
WITH s0 AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails,
         regexp_replace(text, '{PII_EMAIL}', '{_RED_EMAIL}', 'g') AS t1
  FROM documents
),
s1 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1, '{PII_IPV4}')) AS n_ipv4,
         regexp_replace(t1, '{PII_IPV4}', '{_RED_IPV4}', 'g') AS t2
  FROM s0
),
s2 AS (
  SELECT doc_id, n_emails, n_ipv4,
         len(regexp_extract_all(t2, '{PII_DIGIT_RUN}')) AS n_digit_runs,
         regexp_replace(t2, '{PII_DIGIT_RUN}', '{_RED_DIGITS}', 'g') AS redacted
  FROM s1
)
SELECT doc_id, redacted,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_ipv4 AS BIGINT) AS n_ipv4,
       CAST(n_digit_runs AS BIGINT) AS n_digit_runs
FROM s2 ORDER BY doc_id
"""


@query("text_pii_redact", oracle=_PII_REDACT_SQL)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The masking rewrite text_pii_stats scopes: staged regexp_replace
    (emails → IPv4 → long digit runs, fixed order so later stages never
    see digits the earlier ones already masked) with per-stage match
    counts. Zero shuffles beyond the presentation sort — one codegen'd
    Project of JVM regex ops per row, the same map-only shape at 10^12
    documents. Patterns are greedy and alternation-free, so Java regex
    (Spark) and RE2 (DuckDB) agree on match spans and the redacted TEXT
    value-hashes identically, not just the counts."""
    return pii_redact_frame(T(spark, sf_dir, "documents")).orderBy("doc_id")


def pii_redact_frame(d: DataFrame) -> DataFrame:
    """The staged redaction over any (doc_id, text) frame — split out so
    tests can feed planted-PII fixtures (the synthetic corpus is
    PII-free, which proves only the no-op path)."""
    s0 = d.select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_replace(F.col("text"), PII_EMAIL, _RED_EMAIL).alias("t1"),
    )
    s1 = s0.select(
        "doc_id",
        "n_emails",
        F.regexp_count("t1", F.lit(PII_IPV4)).cast("long").alias("n_ipv4"),
        F.regexp_replace(F.col("t1"), PII_IPV4, _RED_IPV4).alias("t2"),
    )
    return s1.select(
        "doc_id",
        F.regexp_replace(F.col("t2"), PII_DIGIT_RUN, _RED_DIGITS).alias("redacted"),
        "n_emails",
        "n_ipv4",
        F.regexp_count("t2", F.lit(PII_DIGIT_RUN)).cast("long").alias("n_digit_runs"),
    )


# --------------------------------------------------------------------------
# Character-bigram LM typicality score (corpus-trained, exact rational)
# --------------------------------------------------------------------------

_BIGRAM_LM_SQL = """
WITH bg AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 2) AS b
  FROM documents, UNNEST(range(1, length(text))) AS t(i)
),
vocab AS (SELECT b, COUNT(*) AS cf FROM bg GROUP BY b),
scored AS (
  SELECT bg.doc_id, COUNT(*) AS n_bigrams,
         CAST(SUM(v.cf) AS BIGINT) AS bigram_mass
  FROM bg JOIN vocab v ON v.b = bg.b
  GROUP BY bg.doc_id
)
SELECT doc_id, n_bigrams, bigram_mass,
       CAST(bigram_mass AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS typicality
FROM scored ORDER BY doc_id
"""


@query("text_bigram_likelihood", oracle=_BIGRAM_LM_SQL)
def text_bigram_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained character-bigram language-model typicality — the
    log-free cousin of LM-perplexity quality filtering (train on the corpus
    itself, score each document by how typical its character transitions
    are; low scores flag boilerplate, code, and mojibake). Score = mean
    corpus frequency of the document's bigrams — an exact integer ratio
    (num = Σ corpus-count over the doc's bigram tokens, den = token count),
    so it is bit-identical on both engines where a log-prob sum would
    drift; the ranking it induces is the same as add-one-smoothed unigram-
    backoff perplexity's leading term on this vocabulary.

    Scale shape: bigram extraction is a map-side explode (sequence +
    substring, pure Catalyst — no Python); the model is ONE partial-
    aggregable count shuffle whose result is bounded by the alphabet²
    vocabulary, so the train-table joins back as a BROADCAST; the per-doc
    score is one more partial-aggregable shuffle on doc_id. At 10^12
    documents: two count shuffles + a broadcast join, no sort."""
    d = T(spark, sf_dir, "documents").select("doc_id", "text")
    # Guard: F.sequence defaults step to -1 when start > stop, so a 0/1-char
    # doc would yield [1,0] and emit spurious 1-char "bigrams" while the
    # oracle's range(1, length) is empty (ADVICE r3). Docs shorter than 2
    # chars have no bigrams on either engine.
    bg = (
        d.filter(F.length("text") >= 2)
        .select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(1), F.length("text") - 1)).alias("i"),
        )
        .select("doc_id", F.expr("substring(text, i, 2)").alias("b"))
    )
    vocab = bg.groupBy("b").agg(F.count(F.lit(1)).alias("cf"))
    return (
        bg.join(F.broadcast(vocab), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("cf").alias("bigram_mass"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "bigram_mass",
            (
                F.col("bigram_mass").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("typicality"),
        )
        .orderBy("doc_id")
    )
