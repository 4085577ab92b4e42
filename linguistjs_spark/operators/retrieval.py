"""Corpus retrieval scoring: Okapi BM25 over the documents table.

Web-scale training pipelines use lexical retrieval scores both for
corpus curation (query-targeted subsetting, e.g. "collect docs that look
like the eval domain") and for dataset search tooling. The reference has
no retrieval tier (its cascade ends at heuristics); this is a
first-class graft component like dedup/ANN.

Spark-first shape — the 100-TB contract:

  * ONE token-array projection per document (`regexp_extract_all`,
    let-bound so the scan happens once per row), then per-query-term
    term frequencies as `size(filter(tokens, = term))` — NO explode, NO
    per-term join, text never shuffles.
  * Corpus statistics (N, total length, per-term document frequency)
    are ONE map-side-combined global aggregate producing a SINGLE row,
    joined back by broadcast — the same 1-row-broadcast pattern as
    link_graph's dangling-mass step.  Two passes over the pushed-down
    (doc_id, text) columns total; zero wide shuffles.
  * The per-document score is a driver-built Column fold over the
    (small, bounded) query-term list — whole-stage codegen, no UDF.

Determinism contract (cross-engine hash matching): `ln` is the only
transcendental and libm may differ in the last ulp between the JVM and
DuckDB, so the IDF and each term's contribution are quantized to
multiples of 2^-20 (`_qd`) in BOTH engines; everything else is IEEE
+,-,*,/ on identical doubles, which is bit-identical.  The horizontal
sum over query terms is a fixed-order fold in one row (no cross-row
float aggregation), so no order-free-exactness bound is needed.

BM25 per Robertson et al. (Okapi TREC-3), Lucene-style non-negative IDF:
  idf(t)  = ln( (N - df + 0.5) / (df + 0.5) + 1 )
  s(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b*dl/avgdl))
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _let

# Lowercased alphanumeric runs: the classic lexical-retrieval tokenizer,
# stated identically to Java regex and DuckDB/RE2.
TOKEN_PAT = r"[a-z0-9]+"

_Q = float(2**20)
K1 = 1.2
B = 0.75


def _validate_terms(terms: list[str]) -> None:
    """Query terms must be tokenizer-shaped (lowercase alphanumeric):
    anything else can never equal a token, so a mixed-case or
    punctuated term is a silent always-zero bug — and would also break
    the oracle restatement's SQL literals."""
    import re

    if not terms:
        raise ValueError("terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError("terms must be distinct")
    bad = [t for t in terms if not re.fullmatch(TOKEN_PAT, t)]
    if bad:
        raise ValueError(
            f"terms must be lowercase alphanumeric tokens: {bad!r}")


def tokens_col(text: Column) -> Column:
    """Lowercased alphanumeric token array; NULL text -> empty array."""
    return F.regexp_extract_all(
        F.lower(F.coalesce(text, F.lit(""))), F.lit(TOKEN_PAT), 0
    )


def _qd(c: Column) -> Column:
    """Quantize to a 2^-20 dyadic (ties away from zero in both engines)."""
    return F.round(c * F.lit(_Q)) / F.lit(_Q)


def term_frequencies(
    docs: DataFrame,
    terms: list[str],
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, dl, tf_0..tf_{k-1}) in ONE projection.

    The token array is let-bound so `regexp_extract_all` runs once per
    row even though k+1 expressions consume it (HOF lambda children are
    not CSE'd — see dedup._let).  dl counts ALL tokens, not just query
    terms (BM25's length normalization needs the true document length).
    """
    _validate_terms(terms)

    def eq(term: str):
        # closure factory, NOT `lambda x, t=t`: pyspark counts a HOF
        # lambda's parameters to decide whether to pass (element) or
        # (element, index) — a defaulted second arg would receive the
        # array index Column
        return lambda x: x == F.lit(term)

    def build(ts: Column) -> Column:
        return F.struct(
            F.size(ts).cast("long").alias("dl"),
            *[
                F.size(F.filter(ts, eq(t))).cast("long").alias(f"tf_{i}")
                for i, t in enumerate(terms)
            ],
        )
    s = _let(tokens_col(F.col(text_col)), build)
    return docs.select(F.col(doc_id_col), s.alias("_s")).select(
        doc_id_col,
        F.col("_s.dl").alias("dl"),
        *[F.col(f"_s.tf_{i}").alias(f"tf_{i}") for i in range(len(terms))],
    )


def corpus_stats(base: DataFrame, n_terms: int) -> DataFrame:
    """ONE-row corpus aggregate: N, sum(dl), df per query term.

    Map-side combined (sum/count over longs); the single output row is
    the broadcast side of the score join.  df counts documents where the
    term occurs at least once (standard document frequency).
    """
    return base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"df_{i}")
            for i in range(n_terms)
        ],
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = K1,
    b: float = B,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 score against a bounded query-term list.

    Returns (doc_id, dl, score) for every document (score 0.0 when no
    query term occurs).  Plan: scan -> tf projection -> [1-row agg]
    broadcast-joined back -> codegen score fold.  The only shuffle is
    the 1-row aggregate; document text never moves.
    """
    base = term_frequencies(docs, terms, doc_id_col, text_col)
    g = corpus_stats(base, len(terms))
    joined = base.join(F.broadcast(g))

    avgdl = F.col("sum_dl") / F.col("n_docs")
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}")
        idf = _qd(
            F.log((F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
                  + F.lit(1.0))
        )
        norm = tf * F.lit(k1 + 1.0) / (
            tf + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("dl").cast("double") / avgdl)
        )
        score = score + F.when(tf > 0, _qd(idf * norm)).otherwise(F.lit(0.0))

    return joined.select(doc_id_col, "dl", score.alias("score"))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 25,
    k1: float = K1,
    b: float = B,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score, deterministic (doc_id tiebreak).

    The orderBy+limit compiles to TakeOrderedAndProject — per-partition
    top-k heaps then a k-row driver merge, never a global sort — the
    right shape when k is tiny against 10^12 rows.
    """
    scored = bm25_scores(docs, terms, k1, b, doc_id_col, text_col)
    return (
        scored.where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(doc_id_col))
        .limit(k)
    )


def keyword_topk(
    docs: DataFrame,
    k: int = 3,
    max_df_num: int = 1,
    max_df_den: int = 2,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k keywords by tf-idf — the UNBOUNDED-vocab
    complement to bm25_topk's bounded-query shape.

    Plan (the honest inverted-index pipeline at 10^12 docs):
      1. explode tokens -> groupBy(doc_id, term) count  [shuffle 1: the
         posting-list build; map-side combine collapses in-doc repeats]
      2. groupBy(term) count -> df                      [shuffle 2: term
         dictionary; orders of magnitude smaller than postings]
      3. corpus N as a 1-row broadcast
      4. postings JOIN df on term — a real keyed shuffle join (the term
         dictionary is vocab-sized: NOT broadcastable at corpus scale)
      5. stopword suppression by integer document-frequency ratio:
         keep iff df * max_df_den <= N * max_df_num (exact, no floats)
      6. tfidf = tf * qd(ln(N/df)) — integer x 2^-20 dyadic, exact in
         float64 (no cross-row float aggregation anywhere)
      7. per-doc window top-k, ties broken by term — deterministic

    Returns (doc_id, term, tf, tfidf, rank). Documents with no kept
    term (NULL/empty text, or all terms too frequent) are absent.
    """
    from pyspark.sql import Window

    tf = (
        docs.select(
            F.col(doc_id_col),
            F.explode(tokens_col(F.col(text_col))).alias("term"),
        )
        .groupBy(doc_id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))

    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .where(F.col("df") * F.lit(max_df_den)
               <= F.col("n_docs") * F.lit(max_df_num))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * _qd(F.log(F.col("n_docs").cast("double")
                        / F.col("df").cast("double"))),
        )
    )
    w = Window.partitionBy(doc_id_col).orderBy(
        F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(doc_id_col, "term", "tf", "tfidf", "rank")
    )


def keyword_topk_oracle_sql(
    k: int = 3,
    max_df_num: int = 1,
    max_df_den: int = 2,
    source: str = "documents",
) -> str:
    """DuckDB restatement of keyword_topk: same tokenizer, same integer
    df-ratio gate, same quantized-ln tfidf, same (tfidf desc, term)
    window order."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')),
                                   '{TOKEN_PAT}')) AS term
  FROM {source}
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {source}),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         CAST(tf.tf AS DOUBLE) *
           (round(ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
                  * 1048576.0) / 1048576.0) AS tfidf
  FROM tf JOIN df USING (term), n
  WHERE df.df * {max_df_den} <= n.n_docs * {max_df_num}
),
ranked AS (
  SELECT doc_id, term, tf, tfidf,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, term) AS BIGINT)
           AS rank
  FROM scored
)
SELECT doc_id, term, tf, tfidf, rank FROM ranked WHERE rank <= {k}
"""


def bm25_oracle_sql(
    terms: list[str],
    k: int = 25,
    k1: float = K1,
    b: float = B,
    source: str = "documents",
) -> str:
    """DuckDB restatement of bm25_topk over the same table.

    Same tokenizer regex, same list_filter tf, same 1-row corpus CTE,
    same quantized-ln score algebra (see module docstring for why the
    result hash-matches bit-for-bit)."""
    _validate_terms(terms)
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(ts, x -> x = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"CAST(SUM(CAST(tf_{i} > 0 AS BIGINT)) AS DOUBLE) AS df_{i}"
        for i in range(len(terms))
    )
    qd = "round(({x}) * 1048576.0) / 1048576.0"
    parts = []
    for i in range(len(terms)):
        idf = qd.format(
            x=f"ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        )
        norm = (
            f"CAST(tf_{i} AS DOUBLE) * {k1 + 1.0!r} / "
            f"(CAST(tf_{i} AS DOUBLE) + {k1!r} * ({1.0 - b!r} + {b!r} * "
            f"CAST(dl AS DOUBLE) / (sum_dl / n_docs)))"
        )
        contrib = qd.format(x=f"({idf}) * ({norm})")
        parts.append(
            f"CASE WHEN tf_{i} > 0 THEN {contrib} ELSE 0.0 END"
        )
    score = " + ".join(parts)
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '{TOKEN_PAT}') AS ts
  FROM {source}
),
base AS (
  SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl,
         {tf_cols}
  FROM toks
),
g AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) AS sum_dl,
         {df_cols}
  FROM base
)
SELECT doc_id, dl, score
FROM (SELECT doc_id, dl, 0.0 + {score} AS score FROM base, g)
WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT {k}
"""
