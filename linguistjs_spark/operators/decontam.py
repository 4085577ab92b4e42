"""Benchmark decontamination for training corpora.

Flags every document that shares at least one word n-gram (default n=13,
the common eval-decontamination window) with a benchmark/eval set, so
training data can be filtered before an eval suite leaks into it.

Shares the exact tokenization + shingling kernel with the MinHash dedup
stage (``dedup.shingle_hashes``: lowercase, explicit-ASCII-whitespace
split, xxhash64 of the space-joined window; short docs fall back to one
whole-text shingle = exact-match decontamination for texts under n words).

Scale shape (10^12 docs vs a benchmark of ~10^5-10^7 n-grams):
  * the benchmark n-gram set is tiny (eval suites are MBs) — built once,
    distinct, and **broadcast**; the corpus side never shuffles for the
    probe: explode(doc n-grams) -> broadcast LEFT SEMI join.
  * hits are aggregated per doc (shuffle carries only (doc_id, ngram) pairs
    for *matching* rows — contamination is rare, so this shuffle is ~0) and
    the resulting contaminated-id set joins back onto the corpus for the
    final flag column UNHINTED: AQE broadcasts it while it is small (the
    common case, leaving the corpus unshuffled end-to-end) and falls back
    to a sort-merge join if contamination were ever pathologically
    widespread — an explicit broadcast hint would instead abort the job,
    since user hints are never demoted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_hashes


def benchmark_ngrams(
    bench: DataFrame, text_col: str = "text", n: int = 13
) -> DataFrame:
    """Distinct xxhash64 word-n-gram hashes of the benchmark set — one
    column ``ngram_hash``; small enough to broadcast."""
    return (
        bench.select(F.explode(shingle_hashes(F.col(text_col), k=n)).alias("ngram_hash"))
        .distinct()
    )


def contamination_flags(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Input docs plus ``n_hits`` (distinct benchmark n-grams present) and
    ``is_contaminated``; clean docs pass through with (0, false)."""
    bg = benchmark_ngrams(bench, text_col=text_col, n=n)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(shingle_hashes(F.col(text_col), k=n)).alias("ngram_hash"),
    )
    hits = (
        doc_grams.join(F.broadcast(bg), "ngram_hash", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    # NO broadcast hint on `hits`: a user hint is never demoted by AQE, so
    # hinting here would abort the job (broadcast limit / driver OOM) if
    # contamination were ever widespread. Unhinted, AQE broadcasts it when
    # it is small (the common case) and falls back to sort-merge otherwise.
    return (
        docs.join(hits, id_col, "left")
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)))
        .withColumn("is_contaminated", F.col("n_hits") > 0)
    )
