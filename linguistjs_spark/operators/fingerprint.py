"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003) —
the MOSS algorithm, recast as native Spark Column algebra.

The reference has no fingerprinting surface (its per-file identity is the
path); this is a graft first-class component for the training-data tier:
winnowed fingerprints are the standard index key for local (substring-level)
overlap detection — plagiarism / license-text / boilerplate reuse — where
MinHash (dedup.py) answers whole-document similarity instead.

Algorithm: hash every k-word shingle, slide a window of w consecutive
shingle hashes, keep the minimum of each window, dedupe. The guarantee
(paper §3): any shared run of at least w+k-1 words between two documents
produces at least one shared fingerprint, and the expected density of kept
hashes is 2/(w+1) — a tunable, provable sampling of the shingle stream.

Scale posture (100 TB): fingerprinting is a narrow per-document map — one
scan, zero shuffles; the pair stage is the standard inverted-index shape:
explode fingerprints, drop hot postings (``max_df`` cap, same discipline as
LSH bucket caps in dedup.py), self-equi-join on the fingerprint, count
shared keys per pair. Never all-pairs.

Two hash modes:

* ``xxhash64`` (default) — one JVM hash call per shingle; the production
  path.
* ``poly`` — a 31-base polynomial over the shingle's characters mod
  1e9+7, evaluated with ``aggregate``. ~k× slower (interpreted fold per
  character) but *arithmetically portable*: DuckDB's ``list_reduce`` over
  ``ascii(substring(...))`` reproduces it bit-for-bit, so the driver oracle
  compares hash-EXACT rather than "equal absent 64-bit collisions". The
  oracle queries run this mode; bench runs xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _let, normalized_text

POLY_MOD = 1_000_000_007
POLY_BASE = 31


def poly_hash_col(s: Column) -> Column:
    """(((0*31+c1)*31+c2)...) % 1e9+7 over the string's characters.

    Portable across Spark and DuckDB: DuckDB's ``list_reduce`` without an
    init uses the first element as the seed, and (0*31+c1) == c1, so the
    folds agree. Intermediates stay < 31*(1e9+7)+0x10FFFF << 2^63 — no
    overflow in either engine's BIGINT."""
    return F.aggregate(
        F.sequence(F.lit(1), F.length(s)),
        F.lit(0).cast("long"),
        lambda acc, i: (acc * POLY_BASE + F.ascii(F.substring(s, i, F.lit(1))))
        % POLY_MOD,
    )


def _shingle_hash(shingle: Column, hash_mode: str) -> Column:
    if hash_mode == "xxhash64":
        return F.xxhash64(shingle)
    if hash_mode == "poly":
        return poly_hash_col(shingle)
    raise ValueError(f"unknown hash_mode {hash_mode!r}")


def winnow_fingerprint_col(
    text: Column, k: int = 5, w: int = 4, hash_mode: str = "xxhash64"
) -> Column:
    """array<long> of distinct winnowed fingerprints for one document.

    Shingles are k-word (word-domain shingling keeps the stream length
    proportional to words, not characters; same normalization as
    dedup.shingle_hashes). Documents shorter than k words contribute their
    whole text as a single shingle (hence >=1 fingerprint whenever there is
    >=1 word); empty/NULL text yields an empty array. Streams shorter than
    the window keep the global minimum — the w>=stream degenerate case of
    the paper's scheme."""

    words = F.filter(F.split(normalized_text(text), " "), lambda x: x != F.lit(""))

    def hashes(ws: Column) -> Column:
        n = F.size(ws)
        idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
        sh = F.transform(
            idx, lambda i: _shingle_hash(F.concat_ws(" ", F.slice(ws, i, k)), hash_mode)
        )
        return F.when(n >= k, sh).otherwise(
            F.when(
                n >= 1,
                F.array(_shingle_hash(F.concat_ws(" ", ws), hash_mode)),
            ).otherwise(F.array().cast("array<long>"))
        )

    def winnow(h: Column) -> Column:
        m = F.size(h)
        wins = F.transform(
            F.sequence(F.lit(1), F.greatest(m - (w - 1), F.lit(0))),
            lambda i: F.array_min(F.slice(h, i, w)),
        )
        return F.when(m >= w, F.array_distinct(wins)).otherwise(
            F.when(m >= 1, F.array(F.array_min(h))).otherwise(
                F.array().cast("array<long>")
            )
        )

    return _let(words, lambda ws: _let(hashes(ws), winnow))


def winnow_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-document fingerprint summary: shingle count, fingerprint count,
    and min/max/xor of the fingerprint set (order-free reductions, so the
    oracle does not depend on array_distinct's ordering; xor — not sum —
    because full-range xxhash64 values overflow a BIGINT sum under ANSI
    mode). One scan, zero shuffles."""
    words = F.filter(
        F.split(normalized_text(F.col(text_col)), " "), lambda x: x != F.lit("")
    )
    n_words = F.size(words)
    n_shingles = F.when(n_words >= k, n_words - (k - 1)).otherwise(
        F.when(n_words >= 1, F.lit(1)).otherwise(F.lit(0))
    )
    fps = winnow_fingerprint_col(F.col(text_col), k=k, w=w, hash_mode=hash_mode)
    return docs.select(
        F.col(id_col),
        n_shingles.cast("long").alias("n_shingles"),
        _let(
            fps,
            lambda a: F.struct(
                F.size(a).cast("long").alias("n_fp"),
                F.array_min(a).alias("fp_min"),
                F.array_max(a).alias("fp_max"),
                F.aggregate(
                    a, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseXOR(x)
                ).alias("fp_xor"),
            ),
        ).alias("_s"),
    ).select(id_col, "n_shingles", "_s.n_fp", "_s.fp_min", "_s.fp_max", "_s.fp_xor")


def winnow_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 64,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints.

    Inverted-index join: explode the (already distinct) fingerprint sets,
    drop fingerprints whose posting list exceeds ``max_df`` (a fingerprint
    shared by thousands of documents is boilerplate, not overlap — and its
    posting list would quadratically dominate the join; identical cap
    discipline to dedup.lsh_candidate_pairs), then self-equi-join on the
    fingerprint and count shared keys per (a, b) pair. Shuffles: one
    explode-side exchange on the fingerprint, one on the pair key — both
    AQE-coalescible; never all-pairs."""
    postings = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            winnow_fingerprint_col(F.col(text_col), k=k, w=w, hash_mode=hash_mode)
        ).alias("fp"),
    )
    df_ok = (
        postings.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("fp")
    )
    kept = postings.join(df_ok, "fp")
    a = kept.select(F.col("_id").alias("doc_a"), "fp")
    b = kept.select(F.col("_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
