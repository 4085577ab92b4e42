"""Text-analysis operators for training-data pipelines (graft first-class
components): token counting, language-ID over plain text, quality scoring,
and document fingerprinting. All native Column expressions — no Python in
the hot path; every one has a DuckDB-expressible oracle twin in
__spark_entry__.py."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..oracle import WORD_SPLIT_PAT
from .quality import _WORD_RUN_PAT, quality_struct
from .scrub import nl_lang_col

# BPE-ish subword proxy: runs of word chars, digits, or single punctuation —
# a deterministic, engine-portable approximation of a tokenizer's piece count.
BPE_TOKEN_PAT = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_count_col(text: Column) -> Column:
    """Whitespace token count (exact words): one regexp_count of non-ws
    runs — same value as size(words_col(text)) without the array."""
    return F.regexp_count(text, F.lit(_WORD_RUN_PAT)).cast("long")


def bpe_token_count_col(text: Column) -> Column:
    """Tokenizer-piece proxy count via one regexp_count (JVM-side)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PAT)).cast("long")


def fingerprint_col(text: Column) -> Column:
    """64-bit document fingerprint (xxhash64 of normalized text): whitespace
    runs collapsed + lowercased, the canonical exact-dup key at scale."""
    norm = F.lower(F.regexp_replace(text, WORD_SPLIT_PAT, " "))
    return F.xxhash64(F.trim(norm))


def doc_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stat frame over a documents-shaped table."""
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count_col(t).alias("n_tokens"),
        bpe_token_count_col(t).alias("n_bpe_tokens"),
        F.octet_length(t).cast("long").alias("n_bytes"),
        quality_struct(t).alias("quality"),
        nl_lang_col(t).alias("nl_lang"),
        fingerprint_col(t).alias("fingerprint"),
    )
