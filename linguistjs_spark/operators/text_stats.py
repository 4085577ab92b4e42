"""Text-analysis operators for training-data pipelines (graft first-class
components): token counting, language-ID over plain text, quality scoring,
and document fingerprinting. All native Column expressions — no Python in
the hot path (single documented exception: ``zlib_len_col``, an Arrow-
batched DEFLATE-length kernel with no native equivalent); every one has a
DuckDB-expressible oracle twin in __spark_entry__.py."""

from __future__ import annotations

import pandas as pd
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


# Flesch–Kincaid readability (Kincaid et al. 1975): a standard web-text
# quality/education signal (the FineWeb-Edu-style "is this instructive
# prose" family). Whole-text regexp_count scans only — no arrays, no UDF,
# and no transcendentals, so the value is cross-engine bit-exact from the
# three integer counts with NO quantization needed (IEEE +,-,*,/ on
# identical doubles in identical order).
SENTENCE_END_PAT = r"[.!?]+"
# syllable proxy: vowel GROUPS per lowercased text (the classic
# vowel-run approximation; 'y' counts as a vowel)
VOWEL_RUN_PAT = r"[aeiouy]+"

_FK_W = 0.39
_FK_S = 11.8
_FK_C = 15.59


def fk_grade_col(text: Column) -> Column:
    """Flesch–Kincaid grade level; NULL when the document has no words.

    grade = 0.39*(words/sentences) + 11.8*(syllables/words) - 15.59,
    with sentences floored at 1 (a fragment without terminal punctuation
    is one sentence). Restate in SQL with the same operation order for
    bit-identical doubles."""
    words = F.regexp_count(text, F.lit(_WORD_RUN_PAT)).cast("double")
    sents = F.greatest(
        F.regexp_count(text, F.lit(SENTENCE_END_PAT)).cast("double"),
        F.lit(1.0),
    )
    syls = F.regexp_count(F.lower(text), F.lit(VOWEL_RUN_PAT)).cast("double")
    grade = (
        F.lit(_FK_W) * (words / sents)
        + F.lit(_FK_S) * (syls / words)
        - F.lit(_FK_C)
    )
    return F.when(words > 0, grade)


def fk_band_col(grade: Column) -> Column:
    """Readability band from the FK grade: elementary (<6), middle
    (<9), high (<13), college (>=13), or 'nontext' for NULL grades
    (no words — NULL text included)."""
    return (
        F.when(grade.isNull(), F.lit("nontext"))
        .when(grade < 6, F.lit("elementary"))
        .when(grade < 9, F.lit("middle"))
        .when(grade < 13, F.lit("high"))
        .otherwise(F.lit("college"))
    )


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


def zlib_len_col(text: Column, level: int = 6) -> Column:
    """DEFLATE-compressed byte length of the UTF-8 text — the one Arrow-
    batched kernel in this module (everything else is a native Column
    expression): DEFLATE has no JVM-built-in Spark function, and the
    compressed LENGTH of a document cannot be approximated columnar-ly.
    Per-batch cost is one C zlib call per document (the python loop only
    dispatches); NULL in, NULL out.

    Only the integer length crosses back over Arrow — the ratio below is
    computed natively against octet_length, so the float arithmetic stays
    engine-portable and the DuckDB oracle can restate everything except
    the integer itself (which a python twin supplies as literal VALUES)."""
    @F.pandas_udf("long")
    def _zlen(s: pd.Series) -> pd.Series:
        import zlib

        return pd.Series(
            [
                None if t is None
                else len(zlib.compress(t.encode("utf-8"), level))
                for t in s
            ],
            dtype="Int64",
        )

    return _zlen(text)


def compression_signal(
    docs: DataFrame,
    text_col: str = "text",
    level: int = 6,
    low: float = 0.30,
    high: float = 0.98,
) -> DataFrame:
    """Compression-ratio quality signal (the Dolma / RedPajama-style
    "gzip ratio" heuristic): ratio = deflate_len / raw_len. Highly
    repetitive or boilerplate text compresses far below natural prose
    (ratio < ``low`` → ``repetitive``); near-incompressible text is
    usually base64 blobs, minified code, or binary mislabeled as text
    (ratio > ``high`` → ``opaque``); the band between is ``normal``.

    Adds (raw_b, comp_b, comp_ratio, comp_flag) to ``docs``. One narrow
    projection — the only shuffle-free stage cost is the zlib kernel,
    whose output is an 8-byte integer per document, so downstream rollups
    never carry text."""
    raw = F.octet_length(F.col(text_col))
    out = docs.withColumn("raw_b", raw.cast("long")).withColumn(
        "comp_b", zlib_len_col(F.col(text_col), level))
    ratio = F.when(
        F.col("raw_b") > 0,
        F.col("comp_b").cast("double") / F.col("raw_b").cast("double"),
    )
    flag = (
        F.when(ratio.isNull(), F.lit(None).cast("string"))
        .when(ratio < F.lit(low), F.lit("repetitive"))
        .when(ratio > F.lit(high), F.lit("opaque"))
        .otherwise(F.lit("normal"))
    )
    return out.withColumn("comp_ratio", ratio).withColumn("comp_flag", flag)


def zlib_len_py(text: str | None, level: int = 6) -> int | None:
    """Row twin of zlib_len_col — same in-process zlib, so the VALUES
    oracle is byte-identical by construction."""
    import zlib

    if text is None:
        return None
    return len(zlib.compress(text.encode("utf-8"), level))
