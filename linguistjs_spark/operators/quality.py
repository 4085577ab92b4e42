"""Quality features: line metrics (A2) + Gopher/C4-style rules — all native.

Every expression here is a built-in Column expression (split / filter /
aggregate / regexp_count), so the whole stage stays inside whole-stage
codegen on the JVM: no Python in the hot path. The regex patterns are the
exact strings shared with the pure-Python oracle (oracle.py A2 section),
restricted to a Java-regex/Python-re-identical subset.

Reference analog: the aggregation-loop line counting at
/root/reference/src/index.ts:423-433; the Gopher/C4 rules are the graft
addition (BASELINE.json north_star).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import QualityFilterConfig
from ..oracle import (
    BLANK_LINE_PAT,
    BLOCK_COMMENT_PAT,
    LINE_COMMENT_PAT,
    LINE_SPLIT_PAT,
    SYMBOL_PAT,
    WORD_SPLIT_PAT,
)


def _nonblank(arr: Column) -> Column:
    return F.filter(arr, lambda x: ~x.rlike(BLANK_LINE_PAT))


def lines_struct(text: Column) -> Column:
    """struct(total, content, code) — mirrors src/index.ts:426-432.

    The two split arrays are let-bound so each evaluates once per row:
    filter/aggregate lambdas run interpreted (outside codegen CSE), so a
    bare reuse of `all_lines` would re-split the text per reference."""
    from .dedup import _let

    all_lines = F.split(text, LINE_SPLIT_PAT)
    stripped = F.regexp_replace(
        F.regexp_replace(text, LINE_COMMENT_PAT, ""), BLOCK_COMMENT_PAT, ""
    )
    code_lines = F.split(stripped, LINE_SPLIT_PAT)

    def build(b: Column) -> Column:
        return F.struct(
            F.size(b.getField("a")).cast("long").alias("total"),
            F.size(_nonblank(b.getField("a"))).cast("long").alias("content"),
            F.size(_nonblank(b.getField("c"))).cast("long").alias("code"),
        )

    return _let(F.struct(all_lines.alias("a"), code_lines.alias("c")), build)


def words_col(text: Column) -> Column:
    return F.filter(F.split(text, WORD_SPLIT_PAT), lambda x: x != F.lit(""))


def quality_struct(text: Column) -> Column:
    """struct(n_words, mean_word_len, symbol_ratio, dup_line_ratio) — the
    same features as oracle.quality_features, computed JVM-side. The word
    and nonblank-line arrays are let-bound (see lines_struct) so the text
    splits once per row instead of once per referencing expression."""
    from .dedup import _let

    words = words_col(text)
    lines = _nonblank(F.split(text, LINE_SPLIT_PAT))

    def build(b: Column) -> Column:
        w = b.getField("w")
        l = b.getField("l")
        n_words = F.size(w).cast("long")
        char_sum = F.aggregate(
            w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        mean_wl = F.when(n_words > 0, char_sum / n_words).otherwise(F.lit(0.0))
        sym_ratio = F.when(
            F.length(text) > 0,
            F.regexp_count(text, F.lit(SYMBOL_PAT)) / F.length(text),
        ).otherwise(F.lit(0.0))
        n_lines = F.size(l)
        dup_ratio = F.when(
            n_lines > 0,
            F.lit(1.0) - F.size(F.array_distinct(l)) / n_lines,
        ).otherwise(F.lit(0.0))
        return F.struct(
            n_words.alias("n_words"),
            mean_wl.alias("mean_word_len"),
            sym_ratio.alias("symbol_ratio"),
            dup_ratio.alias("dup_line_ratio"),
        )

    return _let(F.struct(words.alias("w"), lines.alias("l")), build)


def quality_drop_reason_col(q: Column, cfg: QualityFilterConfig) -> Column:
    """CASE chain mirroring oracle.quality_drop_reason (rule order matters)."""
    if not cfg.quality_rules:
        return F.lit(None).cast("string")
    return (
        F.when(
            (q.n_words < cfg.min_words) | (q.n_words > cfg.max_words),
            F.lit("quality-words"),
        )
        .when(
            ~q.mean_word_len.between(cfg.min_mean_word_len, cfg.max_mean_word_len),
            F.lit("quality-word-length"),
        )
        .when(q.symbol_ratio > cfg.max_symbol_ratio, F.lit("quality-symbols"))
        .when(q.dup_line_ratio > cfg.max_dup_line_ratio, F.lit("quality-dup-lines"))
        .otherwise(F.lit(None))
    )
