"""Bloom-filter cross-corpus dedup (dedup.bloom_filter_table/bloom_probe):
position parity against the hash twin, end-to-end bit-exact verdict
parity, the no-false-negative guarantee, and plan shape (broadcast join,
no sort-merge, no python)."""

from pyspark.sql import functions as F

import linguistjs_spark.operators.dedup as DD
from linguistjs_spark.hash_twin import (
    oracle_bloom_maybe_dup,
    oracle_bloom_positions,
)

TEXTS = [
    "", "a", "hello world", "the quick brown fox", "ünïcødé £ text",
    "x" * 100, "line one\nline two", "🎉 astral", "the quick brown fox",
]


def test_bloom_positions_match_twin(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "i long, t string"
    )
    got = {
        r["i"]: list(r["p"])
        for r in df.select(
            "i", DD._bloom_positions(F.col("t"), 1 << 22, 7).alias("p")
        ).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == oracle_bloom_positions(t, 1 << 22, 7), t
    # positions are in-range and k-long
    assert all(0 <= p < (1 << 22) for ps in got.values() for p in ps)
    assert all(len(ps) == 7 for ps in got.values())


def test_bloom_probe_matches_twin_and_never_misses(spark):
    # reference = docs 0..9; corpus = byte-identical twins of 0..4 (under
    # other ids) + 5 fresh docs. Twin parity is bit-exact; the 5 true
    # dups MUST flag maybe_dup (no false negatives, not a probability).
    ref_texts = [f"reference document number {i} with words" for i in range(10)]
    corpus = [(100 + i, ref_texts[i]) for i in range(5)] + [
        (200 + i, f"novel unseen document {i} entirely") for i in range(5)
    ]
    ref_df = spark.createDataFrame(
        [(t,) for t in ref_texts], "text string"
    )
    corpus_df = spark.createDataFrame(corpus, "doc_id long, text string")
    filt = DD.bloom_filter_table(ref_df, m_bits=1 << 16, k=5)
    got = {
        r["doc_id"]: r["maybe_dup"]
        for r in DD.bloom_probe(
            corpus_df, filt, m_bits=1 << 16, k=5
        ).collect()
    }
    exp = oracle_bloom_maybe_dup(corpus, ref_texts, m_bits=1 << 16, k=5)
    assert got == exp
    for i in range(5):
        assert got[100 + i] is True   # exact twins always hit


def test_bloom_filter_table_is_bounded(spark):
    # the filter table never exceeds m/64 rows, whatever the corpus size
    ref = spark.range(500).selectExpr("CAST(id AS STRING) AS text")
    m = 1 << 12
    tab = DD.bloom_filter_table(ref, m_bits=m, k=7).collect()
    assert len(tab) <= m // 64
    assert all(0 <= r["word"] < m // 64 for r in tab)


def test_bloom_plan_broadcast_no_python(spark):
    from linguistjs_spark.plans.explain_utils import formatted_plan

    ref = spark.range(50).selectExpr("CAST(id AS STRING) AS text")
    corpus = spark.range(50).selectExpr(
        "id AS doc_id", "CAST(id + 25 AS STRING) AS text"
    )
    out = DD.bloom_probe(corpus, DD.bloom_filter_table(ref))
    plan = formatted_plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
