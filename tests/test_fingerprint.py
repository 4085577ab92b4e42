"""Winnowing fingerprints (operators/fingerprint.py): the paper's coverage
guarantee, density bound, hash-mode parity, portable-hash twin, and edge
cases. The cross-engine oracle parity itself is swept by
test_entry_queries.py (winnow_fingerprints / winnow_pairs rows)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from linguistjs_spark.operators import fingerprint as FP

K, W = 5, 4


def _fps(spark, texts, hash_mode="xxhash64", k=K, w=W):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    rows = df.select(
        "doc_id",
        FP.winnow_fingerprint_col(
            F.col("text"), k=k, w=w, hash_mode=hash_mode
        ).alias("fps"),
    ).collect()
    return {r.doc_id: set(r.fps) for r in rows}


def py_poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * FP.POLY_BASE + ord(ch)) % FP.POLY_MOD
    return h


def test_poly_hash_twin(spark):
    texts = ["hello world", "a", "Zz 9!", "the quick brown fox"]
    df = spark.createDataFrame([Row(s=t) for t in texts])
    got = [r[0] for r in df.select(FP.poly_hash_col(F.col("s"))).collect()]
    assert got == [py_poly_hash(t) for t in texts]


def test_shared_run_guarantee(spark):
    # Paper §3: documents sharing a run of >= w+k-1 words share >= 1
    # fingerprint. Build two docs with disjoint vocab except an 8-word run.
    run = "alpha beta gamma delta epsilon zeta eta theta"  # w+k-1 = 8 words
    a = "one two three four " + run + " five six seven"
    b = "red green blue yellow " + run + " purple orange pink"
    for mode in ("xxhash64", "poly"):
        fps = _fps(spark, [a, b], hash_mode=mode)
        assert fps[0] & fps[1], mode


def test_disjoint_docs_share_nothing(spark):
    a = "aa bb cc dd ee ff gg hh ii jj"
    b = "kk ll mm nn oo pp qq rr ss tt"
    fps = _fps(spark, [a, b])
    assert not (fps[0] & fps[1])


def test_density_bound_and_subset_of_shingles(spark):
    text = " ".join(f"w{i % 37}" for i in range(200))
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    row = FP.winnow_stats(df, k=K, w=W).collect()[0]
    # n_windows = n_shingles - w + 1; fingerprints are distinct window mins
    assert 1 <= row.n_fp <= row.n_shingles - W + 1
    assert row.n_shingles == 200 - (K - 1)


def test_edge_cases(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=None),
            Row(doc_id=1, text=""),
            Row(doc_id=2, text="   \t \n "),
            Row(doc_id=3, text="one"),
            Row(doc_id=4, text="one two three"),  # < k words: one shingle
            Row(doc_id=5, text="a b c d e"),  # exactly k words: one window min
        ]
    )
    rows = {r.doc_id: r for r in FP.winnow_stats(df, k=K, w=W).collect()}
    for d in (0, 1, 2):
        assert rows[d].n_fp == 0 and rows[d].fp_min is None
        assert rows[d].fp_xor == 0
    for d in (3, 4, 5):
        assert rows[d].n_fp == 1
        assert rows[d].fp_min == rows[d].fp_max == rows[d].fp_xor


def test_planted_copy_pairs_production_mode(spark):
    # The xxhash64 production mode finds planted full copies exactly like
    # the oracle-checked poly mode: a copy shares its source's entire
    # fingerprint set.
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    base = docs.filter(F.col("doc_id") < 10).select("doc_id", "text")
    planted = base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    corpus = base.unionByName(planted)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in FP.winnow_candidate_pairs(
            corpus, k=K, w=W, min_shared=1, max_df=64
        ).collect()
    }
    stats = {
        r.doc_id: r.n_fp
        for r in FP.winnow_stats(base, k=K, w=W).collect()
    }
    for d, n_fp in stats.items():
        if n_fp >= 1:
            assert (d, d + 1_000_000) in pairs


def test_max_df_cap_drops_boilerplate(spark):
    # A fingerprint present in more than max_df docs must not generate pairs.
    text = "same boiler plate text everywhere here"  # 6 words -> 2 shingles
    df = spark.createDataFrame(
        [Row(doc_id=i, text=text) for i in range(5)]
    )
    pairs = FP.winnow_candidate_pairs(
        df, k=K, w=W, min_shared=1, max_df=4
    ).collect()
    assert pairs == []  # df == 5 > 4 for every fingerprint
