"""Distributed BPE learning (operators/bpe.py) vs the python twin.

The twin is an independent reimplementation of the Sennrich learn_bpe
semantics (all-positions pair counts, greedy left-to-right merge,
count-desc/byte-order tie-break); the Spark side must reproduce its
merges, segmentations, and token counts exactly.
"""

import pytest
from pyspark.sql import functions as F

from linguistjs_spark.operators.bpe import (
    END_OF_WORD,
    bpe_token_counts,
    encode_word_col,
    learn_bpe,
    learn_bpe_local,
    merge_pair_col,
    merge_word_local,
    pair_counts,
    symbols_col,
    token_counts_local,
    word_count_table,
    word_counts_local,
)

TEXTS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest widest"),
    (3, "widest widest\tnewest\nlow"),
    (4, None),
    (5, ""),
    (6, "aaaa aaaa baaa"),          # overlapping-pair semantics
    (7, "café café \U0001F600x"),  # non-ASCII + astral plane
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_word_counts_match_twin(spark, docs):
    got = {
        r["word"]: r["cnt"] for r in word_count_table(docs).collect()
    }
    want = word_counts_local([t for _, t in TEXTS])
    assert got == want
    assert got["low"] == 6 and got["newest"] == 7


def test_symbols_code_points(spark):
    df = spark.createDataFrame(
        [("café",), ("\U0001F600x",), ("a",)], "w string"
    )
    rows = {tuple(r[0]) for r in
            df.select(F.array(symbols_col(F.col("w")))[0]).collect()}
    assert ("c", "a", "f", "é", END_OF_WORD) in rows
    assert ("\U0001F600", "x", END_OF_WORD) in rows
    assert ("a", END_OF_WORD) in rows


def test_merge_fold_greedy_nonoverlapping(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a", "a"],), (["a", "a", "a"],), (["b", "a", "a"],),
         (["a", "b"],), ([],)],
        "syms array<string>",
    )
    out = [r[0] for r in
           df.select(merge_pair_col(F.col("syms"), "a", "a")).collect()]
    assert out == [["aa", "aa"], ["aa", "a"], ["b", "aa"], ["a", "b"], []]
    for syms in [["a", "a", "a", "a"], ["a", "a", "a"], ["b", "a", "a"],
                 ["a", "b"], []]:
        assert merge_word_local(syms, "a", "a") in out


def test_pair_counts_overlapping_weighted(spark):
    vt = spark.createDataFrame(
        [(["a", "a", "a", END_OF_WORD], 2)],
        "syms array<string>, cnt long",
    )
    got = {(r["a"], r["b"]): r["n"] for r in pair_counts(vt).collect()}
    assert got == {("a", "a"): 4, ("a", END_OF_WORD): 2}


def test_learn_bpe_matches_twin(spark, docs):
    merges, vocab = learn_bpe(word_count_table(docs), num_merges=10)
    wc = word_counts_local([t for _, t in TEXTS])
    want_merges, want_vocab = learn_bpe_local(wc, num_merges=10)
    assert merges == want_merges
    assert len(merges) >= 5
    got_vocab = {
        "".join(r["syms"]).replace(END_OF_WORD, ""): r["syms"]
        for r in vocab.collect()
    }
    # reconstruct key: merged symbols concatenate back to the word
    for w, syms in want_vocab.items():
        assert got_vocab[w] == syms


def test_early_stop_min_count(spark):
    docs = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    merges, _ = learn_bpe(word_count_table(docs), num_merges=5, min_count=2)
    assert merges == []  # every pair occurs once


def test_encode_and_token_counts_match_twin(spark, docs):
    wc_df = word_count_table(docs)
    merges, _ = learn_bpe(wc_df, num_merges=8)
    got = {r["token"]: r["n"]
           for r in bpe_token_counts(docs, merges).collect()}
    wc = word_counts_local([t for _, t in TEXTS])
    want = token_counts_local(wc, merges)
    assert got == want


def test_encode_word_col_matches_twin(spark, docs):
    merges, _ = learn_bpe(word_count_table(docs), num_merges=8)
    df = spark.createDataFrame(
        [("lowest",), ("newest",), ("zzz",)], "w string"
    )
    got = {r["w"]: r["e"] for r in df.select(
        "w", encode_word_col(F.col("w"), merges).alias("e")).collect()}
    for w in ("lowest", "newest", "zzz"):
        syms = list(w) + [END_OF_WORD]
        for _, a, b, _ in merges:
            syms = merge_word_local(syms, a, b)
        assert got[w] == syms


def test_fold_is_native_no_python(spark, docs):
    wc = word_count_table(docs)
    df = wc.select(merge_pair_col(symbols_col(F.col("word")), "e", "s"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_sf_docs_learning_deterministic(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    wc = word_count_table(docs)
    m1, _ = learn_bpe(wc, num_merges=6)
    m2, _ = learn_bpe(word_count_table(docs), num_merges=6)
    assert m1 == m2
    assert len(m1) == 6
    assert all(n >= 2 for _, _, _, n in m1)


def test_doc_token_counts_match_twin(spark, docs):
    from linguistjs_spark.operators.bpe import (
        bpe_doc_token_counts, doc_token_counts_local)

    merges, _ = learn_bpe(word_count_table(docs), num_merges=8)
    got = {r["doc_id"]: r["n_tokens"]
           for r in bpe_doc_token_counts(docs, merges).collect()}
    want = doc_token_counts_local(TEXTS, merges)
    assert got == want
    assert got[4] == 0 and got[5] == 0  # NULL / empty text
    # token totals agree with the corpus-wide count path
    corpus = {r["token"]: r["n"]
              for r in bpe_token_counts(docs, merges).collect()}
    assert sum(got.values()) == sum(corpus.values())


def test_doc_token_counts_oov_fallback(spark):
    # merges learned elsewhere: unseen words fall back to unmerged
    # symbol count (chars + </w>)
    from linguistjs_spark.operators.bpe import bpe_doc_token_counts

    merges = [(0, "x", "y", 10)]
    docs = spark.createDataFrame(
        [(0, "abc xyxy")], "doc_id long, text string"
    )
    got = bpe_doc_token_counts(docs, merges).collect()[0]
    # 'abc' -> a b c </w> = 4; 'xyxy' -> xy xy </w> = 3
    assert got["n_tokens"] == 7


def test_encode_words_df_batches_large_merge_lists(spark, docs):
    """encode_words_df must segment identically to the twin at merge
    counts far past one expression tree (the checkpoint-batched path),
    and encode_word_col must refuse them loudly."""
    from linguistjs_spark.operators.bpe import encode_words_df

    wc = {f"prefix{i:02d}word{i % 7}ending": i + 1 for i in range(40)}
    merges, want_vocab = learn_bpe_local(wc, num_merges=100, min_count=1)
    assert len(merges) > 64  # past the single-tree guard
    with pytest.raises(ValueError, match="encode_words_df"):
        encode_word_col(F.col("w"), merges)
    words = spark.createDataFrame(
        [(w,) for w in wc], "word string"
    )
    got = {r["word"]: r["syms"]
           for r in encode_words_df(words, merges, fold_batch=16).collect()}
    assert got == want_vocab
