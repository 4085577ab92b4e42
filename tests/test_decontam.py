"""Benchmark decontamination: 13-gram overlap semantics, short-text
exact-match fallback, and broadcast-probe plan shape."""

from pyspark.sql import functions as F

from linguistjs_spark.operators.decontam import contamination_flags

WORDS = ("the quick brown fox jumps over the lazy dog while seven wizards "
         "brew strong coffee before dawn breaks gently")


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contaminated_iff_13gram_shared(spark):
    bench = _df(spark, [(100, WORDS)])
    docs = _df(spark, [
        # full copy -> contaminated
        (1, WORDS),
        # first 13 words verbatim inside fresh prose -> contaminated
        (2, "totally new intro " + " ".join(WORDS.split()[:13]) + " and new tail"),
        # only a 12-word window shared -> clean
        (3, "x " + " ".join(WORDS.split()[:12]) + " y"),
        # nothing shared -> clean
        (4, "completely unrelated text about spark shuffles and parquet files"),
    ])
    got = {r.doc_id: (r.n_hits, r.is_contaminated)
           for r in contamination_flags(docs, bench, n=13).collect()}
    assert got[1][1] and got[1][0] > 1
    assert got[2] == (1, True)
    assert got[3] == (0, False)
    assert got[4] == (0, False)


def test_short_text_exact_match_fallback(spark):
    # under n words both sides collapse to one whole-text shingle:
    # decontamination degrades to exact normalized match, not a skip
    bench = _df(spark, [(100, "short eval answer")])
    docs = _df(spark, [
        (1, "  SHORT   eval\tanswer "),   # normalizes equal -> contaminated
        (2, "short eval answers"),         # different -> clean
    ])
    got = {r.doc_id: r.is_contaminated
           for r in contamination_flags(docs, bench).collect()}
    assert got[1] is True and got[2] is False


def test_probe_plan_broadcasts_both_sides(spark):
    bench = _df(spark, [(100, WORDS)])
    docs = _df(spark, [(i, WORDS + f" tail {i}") for i in range(10)])
    out = contamination_flags(docs, bench)
    out.collect()  # the flag join is unhinted: AQE decides at runtime
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # benchmark n-gram probe is hint-broadcast; the small hits flag-join is
    # AQE-broadcast in the executed final plan — the corpus side is never
    # shuffled for either join
    assert final.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in final
