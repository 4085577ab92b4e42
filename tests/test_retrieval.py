"""BM25 retrieval operator: python-twin parity, edge cases, plan shape.

The twin recomputes Okapi BM25 with the module's exact determinism
contract (same tokenizer, same quantized-ln algebra, same fixed fold
order) so the comparison is bit-identical float equality, not approx.
The DuckDB restatement is additionally swept by test_entry_queries.py
via the bm25_topk registry row.
"""

import math
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from linguistjs_spark.operators.retrieval import (
    B,
    K1,
    TOKEN_PAT,
    bm25_scores,
    bm25_topk,
    term_frequencies,
)

_Q = float(2**20)


def _qd(v: float) -> float:
    # HALF_UP for non-negative values (all BM25 idf/contribs are >= 0)
    return math.floor(v * _Q + 0.5) / _Q


def _twin(rows, terms, k1=K1, b=B):
    toks = {
        d: re.findall(TOKEN_PAT, (t or "").lower()) for d, t in rows
    }
    dl = {d: len(ts) for d, ts in toks.items()}
    tf = {d: [ts.count(t) for t in terms] for d, ts in toks.items()}
    n = float(len(rows))
    sum_dl = float(sum(dl.values()))
    avgdl = sum_dl / n
    df = [float(sum(1 for d in toks if tf[d][i] > 0))
          for i in range(len(terms))]
    out = {}
    for d in toks:
        s = 0.0
        for i in range(len(terms)):
            t = float(tf[d][i])
            if t <= 0:
                continue
            idf = _qd(math.log((n - df[i] + 0.5) / (df[i] + 0.5) + 1.0))
            norm = t * (k1 + 1.0) / (
                t + k1 * (1.0 - b + b * float(dl[d]) / avgdl)
            )
            s = s + _qd(idf * norm)
        out[d] = (dl[d], s)
    return out


_ROWS = [
    (0, "Spark merge WINDOW spark spark9 window; vector_x"),
    (1, "merge merge merge merge merge stream"),
    (2, None),
    (3, ""),
    (4, "...!!!"),
    (5, "customer stream vector spark"),
    (6, "the quick brown fox jumps over 42 lazy dogs"),
    (7, "spark spark spark spark spark spark spark spark"),
    (8, "Vector VECTOR vector,vector.vector"),
]
_TERMS = ["spark", "window", "merge", "vector", "customer", "zzzunseen"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_ROWS, "doc_id long, text string")


def test_term_frequencies_edges(docs):
    got = {
        r["doc_id"]: r.asDict()
        for r in term_frequencies(docs, _TERMS).collect()
    }
    # tokens of doc 0: spark merge window spark spark9 window vector x
    # ('spark9' is ONE token distinct from 'spark'; '_' and ';' split;
    # case folds) -> dl=8, tf(spark)=2, tf(window)=2, tf(vector)=1
    assert got[0]["dl"] == 8
    assert got[0]["tf_0"] == 2 and got[0]["tf_1"] == 2
    assert got[0]["tf_3"] == 1
    twin = _twin(_ROWS, _TERMS)
    for d, (dl, _) in twin.items():
        assert got[d]["dl"] == dl, d
        assert got[d]["tf_0"] == [
            t for t in re.findall(TOKEN_PAT, (dict(_ROWS)[d] or "").lower())
        ].count("spark")
    # NULL and empty and punctuation-only all give dl=0, all tf=0
    for d in (2, 3, 4):
        assert got[d]["dl"] == 0
        assert all(got[d][f"tf_{i}"] == 0 for i in range(len(_TERMS)))
    # absent term never occurs
    assert all(got[d]["tf_5"] == 0 for d in got)


def test_bm25_scores_match_twin_bitwise(docs):
    twin = _twin(_ROWS, _TERMS)
    got = {r["doc_id"]: r for r in bm25_scores(docs, _TERMS).collect()}
    assert set(got) == set(twin)
    for d, (dl, s) in twin.items():
        assert got[d]["dl"] == dl
        # bit-identical, not approx: the determinism contract under test
        assert got[d]["score"] == s, (d, got[d]["score"], s)
    # docs with no query term score exactly 0
    for d in (2, 3, 4, 6):
        assert got[d]["score"] == 0.0


def test_bm25_topk_order_and_filter(docs):
    rows = bm25_topk(docs, _TERMS, k=3).collect()
    twin = _twin(_ROWS, _TERMS)
    want = sorted(
        ((s, d) for d, (_, s) in twin.items() if s > 0),
        key=lambda p: (-p[0], p[1]),
    )[:3]
    assert [(r["score"], r["doc_id"]) for r in rows] == want


def test_bm25_plan_shape(docs):
    plan = bm25_topk(docs, _TERMS, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan           # no python UDF anywhere
    # the only join is the 1-row broadcast corpus-stats join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


_frag = st.one_of(
    st.text(alphabet="ab1 xy\n\t.!?", min_size=0, max_size=30),
    st.sampled_from([
        "the quick fox", "a a a a", "SPARK Spark spark", "x1 x1 y2",
        "merge;merge,merge", "", "   ", "§±µ 🎉", "zzzunseen",
        "vector_x vector", "0 1 2 3 4 5",
    ]),
)

_texts = st.lists(
    st.builds(lambda parts: " ".join(parts), st.lists(_frag, max_size=6)),
    min_size=1,
    max_size=12,
)
_FUZZ_TERMS = ["a", "the", "spark", "merge", "x1", "zzzunseen"]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_texts)
def test_bm25_scores_fuzz(spark, batch):
    rows = [(i, t) for i, t in enumerate(batch)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    twin = _twin(rows, _FUZZ_TERMS)
    got = {
        r["doc_id"]: r for r in bm25_scores(df, _FUZZ_TERMS).collect()
    }
    assert set(got) == set(twin)
    for d, (dl, s) in twin.items():
        assert got[d]["dl"] == dl, (d, batch[d])
        assert got[d]["score"] == s, (d, batch[d], got[d]["score"], s)


def _kw_twin(rows, k=3, num=1, den=2):
    from collections import Counter

    tf = {d: Counter(re.findall(TOKEN_PAT, (t or "").lower()))
          for d, t in rows}
    dfc = Counter()
    for c in tf.values():
        for term in c:
            dfc[term] += 1
    n = len(rows)
    out = []
    for d, c in tf.items():
        cand = [
            (term, f, float(f) * _qd(math.log(float(n) / float(dfc[term]))))
            for term, f in c.items() if dfc[term] * den <= n * num
        ]
        cand.sort(key=lambda x: (-x[2], x[0]))
        out.extend((d, t, f, s, r) for r, (t, f, s) in enumerate(cand[:k], 1))
    return sorted(out)


def test_keyword_topk_matches_twin(spark):
    from linguistjs_spark.operators.retrieval import keyword_topk

    rows = [
        (0, "rare unique apple apple banana the the the"),
        (1, "the the common words common here"),
        (2, None),                          # absent from output
        (3, ""),                            # absent from output
        (4, "the zebra"),                   # 'the' df-gated (in 5/6 docs)
        (5, "the common banana xylophone xylophone xylophone"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["term"], r["tf"], r["tfidf"], r["rank"])
        for r in keyword_topk(df, k=3).collect()
    )
    want = _kw_twin(rows)
    assert got == want
    # 'the' occurs in 4 of 6 docs -> df*2 > N -> never a keyword
    assert all(t != "the" for _, t, _, _, _ in got)
    # NULL/empty docs produce no rows
    assert all(d not in (2, 3) for d, *_ in got)
    # tf weighting: doc 5's triple xylophone outranks its single banana
    d5 = [t for d, t, _, _, r in
          sorted(got, key=lambda x: (x[0], x[4])) if d == 5]
    assert d5[0] == "xylophone"
    # no python UDF in the plan
    plan = keyword_topk(df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_bm25_validation():
    with pytest.raises(ValueError):
        term_frequencies(None, [])
    with pytest.raises(ValueError):
        term_frequencies(None, ["a", "a"])
    # non-tokenizer-shaped terms can never match a token: reject loudly
    # instead of silently scoring zero (and breaking the oracle literal)
    for bad in (["Spark"], ["o'brien"], ["two words"], [""]):
        with pytest.raises(ValueError):
            term_frequencies(None, bad)
