"""Model-based quality filter (operators/model_filter.py).

Covers: the linearity recast vs FastTextBinModel.predict (same .bin, same
probabilities), bit-exactness of the distributed mean vs the python twin
(the dyadic-quantization contract), OOV/NULL handling, the margin<->prob
threshold equivalence, plan shape (BroadcastHashJoin, no python workers),
and the demo model's .bin round-trip through the real format writer.
"""

import math
import os

import numpy as np
import pytest

from linguistjs_spark.fasttext_bin import load_model
from linguistjs_spark.operators.model_filter import (
    build_demo_quality_model,
    logit_dim_df,
    logit_means_local,
    margin_threshold,
    model_logit_means,
    model_quality_filter,
    model_quality_scores,
    word_logit_rows,
)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("mq") / "demo_quality.bin")
    build_demo_quality_model(p)
    return p


@pytest.fixture(scope="module")
def model(model_path):
    return load_model(model_path)


TEXTS = [
    (0, "the study and the analysis were published by the university"),
    (1, "click here for free pills and a casino bonus prize"),
    (2, "the free offer was published with evidence and a discount deal"),
    (3, "zzz qqq www"),                      # OOV-only -> NULL score
    (4, None),                               # NULL text
    (5, ""),                                 # empty
    (6, "the the the the"),                  # single repeated hq word
    (7, "research\t\nresearch\x0bcasino"),   # fastText delimiter set
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_demo_model_roundtrips_real_format(model):
    assert model.labels == ["__label__hq", "__label__lq"]
    assert len(model.word_ids) == 56
    labels, probs = model.predict("the research was published", k=2)
    assert labels[0] == "__label__hq"
    assert probs[0] > 0.85


def test_quantized_logits_are_dyadic(model):
    rows = word_logit_rows(model)
    for _, l in rows:
        for x in l:
            assert x == round(x * 2**20) / 2**20
            assert abs(x) <= 2.0**6


def test_distributed_means_bit_exact_vs_twin(spark, docs, model):
    rows = word_logit_rows(model)
    got = {
        r["doc_id"]: r
        for r in model_logit_means(docs, logit_dim_df(spark, model), 2)
        .collect()
    }
    assert set(got) == {d for d, _ in TEXTS}
    for doc_id, text in TEXTS:
        n, means = logit_means_local(rows, text, 2)
        r = got[doc_id]
        assert r["n_toks"] == n
        if means is None:
            assert r["m0"] is None and r["m1"] is None
        else:
            # bit-exact: quantized dyadic sums are order-independent
            assert r["m0"] == means[0]
            assert r["m1"] == means[1]


def test_scores_match_fasttext_predict(spark, docs, model):
    """Softmax of the mean logits == FastTextBinModel.predict on the same
    .bin (linearity: O @ mean(I[t]) == mean(O @ I[t]); quantization moves
    probabilities by < 1e-5)."""
    out = {
        r["doc_id"]: r
        for r in model_quality_scores(
            docs, logit_dim_df(spark, model), model.labels
        ).collect()
    }
    for doc_id, text in TEXTS:
        r = out[doc_id]
        labels, probs = model.predict(text or "", k=2)
        if not labels:
            assert r["mq_label"] is None
            assert r["p0"] is None
        else:
            assert r["mq_label"] == labels[0]
            by = {lab: p for lab, p in zip(labels, probs)}
            assert r["p0"] == pytest.approx(by["__label__hq"], abs=1e-5)
            assert r["p1"] == pytest.approx(by["__label__lq"], abs=1e-5)


def test_filter_margin_equals_prob_threshold(spark, docs, model):
    ldf = logit_dim_df(spark, model)
    for tau in (0.5, 0.8, 0.95):
        kept = {
            r["doc_id"]: r["keep"]
            for r in model_quality_filter(docs, ldf, min_prob=tau).collect()
        }
        scored = {
            r["doc_id"]: r
            for r in model_quality_scores(docs, ldf, model.labels).collect()
        }
        for doc_id, _ in TEXTS:
            p0 = scored[doc_id]["p0"]
            want = bool(p0 is not None and p0 >= tau - 1e-12)
            assert kept[doc_id] == want, (doc_id, tau, p0)


def test_oov_and_null_dropped(spark, docs, model):
    kept = {
        r["doc_id"]: (r["keep"], r["margin"])
        for r in model_quality_filter(
            docs, logit_dim_df(spark, model)
        ).collect()
    }
    for d in (3, 4, 5):
        assert kept[d] == (False, None)
    assert kept[6][0] is True   # pure hq tokens
    assert kept[1][0] is False  # spam


def test_margin_threshold_math():
    assert margin_threshold(0.5) == 0.0
    assert margin_threshold(0.9) == pytest.approx(math.log(9))
    for bad in (0.0, 1.0, -1, 2):
        with pytest.raises(ValueError):
            margin_threshold(bad)


def test_plan_broadcast_join_no_python(spark, docs, model):
    df = model_quality_filter(docs, logit_dim_df(spark, model))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_sf_docs_deterministic_and_nonempty(spark, model):
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    ldf = logit_dim_df(spark, model)
    a = model_quality_filter(docs, ldf, min_prob=0.6)
    counts = a.groupBy("keep").count().collect()
    total = sum(r["count"] for r in counts)
    assert total == docs.count()
    # run twice: identical margins (order-free exact sums)
    rows1 = sorted((r["doc_id"], r["margin"]) for r in a.collect())
    rows2 = sorted(
        (r["doc_id"], r["margin"])
        for r in model_quality_filter(docs, ldf, min_prob=0.6).collect()
    )
    assert rows1 == rows2


def test_word_weight_variety(model):
    # demo logits are not all equal (md5-derived weights)
    rows = word_logit_rows(model)
    hq = {l[0] for w, l in rows if l[0] > 0}
    assert len(hq) > 20


def test_require_two_labels_and_margin_batch_guard(tmp_path):
    import pandas as pd

    from linguistjs_spark.fasttext_bin import save_supervised_model
    from linguistjs_spark.operators.model_filter import (
        margin_batch, require_two_labels)

    p = str(tmp_path / "three.bin")
    save_supervised_model(
        p, ["a", "b"], ["__label__x", "__label__y", "__label__z"],
        np.ones((2, 3), dtype=np.float32), np.ones((3, 3), dtype=np.float32),
    )
    with pytest.raises(ValueError, match="2-label"):
        require_two_labels(load_model(p))
    with pytest.raises(ValueError, match="2-label"):
        margin_batch([("a", [1.0, 2.0, 3.0])], pd.Series(["a"]))
