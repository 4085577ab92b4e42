"""Unicode edge cases: the Spark (Java regex/UTF8String) and oracle (Python
re/str) paths must agree on quality features, line metrics, langid, and —
byte-identically — on scrubbed text, even for emoji (astral plane), NBSP,
CRLF, vertical tab, CJK, RTL, and combining characters."""

import pytest
from pyspark.sql import functions as F

from linguistjs_spark import oracle
from linguistjs_spark.operators.quality import lines_struct, quality_struct
from linguistjs_spark.operators.scrub import nl_lang_col, scrubbed_col, toxicity_hits_col

TRICKY = [
    "hello world",
    "héllo wörld with ümlauts and café",
    "emoji 😀😀 and astral 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 text",
    "nbsp separated words here",
    "crlf\r\nline\r\nendings\r\n",
    "vertical\x0btab and form\x0cfeed",
    "中文文本没有空格也应该可以处理",
    "日本語のテキストです。改行も\nあります",
    "العربية من اليمين إلى اليسار",
    "combining á é marks",
    "mixed: a.b@exämple.com and 10.0.0.1 and +1 555-013-7777",
    "zero​width​space",
    "tabs\tand\tmore\ttabs",
    "",
    " \t \r\n \x0b ",
    "a",
    "ssn-ish 123-45-6789 inside unicode ✓ text",
    "the quick brown fox 😀 jumps over the lazy dog",
    "surrogate-adjacent 😀123-45-6789😀 digits",
    "trailing newline\n",
]


@pytest.fixture(scope="module")
def results(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TRICKY)], "i int, text string")
    out = df.select(
        "i",
        "text",
        lines_struct(F.col("text")).alias("lines"),
        quality_struct(F.col("text")).alias("q"),
        scrubbed_col(F.col("text")).alias("scrubbed"),
        toxicity_hits_col(F.col("text")).alias("tox"),
        nl_lang_col(F.col("text")).alias("nl"),
    ).collect()
    return {r["i"]: r for r in out}


def test_line_metrics_unicode(results):
    for i, t in enumerate(TRICKY):
        total, content, code = oracle.line_metrics(t)
        g = results[i]["lines"]
        assert (g["total"], g["content"], g["code"]) == (total, content, code), t


def test_quality_features_unicode(results):
    for i, t in enumerate(TRICKY):
        exp = oracle.quality_features(t)
        g = results[i]["q"]
        assert g["n_words"] == exp["n_words"], t
        assert g["mean_word_len"] == pytest.approx(exp["mean_word_len"], abs=1e-9), t
        assert g["symbol_ratio"] == pytest.approx(exp["symbol_ratio"], abs=1e-9), t
        assert g["dup_line_ratio"] == pytest.approx(exp["dup_line_ratio"], abs=1e-9), t


def test_scrub_byte_identity_unicode(results):
    for i, t in enumerate(TRICKY):
        exp = oracle.scrub_text(t)
        got = results[i]["scrubbed"]
        assert got.encode("utf-8") == exp.encode("utf-8"), (t, got, exp)


def test_toxicity_and_langid_unicode(results):
    for i, t in enumerate(TRICKY):
        assert results[i]["tox"] == oracle.get_scrubber().toxicity_hits(t), t
        assert results[i]["nl"] == oracle.langid(t), t
