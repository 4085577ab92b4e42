"""Pipeline integration of the normalize/mojibake/compression gates
(config.normalize_unicode / drop_mojibake / compression_gate): keep_reason
attribution, scrubbed-text canonicalization, and default invisibility."""

import datetime as dt

from linguistjs_spark.config import QualityFilterConfig
from linguistjs_spark.pipeline import run_pipeline

_TS = dt.datetime(2021, 6, 1)

_CLEAN = ("the research study and the analysis were published by the "
          "university press this year in full")
_CURLY = ("the “research” study – and it’s analysis … were published by "
          "the university press this year")
_MOJI = ("the research study " + "�" * 40 +
         " and the analysis were published by the university")
_REPET = "spam " * 400


def _pages(spark, texts):
    rows = [
        (f"https://a.example/d{i}.txt", _TS, None, t, None)
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )


def test_gates_off_by_default(spark):
    pages = _pages(spark, [_CLEAN, _CURLY, _MOJI])
    out = {r.url: r for r in run_pipeline(
        spark, pages, QualityFilterConfig()).collect()}
    for r in out.values():
        assert r.keep is True
    # raw curly punctuation survives untouched when normalization is off
    assert "“research”" in out["https://a.example/d1.txt"].scrubbed_text


def test_normalize_unicode_canonicalizes_scrubbed_text(spark):
    pages = _pages(spark, [_CURLY])
    cfg = QualityFilterConfig(normalize_unicode=True)
    r = run_pipeline(spark, pages, cfg).collect()[0]
    assert r.keep is True
    assert '"research"' in r.scrubbed_text
    assert "it's analysis ..." in r.scrubbed_text
    assert "“" not in r.scrubbed_text and "…" not in r.scrubbed_text


def test_mojibake_gate_drops_decode_casualties(spark):
    pages = _pages(spark, [_CLEAN, _MOJI, None])
    cfg = QualityFilterConfig(drop_mojibake=True)
    out = {r.url: r for r in run_pipeline(spark, pages, cfg).collect()}
    assert out["https://a.example/d0.txt"].keep is True
    bad = out["https://a.example/d1.txt"]
    assert bad.keep is False and bad.keep_reason == "bad-unicode"
    # NULL text keeps its existing attribution, never 'bad-unicode'
    assert out["https://a.example/d2.txt"].keep_reason == "unreadable"


def test_compression_gate_drops_repetitive(spark):
    pages = _pages(spark, [_CLEAN, _REPET])
    cfg = QualityFilterConfig(
        compression_gate=True,
        # neutralize the word-level quality rules so the compression gate
        # is what attributes the drop
        max_dup_line_ratio=1.1, max_words=10_000,
    )
    out = {r.url: r for r in run_pipeline(spark, pages, cfg).collect()}
    assert out["https://a.example/d0.txt"].keep is True
    rep = out["https://a.example/d1.txt"]
    assert rep.keep is False
    assert rep.keep_reason == "compression-repetitive"
