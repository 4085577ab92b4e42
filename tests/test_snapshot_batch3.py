"""Batch-3 snapshot widening (VERDICT r02 item 4): 68 disambiguation
groups / 440 languages. The 79 `_HEUR_CASES` content fixtures — one per
rule branch of the newly added groups — classify identically through the
python oracle AND the full Spark pipeline, and every case's extension is
genuinely contested (multi-candidate), so each pin exercises rule order
against real content rather than falling back to first-candidate.
Reference semantics: /root/reference/src/index.ts:320-361."""

import datetime
import json
import os

from linguistjs_spark.config import QualityFilterConfig
from linguistjs_spark import oracle

from __spark_entry__ import _HEUR_CASES

CFG = QualityFilterConfig(
    quality_rules=False, langid_fallback=False,
    scrub_pii=False, toxicity_filter=False,
)

_DATA = os.path.join(
    os.path.dirname(__file__), "..", "linguistjs_spark", "data"
)


def test_batch3_cases_cover_contested_exts():
    langs = json.load(open(os.path.join(_DATA, "languages.json")))["languages"]
    heur = json.load(open(os.path.join(_DATA, "heuristics.json")))
    grouped = {e for g in heur["disambiguations"] for e in g["extensions"]}
    exts = {ext for ext, _, _ in _HEUR_CASES}
    assert len(exts) >= 30  # VERDICT item-4 "Done =" bar
    for ext in exts:
        cands = [n for n, e in langs.items() if ext in e.get("extensions", [])]
        assert len(cands) > 1, f"{ext} is not contested (cands={cands})"
        assert ext in grouped, f"{ext} has no disambiguation group"


def test_batch3_oracle_classifies():
    for i, (ext, text, want) in enumerate(_HEUR_CASES):
        got = oracle.analyse_document(
            f"https://heur.example/case{i}{ext}", text, cfg=CFG
        )
        assert got.lang == want, (ext, text[:30], got.lang)
        assert got.keep, (ext, got.keep_reason)


def test_batch3_pipeline_classifies(spark):
    from linguistjs_spark.pipeline import run_pipeline

    t = datetime.datetime(2026, 1, 1)
    pages = spark.createDataFrame(
        [(f"https://heur.example/case{i}{ext}", t, None, text)
         for i, (ext, text, _) in enumerate(_HEUR_CASES)],
        "url string, warc_ts timestamp, html binary, text string",
    )
    got = {r.url: r.lang for r in run_pipeline(spark, pages, CFG).collect()}
    for i, (ext, _, want) in enumerate(_HEUR_CASES):
        url = f"https://heur.example/case{i}{ext}"
        assert got[url] == want, (url, got[url])


def test_batch3_snapshot_breadth_and_compile_cost():
    import time

    from linguistjs_spark.metadata import load_metadata

    heur = json.load(open(os.path.join(_DATA, "heuristics.json")))
    assert len(heur["disambiguations"]) >= 68
    t0 = time.time()
    md = load_metadata.__wrapped__() if hasattr(load_metadata, "__wrapped__") \
        else load_metadata()
    dt = time.time() - t0
    assert len(md.languages) >= 440
    assert dt < 5.0  # driver-side compile stays O(seconds) at this breadth
