"""Batch-2 snapshot widening: new extensions classify, and the two new
disambiguation groups (.rpy Python/Ren'Py, .shader ShaderLab/GLSL) pick
the right side from content — checked through the full pipeline AND the
python oracle (parity)."""

import datetime

from linguistjs_spark.config import QualityFilterConfig
from linguistjs_spark import oracle

CASES = [
    ("a.mojo", "fn main():\n    print('hello from mojo land today')", "Mojo"),
    ("b.rpy", 'label start:\n    scene bg room with fade\n    "Hi"', "Ren'Py"),
    ("c.rpy", "import os\nfrom sys import argv\nprint(argv)", "Python"),
    ("d.shader", 'Shader "Custom/MyShader" {\n Properties { }\n}', "ShaderLab"),
    ("e.shader", "#version 330 core\nvoid main() { gl_Position = vec4(0); }",
     "GLSL"),
    ("f.red", 'Red [Title: "demo program here"]\nprint "hi"', "Red"),
    ("g.astro", "---\nconst x = 1;\n---\n<h1>{x} welcome page</h1>", "Astro"),
    ("h.kdl", 'package {\n  name my-pkg\n  version "1.0.0"\n}', "KDL"),
    ("i.rexx", "/* REXX */\nsay 'hello there world'", "REXX"),
    ("j.smali", ".class public Lcom/example/Foo;\n.super Ljava/lang/Object;",
     "Smali"),
    ("k.move", "module 0x1::coin {\n  struct Coin has key { value: u64 }\n}",
     "Move"),
    ("l.zpl", "set I := {1..10};\nvar x[I] binary;", "Zimpl"),
]

CFG = QualityFilterConfig(
    quality_rules=False, langid_fallback=False,
    scrub_pii=False, toxicity_filter=False,
)


def test_batch2_oracle_classifies():
    for name, text, want in CASES:
        got = oracle.analyse_document(f"https://x.example/{name}", text, cfg=CFG)
        assert got.lang == want, (name, got.lang)


def test_batch2_pipeline_classifies(spark):
    from linguistjs_spark.pipeline import run_pipeline

    t = datetime.datetime(2026, 1, 1)
    pages = spark.createDataFrame(
        [(f"https://x.example/{n}", t, None, txt) for n, txt, _ in CASES],
        "url string, warc_ts timestamp, html binary, text string",
    )
    got = {r.url.rsplit("/", 1)[1]: r.lang
           for r in run_pipeline(spark, pages, CFG).collect()}
    for name, _, want in CASES:
        assert got[name] == want, (name, got[name])


def test_snapshot_size_and_driver_compile_cost():
    import time

    from linguistjs_spark.metadata import load_metadata

    t0 = time.time()
    md = load_metadata.__wrapped__() if hasattr(load_metadata, "__wrapped__") \
        else load_metadata()
    dt = time.time() - t0
    assert len(md.languages) >= 407
    assert dt < 5.0  # driver-side compile stays O(seconds) at this breadth
