"""Batch-8 snapshot widening (VERDICT r02 "what's missing" #2): 643
languages / 108 disambiguation groups. ~35 long-tail languages, the two
groups they create (`.mo` Motoko/Modelica, `.rsc` RouterOS/Rascal), an
Apex rule in the existing `.cls` group and an NCL fallback in `.ncl`.
Content cases live in `_HEUR_CASES` (batch-3 oracle + pipeline parity
tests execute them); this module pins breadth, the new claimant sets,
and the filename-map entries.
Reference semantics: /root/reference/src/index.ts:38-41."""

import datetime
import json
import os

from linguistjs_spark.config import QualityFilterConfig
from linguistjs_spark import oracle

CFG = QualityFilterConfig(
    quality_rules=False, langid_fallback=False,
    scrub_pii=False, toxicity_filter=False,
)

_DATA = os.path.join(
    os.path.dirname(__file__), "..", "linguistjs_spark", "data"
)

# unique-extension languages from this batch: (basename, lang)
_EXT_CASES = [
    ("demo.fst", "F*"),
    ("app.hocon", "HOCON"),
    ("spec.ksy", "Kaitai Struct"),
    ("page.latte", "Latte"),
    ("post.mdx", "MDX"),
    ("rules.ninja", "Ninja"),
    ("model.pml", "Promela"),
    ("report.rmd", "RMarkdown"),
    ("token.tact", "Tact"),
    ("voice.talon", "Talon"),
    ("main.toit", "Toit"),
    ("default.vcl", "VCL"),
    ("index.gmi", "Gemini"),
    ("story.ink", "Ink"),
    ("script.mirah", "Mirah"),
    ("notes.muse", "Muse"),
    ("page.myt", "Myghty"),
    ("mod.ob2", "Oberon"),
    ("policy.polar", "Polar"),
    ("program.arr", "Pyret"),
    ("warrior.cw", "Redcode"),
    ("widget.riot", "Riot"),
    ("view.scaml", "HTML"),      # group collapse Scaml -> HTML
    ("scene.scenic", "Scenic"),
    ("cpu.tlv", "TL-Verilog"),
    ("alias.mrc", "mIRC Script"),
    ("Window1.xojo_window", "Xojo"),
    ("Ctrl.apex", "Apex"),
]

_FILENAME_CASES = [
    ("justfile", "Just"),
    ("haproxy.cfg", "HAProxy"),
    ("build.gradle.kts", "Gradle"),  # group collapse -> Gradle
    ("Singularity", "Singularity"),
]


def _load():
    langs = json.load(open(os.path.join(_DATA, "languages.json")))["languages"]
    heur = json.load(open(os.path.join(_DATA, "heuristics.json")))
    return langs, heur


def test_batch8_breadth():
    langs, heur = _load()
    assert len(langs) >= 643
    assert len(heur["disambiguations"]) >= 108
    grouped = {e for g in heur["disambiguations"] for e in g["extensions"]}
    assert {".mo", ".rsc"} <= grouped
    cls = next(g for g in heur["disambiguations"]
               if g["extensions"] == [".cls"])
    assert "Apex" in {r["language"] for r in cls["rules"]}
    ncl = next(g for g in heur["disambiguations"]
               if g["extensions"] == [".ncl"])
    # NCL is the pattern-less fallback, so it must come last
    assert ncl["rules"][-1] == {"language": "NCL"}


def test_batch8_ext_map_oracle():
    for base, want in _EXT_CASES:
        got = oracle.analyse_document(
            f"https://b8.example/{base}", "x = 1\n", cfg=CFG
        )
        assert got.lang == want, (base, got.lang)


def test_batch8_filename_map_oracle():
    for base, want in _FILENAME_CASES:
        got = oracle.analyse_document(
            f"https://b8.example/{base}", "x = 1\n", cfg=CFG
        )
        assert got.lang == want, (base, got.lang)


def test_batch8_pipeline_parity(spark):
    from linguistjs_spark.pipeline import run_pipeline

    t = datetime.datetime(2026, 1, 1)
    cases = _EXT_CASES + _FILENAME_CASES
    pages = spark.createDataFrame(
        [(f"https://b8.example/{base}", t, None, "x = 1\n")
         for base, _ in cases],
        "url string, warc_ts timestamp, html binary, text string",
    )
    got = {r.url: r.lang for r in run_pipeline(spark, pages, CFG).collect()}
    for base, want in cases:
        url = f"https://b8.example/{base}"
        assert got[url] == want, (url, got[url])
