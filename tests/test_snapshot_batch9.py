"""Batch-9 snapshot widening (VERDICT r02 "what's missing" #2): 677
languages / 111 disambiguation groups. ~34 long-tail languages, the three
groups their claims create (`.sch` Eagle/KiCad Schematic/XML, `.brd`
Eagle/KiCad Legacy Layout, `.cue` Cue Sheet/CUE) and an E rule appended
to the existing `.e` (Eiffel/Euphoria) group. Content cases live in
`_HEUR_CASES` (batch-3 oracle + pipeline parity tests execute them);
this module pins breadth, the new claimant sets, and the filename-map
entries. Reference semantics: /root/reference/src/index.ts:38-41."""

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
    ("job.outjob", "Altium Designer"),
    ("board.pcbdoc", "Altium Designer"),
    ("solve.lp", "Answer Set Programming"),
    ("script.be", "Berry"),
    ("calc.bqn", "BQN"),
    ("dump.c-objdump", "C-ObjDump"),
    ("binding.chs", "Haskell"),       # group collapse C2hs Haskell -> Haskell
    ("model.dae", "COLLADA"),
    ("win.clw", "Clarion"),
    ("dump.cppobjdump", "Cpp-ObjDump"),
    ("dump.d-objdump", "D-ObjDump"),
    ("deploy.com", "DIGITAL Command Language"),
    ("app.desktop", "Desktop"),
    ("font.flf", "FIGlet Font"),
    ("actor.fy", "Fancy"),
    ("cmds.gdb", "GDB"),
    ("mod.gsc", "GSC"),
    ("font.bdf", "Glyph Bitmap Distribution Format"),
    ("lib.gr", "Grain"),
    ("packet.msg", "OMNeT++ MSG"),
    ("net.ned", "OMNeT++ NED"),
    ("flow.chem", "Roff"),            # group collapse Pic -> Roff
    ("spec.sail", "Sail"),
    ("annot.textgrid", "TextGrid"),
]

_FILENAME_CASES = [
    ("build.xml", "Ant Build System"),
    ("SHA256SUMS", "Checksums"),
    (".curlrc", "curl Config"),
    (".npmrc", "NPM Config"),
    (".git-blame-ignore-revs", "Git Revision List"),
    ("sshd_config", "SSH Config"),
    ("fonts.dir", "X Font Directory Index"),
    (".gdbinit", "GDB"),
    ("Fakefile", "Fancy"),
]

# shebang interpreter -> group-collapsed language (C2 before heuristics)
_SHEBANG_CASES = [
    ("#!/sbin/openrc-run\ndescription=\"svc\"\n", "Shell"),  # OpenRC -> Shell
]


def _load():
    langs = json.load(open(os.path.join(_DATA, "languages.json")))["languages"]
    heur = json.load(open(os.path.join(_DATA, "heuristics.json")))
    return langs, heur


def test_batch9_breadth():
    langs, heur = _load()
    assert len(langs) >= 677
    assert len(heur["disambiguations"]) >= 111
    grouped = {e for g in heur["disambiguations"] for e in g["extensions"]}
    assert {".sch", ".brd", ".cue"} <= grouped
    e_group = next(g for g in heur["disambiguations"]
                   if g["extensions"] == [".e"])
    assert {"Eiffel", "Euphoria", "E"} <= {
        r["language"] for r in e_group["rules"]
    }
    # CUE and KiCad Legacy Layout are the pattern-less fallbacks: last
    cue = next(g for g in heur["disambiguations"]
               if g["extensions"] == [".cue"])
    assert cue["rules"][-1] == {"language": "CUE"}
    brd = next(g for g in heur["disambiguations"]
               if g["extensions"] == [".brd"])
    assert brd["rules"][-1] == {"language": "KiCad Legacy Layout"}


def test_batch9_ext_map_oracle():
    for base, want in _EXT_CASES:
        got = oracle.analyse_document(
            f"https://b9.example/{base}", "x = 1\n", cfg=CFG
        )
        assert got.lang == want, (base, got.lang)


def test_batch9_filename_map_oracle():
    for base, want in _FILENAME_CASES:
        got = oracle.analyse_document(
            f"https://b9.example/{base}", "x = 1\n", cfg=CFG
        )
        assert got.lang == want, (base, got.lang)


def test_batch9_shebang_oracle():
    for text, want in _SHEBANG_CASES:
        got = oracle.analyse_document(
            "https://b9.example/svc", text, cfg=CFG
        )
        assert got.lang == want, (text.splitlines()[0], got.lang)


def test_batch9_pipeline_parity(spark):
    from linguistjs_spark.pipeline import run_pipeline

    t = datetime.datetime(2026, 1, 1)
    cases = _EXT_CASES + _FILENAME_CASES
    pages = spark.createDataFrame(
        [(f"https://b9.example/{base}", t, None, "x = 1\n")
         for base, _ in cases]
        + [(f"https://b9.example/shebang-{i}", t, None, text)
           for i, (text, _) in enumerate(_SHEBANG_CASES)],
        "url string, warc_ts timestamp, html binary, text string",
    )
    got = {r.url: r.lang for r in run_pipeline(spark, pages, CFG).collect()}
    for base, want in cases:
        url = f"https://b9.example/{base}"
        assert got[url] == want, (url, got[url])
    for i, (_, want) in enumerate(_SHEBANG_CASES):
        url = f"https://b9.example/shebang-{i}"
        assert got[url] == want, (url, got[url])
