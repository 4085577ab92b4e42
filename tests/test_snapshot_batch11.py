"""Batch-11 snapshot widening: 709 languages / 113 disambiguation
groups. Closes the remaining high-confidence upstream deltas — the
Fortran fixed/free-form split (.f90/.f95/.f03/.f08 move to "Fortran Free
Form" per upstream ownership), the `.mod` NMODL rule + Linux Kernel
Module fallback, Rez/Terra/Nickel/Adblock/Vim-Help group memberships, a
new `.nas` Nasal-vs-Assembly group, the go.work → Go Workspace filename
move, and ~20 unique-ext long-tail languages. Content cases live in
`_HEUR_CASES` (batch-3 oracle + pipeline parity tests execute every rule
branch); this module pins breadth, the ownership moves, and the ext/
filename-map entries end-to-end through oracle AND pipeline.
Reference semantics: /root/reference/src/index.ts:38-41 (languages/
heuristics load), :173-208 (filename map)."""

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

# unique-extension languages from this batch: (basename, body, lang)
_EXT_CASES = [
    ("main.f90", "program hello\nend program\n", "Fortran Free Form"),
    ("legacy.f", "      program hello\n      end\n", "Fortran"),
    ("cal.ics", "BEGIN:VCALENDAR\nEND:VCALENDAR\n", "iCalendar"),
    ("model.cds", "entity Books { key ID : Integer; }\n", "CAP CDS"),
    ("kernel.ispc", "export void f(uniform float x[]) {}\n", "ISPC"),
    ("diagram.d2", "x -> y: hello\n", "D2"),
    ("main.4gl", "MAIN\n  DISPLAY \"hi\"\nEND MAIN\n", "Genero 4gl"),
    ("form.per", "SCHEMA demo\n", "Genero per"),
    ("contract.mligo", "let main (p, s) = ([], s)\n", "CameLIGO"),
    ("prog.omgrofl", "lol iz 1\n", "Omgrofl"),
    ("files.sfv", "file.bin 1234ABCD\n", "Simple File Verification"),
    ("calc.numpy", "x = arange(10)\n", "Python"),  # group collapse NumPy
    ("main.parrot", ".sub main\n.end\n", "Parrot"),
    ("snip.yasnippet", "# -*- mode: snippet -*-\n", "YASnippet"),
    ("data.edn", "{:a 1}\n", "edn"),
    ("main.ha", "export fn main() void = void;\n", "Hare"),
    ("obj.pickle", "not really binary\n", "Pickle"),
    ("shader.slang", "float4 main() : SV_Target { return 0; }\n", "Slang"),
    ("ui.axs.erb", "PROGRAM_NAME='<%= name %>'\n", "NetLinx+ERB"),
]

# filename-map languages from this batch
_FILENAME_CASES = [
    ("requirements.txt", "requests==2.31.0\n", "Pip Requirements"),
    ("constraints.txt", "urllib3<2\n", "Pip Requirements"),
    ("robots.txt", "User-agent: *\nDisallow: /\n", "robots.txt"),
    ("dune-project", "(lang dune 3.0)\n", "Dune"),
    ("dune", "(executable (name main))\n", "Dune"),
    ("go.work", "go 1.22\nuse ./app\n", "Go Workspace"),
    ("descrip.mms", "target : source\n", "Module Management System"),
]


def _load():
    langs = json.load(open(os.path.join(_DATA, "languages.json")))["languages"]
    heur = json.load(open(os.path.join(_DATA, "heuristics.json")))
    return langs, heur


def test_batch11_breadth():
    langs, heur = _load()
    assert len(langs) >= 709
    assert len(heur["disambiguations"]) >= 113
    grouped = {e for g in heur["disambiguations"] for e in g["extensions"]}
    assert ".nas" in grouped
    # free-form ownership moved off Fortran; fixed-form group shrank
    assert ".f90" not in langs["Fortran"]["extensions"]
    assert ".f90" in langs["Fortran Free Form"]["extensions"]
    assert ".f90" not in grouped  # uncontested now — pure ext-map hit
    # go.work moved off Go Module
    assert "go.work" not in langs["Go Module"].get("filenames", [])
    assert "go.work" in langs["Go Workspace"]["filenames"]
    # contested claims that stay PRUNED (provenance stance)
    assert ".pkl" not in langs["Pickle"]["extensions"]
    # new group memberships are all candidates of their group's exts
    for ext, lang in ((".mod", "NMODL"), (".mod", "Linux Kernel Module"),
                      (".r", "Rez"), (".t", "Terra"), (".ncl", "Nickel"),
                      (".txt", "Adblock Filter List"),
                      (".txt", "Vim Help File"), (".nas", "Nasal")):
        assert ext in langs[lang]["extensions"], (ext, lang)
        assert ext in grouped, ext


def test_batch11_ext_and_filename_oracle():
    for fn, body, want in _EXT_CASES + _FILENAME_CASES:
        got = oracle.analyse_document(
            f"https://files.example/repo/{fn}", body, cfg=CFG
        )
        assert got.lang == want, (fn, got.lang)
        assert got.keep, (fn, got.keep_reason)


def test_batch11_pipeline_matches_oracle(spark):
    from linguistjs_spark.pipeline import run_pipeline

    t = datetime.datetime(2026, 1, 1)
    cases = _EXT_CASES + _FILENAME_CASES
    pages = spark.createDataFrame(
        [(f"https://files.example/repo{i}/{fn}", t, None, body)
         for i, (fn, body, _) in enumerate(cases)],
        "url string, warc_ts timestamp, html binary, text string",
    )
    got = {r.url: r.lang for r in run_pipeline(spark, pages, CFG).collect()}
    for i, (fn, _, want) in enumerate(cases):
        url = f"https://files.example/repo{i}/{fn}"
        assert got[url] == want, (url, got[url])
