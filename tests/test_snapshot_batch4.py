"""Batch-4 snapshot widening (VERDICT r02 item 5): 580 languages / 72
disambiguation groups. Pins the NEW entry points this batch added beyond
plain extensions — filename-map languages (go.mod, CODEOWNERS, Android.bp
...), interpreter-map languages (osascript, elvish, nush, makeinfo), the
Dotenv-filename vs Shell-extension split on `.env`, and the four contested
extensions that arrived WITH their disambiguation group (.al .dsp .i
.star; their content cases live in `_HEUR_CASES` so the batch-3 oracle +
pipeline parity tests cover them automatically). Unique-ext pins live in
`_WIDE_EXT_LANGS` / the cascade_wide driver oracle.
Reference semantics: /root/reference/src/index.ts:173-208 (filename map),
:241-258 (shebang interpreter map)."""

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

# (basename, expected_lang, expected_keep). lang None = dropped upstream
# of classification (lockfiles/checksums are generated, .gitignore is
# infrastructure) — the drop IS the pinned behavior.
_FILENAME_CASES = [
    ("CODEOWNERS", "CODEOWNERS", True),
    ("Gemfile.lock", None, False),
    ("go.mod", "Go Module", True),
    ("go.sum", None, False),
    ("APKBUILD", "Alpine Abuild", True),
    (".editorconfig", "INI", True),  # group collapse EditorConfig -> INI
    ("Android.bp", "Soong", True),
    ("firestore.rules", "Cloud Firestore Security Rules", True),
    (".env", "Dotenv", True),        # filename map wins for the literal file
    ("config.env", "Shell", True),   # the .env EXTENSION stays with Shell
    ("Nukefile", "Nu", True),
    ("MANIFEST.MF", "JAR Manifest", True),
    ("hosts", "Hosts File", True),
    ("_redirects", "Redirect Rules", True),
    (".inputrc", "Readline Config", True),
    (".wgetrc", "Wget Config", True),
    (".tm_properties", "TextMate Properties", True),
    (".shellcheckrc", "ShellCheck Config", True),
    (".browserslistrc", "Browserslist", True),
    (".dircolors", "Dircolors", True),
]

# (first line + body, expected lang) through the shebang interpreter map
_SHEBANG_CASES = [
    ("#!/usr/bin/osascript\nsay hi", "AppleScript"),
    ("#!/usr/bin/env elvish\necho hi", "Elvish"),
    ("#!/bin/tcsh\necho hi", "Shell"),  # group collapse Tcsh -> Shell
    ("#!/usr/bin/env nush\n(puts)", "Nu"),
    ("#!/usr/bin/env makeinfo\n@node Top", "Texinfo"),
]


def test_batch4_breadth():
    langs = json.load(open(os.path.join(_DATA, "languages.json")))["languages"]
    heur = json.load(open(os.path.join(_DATA, "heuristics.json")))
    assert len(langs) >= 580
    assert len(heur["disambiguations"]) >= 72
    # the four batch-4 contested exts are grouped, and Cool resurrects the
    # pre-existing .cl rule that was dead without its language entry
    grouped = {e for g in heur["disambiguations"] for e in g["extensions"]}
    assert {".al", ".dsp", ".i", ".star", ".cl"} <= grouped
    assert "Cool" in langs
    # .xaml ownership moved: XAML alone, per upstream
    assert ".xaml" in langs["XAML"]["extensions"]
    assert ".xaml" not in langs["XML"]["extensions"]


def test_batch4_filename_map_oracle():
    for f, want, keep in _FILENAME_CASES:
        got = oracle.analyse_document(
            f"https://files.example/repo/{f}", "k=v\n", cfg=CFG
        )
        assert got.keep is keep, (f, got.keep, got.keep_reason)
        if want is None:
            assert got.lang in (None, "None"), (f, got.lang)
        else:
            assert got.lang == want, (f, got.lang)


def test_batch4_shebang_map_oracle():
    for text, want in _SHEBANG_CASES:
        got = oracle.analyse_document(
            "https://files.example/repo/script", text, cfg=CFG
        )
        assert got.lang == want, (text.splitlines()[0], got.lang)


def test_batch4_pipeline_matches_oracle(spark):
    from linguistjs_spark.pipeline import run_pipeline

    t = datetime.datetime(2026, 1, 1)
    rows = [
        (f"https://files.example/repo{i}/{f}", t, None, "k=v\n")
        for i, (f, _, _) in enumerate(_FILENAME_CASES)
    ] + [
        (f"https://files.example/sh{i}/script", t, None, text)
        for i, (text, _) in enumerate(_SHEBANG_CASES)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string"
    )
    got = {
        r.url: (r.lang, r.keep)
        for r in run_pipeline(spark, pages, CFG).collect()
    }
    for i, (f, want, keep) in enumerate(_FILENAME_CASES):
        url = f"https://files.example/repo{i}/{f}"
        lang, k = got[url]
        assert k is keep, (url, k)
        if want is not None:
            assert lang == want, (url, lang)
    for i, (text, want) in enumerate(_SHEBANG_CASES):
        url = f"https://files.example/sh{i}/script"
        assert got[url][0] == want, (url, got[url])
