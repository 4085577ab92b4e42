"""The reference's 30 unit tests (/root/reference/test/unit.js:29-87) replayed
against the pure-Python oracle — the seed of the golden fixture table
(FIXTURES.md §1)."""

import pytest

from linguistjs_spark.config import REFERENCE_PARITY_CONFIG as CFG
from linguistjs_spark.oracle import analyse_document
from linguistjs_spark.sources.pages import SEED_OVERRIDES


def lang_of(path, text=""):
    r = analyse_document("https://crawl.example/" + path, text, cfg=CFG)
    if not r.keep:
        return "DROP:" + r.keep_reason
    return r.lang


# (path, text, expected) — unit.js:35-80
CASES = [
    ("x.js", "", "JavaScript"),
    ("x.cpp", "", "C++"),
    ("x.c", "", "C"),
    ("x.R", "", "R"),
    ("Dockerfile", "FROM node", "Dockerfile"),
    ("CMakeLists.txt", "project(x)", "CMake"),
    ("tsconfig.json", "{}", "JSON with Comments"),
    ("index.tsx", "<App/>", "TSX"),
    ("file.antlers.php", "{{ x }}", "Antlers"),
    ("file.other.php", "<?php?>", "PHP"),
    ("node_js", "#!/usr/bin/env node", "JavaScript"),
    ("rake_ruby", "#!/usr/bin/env rake", "Ruby"),
    ("sh_shell", "#!/bin/sh", "Shell"),
    ("emacs_cpp", "# -*- mode:c++ -*-", "C++"),
    ("emacs_cs", "# -*- c# -*-", "C#"),
    ("vim_sh", "# vim: filetype=sh", "Shell"),
    ("vim_ruby", "# vim: syntax = ruby", "Ruby"),
    ("XCompose", "# for Emacs: -*- coding: utf-8 -*-", "XCompose"),
    ("c-sharp.cs", "namespace example {} // empty", "C#"),
    ("smalltalk.cs", "!interface methodsFor: instance", "Smalltalk"),
    ("eclipse.ecl", "var:-val", "ECLiPSe"),
    ("ecl.ecl", "var:=val", "ECL"),
    ("frege.fr", "import package", "Frege"),
    ("forth.fr", "new-device 1", "Forth"),
    ("raku", "#!/usr/bin/env perl6\n module", "Raku"),
    ("unknown", "Unknown", None),
    # snapshot-expansion coverage: filename map, shebang interpreters,
    # multi-candidate default-first ordering, plain ext hits
    ("Makefile", "all:\n\tcc main.c", "Makefile"),
    ("BUILD", "cc_library(name = 'x')", "Starlark"),
    ("awk_filter", "#!/usr/bin/awk -f\n{print}", "Awk"),
    ("guide.rst", "Title\n=====", "reStructuredText"),
    ("app.mm", "", "Objective-C++"),  # [Objective-C++, XML]: first wins
    ("flake.nix", "{ outputs = _: {}; }", "Nix"),
    ("query.graphql", "query { id }", "GraphQL"),
    ("main.rkt", "#lang racket", "Racket"),
    ("schema.proto", "syntax = \"proto3\";", "Protocol Buffer"),
    ("contract.sol", "pragma solidity ^0.8.0;", "Solidity"),
]

DROPS = [
    ("gradlew", "vendored"),
    ("decl.d.ts", "vendored"),
    ("deps/file.c", "vendored"),
    ("node_modules/file.js", "vendored"),
    ("file.Feature.cs", "generated"),
    ("package-lock.json", "generated"),
    ("Pipfile.lock", "generated"),
    ("README.md", "documentation"),
    ("docs/demo.js", "documentation"),
    ("samples/head.h", "documentation"),
]


@pytest.mark.parametrize("path,text,expected", CASES)
def test_unit_lang(path, text, expected):
    assert lang_of(path, text) == expected


@pytest.mark.parametrize("path,reason", DROPS)
def test_unit_drop(path, reason):
    assert lang_of(path) == "DROP:" + reason


def test_metadata_size():
    # unit.js:31-33: raw-content size == string length (ASCII)
    r = analyse_document("https://x/file_size", "0123456789", cfg=CFG)
    assert r.bytes == 10
    r = analyse_document("https://x/empty", "", cfg=CFG)
    assert r.bytes == 0


def test_dot_m_alternatives():
    # unit.js:40 asserts alternatives_count == 1, which counts FILES in the
    # alternatives map (test/unit.js:16), i.e. "the .m file HAS alternatives"
    # — NOT that there is exactly one alternative language. With the full
    # upstream language set the reference's empty-content fallback picks the
    # first candidate in languages.yml order (src/index.ts:368), which for
    # .m is Limbo; the snapshot's .m group (6 candidates) mirrors that.
    r = analyse_document("https://x/.m", "", cfg=CFG)
    assert r.lang == "Limbo"
    assert len(r.alternatives) >= 1
    assert "Objective-C" in r.alternatives and "MATLAB" in r.alternatives
    # content-based disambiguation still lands on MATLAB/Objective-C
    r = analyse_document("https://x/x.m", "% comment\nx = 1;", cfg=CFG)
    assert r.lang == "MATLAB"
    r = analyse_document("https://x/y.m", '#import "Foo.h"\n@interface', cfg=CFG)
    assert r.lang == "Objective-C"


def test_asc_alternatives():
    # expected.json:9,21 analog (FIXTURES.md)
    r = analyse_document("https://x/alternatives.asc", "Alternatives", cfg=CFG)
    assert r.lang == "AGS Script"
    assert r.alternatives == ["AsciiDoc", "Public Key"]


def test_group_collapse_default():
    # src/index.ts:206: TSX -> TypeScript without childLanguages
    from linguistjs_spark.config import QualityFilterConfig

    cfg = QualityFilterConfig(quality_rules=False, scrub_pii=False,
                              toxicity_filter=False, langid_fallback=False)
    r = analyse_document("https://x/index.tsx", "<App/>", cfg=cfg)
    assert r.lang == "TypeScript"


def test_override_forced_language_alias():
    # FIXTURES.md §2: file.txt linguist-language=JS -> JavaScript, definite
    r = analyse_document(
        "https://x/file.txt", "anything", cfg=CFG, overrides=SEED_OVERRIDES
    )
    assert r.lang == "JavaScript" and r.definite


def test_override_vendored_true_and_generated_false():
    r = analyse_document(
        "https://x/vendored", "var x;", cfg=CFG, overrides=SEED_OVERRIDES
    )
    assert not r.keep and r.keep_reason == "vendored"
    r = analyse_document(
        "https://x/package-lock.json", "{}", cfg=CFG, overrides=SEED_OVERRIDES
    )
    assert r.keep and r.lang == "JSON"


def test_line_metrics_golden():
    from linguistjs_spark.oracle import line_metrics
    from linguistjs_spark.sources.pages import SEED_CASES

    loc_c = dict(SEED_CASES)["loc.c"]
    total, content, code = line_metrics(loc_c)
    assert total == 10
    assert content == 8
    assert code == 4


def test_binary_sniff():
    r = analyse_document(
        "https://x/sniffme", "data", html=b"PK\x03\x04\x00\x00", cfg=CFG
    )
    assert not r.keep and r.keep_reason == "binary-content"
    r = analyse_document("https://x/image.png", "", html=b"\x89PNG\x00", cfg=CFG)
    assert not r.keep and r.keep_reason == "binary-ext"


def test_metadata_loads_from_pyfiles_zip(tmp_path):
    """Regression: the snapshot must load when the package is imported from
    a spark-submit --py-files style zip (data/ inside the archive), not
    just from the filesystem checkout."""
    import os
    import subprocess
    import sys
    import zipfile

    z = tmp_path / "pkg.zip"
    with zipfile.ZipFile(z, "w") as zf:
        for root, _, files in os.walk("/root/repo/linguistjs_spark"):
            for f in files:
                if f.endswith(".pyc"):
                    continue
                p = os.path.join(root, f)
                zf.write(p, os.path.relpath(p, "/root/repo"))
    code = (
        f"import sys; sys.path.insert(0, {str(z)!r}); "
        "from linguistjs_spark.metadata import load_metadata; "
        "print(len(load_metadata().languages))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert int(out.stdout.strip()) >= 140
