"""Property-based fuzz: the vectorized classify kernel must agree with the
row-wise oracle on arbitrary (path, text) inputs — no Spark needed, the
kernel's batch function runs directly on pandas Series."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from linguistjs_spark.config import DEFAULT_CONFIG, REFERENCE_PARITY_CONFIG
from linguistjs_spark.metadata import load_metadata
from linguistjs_spark.operators.classify import classify_batch
from linguistjs_spark import oracle

MD = load_metadata()

_EXTS = [
    "", ".js", ".cpp", ".c", ".m", ".cs", ".ecl", ".fr", ".php", ".asc",
    ".pl", ".pm", ".txt", ".md", ".py", ".tsx", ".antlers.php", ".other.php",
    ".h", ".rs", ".ts", ".pod", ".xyz", ".tar.gz", ".d.ts",
    # snapshot-expansion exts incl. the .mm overlap and group-child cases
    ".mm", ".rst", ".nix", ".rkt", ".scm", ".sv", ".tcl", ".raku", ".p6",
    ".pp", ".tpl", ".v", ".sol", ".org",
]
_NAMES = ["x", "file", "doc", "a.b", "Dockerfile", "CMakeLists.txt",
          "tsconfig.json", ".m", "XCompose", "Pipfile", "gradlew", "UPPER"]
_DIRS = ["", "src/", "deps/", "docs/", "a/b/", "node_modules/", "p/1/"]

_TEXT_FRAGMENTS = [
    "", "int x;", "var x = 1;", "#!/bin/sh", "#!/usr/bin/env node",
    "#!/usr/bin/env perl6\n module", "# -*- mode:c++ -*-", "# vim: ft=sh",
    "# vim: syntax = ruby", "namespace example {", "!x methodsFor: ",
    "var:-val", "var:=val", "import package", "new-device 1", "<?php?>",
    "<?hh", "use strict;", "use v6;", "=begin pod", "data Foo", ": word ;",
    "----- BEGIN PUBLIC KEY", "{{ x }}", "std::vector<int>", "#import <a.h>",
    "the quick brown fox", "syntax = proto3", "-*- coding: utf-8 -*-",
]

paths = st.builds(
    lambda d, n, e: d + n + e,
    st.sampled_from(_DIRS), st.sampled_from(_NAMES), st.sampled_from(_EXTS),
)
texts = st.one_of(
    st.sampled_from(_TEXT_FRAGMENTS),
    st.text(max_size=80),
    st.builds(
        lambda a, b: a + "\n" + b,
        st.sampled_from(_TEXT_FRAGMENTS), st.sampled_from(_TEXT_FRAGMENTS),
    ),
)


def _oracle_one(path, text, cfg):
    cands, definite, fsb = oracle.classify(MD, cfg, path, text, overrides=[])
    lang, alts, _ = oracle.narrow(MD, cfg, path, text, cands, definite, fsb)
    return lang, alts, definite, fsb


from linguistjs_spark.config import QualityFilterConfig

_FUZZ_CONFIGS = (
    REFERENCE_PARITY_CONFIG,
    DEFAULT_CONFIG,
    QualityFilterConfig(honest_heuristics=True),
    QualityFilterConfig(quick=True),
    QualityFilterConfig(child_languages=True),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(paths, texts), min_size=1, max_size=25))
def test_kernel_matches_oracle(rows):
    for cfg in _FUZZ_CONFIGS:
        cfg = cfg.effective_flags()
        p = pd.Series([r[0] for r in rows])
        t = pd.Series([r[1] for r in rows])
        out = classify_batch(p, t, cfg)
        for i, (path, text) in enumerate(rows):
            lang, alts, definite, fsb = _oracle_one(path, text, cfg)
            assert out["lang"][i] == lang, (path, text, out["lang"][i], lang)
            assert list(out["alternatives"][i]) == alts, (path, text)
            assert bool(out["definite"][i]) == definite, (path, text)
            assert bool(out["from_shebang"][i]) == fsb, (path, text)
