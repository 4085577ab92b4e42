"""Honest AND/negative heuristic semantics vs the reference's OR-flattened,
negative-ignoring behavior (src/index.ts:338-348; SURVEY.md §2.2 C8 delta).

Default config reproduces the reference; honest_heuristics=True applies
upstream github-linguist semantics. Both paths run in the oracle AND in the
vectorized kernel, and must agree with each other per mode."""

import pandas as pd

from linguistjs_spark.config import QualityFilterConfig
from linguistjs_spark.operators.classify import classify_batch
from linguistjs_spark.oracle import analyse_document

COMPAT = QualityFilterConfig(quality_rules=False, langid_fallback=False,
                             scrub_pii=False, toxicity_filter=False)
HONEST = QualityFilterConfig(quality_rules=False, langid_fallback=False,
                             scrub_pii=False, toxicity_filter=False,
                             honest_heuristics=True)

# line-start markdown char present (compat OR fires Markdown) + '<!--'
# (honest negative blocks) + a GCC define at a line start (honest winner)
DIVERGENT = "abc\n<!-- generated -->\n(define_insn foo)"


def test_modes_diverge_on_crafted_md():
    compat = analyse_document("https://x/doc.md", DIVERGENT, cfg=COMPAT)
    honest = analyse_document("https://x/doc.md", DIVERGENT, cfg=HONEST)
    assert compat.lang == "Markdown"           # OR-flattened, negative ignored
    assert honest.lang == "GCC Machine Description"  # negative blocks rule 1


def test_modes_agree_on_plain_markdown():
    text = "# Title\n\nplain prose paragraph"
    for cfg in (COMPAT, HONEST):
        r = analyse_document("https://x/notes.md", text, cfg=cfg)
        assert r.lang == "Markdown", cfg


def test_kernel_matches_oracle_both_modes():
    rows = [
        ("doc.md", DIVERGENT),
        ("notes.md", "# Title\nprose"),
        ("x.md", "<!-- only a comment -->"),
        ("y.md", ";; gcc md\n(define_insn x)"),
        ("file.other.php", "<?php?>"),
        ("frege.fr", "import package"),
    ]
    for cfg in (COMPAT, HONEST):
        cfg = cfg.effective_flags()
        out = classify_batch(
            pd.Series([r[0] for r in rows]), pd.Series([r[1] for r in rows]), cfg
        )
        for i, (path, text) in enumerate(rows):
            exp = analyse_document("https://x/" + path, text, cfg=cfg)
            assert out["lang"][i] == exp.lang, (path, cfg.honest_heuristics)
