"""Batch-16 snapshot widening: new rule branches in existing groups.

`.pm` gains upstream's X PixMap claimant (verbatim XPM header rule) and
`.gs` gains GLSL (derived from the `.fs` group's signal family). Pins the
new branches, the unchanged behavior of the pre-existing branches, and
the C9 fallbacks (Perl stays first for .pm; .gs now defaults to GLSL,
which precedes Genie in ASCII order).
Reference semantics: /root/reference/src/index.ts:320-361.
"""

from linguistjs_spark.config import QualityFilterConfig
from linguistjs_spark import oracle
from linguistjs_spark.metadata import load_metadata

CFG = QualityFilterConfig(
    quality_rules=False, langid_fallback=False,
    scrub_pii=False, toxicity_filter=False,
)


def _classify(path, text):
    md = load_metadata()
    cands, definite, from_shebang = oracle.classify(md, CFG, path, text)
    lang, _, _ = oracle.narrow(md, CFG, path, text, cands, definite, from_shebang)
    return lang


def test_pm_xpm_header():
    assert _classify(
        "icons/logo.pm", "/* XPM */\nstatic char *icon[] = {\n"
    ) == "X PixMap"
    # indented header still matches (^\s* prefix)
    assert _classify("icons/pad.pm", "  /* XPM */\n") == "X PixMap"


def test_pm_existing_branches_unchanged():
    assert _classify("lib/Foo.pm", "package Foo;\nuse strict;\n1;\n") == "Perl"
    assert _classify("lib/Bar.pm", "use v6;\nmodule Bar {}\n") == "Raku"
    # C9 fallback: Perl stays the alphabetical-first candidate
    assert _classify("lib/plain.pm", "just prose\n") == "Perl"


def test_gs_glsl_branch():
    assert _classify(
        "shaders/geom.gs",
        "#version 330 core\nlayout(points) in;\nvoid main() {}\n",
    ) == "GLSL"
    assert _classify(
        "shaders/pass.gs", "uniform mat4 mvp;\nvoid main() {}\n"
    ) == "GLSL"


def test_gs_existing_branches_unchanged():
    assert _classify("src/app.gs", '[indent=4]\ninit\n\tprint "hi"') == "Genie"
    assert _classify("src/A.gs", "uses java.util.List\nclass A {}") == "Gosu"
    # C9 fallback CHANGES with the new claimant: "GLSL" precedes "Genie"
    # in ASCII order (upstream languages.yml is ASCII-sorted the same
    # way), so unmatched .gs content now defaults to GLSL — the majority
    # language for the extension, as it happens
    assert _classify("src/plain.gs", "just prose\n") == "GLSL"
