"""Unicode punctuation normalization + mojibake gate semantics."""

from pyspark.sql import functions as F

from linguistjs_spark.operators.normalize import (
    bad_unicode_col,
    mojibake_stats,
    unicode_punct_norm_col,
)


def _norm(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string")
    return [r.n for r in df.select(
        unicode_punct_norm_col(F.col("t")).alias("n")).orderBy("i").collect()]


def test_punctuation_mappings(spark):
    cases = [
        ("“curly” and ‘single’", '"curly" and \'single\''),
        ("en – em — minus −", "en - em - minus -"),
        ("dots … here", "dots ... here"),
        ("nbsp thin ideo　x", "nbsp thin ideo x"),
        ("ｆｕｌｌ　ＷＩＤＥ！１２３", "full WIDE!123"),
        ("zero​width‍﻿soft­hyphen",
         "zerowidthsofthyphen"),
        ("«guillemets» •bullet ·dot", '"guillemets" *bullet *dot'),
        ("plain ascii stays, exactly.", "plain ascii stays, exactly."),
        (None, None),
    ]
    got = _norm(spark, [c for c, _ in cases])
    for (src, want), g in zip(cases, got):
        assert g == want, (src, g, want)


def test_normalization_idempotent(spark):
    texts = ["“a” – … ｘ «b»​end", "mixed “quotes” … ＡＢＣ　！"]
    once = _norm(spark, texts)
    twice = _norm(spark, once)
    assert once == twice


def test_mojibake_stats_and_gate(spark):
    rows = [
        "clean text with no damage at all " * 10,       # 0 bad
        ("x" * 100) + "���",             # 3/103 = 291 bp
        ("y" * 9990) + "�",                        # 1/9991 ~ 1 bp
        "tab\tand\nnewline\rstay fine",                 # \t\n\r not control-flagged
        "ctrl\x01\x02\x03heavy",                        # 3/12 = 2500 bp
        None,
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "i long, t string")
    out = {r.i: r for r in df.select(
        "i", mojibake_stats(F.col("t")).alias("s"),
        bad_unicode_col(F.col("t"), max_bad_bp=25).alias("drop"),
    ).collect()}
    assert out[0].s.bad_bp == 0 and not out[0].drop
    assert out[1].s.n_repl == 3 and out[1].s.bad_bp == 291 and out[1].drop
    assert out[2].s.bad_bp == 1 and not out[2].drop
    assert out[3].s.n_ctrl == 0 and not out[3].drop
    assert out[4].s.n_ctrl == 3 and out[4].drop
    assert out[5].s.bad_bp is None and not out[5].drop   # NULL never drops
    assert out[6].s.bad_bp is None and not out[6].drop


def test_normalize_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "“x” – …")], "i long, t string")
    plan = (df.select(unicode_punct_norm_col(F.col("t")))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_normalize_fuzz_vs_python_twin(spark):
    """150 random strings mixing every mapped codepoint with ASCII, CJK,
    emoji, and combining marks vs a str.translate/re twin of the same
    mapping constants — the twin and the Column chain share NORM_SRC/
    NORM_DST, so a drift in either mapping breaks this test."""
    import random
    import re

    from linguistjs_spark.operators.normalize import (
        ELLIPSIS_PAT, NORM_DST, NORM_SRC, ZERO_WIDTH_PAT)

    table = {ord(s): d for s, d in zip(NORM_SRC, NORM_DST)}

    def twin(t):
        if t is None:
            return None
        t = t.translate(table)
        t = re.sub(ELLIPSIS_PAT, "...", t)
        return re.sub(ZERO_WIDTH_PAT, "", t)

    rng = random.Random(20260821)
    pool = (list(NORM_SRC) + list("abc XY.12!?#&")
            + ["…", "​", "­", "中", "日", "🎉", "é"])
    texts = ["".join(rng.choice(pool) for _ in range(rng.randrange(0, 40)))
             for _ in range(150)]
    texts += [None, ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r.i: r.n for r in df.select(
        "i", unicode_punct_norm_col(F.col("t")).alias("n")).collect()}
    bad = [(repr(texts[i]), repr(got[i]), repr(twin(texts[i])))
           for i in range(len(texts)) if got[i] != twin(texts[i])]
    assert bad == [], bad[:3]
