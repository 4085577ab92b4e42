"""KenLM-style perplexity: sanity + Spark/oracle parity with the gate on."""

import pytest

from linguistjs_spark.config import QualityFilterConfig
from linguistjs_spark.oracle import analyse_document
from linguistjs_spark.perplexity import perplexity
from linguistjs_spark.pipeline import run_pipeline
from linguistjs_spark.sources.pages import generate_pages, pages_df


def test_prose_scores_lower_than_gibberish():
    prose = "this is a normal english sentence with common words in it"
    gibberish = "qzxv jkqp wvxz zzqj xqvk pzwq jxqv kqzz"
    assert perplexity(prose) < perplexity(gibberish)
    assert perplexity("") == 0.0
    assert perplexity("a") == 0.0


def test_binary_soup_scores_high():
    prose = "the model assigns ordinary prose a low score as expected here"
    soup = "".join(chr((i * 37) % 200 + 33) for i in range(200))
    assert perplexity(soup) > 2 * perplexity(prose)


def test_pipeline_perplexity_parity(spark):
    cfg = QualityFilterConfig(
        compute_perplexity=True,
        max_perplexity=18.0,  # low enough to force some drops
        quality_rules=False,
        langid_fallback=False,
        scrub_pii=False,
        toxicity_filter=False,
    )
    rows = generate_pages(n_bulk=120)
    df = pages_df(spark, n_bulk=120)
    got = {r["url"]: r for r in run_pipeline(spark, df, cfg).collect()}
    n_drops = 0
    for url, _ts, html, text, _l in rows:
        exp = analyse_document(url, text, html=html, cfg=cfg)
        g = got[url]
        assert (g["keep"], g["keep_reason"]) == (exp.keep, exp.keep_reason), url
        if exp.ppl is not None and g["ppl"] is not None:
            assert g["ppl"] == pytest.approx(exp.ppl, abs=1e-12)
        if exp.keep_reason == "quality-perplexity":
            n_drops += 1
    assert n_drops > 0  # the gate actually fired on some fixture rows


def test_fitted_table_matches_local_twin(spark):
    import numpy as np

    from linguistjs_spark.perplexity import (
        fit_char_bigram_table, fit_char_bigram_table_local)

    texts = ["the quick brown fox jumps over the lazy dog",
             "pack my box with five dozen liquor jugs", None, "",
             "zzzz qqqq xxxx jjjj vvvv"] * 20
    df = spark.createDataFrame([(t,) for t in texts], "text string") \
        .repartition(7)
    dist = fit_char_bigram_table(df)
    local = fit_char_bigram_table_local(texts)
    assert np.array_equal(dist, local)  # bit-identical, not just close


def test_fitted_model_separates_prose_from_gibberish(spark):
    from linguistjs_spark.perplexity import (
        fit_char_bigram_table, perplexity_with_table)

    prose = ["the weather this evening is calm and the streets are quiet",
             "she walked along the river reading the names of the boats"] * 50
    df = spark.createDataFrame([(t,) for t in prose], "text string")
    table = fit_char_bigram_table(df)
    good = perplexity_with_table(table, "the streets along the river are quiet")
    bad = perplexity_with_table(table, "xq zvk jjw qqp zzx mmv kkq wwz")
    assert bad > good * 2


def test_arpa_export_roundtrip(tmp_path):
    # VERDICT r02 item 6: the KenLM hook's model-file interface, exercised
    # end-to-end with the repo's own tooling — fit, export ARPA, reload,
    # score-identical (within the log10<->log2 conversion's float error)
    import numpy as np

    from linguistjs_spark.perplexity import (
        export_arpa, fit_char_bigram_table_local, load_arpa_table,
        perplexity_with_table)

    texts = ["the quick brown fox jumps over the lazy dog",
             "pack my box with five dozen liquor jugs", "zzzz qqqq xxxx"]
    table = fit_char_bigram_table_local(texts)
    p = str(tmp_path / "model.arpa")
    export_arpa(table, p)
    loaded = load_arpa_table(p)
    assert np.allclose(loaded, table, rtol=0, atol=1e-12)
    for t in texts + ["completely unseen sentence with normal words"]:
        assert perplexity_with_table(loaded, t) == pytest.approx(
            perplexity_with_table(table, t), rel=1e-9)


def test_arpa_file_is_spec_shaped(tmp_path):
    # header counts + required sentinel words, so real ARPA consumers
    # (kenlm.Model, SRILM ngram) accept the artifact
    from linguistjs_spark.perplexity import (
        export_arpa, fit_char_bigram_table_local)

    table = fit_char_bigram_table_local(["abc abc abc"])
    p = str(tmp_path / "m.arpa")
    export_arpa(table, p)
    text = open(p).read()
    assert text.startswith("\\data\\\n")
    assert "ngram 1=259" in text and "ngram 2=65536" in text
    for w in ("<unk>", "<s>", "</s>"):
        assert w in text
    assert text.rstrip().endswith("\\end\\")
    assert text.count("\n") == 65536 + 259 + 9


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["x"]).find_spec("kenlm") is None,
    reason="kenlm not installed in this environment",
)
def test_real_kenlm_loads_exported_arpa(tmp_path):
    from linguistjs_spark.perplexity import (
        export_arpa, fit_char_bigram_table_local, try_import_kenlm)

    table = fit_char_bigram_table_local(
        ["the quick brown fox jumps over the lazy dog"] * 3)
    p = str(tmp_path / "m.arpa")
    export_arpa(table, p)
    scorer = try_import_kenlm(p)
    assert scorer is not None
    assert scorer("the quick brown fox") > 0


def test_ccnet_buckets_exact_vs_scale(spark):
    """The threshold/broadcast scale path must agree with the exact NTILE
    path on every doc except ties at the tercile boundaries (the approx-
    percentile contract); with distinct perplexities and counts divisible
    by 3 the two are identical."""
    import pyspark.sql.functions as F

    from linguistjs_spark.perplexity import ccnet_ppl_buckets

    rows = [(i, "en" if i % 2 == 0 else "fr", float(10 + i)) for i in range(60)]
    scored = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
    exact = {r.doc_id: r.bucket
             for r in ccnet_ppl_buckets(scored, exact=True).collect()}
    scale = {r.doc_id: r.bucket
             for r in ccnet_ppl_buckets(scored, exact=False).collect()}
    assert exact == scale
    # each language splits 30 docs into 10/10/10
    from collections import Counter
    per_lang = Counter((r[1], exact[r[0]]) for r in rows)
    assert all(v == 10 for v in per_lang.values())


def test_ccnet_buckets_plan_scale_path_has_no_sort(spark):
    """The scale path must not sort within languages — its plan is an
    aggregate + broadcast join, the exact path's is a window sort."""
    from linguistjs_spark.perplexity import ccnet_ppl_buckets
    from linguistjs_spark.plans.explain_utils import formatted_plan

    scored = spark.range(100).selectExpr(
        "id AS doc_id", "CAST(id % 3 AS STRING) AS lang",
        "CAST(id AS DOUBLE) AS ppl")
    scale_plan = formatted_plan(ccnet_ppl_buckets(scored, exact=False))
    exact_plan = formatted_plan(ccnet_ppl_buckets(scored, exact=True))
    assert "BroadcastHashJoin" in scale_plan and "Window" not in scale_plan
    assert "Window" in exact_plan


# --- VERDICT r04 item 5: batch-vectorized scoring kernel ---


def test_batch_kernel_float_exact_vs_row_twin():
    """perplexity_batch_with_table must be FLOAT-EXACT vs the row twin
    (the fitted_perplexity oracle builds literal VALUES from the twin):
    same gather values at the same length => identical pairwise-summation
    rounding. Covers None/empty/1-char/short/long/non-ASCII/mixed."""
    import numpy as np
    import pandas as pd

    from linguistjs_spark.perplexity import (
        fit_char_bigram_table_local,
        perplexity_batch_with_table,
        perplexity_with_table,
    )

    table = fit_char_bigram_table_local(
        ["the quick brown fox jumps over the lazy dog " * 20,
         "ordinary english sentences with normal words"])
    texts = [
        None, "", "x", "ab",
        "the streets along the river are quiet tonight",
        "xq zvk jjw qqp zzx mmv kkq wwz",
        "Ünïcödé — ß and 日本語のテキスト mixed in",
        "word " * 5000,          # long doc: pairwise-summation regime
        "\x00\x01\x02 binary-ish \xff",
        "The Quick BROWN Fox",   # lower() path
    ]
    got = perplexity_batch_with_table(table, pd.Series(texts, dtype=object))
    want = [perplexity_with_table(table, t) for t in texts]
    assert list(got) == want  # exact equality, no tolerance

    # empty batch and all-empty batch
    assert list(perplexity_batch_with_table(table, pd.Series([], dtype=object))) == []
    assert list(perplexity_batch_with_table(
        table, pd.Series([None, "", "y"], dtype=object))) == [0.0, 0.0, 0.0]


def test_batch_kernel_builtin_table_matches_perplexity():
    import pandas as pd

    from linguistjs_spark.perplexity import (
        _logp,
        perplexity,
        perplexity_batch_with_table,
    )

    texts = ["a readable english sentence", "zzqqxx", None, "word " * 999]
    got = perplexity_batch_with_table(_logp(), pd.Series(texts, dtype=object))
    assert list(got) == [perplexity(t) for t in texts]


def test_batch_kernel_fuzz_exact():
    """Randomized doc mixes (empty/None/1-byte/short/long at random
    positions, including leading/trailing empties) stay float-exact."""
    import numpy as np
    import pandas as pd

    from linguistjs_spark.perplexity import (
        _logp,
        perplexity,
        perplexity_batch_with_table,
    )

    rng = np.random.default_rng(7)
    pool = ["", None, "x", "ab", "the word", "zz", "word " * 50,
            "\xff\x00", "mixed Ünïcöde 日本語"]
    for _ in range(30):
        texts = [pool[i] for i in rng.integers(0, len(pool), size=25)]
        got = perplexity_batch_with_table(
            _logp(), pd.Series(texts, dtype=object))
        assert list(got) == [perplexity(t) for t in texts]
