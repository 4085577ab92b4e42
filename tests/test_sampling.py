"""Deterministic key-hash sampling: twin parity, determinism under
repartitioning, nested-sample property, stratified fractions."""

from pyspark.sql import functions as F

from linguistjs_spark.hash_twin import spark_xxhash64
from linguistjs_spark.operators.sampling import (
    deterministic_sample,
    sample_hash_col,
    stratified_sample,
    temperature_rates_ppm,
    temperature_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en")
        .when(F.col("id") % 4 == 1, "de")
        .when(F.col("id") % 4 == 2, "fr")
        .otherwise("zz").alias("lang"),
    )


def test_hash_twin_parity(spark):
    rows = (
        _docs(spark, 500)
        .select("doc_id", sample_hash_col(F.col("doc_id"), seed=7).alias("b"))
        .collect()
    )
    for r in rows:
        assert r.b == spark_xxhash64(int(r.doc_id), 7) % 1_000_000, r.doc_id


def test_deterministic_and_layout_independent(spark):
    docs = _docs(spark)
    a = sorted(r.doc_id for r in deterministic_sample(docs, 0.3, seed=1).collect())
    b = sorted(
        r.doc_id
        for r in deterministic_sample(docs.repartition(13), 0.3, seed=1).collect()
    )
    assert a == b and len(a) > 0


def test_nested_sample_property(spark):
    # same seed: the 10% sample is a strict subset of the 30% sample
    docs = _docs(spark)
    s10 = {r.doc_id for r in deterministic_sample(docs, 0.1, seed=5).collect()}
    s30 = {r.doc_id for r in deterministic_sample(docs, 0.3, seed=5).collect()}
    assert s10 <= s30 and len(s10) < len(s30)


def test_fraction_realized_within_tolerance(spark):
    docs = _docs(spark, 5000)
    got = deterministic_sample(docs, 0.25, seed=3).count()
    assert abs(got / 5000 - 0.25) < 0.03


def test_stratified_fractions_and_default(spark):
    docs = _docs(spark, 4000)  # 1000 per lang
    out = stratified_sample(
        docs, {"en": 0.5, "de": 0.1}, seed=2, default_fraction=0.0
    )
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(by_lang["en"] / 1000 - 0.5) < 0.06
    assert abs(by_lang["de"] / 1000 - 0.1) < 0.04
    assert "fr" not in by_lang and "zz" not in by_lang  # default 0.0


def test_temperature_rates_alpha1_is_flat(spark):
    # alpha=1 is natural multinomial sampling: every stratum keeps exactly
    # budget_frac (T*p_l/n_l = T/N), regardless of skew.
    counts = {"en": 9000, "de": 900, "zz": 13}
    ppm = temperature_rates_ppm(counts, alpha=1.0, budget_frac=0.25)
    assert all(v == 250_000 for v in ppm.values())


def test_temperature_rates_upweight_tail(spark):
    counts = {"en": 10_000, "zz": 100}
    ppm = temperature_rates_ppm(counts, alpha=0.5, budget_frac=0.5)
    assert ppm["zz"] > ppm["en"]
    assert all(0 <= v <= 1_000_000 for v in ppm.values())
    # expected kept total stays within the budget (floor only rounds down)
    exp_kept = sum(counts[k] * ppm[k] / 1e6 for k in counts)
    assert exp_kept <= 0.5 * sum(counts.values()) + 1


def test_temperature_rates_cap_and_empty(spark):
    # tiny stratum under a generous budget hits the min(1, .) cap
    ppm = temperature_rates_ppm({"en": 10_000, "zz": 4}, alpha=0.5,
                                budget_frac=0.9)
    assert ppm["zz"] == 1_000_000
    assert temperature_rates_ppm({}) == {}


def test_temperature_sample_deterministic_and_layout_stable(spark):
    docs = _docs(spark, 4000)
    a = sorted(r.doc_id for r in
               temperature_sample(docs, seed=11).collect())
    b = sorted(r.doc_id for r in
               temperature_sample(docs.repartition(17), seed=11).collect())
    assert a == b and len(a) > 0


def test_temperature_sample_matches_rates(spark):
    docs = _docs(spark, 4000)  # 1000 per lang
    ppm = temperature_rates_ppm({"en": 1000, "de": 1000, "fr": 1000,
                                 "zz": 1000}, alpha=0.5, budget_frac=0.5)
    # symmetric counts: every lang keeps the same rate (500000 ppm)
    assert len(set(ppm.values())) == 1
    got = temperature_sample(docs, seed=3).count()
    assert abs(got / 4000 - 0.5) < 0.03


def test_sample_filter_is_pushed_to_scan(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    _docs(spark, 100).write.mode("overwrite").parquet(p)
    df = deterministic_sample(spark.read.parquet(p), 0.2, seed=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow: no shuffle introduced
