"""Physical-plan shape assertions: the scale story must be visible in
explain() output, not just asserted in prose (SURVEY.md §4)."""

import pytest
from pyspark.sql import functions as F

from linguistjs_spark.config import QualityFilterConfig
from linguistjs_spark.pipeline import run_pipeline
from linguistjs_spark.plans.explain_utils import (
    count_nodes,
    formatted_plan,
    has_wholestage_codegen,
    pushed_filters,
    scan_read_schemas,
)
from linguistjs_spark.sources.pages import pages_df


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    pages_df(spark, n_bulk=50).write.mode("overwrite").parquet(path)
    return path


def test_pipeline_is_single_pass(spark, pages_parquet):
    """The single-pass rewrite (VERDICT r01 #1): one action over labels must
    plan exactly ONE scan of the pages source and ONE ArrowEvalPython stage —
    the filter+union formulation executed the classify UDF 3x and the scan
    4x because Spark does not CSE across union branches."""
    pages = spark.read.parquet(pages_parquet)
    labels = run_pipeline(spark, pages, QualityFilterConfig())
    plan = formatted_plan(labels)
    assert count_nodes(plan, "Scan parquet") == 1, plan
    assert count_nodes(plan, "ArrowEvalPython") == 1, plan


def test_entry_rollup_is_single_pass(spark):
    """entry()'s sorted per-language rollup (scan -> classify -> groupBy ->
    window pct) must also stay one scan / one python stage end-to-end: the
    old crossJoin(total) form doubled the whole upstream pipeline."""
    import __spark_entry__ as entry_mod

    plan = formatted_plan(entry_mod.entry(spark))
    assert count_nodes(plan, "Scan parquet") == 1, plan
    assert count_nodes(plan, "ArrowEvalPython") == 1, plan


def test_url_prefilter_pushdown(spark, pages_parquet):
    """A url predicate applied before the pipeline must reach the scan as a
    pushed filter (the partition-pruning analog of the reference's walk-time
    gitignore pruning, walk-tree.ts:82-83)."""
    pages = spark.read.parquet(pages_parquet).filter(
        F.col("url").startswith("https://crawl.example/")
    )
    labels = run_pipeline(spark, pages, QualityFilterConfig())
    plan = formatted_plan(labels)
    pf = pushed_filters(plan)
    assert any("StringStartsWith" in p or "startswith" in p.lower() for p in pf), pf


def test_quality_stage_is_codegen(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    labels = run_pipeline(spark, pages, QualityFilterConfig())
    assert has_wholestage_codegen(formatted_plan(labels))


def test_classify_udf_sees_only_path_and_text(spark, pages_parquet):
    """Arrow transfer discipline: the classify kernel's python stage must
    receive exactly (path, text) — never html bytes."""
    pages = spark.read.parquet(pages_parquet)
    labels = run_pipeline(spark, pages, QualityFilterConfig())
    plan = formatted_plan(labels)
    arrow_lines = [
        l for l in plan.splitlines() if "ArrowEvalPython" in l or "classify_udf" in l
    ]
    assert arrow_lines, "expected an ArrowEvalPython stage"
    assert not any("html" in l for l in arrow_lines), arrow_lines


def test_single_shuffle_for_rollup(spark, pages_parquet):
    """language_rollup over labels adds exactly one exchange beyond the
    pipeline itself (the groupBy) — partial aggregation handles the rest."""
    from linguistjs_spark.operators.rollup import language_rollup

    pages = spark.read.parquet(pages_parquet)
    labels = run_pipeline(spark, pages, QualityFilterConfig())
    base_plan = formatted_plan(labels)
    roll_plan = formatted_plan(language_rollup(labels))
    n_base = base_plan.count("Exchange")
    n_roll = roll_plan.count("Exchange")
    assert n_roll - n_base <= 2, (n_base, n_roll)


def test_revenue_join_broadcasts_dimension(spark):
    """The nation dimension side of the join chain must be a broadcast hash
    join — no shuffle of the fact side against a 25-row table."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["revenue_by_nation"](spark, "/root/testdata/sf0.001")
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    # and the lineitem scan must be column-pruned to the join/agg columns
    schemas = scan_read_schemas(plan)
    li = [s for s in schemas if "l_orderkey" in s]
    assert li and all("l_shipdate" not in s and "l_tax" not in s for s in li), li


def test_anti_join_shape(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["orders_no_lineitem"](spark, "/root/testdata/sf0.001")
    plan = formatted_plan(df)
    assert "LeftAnti" in plan, plan
    # the lineitem side projects only the key
    schemas = scan_read_schemas(plan)
    assert any(s.strip().endswith("l_orderkey:bigint>") or "struct<l_orderkey" in s
               for s in schemas), schemas


def test_shipdate_predicate_pushdown(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["shipped_revenue_window"](spark, "/root/testdata/sf0.001")
    plan = formatted_plan(df)
    pf = pushed_filters(plan)
    assert any("l_shipdate" in p for p in pf), pf


def test_training_mix_plan_shape(spark):
    """The composed mix pipeline keeps its at-scale shapes in ONE plan:
    the benchmark-gram probe is a broadcast join (corpus never shuffles
    against it), exactly one Window handles exact-dedup winner selection,
    and nothing degenerates into a cartesian product."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["training_mix"](spark, "/root/testdata/sf0.001")
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert plan.count("Window") >= 1, plan
