"""Structured Streaming incremental pipeline: AvailableNow drains, file-level
checkpointing, and batch-equivalence of the streamed labels."""

import pytest

from linguistjs_spark.config import QualityFilterConfig
from linguistjs_spark.pipeline import run_pipeline
from linguistjs_spark.sources.pages import pages_from_documents
from linguistjs_spark.streaming.stream_pipeline import stream_labels

SF_DIR = "/root/testdata/sf0.001"

CFG = QualityFilterConfig(
    langid_fallback=False, scrub_pii=False, toxicity_filter=False
)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    return {
        "in": str(root / "pages_in"),
        "out": str(root / "labels_out"),
        "ckpt": str(root / "ckpt"),
    }


def _label_set(df):
    return {
        (r["url"], r["keep"], r["keep_reason"], r["lang"])
        for r in df.select("url", "keep", "keep_reason", "lang").collect()
    }


def test_streamed_labels_match_batch_and_resume_incrementally(spark, dirs):
    pages = pages_from_documents(spark, SF_DIR)
    first, second = (
        pages.filter("pmod(xxhash64(url), 2) = 0"),
        pages.filter("pmod(xxhash64(url), 2) = 1"),
    )

    # drop 1: half the pages land
    first.write.mode("append").parquet(dirs["in"])
    stream_labels(spark, dirs["in"], dirs["out"], dirs["ckpt"], CFG)
    got1 = spark.read.parquet(dirs["out"])
    assert _label_set(got1) == _label_set(run_pipeline(spark, first, CFG))

    # drop 2: the rest lands; checkpoint means only new files process,
    # and the accumulated sink equals one batch run over everything
    second.write.mode("append").parquet(dirs["in"])
    stream_labels(spark, dirs["in"], dirs["out"], dirs["ckpt"], CFG)
    got2 = spark.read.parquet(dirs["out"])
    assert _label_set(got2) == _label_set(run_pipeline(spark, pages, CFG))

    # drop nothing: idempotent re-drain appends zero rows
    n_before = got2.count()
    stream_labels(spark, dirs["in"], dirs["out"], dirs["ckpt"], CFG)
    assert spark.read.parquet(dirs["out"]).count() == n_before


def test_stream_exact_dedup_across_drains(spark, tmp_path):
    """Duplicates within the watermark window are dropped exactly once,
    including across separate AvailableNow drains (state checkpointed)."""
    import datetime

    from linguistjs_spark.streaming.stream_pipeline import stream_exact_dedup

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/{name}")

    write_batch("b1", [
        ("u1", t, None, "the first unique document text", ""),
        ("u2", t, None, "the second unique document text", ""),
        ("u3", t, None, "the first unique document text", ""),   # dup of u1
    ])
    stream_exact_dedup(spark, in_dir, out_dir, ckpt)
    got1 = spark.read.parquet(out_dir).collect()
    assert len(got1) == 2
    assert {r.text for r in got1} == {
        "the first unique document text", "the second unique document text"}

    # second drain: a cross-drain duplicate and a fresh doc
    write_batch("b2", [
        ("u4", t + datetime.timedelta(minutes=5), None,
         "the second unique document text", ""),                  # dup of u2
        ("u5", t + datetime.timedelta(minutes=5), None,
         "a brand new third document", ""),
    ])
    stream_exact_dedup(spark, in_dir, out_dir, ckpt)
    got2 = spark.read.parquet(out_dir).collect()
    assert len(got2) == 3
    texts = sorted(r.text for r in got2)
    assert texts == [
        "a brand new third document",
        "the first unique document text",
        "the second unique document text",
    ]


def test_stream_quality_stages_match_batch_and_resume(spark, tmp_path):
    """Streamed stage stamps equal the batch stateless stage per url, and
    the checkpoint makes the second drain incremental + idempotent."""
    from pyspark.sql import functions as F

    from linguistjs_spark.operators.gopher import quality_stage_col
    from linguistjs_spark.streaming.stream_pipeline import (
        stream_quality_stages)

    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    pages = pages_from_documents(spark, SF_DIR)
    first, second = (
        pages.filter("pmod(xxhash64(url), 2) = 0"),
        pages.filter("pmod(xxhash64(url), 2) = 1"),
    )

    def batch_stages(df):
        return {
            (r["url"], r["stage"])
            for r in df.select(
                "url",
                quality_stage_col(
                    F.coalesce(F.col("text"), F.lit("")),
                    lang=F.col("lang"), min_words=20,
                ).alias("stage"),
            ).collect()
        }

    first.write.mode("append").parquet(d["in"])
    stream_quality_stages(spark, d["in"], d["out"], d["ckpt"], min_words=20)
    got1 = spark.read.parquet(d["out"])
    assert {
        (r["url"], r["stage"]) for r in got1.select("url", "stage").collect()
    } == batch_stages(first)

    second.write.mode("append").parquet(d["in"])
    stream_quality_stages(spark, d["in"], d["out"], d["ckpt"], min_words=20)
    got2 = spark.read.parquet(d["out"])
    assert {
        (r["url"], r["stage"]) for r in got2.select("url", "stage").collect()
    } == batch_stages(pages)
    # multiple stages actually exercised at this SF
    assert len({r["stage"] for r in got2.select("stage").collect()}) >= 3

    n = got2.count()
    stream_quality_stages(spark, d["in"], d["out"], d["ckpt"], min_words=20)
    assert spark.read.parquet(d["out"]).count() == n


def test_streamed_model_quality_tier_matches_batch(spark, tmp_path):
    """The model tier (cfg.model_quality_path) is a stateless pandas-UDF
    column, so stream_labels streams it as-is: streamed labels ==
    batch labels, including 'model-quality' drop attribution."""
    import datetime as dt

    from linguistjs_spark.operators.model_filter import (
        build_demo_quality_model)

    model = str(tmp_path / "mq.bin")
    build_demo_quality_model(model)
    cfg = QualityFilterConfig(
        langid_fallback=False, scrub_pii=False, toxicity_filter=False,
        model_quality_path=model, model_quality_min_prob=0.6,
    )
    ts = dt.datetime(2022, 3, 1)
    rows = [
        ("https://s.example/hq.txt", ts, None,
         "the research study and the analysis were published by the "
         "university", None),
        ("https://s.example/lq.txt", ts, None,
         "click the free casino bonus prize and the jackpot offer deal",
         None),
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )
    in_dir, out_dir, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "ckpt")
    )
    pages.write.mode("append").parquet(in_dir)
    stream_labels(spark, in_dir, out_dir, ckpt, cfg)
    got = _label_set(spark.read.parquet(out_dir))
    assert got == _label_set(run_pipeline(spark, pages, cfg))
    reasons = {u: r for u, _, r, _ in got}
    assert reasons["https://s.example/lq.txt"] == "model-quality"
    assert reasons["https://s.example/hq.txt"] == "classified"


def test_streamed_normalize_and_gates_match_batch(spark, tmp_path):
    """The normalize/mojibake/compression gates are stateless per-row
    algebra (one translate/regex projection + the zlib kernel), so
    stream_labels streams them unchanged: streamed labels == batch
    labels, including 'bad-unicode' and 'compression-repetitive'
    attribution."""
    import datetime as dt

    cfg = QualityFilterConfig(
        langid_fallback=False, toxicity_filter=False,
        normalize_unicode=True, drop_mojibake=True, compression_gate=True,
        max_dup_line_ratio=1.1, max_words=10_000,
    )
    ts = dt.datetime(2022, 3, 1)
    rows = [
        ("https://s.example/curly.txt", ts, None,
         "the “research” study – and it’s analysis … were published by "
         "the university press this year", None),
        ("https://s.example/moji.txt", ts, None,
         "the research study " + "�" * 40 +
         " and the analysis were published by the university", None),
        ("https://s.example/rep.txt", ts, None, "spam " * 400, None),
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )
    in_dir, out_dir, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "ckpt")
    )
    pages.write.mode("append").parquet(in_dir)
    stream_labels(spark, in_dir, out_dir, ckpt, cfg)
    got = _label_set(spark.read.parquet(out_dir))
    assert got == _label_set(run_pipeline(spark, pages, cfg))
    reasons = {t[0]: t[2] for t in got}
    assert reasons["https://s.example/moji.txt"] == "bad-unicode"
    assert reasons["https://s.example/rep.txt"] == "compression-repetitive"
    assert reasons["https://s.example/curly.txt"] == "classified"
