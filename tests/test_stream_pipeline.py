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
