"""Compression-ratio quality signal: zlib kernel + native ratio/flag."""

import zlib

from pyspark.sql import functions as F

from linguistjs_spark.operators.text_stats import (
    compression_signal,
    zlib_len_py,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def test_flag_bands_and_null_handling(spark):
    import hashlib

    rows = [
        "a" * 4000,                                  # hyper-repetitive
        ("The quick brown fox jumps over the lazy dog. " * 40),
        None,                                        # NULL in -> NULL out
        "",                                          # empty: no ratio
    ]
    # high-entropy: hex of a chained sha256 stream (deterministic)
    seed, chunks = b"comp", []
    for _ in range(128):
        seed = hashlib.sha256(seed).digest()
        chunks.append(seed)
    rows.append(b"".join(chunks).hex())
    out = {r.doc_id: r for r in compression_signal(_df(spark, rows)).collect()}
    assert out[0].comp_flag == "repetitive" and out[0].comp_ratio < 0.05
    assert out[1].comp_flag == "repetitive"  # 40x repeated sentence
    assert out[2].comp_b is None and out[2].comp_flag is None
    assert out[3].comp_ratio is None and out[3].comp_flag is None
    assert out[4].comp_flag in ("normal", "opaque")
    assert out[4].comp_ratio > 0.5


def test_kernel_matches_row_twin(spark):
    texts = ["hello", "x" * 100, "mixed 123 éü中文", None,
             "", "tab\tnew\nline"]
    got = {r.doc_id: r.comp_b
           for r in compression_signal(_df(spark, texts)).collect()}
    for i, t in enumerate(texts):
        assert got[i] == zlib_len_py(t), (i, t)
        if t is not None:
            assert got[i] == len(zlib.compress(t.encode("utf-8"), 6))


def test_single_stage_no_shuffle(spark):
    """The signal is one narrow projection: no Exchange in the plan."""
    plan = (compression_signal(_df(spark, ["abc"]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
