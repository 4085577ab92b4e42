"""Watermarked streaming window agg + applyInPandasWithState sessionization:
batch equivalence once the watermark has passed everything.

Harness pattern: real event files land in time order (a time-split, so
later drops only carry newer events), then two far-future sentinel drops
advance the watermark past all real data — Structured Streaming finalizes
append-mode windows / fires event-time timeouts one batch AFTER the
watermark advances, hence two sentinel drains."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linguistjs_spark.streaming.stateful import (
    EVENTS_SCHEMA,
    stream_event_windows,
    stream_sessionize,
)

SF_DIR = "/root/testdata/sf0.001"
GAP_S = 1800


@pytest.fixture(scope="module")
def events(spark):
    # explicit schema: the stream side reads with EVENTS_SCHEMA (LTZ
    # timestamps, no props column) — batch expectations must see the same
    # typing or window starts/epochs diverge on non-UTC hosts
    return spark.read.schema(EVENTS_SCHEMA).parquet(
        f"{SF_DIR}/events.parquet"
    ).cache()


def _drops(spark, events, base):
    """Write the real events as two time-ordered drops + two sentinels."""
    ts_sorted = sorted(r[0] for r in events.select("ts").collect())
    cutoff_ts = ts_sorted[int(len(ts_sorted) * 0.6)]
    d1 = events.filter(F.col("ts") <= F.lit(cutoff_ts))
    d2 = events.filter(F.col("ts") > F.lit(cutoff_ts))
    max_ts = events.agg(F.max("ts")).collect()[0][0]

    def sentinel(days):
        return spark.createDataFrame(
            [(999_999, -1, "sentinel", max_ts + dt.timedelta(days=days), 0.0)],
            "event_id long, user_id long, event_type string, ts timestamp, "
            "value double",
        )

    return [d1, d2, sentinel(10), sentinel(20)], str(base)


def test_streaming_windows_match_batch_after_watermark(spark, events, tmp_path):
    drops, base = _drops(spark, events, tmp_path)
    dirs = {k: f"{base}/win_{k}" for k in ("in", "out", "ckpt")}
    for d in drops:
        d.write.mode("append").parquet(dirs["in"])
        stream_event_windows(spark, dirs["in"], dirs["out"], dirs["ckpt"])

    got = {
        (r["win_start"], r["event_type"], r["n_events"])
        for r in spark.read.parquet(dirs["out"])
        .filter(F.col("event_type") != "sentinel")
        .collect()
    }
    expect = {
        (r["win_start"], r["event_type"], r["n_events"])
        for r in events.groupBy(
            F.window("ts", "6 hours").start.alias("win_start"), "event_type"
        ).agg(F.count("*").alias("n_events")).collect()
    }
    assert got == expect
    # each finalized window was emitted exactly once across incremental drains
    assert spark.read.parquet(dirs["out"]).filter(
        F.col("event_type") != "sentinel"
    ).count() == len(expect)


def test_streaming_sessionize_matches_batch_after_watermark(spark, events, tmp_path):
    drops, base = _drops(spark, events, tmp_path)
    dirs = {k: f"{base}/sess_{k}" for k in ("in", "out", "ckpt")}
    for d in drops:
        d.write.mode("append").parquet(dirs["in"])
        stream_sessionize(spark, dirs["in"], dirs["out"], dirs["ckpt"], gap_s=GAP_S)

    got = sorted(
        (r["user_id"], r["session_start_s"], r["session_end_s"], r["n_events"])
        for r in spark.read.parquet(dirs["out"])
        .filter(F.col("user_id") >= 0)
        .collect()
    )

    # batch twin: per-user gap sessionization in pandas over all real events
    pdf = events.select("user_id", F.col("ts").cast("double").alias("s")).toPandas()
    expect = []
    for uid, grp in pdf.groupby("user_id"):
        s = e = None
        n = 0
        for t in sorted(int(x) for x in grp["s"]):
            if s is None:
                s, e, n = t, t, 1
            elif t - e > GAP_S:
                expect.append((uid, s, e, n))
                s, e, n = t, t, 1
            else:
                e, n = t, n + 1
        if s is not None:
            expect.append((uid, s, e, n))
    assert got == sorted(expect)
    assert isinstance(pd.DataFrame(expect), pd.DataFrame)
