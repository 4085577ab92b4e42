#!/usr/bin/env python
"""Experiment: cascade_only at varying core counts + config tweaks.

Usage: python scripts/exp_cores.py [cores[,cores...]] [key=val ...]
Prints one JSON line per (cores, leg).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets allocator env before JVM start)


def run(cores: int, extra: dict, legs: int = 3) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from linguistjs_spark.config import QualityFilterConfig
    from linguistjs_spark.pipeline import run_pipeline

    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"exp-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    try:
        bench.warmup(spark, cores)
        cascade_cfg = QualityFilterConfig(
            quality_rules=False, langid_fallback=False,
            scrub_pii=False, toxicity_filter=False,
        )

        def job():
            pages_c = bench.bench_pages(spark, bench.SF_DIR, bench.REPLICATE)
            return (
                run_pipeline(spark, pages_c, cascade_cfg)
                .groupBy("lang").agg(F.count("*"), F.sum("bytes")).collect()
            )

        def vm():
            d = {}
            for line in open("/proc/vmstat"):
                k, v = line.split()
                if k in ("pgfault", "pgfree", "pgalloc_normal", "pgscan_direct"):
                    d[k] = int(v)
            for line in open("/proc/stat"):
                if line.startswith("ctxt"):
                    d["ctxt"] = int(line.split()[1])
            return d

        for i in range(legs):
            v0 = vm()
            t, _ = bench.timed(job)
            v1 = vm()
            print(json.dumps({
                "cores": cores, "leg": i, "sec": round(t, 3),
                "host": dict(bench.LAST_LEG_HOST), "extra": extra,
                "vm": {k: v1[k] - v0[k] for k in v0},
            }), flush=True)
    finally:
        spark.stop()
        time.sleep(1)


if __name__ == "__main__":
    cores_list = [int(c) for c in (sys.argv[1] if len(sys.argv) > 1 else "16,32").split(",")]
    extra = dict(a.split("=", 1) for a in sys.argv[2:])
    for c in cores_list:
        run(c, extra)
