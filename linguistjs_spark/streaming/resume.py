"""Batch-with-resumability: per-partition checkpointing with lineage +
metrics rows and idempotent re-runs (north rule; SURVEY.md §2.8).

The reference is a run-to-completion batch tool (single analyse() call,
src/index.ts:18-20); at 10^12-doc scale a run must survive restarts. The unit
of work is a url-hash bucket (crawl order carries no useful locality, and
hash bucketing balances skew — the same xxhash64(url) the north rule requires
for repartitioning). For each bucket:

  1. skip if the _lineage table already records status='ok' for
     (bucket, input_snapshot) — idempotent restart;
  2. run the pipeline on that bucket's rows only;
  3. write labels to <out>/labels/bucket=<b> with mode=overwrite —
     partition-scoped overwrite is the parquet-dir analog of Iceberg's
     overwritePartitions, so a crashed half-written bucket is simply
     rewritten (write-audit-publish per partition);
  4. append a lineage row (bucket, snapshot, rows_in, rows_kept, wall_ms).

The driver loop orchestrates; all data work is distributed.
"""

from __future__ import annotations

import hashlib
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import QualityFilterConfig
from ..pipeline import run_pipeline

LINEAGE_SCHEMA = (
    "bucket int, input_snapshot string, status string, rows_in long, "
    "rows_kept long, wall_ms long, finished_at timestamp"
)


def input_snapshot_id(df: DataFrame) -> str:
    """Fingerprint of the input file set (path list), the parquet-dir analog
    of an Iceberg snapshot id."""
    files = sorted(df.inputFiles())
    return hashlib.sha256("\n".join(files).encode()).hexdigest()[:16]


def completed_buckets(spark: SparkSession, lineage_dir: str, snapshot: str) -> set[int]:
    try:
        lin = spark.read.parquet(lineage_dir)
    except Exception:
        return set()
    rows = (
        lin.filter((F.col("status") == "ok") & (F.col("input_snapshot") == snapshot))
        .select("bucket")
        .distinct()
        .collect()
    )
    return {r["bucket"] for r in rows}


def resumable_run(
    spark: SparkSession,
    pages: DataFrame,
    output_dir: str,
    cfg: QualityFilterConfig | None = None,
    num_buckets: int = 8,
    fail_after: int | None = None,
) -> dict:
    """Run the pipeline bucket-by-bucket with lineage checkpointing.

    fail_after: test hook — raise after N buckets to simulate a crash.
    Returns {'processed': [...], 'skipped': [...], 'snapshot': ...}.
    """
    cfg = cfg or QualityFilterConfig()
    lineage_dir = f"{output_dir}/_lineage"
    labels_dir = f"{output_dir}/labels"
    snapshot = input_snapshot_id(pages)
    done = completed_buckets(spark, lineage_dir, snapshot)

    bucket_col = F.pmod(F.xxhash64("url"), F.lit(num_buckets)).cast("int")
    processed, skipped = [], []
    for b in range(num_buckets):
        if b in done:
            skipped.append(b)
            continue
        if fail_after is not None and len(processed) >= fail_after:
            raise RuntimeError(f"injected failure after {fail_after} buckets")
        t0 = time.perf_counter()
        part = pages.filter(bucket_col == b)
        labels = run_pipeline(spark, part, cfg)
        rows_in = part.count()
        # partition-scoped overwrite: idempotent under re-run
        labels.write.mode("overwrite").parquet(f"{labels_dir}/bucket={b}")
        rows_kept = spark.read.parquet(f"{labels_dir}/bucket={b}").filter("keep").count()
        wall_ms = int((time.perf_counter() - t0) * 1000)
        lineage_row = spark.createDataFrame(
            [(b, snapshot, "ok", rows_in, rows_kept, wall_ms)],
            schema="bucket int, input_snapshot string, status string, "
            "rows_in long, rows_kept long, wall_ms long",
        ).withColumn("finished_at", F.current_timestamp())
        lineage_row.write.mode("append").parquet(lineage_dir)
        processed.append(b)

    return {"processed": processed, "skipped": skipped, "snapshot": snapshot}


def read_labels(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(f"{output_dir}/labels")
