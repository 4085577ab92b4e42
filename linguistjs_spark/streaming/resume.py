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

    skipped = sorted(done & set(range(num_buckets)))
    pending = [b for b in range(num_buckets) if b not in done]
    if fail_after is not None and len(pending) > fail_after:
        # crash-injection hook: process only the first N buckets, then die
        crash_after_write = True
        pending = pending[:fail_after]
    else:
        crash_after_write = False
    if not pending:
        return {"processed": [], "skipped": skipped, "snapshot": snapshot}

    # ONE job writes every pending bucket (VERDICT r01 #5 — the per-bucket
    # loop ran ~2 full input scans per bucket). partitionBy(bucket) with
    # dynamic partition overwrite keeps the per-bucket idempotent-overwrite
    # contract: only the buckets present in this write are replaced, a
    # crashed half-written bucket is rewritten wholesale on the next run
    # (write-audit-publish per partition, the parquet-dir analog of
    # Iceberg's overwritePartitions).
    t0 = time.perf_counter()
    bucket_col = F.pmod(F.xxhash64("url"), F.lit(num_buckets)).cast("int")
    part = pages.filter(bucket_col.isin(pending))
    labels = run_pipeline(spark, part, cfg).withColumn("bucket", bucket_col)
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        labels.write.mode("overwrite").partitionBy("bucket").parquet(labels_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    wall_ms = int((time.perf_counter() - t0) * 1000)

    # audit pass: rows_in/rows_kept per bucket from ONE scan of the WRITTEN
    # labels (the pipeline emits exactly one label row per input row, so
    # bucket counts over the output equal input counts) — never a second
    # scan of the source
    stats = {
        r["bucket"]: (r["n"], r["k"])
        for r in spark.read.parquet(labels_dir)
        .filter(F.col("bucket").isin(pending))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("keep").cast("long")).alias("k"))
        .collect()
    }
    lineage_rows = [
        (b, snapshot, "ok", *stats.get(b, (0, 0)), wall_ms) for b in pending
    ]
    spark.createDataFrame(
        lineage_rows,
        schema="bucket int, input_snapshot string, status string, "
        "rows_in long, rows_kept long, wall_ms long",
    ).withColumn("finished_at", F.current_timestamp()).write.mode(
        "append"
    ).parquet(lineage_dir)

    if crash_after_write:
        raise RuntimeError(f"injected failure after {fail_after} buckets")
    return {"processed": pending, "skipped": skipped, "snapshot": snapshot}


def read_labels(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(f"{output_dir}/labels")


# ---------------------------------------------------------------------------
# resumable composed training mix (VERDICT r03 item 9)
# ---------------------------------------------------------------------------


def resumable_training_mix(
    spark: SparkSession,
    docs: DataFrame,
    output_dir: str,
    fractions: dict[str, float],
    num_buckets: int = 8,
    seed: int = 7,
    bench_every: int = 50,
    fail_after: int | None = None,
) -> dict:
    """The composed training-mix job (exact-dedup winners -> eval-set
    decontamination -> deterministic stratified sample) with the same
    per-bucket lineage checkpointing as ``resumable_run`` — the workflow a
    100-TB user actually restarts.

    The checkpoint unit is a ``xxhash64(text)`` FINGERPRINT bucket, not a
    url bucket: every exact copy of a text lands in the same bucket, so
    per-bucket dedup (min doc_id per fingerprint) is exactly global dedup
    — restartable partitioning without changing the operator's semantics.
    Decontamination stays global (the bench-gram probe is a broadcast
    built from the full input each run — rebuilding it is two narrow scans
    of the tiny eval slice, never a correctness risk across restarts), and
    sampling is per-row key-hash deterministic, so the union of bucket
    outputs across any crash/restart sequence is byte-identical to the
    one-shot ``training_mix`` plan's sampled set.

    Writes sampled docs to ``<out>/mix/bucket=<b>`` (dynamic partition
    overwrite — a crashed half-written bucket is rewritten wholesale) and
    lineage rows to ``<out>/_lineage``. Returns the same dict shape as
    ``resumable_run``. ``training_mix_rollup`` aggregates the final mix.
    """
    from pyspark.sql import Window

    from ..operators.decontam import contamination_flags
    from ..operators.sampling import stratified_sample

    lineage_dir = f"{output_dir}/_lineage"
    mix_dir = f"{output_dir}/mix"
    snapshot = input_snapshot_id(docs)
    done = completed_buckets(spark, lineage_dir, snapshot)

    skipped = sorted(done & set(range(num_buckets)))
    pending = [b for b in range(num_buckets) if b not in done]
    if fail_after is not None and len(pending) > fail_after:
        crash_after_write = True
        pending = pending[:fail_after]
    else:
        crash_after_write = False
    if not pending:
        return {"processed": [], "skipped": skipped, "snapshot": snapshot}

    t0 = time.perf_counter()
    docs = docs.select("doc_id", "lang", "text")
    bucket_col = F.pmod(F.xxhash64("text"), F.lit(num_buckets)).cast("int")
    part = docs.filter(bucket_col.isin(pending))
    # dedup inside the bucket == global dedup (fingerprint-aligned buckets)
    w = Window.partitionBy(F.xxhash64("text")).orderBy("doc_id")
    winners = (
        part.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn")
    )
    bench = docs.filter(F.col("doc_id") % bench_every == 0)  # global probe
    clean = contamination_flags(winners, bench, n=13).filter(
        ~F.col("is_contaminated")
    ).drop("is_contaminated")
    sampled = stratified_sample(
        clean, fractions, strata_col="lang", key_col="doc_id", seed=seed
    ).withColumn("bucket", bucket_col)

    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        sampled.write.mode("overwrite").partitionBy("bucket").parquet(mix_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    wall_ms = int((time.perf_counter() - t0) * 1000)

    stats = {
        r["bucket"]: r["n"]
        for r in spark.read.parquet(mix_dir)
        .filter(F.col("bucket").isin(pending))
        .groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    lineage_rows = [
        (b, snapshot, "ok", stats.get(b, 0), stats.get(b, 0), wall_ms)
        for b in pending
    ]
    spark.createDataFrame(
        lineage_rows,
        schema="bucket int, input_snapshot string, status string, "
        "rows_in long, rows_kept long, wall_ms long",
    ).withColumn("finished_at", F.current_timestamp()).write.mode(
        "append"
    ).parquet(lineage_dir)

    if crash_after_write:
        raise RuntimeError(f"injected failure after {fail_after} buckets")
    return {"processed": pending, "skipped": skipped, "snapshot": snapshot}


def resumable_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    output_dir: str,
    iters: int = 3,
    damping: float = 0.85,
    fail_after: int | None = None,
) -> dict:
    """Restartable PageRank: the checkpoint unit is the ITERATION.

    Iterative jobs have a different restart shape from the bucket jobs
    above — iteration t depends on all of t-1, so the unit of work is the
    whole rank table per iteration, materialized to
    ``<out>/ranks/iter=<t>`` (parquet _SUCCESS marker = committed).
    Restart scans the lineage for the last committed iteration under the
    same (edge-snapshot, damping) and continues from its rank table; a
    crashed half-written iteration is rewritten wholesale (overwrite).
    Materializing per iteration also bounds lineage exactly like the
    in-memory variant's localCheckpoint, with durability added.

    ``fail_after=k`` injects a crash after committing k pending
    iterations (test hook, same idiom as resumable_run). Returns
    {"processed": [...], "skipped": [...], "snapshot": ...}; read the
    final table with ``pagerank_ranks``.
    """
    from ..operators.link_graph import (
        pagerank_graph, pagerank_init, pagerank_step,
    )

    lineage_dir = f"{output_dir}/_lineage"
    snapshot = f"{input_snapshot_id(edges)}:d={damping!r}"
    done = completed_buckets(spark, lineage_dir, snapshot)

    nodes, n_df, deg, norm = pagerank_graph(edges)
    skipped = sorted(b for b in done if b <= iters)
    start = 0
    while start + 1 in done:
        start += 1
    pending = list(range(start + 1, iters + 1))
    if fail_after is not None and len(pending) > fail_after:
        crash_after = True
        pending = pending[:fail_after]
    else:
        crash_after = False
    if not pending:
        return {"processed": [], "skipped": skipped, "snapshot": snapshot}

    ranks = (
        pagerank_init(nodes, n_df) if start == 0
        else spark.read.parquet(f"{output_dir}/ranks/iter={start}")
    )
    processed = []
    for it in pending:
        t0 = time.perf_counter()
        ranks = pagerank_step(nodes, n_df, deg, norm, ranks, damping)
        ranks.write.mode("overwrite").parquet(f"{output_dir}/ranks/iter={it}")
        ranks = spark.read.parquet(f"{output_dir}/ranks/iter={it}")
        wall_ms = int((time.perf_counter() - t0) * 1000)
        n_rows = ranks.count()
        spark.createDataFrame(
            [(it, snapshot, "ok", n_rows, n_rows, wall_ms)],
            schema="bucket int, input_snapshot string, status string, "
            "rows_in long, rows_kept long, wall_ms long",
        ).withColumn("finished_at", F.current_timestamp()).write.mode(
            "append"
        ).parquet(lineage_dir)
        processed.append(it)
    if crash_after:
        raise RuntimeError(f"injected failure after {fail_after} iterations")
    return {"processed": processed, "skipped": skipped, "snapshot": snapshot}


def pagerank_ranks(spark: SparkSession, output_dir: str, it: int) -> DataFrame:
    return spark.read.parquet(f"{output_dir}/ranks/iter={it}")


def training_mix_rollup(spark: SparkSession, output_dir: str) -> DataFrame:
    """Per-lang (n_docs, bytes) over the materialized mix — the same shape
    as the one-shot ``training_mix`` driver query's output."""
    return (
        spark.read.parquet(f"{output_dir}/mix")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.octet_length("text")).cast("long").alias("bytes"),
        )
    )
