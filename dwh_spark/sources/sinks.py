"""Write-side connectors (SURVEY.md §2.1 S4/S6/S9).

The reference writes row-at-a-time through GORM to Postgres
(`x/common/config.go:233-245`) and content-addressed files to disk
(`x/imgstorage/storage.go:16-84`). The canonical Spark sink is
partitioned parquet (Delta/Iceberg on a real cluster); JDBC exists for
parity with the reference's Postgres surface.

Scale notes:
- `write_partitioned` lays data out for partition PRUNING: queries that
  filter on the partition column scan only matching directories.
  Partition columns must be low-cardinality (date buckets, not entity
  ids) or the filesystem drowns in directories.
- `write_bucketed` pre-shuffles by join key so repeated joins/aggs on
  that key are SHUFFLE-FREE at read time (`spark.table`, not path
  reads — bucketing metadata lives in the catalog).
- sortWithinPartitions gives run-length/delta encoding friendly
  parquet and enables row-group min/max skipping on the sort key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partition-pruned parquet layout; optionally sorted within files
    for row-group skipping on ``sort_by``."""
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed catalog table: co-locates rows by ``bucket_by`` so
    equi-joins/aggs on those keys skip the shuffle entirely. Bucketing
    metadata lives in the catalog — read back with ``spark.table``,
    not a path read. ``path`` makes it external (managed otherwise)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    **options: str,
) -> None:
    """S4 parity sink: JDBC writer (the reference's Postgres surface).
    Row-at-a-time GORM inserts become batched prepared statements, one
    connection per partition — repartition small before calling or a
    1000-executor write opens 1000 connections."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**options)
        .mode(mode)
        .save()
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a partitioned layout; partition columns come from
    directory names and prune on filter."""
    return spark.read.parquet(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Small-file compaction — the maintenance job every streaming sink
    needs: micro-batches and per-task writers leave thousands of tiny
    files whose open/footer costs dominate reads at scale (the classic
    HDFS/S3 small-files problem; Delta's OPTIMIZE).

    Sizes the output from the measured input bytes (one file per
    ``target_file_bytes``), optionally re-sorting within files for
    row-group min/max skipping. Writes to ``out_path`` — the caller
    swaps paths or repoints the table, mirroring how OPTIMIZE commits
    a new snapshot rather than rewriting in place. Returns the output
    file count.
    """
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    # repartition (not coalesce): coalesce would also narrow the READ
    # parallelism; a shuffle-light rebalance keeps the scan wide
    out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    out.write.mode("overwrite").parquet(out_path)
    return n_files
