"""Parquet catalog over the driver testdata directories.

The reference's "sources" are Tendermint RPC polls + Postgres/Mongo sinks
(SURVEY.md §2.1 S1-S13). Our batch-first engine reads append-only parquet
tables; the streaming path (dwh_spark.streaming) reads the same files with
``readStream`` so the two share schemas.

Scale notes: reads go through the vectorized parquet reader with
predicate pushdown and column pruning (verify via
``df.explain()`` → ``PushedFilters``/``ReadSchema``). At 100 TB each
table would be a partitioned directory (e.g. orders by month); the API
here is path-based so that layout change is transparent to callers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Schema comes from parquet footer metadata
    (exact, no inference cost).

    ``events.ts`` has shipped in two fixture encodings, both normalized
    here to session-timezone TIMESTAMP so every downstream operator
    (``unix_micros``, watermarks, decimal casts) sees one type:

    - parquet ``timestamp[ns]`` (round-1 fixtures): Spark's reader
      rejects nanos, so we read nanos-as-long
      (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
      microseconds with integer division — bit-identical to DuckDB's
      ns→us handling (float division loses precision at 1e18 ns).
    - parquet ``timestamp[us]`` without UTC adjustment (round-2+
      fixtures): Spark infers TIMESTAMP_NTZ, which watermarks and
      epoch functions reject. The session timezone is pinned UTC
      (session.py), so ``cast("timestamp")`` is value-exact and
      matches DuckDB's naive-UTC reading of the same file.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.dataType.simpleString() == "timestamp_ntz":
            # o_orderdate / l_shipdate / ts — normalize every temporal
            # column to one type engine-wide
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view for spark.sql use."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
