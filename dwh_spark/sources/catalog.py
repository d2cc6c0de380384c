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

    ``events.ts`` is written as parquet ``timestamp[ns]``, which Spark's
    reader rejects; we read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
    microsecond timestamps with integer division — bit-identical to
    DuckDB's ns→us handling (float division would lose precision at
    1e18 nanoseconds).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view for spark.sql use."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
