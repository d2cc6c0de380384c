"""Fixture-schema invariants the whole engine assumes after load.

Round 2 lesson: the driver regenerated the testdata parquet with ``ts``
as ``timestamp[us]`` (Spark: TIMESTAMP_NTZ) and 7 queries + the bench
crashed at plan time. This test pins the contract of
``sources/catalog.load_table`` — whatever encoding the fixtures ship
(nanos-as-long, us-NTZ, us-UTC), every loaded table must present:

- ``ts`` typed TIMESTAMP (never TIMESTAMP_NTZ, never bigint) so
  ``unix_micros``, watermarks, and decimal casts all resolve;
- no TIMESTAMP_NTZ leakage in ANY column of ANY table;
- the canonical column sets downstream plans select from.

If a future fixture regeneration breaks an assumption, this one test
fails with the table name instead of 7 queries crashing mid-round.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from dwh_spark.sources.catalog import TESTDATA_TABLES, load_table

from tests.conftest import SF_ORACLE, SF_SMALL


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_no_ntz_leakage_any_table(spark, sf_dir):
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        for field in df.schema.fields:
            assert not isinstance(field.dataType, TimestampNTZType), (
                f"{name}.{field.name} is TIMESTAMP_NTZ after load_table — "
                "watermarks/unix_micros will crash; normalize in catalog.py"
            )


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_events_ts_is_timestamp(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    ts_type = dict((f.name, f.dataType) for f in df.schema.fields)["ts"]
    assert isinstance(ts_type, TimestampType), ts_type


def test_events_ts_watermark_and_epoch_resolve(spark):
    """The two plan-time operations the NTZ drift broke must resolve."""
    df = load_table(spark, SF_SMALL, "events")
    # epoch extraction (as-of/proximity/interval joins)
    df.select(F.unix_micros("ts").alias("us")).limit(1).collect()
    # decimal cast (interval frame sums)
    df.select(F.col("ts").cast("decimal(26,6)").alias("d")).limit(1).collect()
    # watermark analysis (streaming family) — plan-time check only
    df.withWatermark("ts", "1 day").groupBy(
        F.window("ts", "1 day")
    ).count()._jdf.queryExecution().analyzed()


def test_ts_values_match_duckdb_epoch(spark):
    """The NTZ→TIMESTAMP cast must be value-exact vs DuckDB's naive-UTC
    reading of the same file (the oracle's view of time)."""
    import duckdb

    df = load_table(spark, SF_SMALL, "events")
    spark_min, spark_max = df.select(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    duck_min, duck_max = duckdb.sql(
        f"SELECT min(epoch_us(ts)), max(epoch_us(ts)) "
        f"FROM read_parquet('{SF_SMALL}/events.parquet')"
    ).fetchone()
    assert (spark_min, spark_max) == (duck_min, duck_max)
