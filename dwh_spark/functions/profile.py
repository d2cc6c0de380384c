"""Table profiling — the ANALYZE/statistics pass as a query.

A warehouse needs per-column statistics (row counts, null counts,
exact distinct counts, min/max) for capacity planning, data-quality
monitoring, and optimizer hints. This computes ALL columns' stats in
ONE scan: the multi-distinct aggregate plans as a single pass with an
Expand (rows × #distinct-aggs) feeding partial aggregation — no
per-column jobs, no driver loop.

Min/max are rendered to strings so heterogeneous column types fit one
tall result schema (the same shape ANALYZE writes to a stats table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row per profiled column: (column_name, n, n_null,
    n_distinct, min_val, max_val). Single scan, single aggregate."""
    aggs = [F.count("*").alias("_total")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(c).alias(f"_n{i}"),
            F.count_distinct(c).alias(f"_d{i}"),
            F.min(c).cast("string").alias(f"_mn{i}"),
            F.max(c).cast("string").alias(f"_mx{i}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"_n{i}").alias("n"),
                (F.col("_total") - F.col(f"_n{i}")).alias("n_null"),
                F.col(f"_d{i}").alias("n_distinct"),
                F.col(f"_mn{i}").alias("min_val"),
                F.col(f"_mx{i}").alias("max_val"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")
