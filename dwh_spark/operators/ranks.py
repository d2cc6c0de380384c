"""Distributed exact global ranking — no single-task sort.

An unpartitioned ``row_number() OVER (ORDER BY ...)`` ships every row
through ONE window task: correct at fixture scale, dead at 100 TB. The
reference gets global ordering from PostgreSQL (ORDER BY in its Hasura
queries, e.g. the stalest-selection daemon `x/mongoDaemon/service.go:
100-103`); Spark's scalable equivalent is a two-phase rank:

1. range-bin rows on the leading (primary) order column — binning is
   weakly monotone in the value, so bin-order concatenation IS the
   global order, and ties always share a bin;
2. collect per-bin counts (<= nbins tiny rows) into cumulative
   offsets, mapped back as a literal expression;
3. ``row_number`` WITHIN each bin (windows partitioned by bin run in
   parallel, each touching ~1/nbins of the data) plus the bin offset.

The same shape as the sweep-line offset join in ``operators/
temporal.py`` and the MRL audit's exact-order-statistics pass
(``plans/pipeline_extra.py``). Degenerate input (every primary value
equal) falls back to a single bin — callers ranking by a constant
column get the global-window behavior they asked for, documented here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BIN = "__rank_bin"


def with_global_rank(
    df: DataFrame,
    primary: str,
    order: list[Column] | None = None,
    nbins: int = 1024,
    rank_col: str = "rn",
) -> DataFrame:
    """Append ``rank_col`` = exact global ``row_number`` ordered by
    ``order`` (default: ``primary`` ascending), distributed via range
    binning on ``primary``.

    ``primary`` must be the LEADING column of ``order`` and ascending,
    castable to double (numeric or timestamp; cast dates to timestamp
    first). Ties on ``primary`` are broken by the remaining ``order``
    columns inside the shared bin, so the result is identical to the
    single-window form for any total ``order``.
    """
    order = order if order is not None else [F.asc(primary)]
    p = F.col(primary).cast("double")
    mm = df.agg(F.min(p).alias("lo"), F.max(p).alias("hi")).collect()[0]
    lo, hi = mm["lo"], mm["hi"]
    if lo is None:  # empty input: preserve schema, nothing to rank
        return df.withColumn(rank_col, F.lit(None).cast("long"))
    if hi > lo:
        bin_col = (
            F.least(F.lit(nbins - 1), F.floor((p - F.lit(lo)) / F.lit(hi - lo) * nbins))
            .cast("long")
        )
    else:  # all primary values equal: ordering is all tie-break
        bin_col = F.lit(0).cast("long")
    binned = df.withColumn(_BIN, bin_col)
    counts = {
        r[_BIN]: r["cnt"]
        for r in binned.groupBy(_BIN).agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets += [F.lit(b), F.lit(acc)]
        acc += counts[b]
    off_map = F.create_map(*offsets)
    w = Window.partitionBy(_BIN).orderBy(*order)
    # long, not int: global ranks overflow int32 beyond ~2.1B rows
    return (
        binned.withColumn(
            rank_col, (F.row_number().over(w) + off_map[F.col(_BIN)]).cast("long")
        ).drop(_BIN)
    )
