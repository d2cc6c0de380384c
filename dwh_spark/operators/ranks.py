"""Distributed exact global ranking — no single-task sort.

An unpartitioned ``row_number() OVER (ORDER BY ...)`` ships every row
through ONE window task: correct at fixture scale, dead at 100 TB. The
reference gets global ordering from PostgreSQL (ORDER BY in its Hasura
queries, e.g. the stalest-selection daemon `x/mongoDaemon/service.go:
100-103`); Spark's scalable equivalent is a two-phase rank:

1. bin rows on the leading (primary) order column at EQUI-DEPTH edges
   (the ``percentile_approx`` aggregate), so heavy value skew cannot
   collapse the data into one bin the way equal-width slicing would —
   each bin holds ~n/nbins rows (plus whatever ties on an edge value,
   which must share a bin for correctness and are irreducible anyway:
   ordering among equal primaries is pure tie-break). Binning is a
   monotone function of the value, so bin-order concatenation IS the
   global order, and nulls get their own leading bin (Spark ASC =
   NULLS FIRST) while NaNs get their own trailing bin (Spark orders
   NaN greatest);
2. collect per-bin counts (<= nbins tiny rows) into cumulative
   offsets, mapped back as a literal expression;
3. ``row_number`` WITHIN each bin (windows partitioned by bin run in
   parallel) plus the bin offset.

The same shape as the sweep-line offset join in ``operators/
temporal.py`` and the MRL audit's exact-order-statistics pass
(``plans/pipeline_extra.py``). The irreducible caveat: if one VALUE
repeats for ~the whole table, its bin is ~the whole table and that
bin's window is one task — no order-preserving partitioning can split
ties without binning on the tie-break columns too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BIN = "__rank_bin"

# The per-row bin fold is O(nbins) codegen work and the probs/edges
# literal arrays are O(nbins) Catalyst nodes (measured: fine at 4096,
# and the nested-when O(log nbins) alternative loses on analysis cost —
# see the inline note below). The floor keeps small inputs on the
# cheap, well-tested 128-bin path.
_MIN_BINS = 128
_MAX_BINS = 4096


def with_global_rank(
    df: DataFrame,
    primary: str,
    order: list[Column] | None = None,
    nbins: int | None = None,
    rank_col: str = "rn",
    meta_out: dict | None = None,
    rows_per_bin: int = 2_000_000,
) -> DataFrame:
    """Append ``rank_col`` = exact global ``row_number`` ordered by
    ``order`` (default: ``primary`` ascending), distributed via
    equi-depth binning on ``primary``.

    ``primary`` must be the LEADING column of ``order``, ascending
    (Spark ASC semantics: nulls first, NaN greatest), and castable to
    double (numeric or timestamp; cast dates to timestamp first). Ties
    on ``primary`` always share a bin and are broken by the remaining
    ``order`` columns inside it, so the result is identical to the
    single-window form for any total ``order``. Null and NaN primaries
    are exact too: each gets a dedicated bin (leading / trailing) and
    never reaches the percentile sketch, so edges are always finite.

    ``nbins=None`` (default) auto-scales: the edge pass also counts
    rows, and bin count is ceil(n / rows_per_bin) clamped to
    [128, 4096] — so a fact-table caller gets ~rows_per_bin-row window
    tasks instead of n/128-row ones, at the cost of one extra tiny-
    output aggregate job when the upgrade triggers. Pass an explicit
    ``nbins`` to pin it (fixture tests, known-compacted inputs).

    ``meta_out``, if given, receives ``{"n": total_row_count,
    "nbins": bins_used}`` — n comes free from the edge pass, so
    callers needing it (top-p% selections) can skip their own
    ``count()`` scan.
    """
    order = order if order is not None else [F.asc(primary)]
    p = F.col(primary).cast("double")
    # NaN-free percentile input: percentile_approx over raw doubles
    # would absorb NaNs into the sketch and can emit NaN edges, making
    # the sorted-edge set undefined. Nulls are ignored by the aggregate.
    p_clean = F.when(F.isnan(p), F.lit(None).cast("double")).otherwise(p)

    def edge_row(k: int, with_count: bool):
        # one pass: equi-depth edges via the percentile_approx AGGREGATE
        # (codegen SQL path — DataFrame.approxQuantile goes through the
        # legacy RDD StatFunctions and is several times slower per job).
        # Edge precision doesn't affect correctness, only bin balance.
        # k < 2 means one bin: no interior edges to compute.
        cols = [
            F.percentile_approx(
                p_clean,
                F.array(*[F.lit(i / k) for i in range(1, k)]),
                F.lit(max(1000, 2 * k)),
            ).alias("qs")
            if k >= 2
            else F.lit(None).cast("array<double>").alias("qs")
        ]
        if with_count:
            cols.append(F.count(F.lit(1)).alias("n"))
        return df.select(*cols).collect()[0]

    base = nbins if nbins is not None else _MIN_BINS
    row = edge_row(base, with_count=True)
    n, qs = row["n"], row["qs"]
    used = base
    if nbins is None and n:
        target = min(_MAX_BINS, max(_MIN_BINS, -(-n // rows_per_bin)))
        if target > base:
            used = target
            qs = edge_row(target, with_count=False)["qs"]
    edges = sorted({float(e) for e in qs if e is not None}) if qs else []
    if meta_out is not None:
        meta_out["n"] = n
        meta_out["nbins"] = used
    if n == 0:  # empty input: preserve schema, nothing to rank
        return df.withColumn(rank_col, F.lit(None).cast("long"))
    # NOTE for callers: this function runs two (adaptive upgrade:
    # three) eager jobs before the lazy ranked frame, so df is
    # materialized up to four times. If df is expensive to recompute,
    # persist it for speed — and if df is NONDETERMINISTIC (sample(),
    # rand(), a re-read of changing files), persisting is a CORRECTNESS
    # requirement: offsets computed from one materialization against
    # bins from another silently skip/duplicate ranks. The same caveat
    # covers the METADATA: meta_out['n'], the n==0 early return, and
    # the adaptive nbins choice are all taken from the EDGE-PASS job
    # (a separate materialization from both the bin counts and the
    # ranked output), so without persist they may describe a different
    # sample of a nondeterministic input than the rows actually ranked.
    if edges:
        # bin(v) = #edges <= v: monotone in v, ties share a bin, and
        # the fold stays JVM-side (codegen loop over a literal array).
        # Measured tradeoff (10M rows, local[32]): an O(log nbins)
        # nested-when binary search is ~40% faster per-row warm but its
        # ~2·nbins-node expression tree costs tens of seconds of
        # Catalyst analysis + codegen PER JOB, swamping fixture-scale
        # queries (34 s vs 1.4 s at sf0.1); the O(nbins) fold compiles
        # to one tight loop and ranks 10M rows in ~18-34 s at
        # nbins=128 (session-load dependent; the r7 smoke measured the
        # adaptive 200-bin path slightly FASTER than 128 — smaller
        # window sorts beat the extra fold work). The auto-scale path
        # raises nbins only with data volume (clamped at _MAX_BINS for
        # exactly this per-row cost).
        bin_expr = F.aggregate(
            F.array(*[F.lit(float(e)) for e in edges]),
            F.lit(0).cast("long"),
            lambda acc, e: acc + F.when(p >= e, 1).otherwise(0),
        )
    else:  # a single distinct non-null value
        bin_expr = F.lit(0).cast("long")
    # nulls sort first under ASC (own leading bin); NaN sorts greatest
    # (own trailing bin — it would land in the top value bin anyway via
    # Spark's NaN-is-greatest comparisons, but an explicit bin keeps
    # bins balanced under NaN-heavy input and the semantics auditable)
    binned = df.withColumn(
        _BIN,
        F.when(p.isNull(), F.lit(-1))
        .when(F.isnan(p), F.lit(len(edges) + 1))
        .otherwise(bin_expr),
    )
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
