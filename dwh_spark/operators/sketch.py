"""Engine-portable distinct-count sketch: K-Minimum-Values (KMV).

Spark's ``approx_count_distinct`` (HLL++) and DuckDB's
``approx_distinct`` use different sketch internals, so their estimates
can never hash-match across engines. KMV (Bar-Yossef et al. 2002) is
deterministic given the hash function: track the k smallest hash
values; if the k-th smallest normalized hash is U, the distinct count
estimate is (k-1)/U. We derive the hash from md5 — available and
bit-identical in both engines — so the oracle reproduces the estimate
exactly.

Scale notes: the Spark plan is distinct → window-topk → tiny groupBy.
At 100 TB the distinct pre-pass is the dominant shuffle, identical to
what exact count(distinct) needs; the payoff is the *mergeable* sketch:
per-partition KMV sets (size k) union into a global estimate without
re-shuffling raw values — the pattern for incremental/streaming rollups
where the exact distinct state would be unbounded.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: fits a signed 64-bit int, uniform on [0, 2^60)
_HASH_SPACE = float(1 << 60)


def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate via KMV with ``k`` minima.

    Returns (group_cols..., n_kmv) where n_kmv is exact when the group
    has fewer than k distinct values (the sketch has seen them all) and
    floor((k-1) * 2^60 / kth_min_hash) otherwise.
    """
    keys = list(group_cols)
    hashed = df.select(*keys, _hash60(F.col(value_col)).alias("__h")).distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    est = F.floor(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("__kth").cast("double"))
    return (
        topk.groupBy(*keys)
        .agg(F.count("*").alias("__seen"), F.max("__h").alias("__kth"))
        .select(
            *keys,
            F.when(F.col("__seen") < k, F.col("__seen")).otherwise(est).alias("n_kmv"),
        )
    )


def kmv_oracle_sql(table: str, group_cols: Sequence[str], value_col: str, k: int = 64) -> str:
    """The DuckDB rendition of :func:`kmv_distinct` — identical hash,
    identical estimate, so results hash-match bit-for-bit."""
    keys = ", ".join(group_cols)
    return f"""
    WITH hashed AS (
      SELECT DISTINCT {keys},
             ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM {table}
    ),
    topk AS (
      SELECT {keys}, h,
             row_number() OVER (PARTITION BY {keys} ORDER BY h) AS rn
      FROM hashed QUALIFY rn <= {k}
    )
    SELECT {keys},
           CASE WHEN count(*) < {k} THEN count(*)
                ELSE floor({float(k - 1)} * {_HASH_SPACE} / CAST(max(h) AS DOUBLE))::BIGINT
           END AS n_kmv
    FROM topk GROUP BY {keys}
    """


# ---------------------------------------------------------------------------
# Count-min sketch: d md5-derived hash rows × w buckets. The sketch
# build is one map-side-combinable groupBy over (row, bucket) — d·w
# cells total regardless of input size — and a point estimate is the
# min over d bucket sums. Estimates only ever OVER-count (collisions
# add), so estimate >= exact always; the registry query pins both the
# cell arithmetic and that invariant against exact DuckDB counts.
# ---------------------------------------------------------------------------
CMS_DEPTH = 4
CMS_WIDTH = 64


def cms_bucket(col: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Deterministic bucket for hash row ``row``: md5 over the
    row-tagged key, first 8 hex digits, mod width — reproducible in
    DuckDB as ('0x' || substr(md5(...), 1, 8))::BIGINT % width."""
    tagged = F.concat(F.lit(f"{row}:"), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("long") % width
    )


def cms_bucket_sql(key_sql: str, row: int, width: int = CMS_WIDTH) -> str:
    return (
        f"('0x' || substr(md5('{row}:' || CAST({key_sql} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {width}"
    )


def cms_build(df, key: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """(row, bucket, cell_count) — the whole sketch is depth·width rows."""
    rows = None
    for r in range(depth):
        part = df.select(
            F.lit(r).alias("row"), cms_bucket(F.col(key), r, width).alias("bucket")
        )
        rows = part if rows is None else rows.unionAll(part)
    return rows.groupBy("row", "bucket").agg(F.count("*").alias("cell"))


def cms_estimate(sketch, probes, key: str, depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH):
    """Point estimates for a (small) probe set: join each probe's d
    buckets against the sketch cells (broadcast — the sketch is d·w
    rows) and take the min cell."""
    probe_buckets = None
    for r in range(depth):
        part = probes.select(
            key, F.lit(r).alias("row"), cms_bucket(F.col(key), r, width).alias("bucket")
        )
        probe_buckets = part if probe_buckets is None else probe_buckets.unionAll(part)
    return (
        probe_buckets.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key)
        .agg(F.min("cell").alias("cms_count"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007), engine-portable edition. Spark's
# approx_count_distinct is HLL++ and DuckDB's approx_distinct is its
# own sketch — they can never hash-match. This build derives every
# register from the same md5 hash both engines compute bit-identically:
#   bucket = top p bits of the 60-bit hash, rho = leading-zero count of
#   the remaining 52 bits + 1 (computed EXACTLY via length(bin(x)) —
#   no float log), register = max(rho).
# The harmonic-mean denominator sum(2^-reg) is kept as an exact BIGINT
# by scaling with 2^53 (register term 2^(53-reg), empty register 2^53;
# max total 256·2^53 < 2^63). The only cross-engine float ops are one
# IEEE division for the raw estimate and one ln() for the linear-
# counting small-range correction — both computed from exact integer
# inputs with identical expression shape on both sides.
#
# Scale: the register table is m rows per group regardless of input
# size, built by one map-side-combinable groupBy — THE mergeable
# distinct sketch for 100 TB rollups (union = max per register).
# ---------------------------------------------------------------------------
HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_HLL_C = _HLL_ALPHA * HLL_M * HLL_M * float(1 << 53)  # raw-estimate numerator
_LOW_BITS = 60 - HLL_P  # 52
_LOW_MASK = (1 << _LOW_BITS) - 1
# floor(m·ln(m/v)) for v=1..m-1, precomputed ONCE and embedded as
# literals on BOTH engines — the linear-counting branch must not
# depend on two libm ln() implementations rounding identically.
_HLL_LC_TABLE = [
    math.floor(float(HLL_M) * math.log(float(HLL_M) / v)) for v in range(1, HLL_M)
]


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-group HLL register table: (group_cols..., __bucket, __reg).

    This IS the sketch's mergeable state — union of sets = per-bucket
    ``max(__reg)`` across their register tables, losslessly. Exposed so
    set-algebra queries can merge sketches without re-reading data."""
    keys = list(group_cols)
    h = _hash60(F.col(value_col))
    return (
        df.select(
            *keys,
            F.shiftright(h, _LOW_BITS).alias("__bucket"),
            h.bitwiseAND(F.lit(_LOW_MASK)).alias("__low"),
        )
        .withColumn(
            "__rho",
            F.when(F.col("__low") == 0, F.lit(_LOW_BITS + 1)).otherwise(
                F.lit(_LOW_BITS + 1) - F.length(F.bin(F.col("__low")))
            ),
        )
        .groupBy(*keys, "__bucket")
        .agg(F.max("__rho").alias("__reg"))
    )


def hll_estimate(regs: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """(group_cols..., n_hll) from a register table (raw estimate with
    the small-range linear-counting branch, shared literal table)."""
    keys = list(group_cols)
    per_group = regs.groupBy(*keys).agg(
        F.sum(F.expr("shiftleft(1L, 53 - __reg)")).alias("__s"),
        F.count("*").alias("__present"),
    )
    v = F.lit(HLL_M) - F.col("__present")  # empty registers
    sum_scaled = F.col("__s") + v * F.lit(1 << 53)
    raw = F.lit(_HLL_C) / sum_scaled.cast("double")
    # linear counting via the shared literal table (not F.log): ln() is
    # not guaranteed correctly-rounded in either engine, so a 1-ulp
    # divergence could flip the floor when m·ln(m/v) grazes an integer
    # (r3 ADVICE); both engines index the identical precomputed ints.
    lc = F.element_at(F.array(*[F.lit(x) for x in _HLL_LC_TABLE]), v.cast("int"))
    return per_group.select(
        *keys,
        F.when((raw <= F.lit(2.5 * HLL_M)) & (v > 0), lc)
        .otherwise(F.floor(raw))
        .alias("n_hll"),
    )


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-group HLL distinct-count estimate, bit-identical to
    :func:`hll_oracle_sql`. Returns (group_cols..., n_hll)."""
    return hll_estimate(hll_registers(df, group_cols, value_col), group_cols)


def hll_oracle_sql(table: str, group_cols: Sequence[str], value_col: str) -> str:
    """DuckDB rendition of :func:`hll_distinct` — identical hash,
    identical exact-integer register sum, identical estimate shape."""
    keys = ", ".join(group_cols)
    return f"""
    WITH hashed AS (
      SELECT {keys},
             ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM {table}
    ),
    regs AS (
      SELECT {keys}, h >> {_LOW_BITS} AS bucket,
             max(CASE WHEN (h & {_LOW_MASK}) = 0 THEN {_LOW_BITS + 1}
                      ELSE {_LOW_BITS + 1} - length(bin(h & {_LOW_MASK})) END) AS reg
      FROM hashed GROUP BY {keys}, bucket
    ),
    agg AS (
      SELECT {keys},
             sum((1::BIGINT << (53 - reg)))::BIGINT
               + ({HLL_M} - count(*)) * ({1 << 53}::BIGINT) AS sum_scaled,
             {HLL_M} - count(*) AS v
      FROM regs GROUP BY {keys}
    )
    SELECT {keys},
           CASE WHEN {_HLL_C!r} / CAST(sum_scaled AS DOUBLE) <= {2.5 * HLL_M}
                 AND v > 0
                THEN ([{", ".join(str(x) for x in _HLL_LC_TABLE)}])[v]::BIGINT
                ELSE floor({_HLL_C!r} / CAST(sum_scaled AS DOUBLE))::BIGINT
           END AS n_hll
    FROM agg
    """


# ------------------------------------------------ Misra-Gries heavy hitters
#
# The missing member of the sketch family next to KMV (distinct), CMS
# (point frequency — needs candidate keys), and HLL: FINDING the heavy
# keys without knowing them up front. Misra-Gries (1982) keeps k
# counters; the mergeable-summaries form (Agarwal et al., PODS 2012)
# is exactly Spark-shaped: one summary per partition, merged by
# key-wise addition, with the deterministic guarantee
#     est(key) <= true(key) <= est(key) + err_bound,
#     err_bound * (k + 1) <= n
# carried explicitly in the output, like the MRL quantile sketch's
# self-tracked bound. Complements the skew machinery: this is how a
# pipeline DISCOVERS its hot keys before salting them.


def mg_partition_summaries(
    df: DataFrame,
    key_col: str,
    part_col: str,
    k: int = 64,
    n_parts: int = 32,
) -> DataFrame:
    """Per-bucket Misra-Gries summaries over ``key_col``. NULL keys
    are excluded from both the counters and the totals (the usual
    sketch convention — filter or coalesce upstream to count them).

    Memory discipline: the exact (bucket, key) pre-counts come from a
    JVM groupBy — map-side combined and SPILLABLE, so worker memory
    never holds a per-partition vocabulary dict (that's the scale
    where a k-counter sketch must not OOM its own worker). The Python
    side then streams the sorted pre-counts through MG with O(k)
    state per bucket.

    Determinism: buckets are ``xxhash64(part_col) mod n_parts`` (a
    pure function of the data, not a physical partition id), and MG
    processes each bucket's (key, count) pairs in sorted-key order —
    bit-reproducible regardless of Arrow batch sizes, shuffle fetch
    order, or input file layout. Batched decrements are faithful to
    unit MG: each decrement unit removes one copy from every live
    counter plus one copy of the incoming key, so
    ``dtot * (k+1) <= n_bucket`` holds per bucket.

    Returns rows ``(pid, key, cnt, dtot, n_p)`` keyed by bucket id:
    one row per surviving counter plus one ``key IS NULL`` accounting
    row per bucket.
    """
    schema = "pid long, key string, cnt long, dtot long, n_p long"

    def build(batches):
        import pandas as pd

        def finish(bucket, counters, dtot, n_b):
            rows = [(bucket, kk, cc, dtot, n_b) for kk, cc in sorted(counters.items())]
            rows.append((bucket, None, 0, dtot, n_b))  # accounting row
            return pd.DataFrame(rows, columns=["pid", "key", "cnt", "dtot", "n_p"])

        cur = None
        counters: dict = {}
        dtot = 0
        n_b = 0
        for pdf in batches:
            for bucket, key, c in zip(pdf["__b"], pdf["__k"], pdf["__c"]):
                bucket, c = int(bucket), int(c)
                if bucket != cur:
                    if cur is not None:
                        yield finish(cur, counters, dtot, n_b)
                    cur, counters, dtot, n_b = bucket, {}, 0, 0
                n_b += c
                # sorted-unique keys per bucket: no revisit branch needed
                while c > 0:
                    if len(counters) < k:
                        counters[key] = c
                        break
                    m = min(counters.values())
                    dec = min(m, c)
                    for kk in list(counters):
                        counters[kk] -= dec
                        if counters[kk] == 0:
                            del counters[kk]
                    dtot += dec
                    c -= dec
        if cur is not None:
            yield finish(cur, counters, dtot, n_b)

    pre = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(
            F.pmod(F.xxhash64(F.col(part_col)), F.lit(n_parts)).alias("__b"),
            F.col(key_col).cast("string").alias("__k"),
        )
        .agg(F.count("*").alias("__c"))
    )
    shaped = pre.repartition(n_parts, "__b").sortWithinPartitions("__b", "__k")
    return shaped.mapInPandas(build, schema)


def mg_merge(partials: DataFrame) -> tuple[DataFrame, int, int]:
    """Merge per-bucket MG summaries: key-wise count addition (the
    union stays <= n_parts * k rows — no re-truncation needed, which
    only tightens the bound). Returns (counters_df(key, est),
    err_bound, n): for every key, est <= true <= est + err_bound, and
    err_bound * (k+1) <= n by construction.

    The partials are persisted for the two consuming jobs and
    unpersisted before returning; the merged counters materialize
    through the driver — <= n_parts * k rows, small BY CONSTRUCTION
    (that is what a summary is), so the returned frame re-executes
    nothing."""
    spark = partials.sparkSession
    partials = partials.persist()
    try:
        acct = (
            partials.groupBy("pid")
            .agg(F.max("dtot").alias("d"), F.max("n_p").alias("m"))
            .agg(F.sum("d").alias("err"), F.sum("m").alias("n"))
            .collect()[0]
        )
        counter_rows = (
            partials.filter(F.col("key").isNotNull())
            .groupBy("key")
            .agg(F.sum("cnt").alias("est"))
            .collect()
        )
    finally:
        partials.unpersist()
    # pandas input, not a python list: list-based createDataFrame
    # parallelizes into defaultParallelism python-RDD partitions and
    # every downstream action pays serial python-worker round trips;
    # the Arrow path materializes a JVM LocalRelation instead
    import pandas as pd

    counters = spark.createDataFrame(
        pd.DataFrame(
            [(r["key"], int(r["est"])) for r in counter_rows],
            columns=["key", "est"],
        ),
        schema="key string, est long",
    )
    return counters, int(acct["err"] or 0), int(acct["n"] or 0)
