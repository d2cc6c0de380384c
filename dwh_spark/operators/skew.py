"""Skew mitigation: salted aggregation and salted skew-join.

AQE's skew-join splitting (on in session.py) handles most cases at
runtime; these explicit forms are for the two places AQE can't help:
(a) a skewed *aggregation* whose single hot key funnels into one task,
(b) a skewed join where the skewed side must stay partitioned (e.g.
streaming state). The salt fan-out trades one extra partial shuffle
for even task sizes — the classic two-phase aggregation.

A hot-key top-k over an event log (one celebrity entity with 10% of
all rows) is the canonical 100 TB case.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation: count + sum of ``value`` per
    key. Phase 1 aggregates (key, salt) — the hot key spreads over
    ``n_salts`` tasks; phase 2 combines the ≤ n_salts partials per key.

    Returns (keys..., n, sum_value). Deterministic regardless of salt
    assignment because count/sum are associative-commutative.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int")  # seeded: plan-stable
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count("*").alias("__n"), F.sum(value).alias("__s"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n"), F.sum("__s").alias("sum_value")
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the skewed side, replicate the small
    side once per salt, join on (keys..., salt). The hot key's rows
    land in ``n_salts`` different tasks instead of one straggler.

    The replicated side multiplies by ``n_salts`` — keep it the
    dimension side. (With a truly small dimension just ``broadcast()``;
    salting is for when it exceeds the broadcast threshold but one
    fact key is hot.)
    """
    keys = list(on)
    salted_fact = skewed.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(replicated, [*keys, "__salt"], how).drop("__salt")


def targeted_salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    hot_keys: Sequence,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join that salts ONLY the discovered hot keys.

    ``salted_join`` replicates the whole dimension side ``n_salts``
    times — the right trade when skew is broad or unknown. When the
    hot keys ARE known (e.g. discovered by the Misra-Gries sketch in
    ``operators/sketch.py`` — for thresholds above the err bound,
    est + err_bound >= threshold selects a guaranteed superset of
    every key above threshold; below err no sketch can promise
    discovery), the dimension
    blow-up can be confined to them: hot fact rows get a uniform salt
    in [0, n_salts), cold rows salt 0; hot dimension keys replicate
    ``n_salts`` times, cold keys once. Dimension amplification drops
    from n_salts*|dim| to |dim| + (n_salts-1)*|hot| — at 100 TB with a
    handful of celebrity keys, effectively free.

    ``hot_keys`` is small by construction (<= n_parts*k from the MG
    merge), so the membership test compiles to a literal IN list
    JVM-side. Single join key only — the discovery sketch keys on one
    column. Salt assignment is distribution-only: the joined row set
    is salt-invariant for any ``hot_keys`` contents — for inner/left
    shapes. Right/full outer are rejected: an UNMATCHED hot dimension
    key would emit once per salt replica instead of once.
    """
    if len(list(on)) != 1:
        raise ValueError("targeted_salted_join salts a single join key")
    if how.replace("_", "") not in {"inner", "left", "leftouter", "leftsemi", "leftanti"}:
        raise ValueError(
            f"targeted_salted_join: {how!r} join would duplicate unmatched "
            "replicated dimension rows; use inner/left/left_semi"
        )
    key = list(on)[0]
    hot = list(hot_keys)
    is_hot = F.col(key).isin(hot) if hot else F.lit(False)
    salted_fact = skewed.withColumn(
        "__salt",
        F.when(is_hot, (F.rand(seed=42) * n_salts).cast("int")).otherwise(F.lit(0)),
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(
            F.when(
                is_hot, F.sequence(F.lit(0), F.lit(n_salts - 1))
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    return salted_fact.join(replicated, [key, "__salt"], how).drop("__salt")
