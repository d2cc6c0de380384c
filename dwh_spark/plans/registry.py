"""Registry pairing each named query with its DuckDB oracle SQL.

Every operator the engine claims (SURVEY.md §2) registers here; the
driver runs the Spark callable and the oracle SQL side-by-side and
hash-compares (row count + schema + order-insensitive value hash).

Determinism rules every query in this registry follows:
- money doubles are CAST to DECIMAL(18,2) *before* aggregation in both
  engines, making sums exact and engine/partition-order independent;
  final outputs cast back to DOUBLE (correctly-rounded, identical).
- averages / ratios are computed as exact-decimal sums divided as
  doubles, then ``round(..., 6)``.
- every computed column is aliased identically on both sides.
- list-shaped results are rendered as sorted comma-joined strings
  (hash-stable across engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation, optionally with its oracle SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator; the
    driver then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} — a second @query "
                "with an existing name would silently shadow the first"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
