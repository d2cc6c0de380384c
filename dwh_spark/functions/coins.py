"""Cosmos coin-string parsing (SURVEY.md §7 hard part 2).

The reference stores money as ``sdk.Coins.String()`` — e.g. ``"100token"``,
multi-coin ``"5atom,100token"``, empty ``""`` (`x/common/types.go:42`,
`marketplace.go:166`). Money is never numeric reference-side; analytics
need it parsed. These are JVM-side regex/column builders: string
columns stay untouched for reference parity, and queries opt in to the
parsed ``(amount DECIMAL(38,0), denom STRING)`` view.

Grammar (cosmos-sdk types/coin.go): amount = decimal digits; denom =
``[a-z][a-z0-9/]{2,127}``. Anything non-conforming parses to NULL
(never throws — bad rows are data, not errors).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Denom grammar is [a-z][a-z0-9/]{2,127} (3..128 chars total) — keep
# these in lock-step with any DuckDB oracle regex that re-parses coins.
_AMOUNT_RE = r"^([0-9]+)[a-z][a-z0-9/]{2,127}$"
_DENOM_RE = r"^[0-9]+([a-z][a-z0-9/]{2,127})$"


def coin_amount(coin: Column) -> Column:
    """Numeric amount of a single-coin string; NULL for empty/invalid.
    DECIMAL(38,0) — cosmos amounts are big.Int, far beyond int64."""
    return F.nullif(F.regexp_extract(coin, _AMOUNT_RE, 1), F.lit("")).cast("decimal(38,0)")


def coin_denom(coin: Column) -> Column:
    """Denomination of a single-coin string; NULL for empty/invalid."""
    return F.nullif(F.regexp_extract(coin, _DENOM_RE, 1), F.lit(""))


def parse_coin(coin: Column) -> Column:
    """``struct(amount, denom)`` of a single-coin string."""
    return F.struct(coin_amount(coin).alias("amount"), coin_denom(coin).alias("denom"))


def parse_coins(coins: Column) -> Column:
    """``array<struct(amount, denom)>`` for a multi-coin string
    (``"5atom,100token"``); empty string → empty array; an invalid
    element parses to a NULL array element (not ``struct(null, null)``).
    Higher-order transform is fine here: coin lists are ≤ a few
    elements."""
    def _one(c: Column) -> Column:
        parsed = parse_coin(c)
        return F.when(
            parsed["amount"].isNotNull() & parsed["denom"].isNotNull(), parsed
        )

    return F.when(
        coins == "", F.array().cast("array<struct<amount:decimal(38,0),denom:string>>")
    ).otherwise(F.transform(F.split(coins, ","), _one))
