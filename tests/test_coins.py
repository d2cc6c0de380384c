"""Coin-string parsing (SURVEY.md §7 hard part 2)."""

from decimal import Decimal

from pyspark.sql import functions as F

from dwh_spark.functions.coins import coin_amount, coin_denom, parse_coins

CASES = [
    ("100token", Decimal(100), "token"),
    ("12345678901234567890123456789012345678stake", Decimal("12345678901234567890123456789012345678"), "stake"),
    ("5ibc/27394fb092d2", Decimal(5), "ibc/27394fb092d2"),
    ("", None, None),            # sdk.Coins{}.String()
    ("token", None, None),       # no amount
    ("100", None, None),         # no denom
    ("100TOKEN", None, None),    # denom must be lowercase
]


def test_single_coin_parse(spark):
    df = spark.createDataFrame([(i, c) for i, (c, _, _) in enumerate(CASES)], "i long, c string")
    got = {
        r["i"]: (r["a"], r["d"])
        for r in df.select(
            "i", coin_amount(F.col("c")).alias("a"), coin_denom(F.col("c")).alias("d")
        ).collect()
    }
    for i, (_, amount, denom) in enumerate(CASES):
        assert got[i] == (amount, denom), CASES[i]


def test_multi_coin_parse(spark):
    df = spark.createDataFrame([("5atom,100token",), ("",)], "c string")
    rows = df.select(parse_coins(F.col("c")).alias("coins")).collect()
    assert [(c["amount"], c["denom"]) for c in rows[0]["coins"]] == [
        (Decimal(5), "atom"), (Decimal(100), "token"),
    ]
    assert rows[1]["coins"] == []
