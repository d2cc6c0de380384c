"""Driver-facing marketplace-replay queries.

These run the full M1-M24 transition engine over the deterministic
gen_marketplace_data.sh scenario fixture and compare against golden
oracles (hand-derived final state, independently pinned by
tests/test_transitions.py). The testdata sf_dir is ignored — the
input is the embedded event log, the same at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_spark.operators.transitions import (
    materialize_auction_bids,
    materialize_messages,
    materialize_nfts,
    materialize_offers,
    materialize_txes,
)
from dwh_spark.plans.registry import query
from dwh_spark.sources.marketplace_fixture import BB, SB, U1, U2, marketplace_events

# (token, owner, status, price, seller_beneficiary, buyout, opening) —
# hand-derived from the reference's transition semantics; see
# tests/test_transitions.py for the per-rule derivation.
_NFTS_FINAL = [
    ("TOKEN_1", U2, 0, "", "", "", ""),
    ("TOKEN_2", U2, 0, "", SB, "", ""),
    ("TOKEN_3", U2, 0, "", "", "", ""),
    ("TOKEN_4", U2, 2, "", SB, "100token", "22token"),
    ("TOKEN_5", U2, 0, "", "", "", ""),
    ("TOKEN_6", U1, 2, "", SB, "100token", "10token"),
    ("TOKEN_7", U1, 0, "", "", "", ""),
    ("TOKEN_8", U1, 0, "", "", "", ""),
    ("TOKEN_9", U2, 0, "", "", "", ""),
    ("TOKEN_10", U1, 1, "12345678token", SB, "", ""),
    ("TOKEN_11", U1, 0, "", "", "", ""),
    ("TOKEN_12", U1, 0, "", "", "", ""),
    ("TOKEN_13", U1, 2, "", SB, "", "1000000token"),
    ("TOKEN_14", U2, 1, "182token", SB, "", ""),
    ("TOKEN_15", U2, 1, "195token", SB, "", ""),
    ("TOKEN_16", U2, 1, "208token", SB, "", ""),
    ("TOKEN_17", U2, 0, "", "", "", ""),
]

_OFFERS_FINAL = [
    ("TOKEN_7", "1", U2, "100token"),
    ("TOKEN_3", "2", U1, "200token"),
    ("TOKEN_8", "3", U2, "678token"),
    ("TOKEN_8", "4", U2, "789token"),
    ("TOKEN_12", "5", U2, "1567token"),
    ("TOKEN_12", "6", U2, "1867token"),
]


def _values_sql(rows: list[tuple], columns: list[str], types: list[str]) -> str:
    def lit(v):
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    body = ",\n      ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    casts = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in zip(columns, types))
    return (
        f"SELECT {casts} FROM (VALUES\n      {body}\n    ) AS t({', '.join(columns)})"
    )


@query(
    "marketplace_nfts_state",
    oracle=_values_sql(
        _NFTS_FINAL,
        ["token_id", "owner_address", "status", "price",
         "seller_beneficiary", "buyout_price", "opening_price"],
        ["VARCHAR", "VARCHAR", "INTEGER", "VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR"],
    ),
)
def marketplace_nfts_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    nfts = materialize_nfts(marketplace_events(spark))
    return nfts.filter(F.col("deleted_at").isNull()).select(
        "token_id", "owner_address", "status", "price",
        "seller_beneficiary", "buyout_price", "opening_price",
    )


@query(
    "marketplace_offers_surviving",
    oracle=_values_sql(
        _OFFERS_FINAL,
        ["token_id", "offer_id", "buyer", "price"],
        ["VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR"],
    ),
)
def marketplace_offers_surviving(spark: SparkSession, sf_dir: str) -> DataFrame:
    offers = materialize_offers(marketplace_events(spark))
    return offers.select("token_id", "offer_id", "buyer", "price")


@query(
    "marketplace_bids_surviving",
    oracle=_values_sql(
        [("TOKEN_6", U2, "50token")],
        ["token_id", "bidder_address", "price"],
        ["VARCHAR", "VARCHAR", "VARCHAR"],
    ),
)
def marketplace_bids_surviving(spark: SparkSession, sf_dir: str) -> DataFrame:
    bids = materialize_auction_bids(marketplace_events(spark))
    return bids.select("token_id", "bidder_address", "price")


@query(
    "marketplace_audit_counts",
    oracle="""
    SELECT CAST(67 AS BIGINT) AS n_txes, CAST(67 AS BIGINT) AS n_messages,
           CAST(2 AS BIGINT) AS n_failed
    """,
)
def marketplace_audit_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = marketplace_events(spark)
    txes = materialize_txes(events)
    messages = materialize_messages(events, txes)
    return (
        messages.agg(
            F.count("*").alias("n_messages"),
            F.sum(F.when(F.col("failed"), 1).otherwise(0)).alias("n_failed"),
        )
        .crossJoin(txes.agg(F.count("*").alias("n_txes")))
        .select("n_txes", "n_messages", "n_failed")
    )
