"""Deterministic marketplace event-log fixture.

Replays the reference's seed workload (`gen_marketplace_data.sh:17-203`:
7+3+3+3+1 mints, market put/remove/buy, auction put/remove/bid/
bid-buyout/buyout/finish, offers, createFT×3) and extends it with the
message types the script leaves uncovered (edit-metadata, burn+remint,
accept_offer, remove_offer, transferFT, a failed tx, an unknown route)
so all 16 transitions (M1-M16) plus M21/M23/M24 are exercised.

Addresses are cosmos-style constants; one message per tx; heights
strictly increasing; ts = 2024-01-01 + height minutes.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from dwh_spark.schemas import MARKETPLACE_EVENTS

U1 = "cosmos1user1user1user1"
U2 = "cosmos1user2user2user2"
SB = "cosmos1sellerbenefic"
BB = "cosmos1buyerbbenefic"
DENOM = "denom_basic"

_T0 = dt.datetime(2024, 1, 1)


def _base(h: int, msg_type: str, route: str = "marketplace", signer: str = U1, code: int = 0) -> dict:
    return {
        "height": h,
        "tx_index": 0,
        "msg_id": 0,
        "tx_hash": f"HASH{h:04d}",
        "code": code,
        "gas_wanted": 200000,
        "gas_used": 100000 + h,
        "route": route,
        "msg_type": msg_type,
        "signers": signer,
        "token_id": None,
        "denom": None,
        "sender": None,
        "recipient": None,
        "buyer": None,
        "bidder": None,
        "beneficiary": None,
        "price": None,
        "buyout_price": None,
        "opening_price": None,
        "bid": None,
        "amount": None,
        "time_to_sell": None,
        "token_uri": None,
        "event_attrs": None,
        "ts": _T0 + dt.timedelta(minutes=h),
    }


def _mint(h, tok, recipient, signer=U1):
    return _base(h, "MsgMintNFT", "nft", signer) | {
        "token_id": tok, "denom": DENOM, "recipient": recipient,
        "token_uri": f"http://meta/{tok}",
    }


def _tts(h):
    return _T0 + dt.timedelta(minutes=h, hours=10)


def scenario_rows() -> list[dict]:
    r: list[dict] = []
    h = 0

    def nxt() -> int:
        nonlocal h
        h += 1
        return h

    # mint TOKEN_1..7 to user1 (gen_marketplace_data.sh:17-23)
    for i in range(1, 8):
        r.append(_mint(nxt(), f"TOKEN_{i}", U1))
    # transfer TOKEN_1 → user2 (:27-29)
    r.append(_base(nxt(), "MsgTransferNFT", "nft") | {
        "token_id": "TOKEN_1", "denom": DENOM, "sender": U1, "recipient": U2})
    # TOKEN_2 market churn then buy (:33-50)
    r.append(_base(nxt(), "MsgPutNFTOnMarket") | {
        "token_id": "TOKEN_2", "price": "100token", "beneficiary": SB})
    r.append(_base(nxt(), "MsgRemoveNFTFromMarket") | {"token_id": "TOKEN_2"})
    r.append(_base(nxt(), "MsgPutNFTOnMarket") | {
        "token_id": "TOKEN_2", "price": "100token", "beneficiary": SB})
    r.append(_base(nxt(), "MsgBuyNFT", signer=U2) | {
        "token_id": "TOKEN_2", "buyer": U2, "beneficiary": BB})
    # TOKEN_3 auction churn, bid, bid-over-buyout (:54-76)
    r.append(_base(nxt(), "MsgPutNFTOnAuction") | {
        "token_id": "TOKEN_3", "opening_price": "10token", "beneficiary": SB,
        "time_to_sell": _tts(h + 1)})
    r.append(_base(nxt(), "MsgRemoveNFTFromAuction") | {"token_id": "TOKEN_3"})
    r.append(_base(nxt(), "MsgPutNFTOnAuction") | {
        "token_id": "TOKEN_3", "opening_price": "10token", "buyout_price": "100token",
        "beneficiary": SB, "time_to_sell": _tts(h + 1)})
    r.append(_base(nxt(), "MsgMakeBidOnAuction", signer=U2) | {
        "token_id": "TOKEN_3", "bidder": U2, "bid": "50token", "beneficiary": BB,
        "event_attrs": {"beneficiary_commission": "10"}})
    r.append(_base(nxt(), "MsgMakeBidOnAuction", signer=U2) | {
        "token_id": "TOKEN_3", "bidder": U2, "bid": "110token", "beneficiary": BB,
        "event_attrs": {"is_buyout": "true", "beneficiary_commission": "10"}})
    # TOKEN_4 auction + buyout (:78-82)
    r.append(_base(nxt(), "MsgPutNFTOnAuction") | {
        "token_id": "TOKEN_4", "opening_price": "10token", "buyout_price": "100token",
        "beneficiary": SB, "time_to_sell": _tts(h + 1)})
    r.append(_base(nxt(), "MsgBuyoutOnAuction", signer=U2) | {
        "token_id": "TOKEN_4", "buyer": U2, "beneficiary": SB})
    # TOKEN_5 auction + bid + finish (:86-96)
    r.append(_base(nxt(), "MsgPutNFTOnAuction") | {
        "token_id": "TOKEN_5", "opening_price": "10token", "buyout_price": "100token",
        "beneficiary": SB, "time_to_sell": _tts(h + 1)})
    r.append(_base(nxt(), "MsgMakeBidOnAuction", signer=U2) | {
        "token_id": "TOKEN_5", "bidder": U2, "bid": "50token", "beneficiary": BB,
        "event_attrs": {"beneficiary_commission": "10"}})
    r.append(_base(nxt(), "MsgFinishAuction") | {
        "token_id": "TOKEN_5", "event_attrs": {"owner": U2}})
    # TOKEN_6 auction + standing bid (:100-106)
    r.append(_base(nxt(), "MsgPutNFTOnAuction") | {
        "token_id": "TOKEN_6", "opening_price": "10token", "buyout_price": "100token",
        "beneficiary": SB, "time_to_sell": _tts(h + 1)})
    r.append(_base(nxt(), "MsgMakeBidOnAuction", signer=U2) | {
        "token_id": "TOKEN_6", "bidder": U2, "bid": "50token", "beneficiary": BB,
        "event_attrs": {"beneficiary_commission": "10"}})
    # offers on TOKEN_7 / TOKEN_3 (:110-123)
    r.append(_base(nxt(), "MsgMakeOffer", signer=U2) | {
        "token_id": "TOKEN_7", "buyer": U2, "price": "100token", "beneficiary": BB,
        "event_attrs": {"offer_id": "1", "beneficiary_commission": "10"}})
    r.append(_base(nxt(), "MsgMakeOffer", signer=U1) | {
        "token_id": "TOKEN_3", "buyer": U1, "price": "200token", "beneficiary": BB,
        "event_attrs": {"offer_id": "2", "beneficiary_commission": "10"}})
    # user2 re-auctions TOKEN_4 (:125-127)
    r.append(_base(nxt(), "MsgPutNFTOnAuction", signer=U2) | {
        "token_id": "TOKEN_4", "opening_price": "22token", "buyout_price": "100token",
        "beneficiary": SB, "time_to_sell": _tts(h + 1)})
    # TOKEN_8..10: mint + put_on_market (:131-139), 8/9 removed (:143-147)
    for i in (8, 9, 10):
        r.append(_mint(nxt(), f"TOKEN_{i}", U1))
        r.append(_base(nxt(), "MsgPutNFTOnMarket") | {
            "token_id": f"TOKEN_{i}", "price": "12345678token", "beneficiary": SB})
    for i in (8, 9):
        r.append(_base(nxt(), "MsgRemoveNFTFromMarket") | {"token_id": f"TOKEN_{i}"})
    # TOKEN_11..13: mint + put_on_auction (no buyout) (:149-157), 11/12 removed
    for i in (11, 12, 13):
        r.append(_mint(nxt(), f"TOKEN_{i}", U1))
        r.append(_base(nxt(), "MsgPutNFTOnAuction") | {
            "token_id": f"TOKEN_{i}", "opening_price": "1000000token",
            "beneficiary": SB, "time_to_sell": _tts(h + 1)})
    for i in (11, 12):
        r.append(_base(nxt(), "MsgRemoveNFTFromAuction") | {"token_id": f"TOKEN_{i}"})
    # offers 3-6 on TOKEN_8 / TOKEN_12 (:163-181)
    for oid, (tok, price) in enumerate(
        [("TOKEN_8", "678token"), ("TOKEN_8", "789token"),
         ("TOKEN_12", "1567token"), ("TOKEN_12", "1867token")], start=3):
        r.append(_base(nxt(), "MsgMakeOffer", signer=U2) | {
            "token_id": tok, "buyer": U2, "price": price, "beneficiary": BB,
            "event_attrs": {"offer_id": str(oid), "beneficiary_commission": "10"}})
    # TOKEN_14..16: mint to user2 + put_on_market i*13 (:183-193)
    for i in (14, 15, 16):
        r.append(_mint(nxt(), f"TOKEN_{i}", U2, signer=U2))
        r.append(_base(nxt(), "MsgPutNFTOnMarket", signer=U2) | {
            "token_id": f"TOKEN_{i}", "price": f"{i * 13}token", "beneficiary": SB})
    # createFT ×3 (:196-202)
    r.append(_base(nxt(), "MsgCreateFungibleToken") | {"sender": U1, "denom": "terra", "amount": 298765})
    r.append(_base(nxt(), "MsgCreateFungibleToken", signer=U2) | {"sender": U2, "denom": "bitcoin", "amount": 194999})
    r.append(_base(nxt(), "MsgCreateFungibleToken") | {"sender": U1, "denom": "tugrik", "amount": 9999})

    # --- extensions beyond the script: remaining transitions ---
    # M3 edit metadata
    r.append(_base(nxt(), "MsgEditNFTMetadata", "nft", signer=U2) | {
        "token_id": "TOKEN_1", "sender": U2, "token_uri": "http://meta/TOKEN_1-v2"})
    # M2 burn (+ later re-mint → fresh row)
    r.append(_mint(nxt(), "TOKEN_17", U1))
    r.append(_base(nxt(), "MsgBurnNFT", "nft") | {"token_id": "TOKEN_17", "sender": U1})
    # M14 accept_offer on TOKEN_9
    r.append(_base(nxt(), "MsgMakeOffer", signer=U2) | {
        "token_id": "TOKEN_9", "buyer": U2, "price": "50token", "beneficiary": BB,
        "event_attrs": {"offer_id": "7", "beneficiary_commission": "10"}})
    r.append(_base(nxt(), "MsgAcceptOffer") | {
        "token_id": "TOKEN_9", "beneficiary": SB, "event_attrs": {"offer_id": "7"}})
    # M15 remove_offer on TOKEN_10
    r.append(_base(nxt(), "MsgMakeOffer", signer=U2) | {
        "token_id": "TOKEN_10", "buyer": U2, "price": "60token", "beneficiary": BB,
        "event_attrs": {"offer_id": "8", "beneficiary_commission": "10"}})
    r.append(_base(nxt(), "MsgRemoveOffer", signer=U2) | {
        "token_id": "TOKEN_10", "event_attrs": {"offer_id": "8"}})
    # M16 transferFT
    r.append(_base(nxt(), "MsgTransferFungibleTokens") | {
        "sender": U1, "recipient": U2, "denom": "terra", "amount": 1000})
    # M21 failed tx — recorded but no state transition
    r.append(_base(nxt(), "MsgPutNFTOnMarket", code=5) | {
        "token_id": "TOKEN_1", "price": "999token", "beneficiary": SB})
    # M23 unknown route — message recorded failed=true
    r.append(_base(nxt(), "MsgSend", route="bank") | {"sender": U1, "recipient": U2, "amount": 7})
    # M1-after-M2: re-mint TOKEN_17 to user2 (fresh row semantics)
    r.append(_mint(nxt(), "TOKEN_17", U2, signer=U2))
    return r


def marketplace_events(spark: SparkSession) -> DataFrame:
    # Via pandas+Arrow this plans as a JVM-side LocalTableScan; the
    # list-of-dicts path would plan as Scan ExistingRDD and re-run
    # Python-worker deserialization on every downstream action (~5s per
    # replay query on local[32]).
    #
    # Columns are built with dtype=object so pandas never coerces a
    # nullable integer column (e.g. `amount`, mostly-None) to float64 with
    # NaN — the non-Arrow createDataFrame verifier rejects NaN/float for
    # LongType, and we must not depend on the caller's session having
    # spark.sql.execution.arrow.pyspark.enabled set.
    import pandas as pd

    rows = scenario_rows()
    pdf = pd.DataFrame(
        {
            f.name: pd.Series([r.get(f.name) for r in rows], dtype=object)
            for f in MARKETPLACE_EVENTS.fields
        }
    )
    return spark.createDataFrame(pdf, MARKETPLACE_EVENTS)
