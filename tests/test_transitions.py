"""Final-state assertions for the marketplace replay engine.

Hand-derived expectations for the gen_marketplace_data.sh scenario
(see dwh_spark/sources/marketplace_fixture.py), pinning M1-M24
semantics exactly — including the reference's quirks (MsgBuyNFT keeps
seller_beneficiary, MsgAcceptOffer changes owner only, burn+remint
yields a fresh row).
"""

from __future__ import annotations

import pytest

from dwh_spark.operators.transitions import materialize_all
from dwh_spark.sources.marketplace_fixture import BB, SB, U1, U2, marketplace_events


@pytest.fixture(scope="module")
def state(spark):
    events = marketplace_events(spark).cache()
    tables = materialize_all(events)
    return {name: df.collect() for name, df in tables.items()}


def nft(state, token):
    rows = [r for r in state["nfts"] if r.token_id == token]
    assert len(rows) == 1, f"{token}: expected 1 row, got {rows}"
    return rows[0]


EXPECTED_NFTS = {
    # token: (owner, status, price, seller_beneficiary, buyout, opening)
    "TOKEN_1": (U2, 0, "", "", "", ""),
    "TOKEN_2": (U2, 0, "", SB, "", ""),        # buy clears price, keeps beneficiary
    "TOKEN_3": (U2, 0, "", "", "", ""),        # bid-over-buyout transfers + clears
    "TOKEN_4": (U2, 2, "", SB, "100token", "22token"),  # re-auctioned by u2
    "TOKEN_5": (U2, 0, "", "", "", ""),        # finish_auction winner from event
    "TOKEN_6": (U1, 2, "", SB, "100token", "10token"),  # still on auction
    "TOKEN_7": (U1, 0, "", "", "", ""),
    "TOKEN_8": (U1, 0, "", "", "", ""),
    "TOKEN_9": (U2, 0, "", "", "", ""),        # accept_offer: owner only
    "TOKEN_10": (U1, 1, "12345678token", SB, "", ""),
    "TOKEN_11": (U1, 0, "", "", "", ""),
    "TOKEN_12": (U1, 0, "", "", "", ""),
    "TOKEN_13": (U1, 2, "", SB, "", "1000000token"),  # no-buyout auction
    "TOKEN_14": (U2, 1, "182token", SB, "", ""),
    "TOKEN_15": (U2, 1, "195token", SB, "", ""),
    "TOKEN_16": (U2, 1, "208token", SB, "", ""),
    "TOKEN_17": (U2, 0, "", "", "", ""),       # burn + re-mint → fresh row
}


def test_nft_final_state(state):
    assert len(state["nfts"]) == len(EXPECTED_NFTS)
    for token, (owner, status, price, sb, buyout, opening) in EXPECTED_NFTS.items():
        row = nft(state, token)
        got = (row.owner_address, row.status, row.price, row.seller_beneficiary,
               row.buyout_price, row.opening_price)
        assert got == (owner, status, price, sb, buyout, opening), f"{token}: {got}"
        assert row.deleted_at is None, token


def test_nft_uri_and_lifecycle(state):
    assert nft(state, "TOKEN_1").token_uri == "http://meta/TOKEN_1-v2"  # M3 edit
    assert nft(state, "TOKEN_2").token_uri == "http://meta/TOKEN_2"
    t17 = nft(state, "TOKEN_17")
    # fresh row from the re-mint: created_at is the SECOND mint's ts
    mints = [r for r in state["txes"] if r.hash and r.code == 0]
    assert t17.created_at == max(r.created_at for r in mints)  # re-mint is last event
    assert nft(state, "TOKEN_4").time_to_sell is not None
    assert nft(state, "TOKEN_3").time_to_sell is None  # cleared by buyout-bid


def test_surviving_offers(state):
    offers = {(r.token_id, r.offer_id): r for r in state["offers"]}
    assert set(offers) == {
        ("TOKEN_7", "1"), ("TOKEN_3", "2"), ("TOKEN_8", "3"),
        ("TOKEN_8", "4"), ("TOKEN_12", "5"), ("TOKEN_12", "6"),
    }
    assert offers[("TOKEN_7", "1")].buyer == U2
    assert offers[("TOKEN_3", "2")].buyer == U1
    assert offers[("TOKEN_12", "6")].price == "1867token"
    assert all(r.buyer_beneficiary == BB for r in state["offers"])


def test_surviving_bids(state):
    bids = state["auction_bids"]
    assert len(bids) == 1
    assert (bids[0].token_id, bids[0].bidder_address, bids[0].price) == ("TOKEN_6", U2, "50token")


def test_fungible_tokens_and_transfers(state):
    fts = {r.denom: r for r in state["fungible_tokens"]}
    assert {d: (fts[d].owner_address, fts[d].emission_amount) for d in fts} == {
        "terra": (U1, 298765), "bitcoin": (U2, 194999), "tugrik": (U1, 9999),
    }
    # ids follow creation order
    assert fts["terra"].id < fts["bitcoin"].id < fts["tugrik"].id
    tr = state["fungible_token_transfers"]
    assert len(tr) == 1
    assert (tr[0].sender_address, tr[0].recipient_address, tr[0].amount) == (U1, U2, 1000)
    assert tr[0].fungible_token_id == fts["terra"].id


def test_users_find_or_create(state):
    users = {r.address: r for r in state["users"]}
    assert set(users) == {U1, U2, SB, BB}
    # ids assigned in first-seen order; U1 signs the first mint
    assert users[U1].id == 1
    assert users[U1].sequence_number > users[SB].sequence_number


def test_audit_tables(state):
    n_events = 67
    assert len(state["txes"]) == n_events
    assert len(state["messages"]) == n_events
    failed = [m for m in state["messages"] if m.failed]
    assert len(failed) == 2  # code=5 tx + unknown 'bank' route
    errors = {m.error for m in failed}
    assert "no handler for route bank" in errors
    # tx_id FK joins back to txes
    tx_ids = {t.id for t in state["txes"]}
    assert all(m.tx_id in tx_ids for m in state["messages"])


def test_failed_tx_causes_no_transition(state):
    # the code=5 put_on_market for TOKEN_1 must not have set a price
    assert nft(state, "TOKEN_1").price == ""


def test_transition_expression_memo_reuses_trees(spark):
    """The r9 fold optimization: _memo must return the SAME Column
    objects across calls (py4j tree construction was ~1.2 s/fold), and
    the memoized builders must keep producing correct frames when
    invoked repeatedly within one session."""
    from dwh_spark.operators import transitions as TR
    from dwh_spark.sources.marketplace_fixture import marketplace_events

    token = object()
    assert TR._memo("__test_key__", lambda: token) is token
    assert TR._memo("__test_key__", lambda: object()) is token  # cached

    ev = marketplace_events(spark)
    a = sorted(map(repr, TR.nft_partial_state(ev).collect()))
    b = sorted(map(repr, TR.nft_partial_state(ev).collect()))
    assert a == b and a  # identical frames from memoized trees
