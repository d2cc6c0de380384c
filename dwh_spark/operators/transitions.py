"""Marketplace state materialization — the 16 message transitions (M1-M24).

The reference applies messages one at a time, in chain order, as row
mutations against PostgreSQL (`x/indexer/handlers/marketplace.go:114-423`).
This module replays the same semantics set-oriented and Spark-first:
instead of N sequential UPDATEs, each output column is "the value
written by the last message that writes that column", computed as
``max(when(writes_col, struct(seq, value)))`` per key — one shuffle per
state table, no per-row loop, no driver-side iteration.

Semantics parity notes (cited against the reference):
- ordering key is (height, tx_index, msg_id), the reference's cursor
  (`x/indexer/cursor.go:5-9`); we pack it into an orderable struct.
- only code==0 txs mutate state (M21, `indexer.go:217-227`); failed
  txs still appear in `txes`/`messages` (M24, `indexer.go:264-286`).
- MsgBurnNFT is a gorm soft delete → row kept with deleted_at set
  (`marketplace.go:129`, gorm.Model at `types.go:36`); a later re-mint
  creates a fresh row (all columns reset to mint defaults).
- cleared coin columns become "" (``sdk.Coins{}.String()``,
  `marketplace.go:177-179`); cleared TimeToSell becomes NULL (the
  reference writes Go's zero time, `marketplace.go:223`).
- MsgBuyNFT clears Price but NOT SellerBeneficiary
  (`marketplace.go:186-190`); MsgAcceptOffer sets owner only
  (`marketplace.go:351-355`). Column sets below mirror the reference
  exactly, quirks included.
- MsgMakeBidOnAuction branches on the emitted ``is_buyout`` event
  attribute (M10, `marketplace.go:235-265`); MsgFinishAuction's winner
  and MsgMakeOffer's offer_id also come from event attrs (M12/M13,
  `marketplace.go:294,323`).
- MsgAcceptOffer resolves the buyer from the offers table
  (`marketplace.go:342-355`); here that lookup is a join against the
  latest prior MsgMakeOffer with the same (token_id, offer_id).

Scale notes (100 TB): every aggregation is keyed by a high-cardinality
entity id (token_id, address, denom), partial-aggregable map-side, and
shuffles once. The only global orderings are surrogate-id assignments
(row_number over first-seen), which exist purely for reference-schema
parity; they are isolated in `_assign_ids` and can be swapped for
``zipWithIndex``-style range offsets on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MSG_MINT = "MsgMintNFT"
MSG_BURN = "MsgBurnNFT"
MSG_EDIT = "MsgEditNFTMetadata"
MSG_TRANSFER = "MsgTransferNFT"
MSG_PUT_MARKET = "MsgPutNFTOnMarket"
MSG_REMOVE_MARKET = "MsgRemoveNFTFromMarket"
MSG_BUY = "MsgBuyNFT"
MSG_PUT_AUCTION = "MsgPutNFTOnAuction"
MSG_REMOVE_AUCTION = "MsgRemoveNFTFromAuction"
MSG_MAKE_BID = "MsgMakeBidOnAuction"
MSG_BUYOUT = "MsgBuyoutOnAuction"
MSG_FINISH_AUCTION = "MsgFinishAuction"
MSG_MAKE_OFFER = "MsgMakeOffer"
MSG_ACCEPT_OFFER = "MsgAcceptOffer"
MSG_REMOVE_OFFER = "MsgRemoveOffer"
MSG_CREATE_FT = "MsgCreateFungibleToken"
MSG_TRANSFER_FT = "MsgTransferFungibleTokens"

KNOWN_ROUTES = ("marketplace", "nft")

# NFT status enum (x/marketplace/types, used at marketplace.go:165,176,205)
STATUS_DEFAULT, STATUS_ON_MARKET, STATUS_ON_AUCTION = 0, 1, 2

EMPTY_COINS = ""  # sdk.Coins{}.String()


# ---------------------------------------------------------------------------
# Expression memo. The transition column trees are large (the NFT agg
# list alone is hundreds of py4j gateway round-trips) and identical on
# every call — and the streaming fold re-enters these builders once
# per micro-batch, so rebuilding them dominated fold time (~1.2 s/fold
# measured r9: build 1.2 s vs analysis 0.02 s across the six trees).
# Columns are UNRESOLVED expression trees, valid against any DataFrame
# carrying the referenced column names, so one build serves every
# batch, stream fold, and test. Keyed on the py4j gateway identity: a
# fresh JVM invalidates old JVM object handles, so the cache resets.
# Concurrent builds (the fold's thread pool) are benign — last write
# wins on identical values.
# ---------------------------------------------------------------------------
_EXPR_CACHE: dict[str, object] = {}


def _memo(name: str, build):
    from pyspark import SparkContext

    gw = id(SparkContext._gateway) if SparkContext._gateway is not None else None
    if _EXPR_CACHE.get("__gw__") != gw:
        _EXPR_CACHE.clear()
        _EXPR_CACHE["__gw__"] = gw
    if name not in _EXPR_CACHE:
        _EXPR_CACHE[name] = build()
    return _EXPR_CACHE[name]


def _seq() -> Column:
    """Orderable replay position — the reference's LevelDB cursor."""
    return _memo(
        "seq",
        lambda: F.struct(
            F.col("height").alias("h"),
            F.col("tx_index").alias("t"),
            F.col("msg_id").alias("m"),
        ),
    )


def _last(cond: Column, value: Column) -> Column:
    """Value written by the last message satisfying ``cond``.

    ``max`` ignores NULLs and orders structs lexicographically, so this
    is a map-side-combinable "last writer wins" — including writers
    that write NULL (the struct wrapper keeps the slot non-null).
    """
    return F.max(F.when(cond, F.struct(F.col("seq").alias("s"), value.alias("v")))).getField("v")


def successful(events: DataFrame) -> DataFrame:
    """M21 failed-tx filter + M23 route dispatch."""
    return events.filter(
        _memo(
            "successful",
            lambda: (F.col("code") == 0) & F.col("route").isin(*KNOWN_ROUTES),
        )
    )


# ---------------------------------------------------------------------------
# nfts — per-column last-writer-wins over the 12 NFT-touching transitions.
#
# Split into partial / merge / finalize so the SAME column specs serve
# both the batch replay and the incremental streaming replay
# (streaming/marketplace.py): every per-column aggregate is
# max(struct(seq, value)) — associative and commutative — so partial
# states from successive micro-batches merge by per-column max, exactly
# like map-side combine generalized across batches.
# ---------------------------------------------------------------------------
def latest_makes(events: DataFrame) -> DataFrame:
    """Latest MsgMakeOffer per (token_id, offer_id) — the lookup state
    AcceptOffer resolution needs (marketplace.go:342-346). Kept as a
    mergeable max-struct per key."""
    ev = successful(events).withColumn("seq", _seq())

    def _build() -> tuple:
        return (
            F.col("msg_type") == MSG_MAKE_OFFER,
            [
                F.col("token_id").alias("mo_token_id"),
                F.col("event_attrs")["offer_id"].alias("mo_offer_id"),
            ],
            F.max(
                F.struct(F.col("seq").alias("s"), F.col("buyer").alias("v"))
            ).alias("mk"),
        )

    keep, keys, agg = _memo("makes_exprs", _build)
    return ev.filter(keep).groupBy(*keys).agg(agg)


def merge_latest_makes(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy("mo_token_id", "mo_offer_id")
        .agg(F.max("mk").alias("mk"))
    )


def _resolve_accepts(ev: DataFrame, makes_state: DataFrame | None) -> DataFrame:
    """M14: attach ``resolved_buyer`` to AcceptOffer events — the
    latest prior MakeOffer with the same (token_id, offer_id), looking
    through both this event set and (for streaming) the carried
    ``makes_state`` from earlier batches."""
    def _build() -> tuple:
        t = F.col("msg_type")
        return (
            t == MSG_MAKE_OFFER,
            [
                F.col("token_id").alias("mo_token_id"),
                F.col("event_attrs")["offer_id"].alias("mo_offer_id"),
                F.col("buyer").alias("mo_buyer"),
                F.col("seq").alias("mo_seq"),
            ],
            t == MSG_ACCEPT_OFFER,
            [F.col("token_id"), F.col("event_attrs")["offer_id"].alias("offer_id"), F.col("seq")],
            # the two sides' column names are disjoint, so the join
            # condition resolves unqualified — which is what lets the
            # whole tree be memoized across folds
            (F.col("token_id") == F.col("mo_token_id"))
            & (F.col("offer_id") == F.col("mo_offer_id"))
            & (F.col("mo_seq") < F.col("seq")),
            F.max_by("mo_buyer", "mo_seq").alias("resolved_buyer"),
        )

    is_make, make_cols, is_accept, accept_cols, join_cond, agg = _memo(
        "resolve_accept_exprs", _build
    )
    makes = ev.filter(is_make).select(*make_cols)
    if makes_state is not None:
        makes = makes.unionByName(
            makes_state.select(
                "mo_token_id",
                "mo_offer_id",
                F.col("mk")["v"].alias("mo_buyer"),
                F.col("mk")["s"].alias("mo_seq"),
            )
        )
    accepts = ev.filter(is_accept).select(*accept_cols)
    accept_owner = (
        accepts.join(makes, join_cond)
        .groupBy("token_id", "seq")
        .agg(agg)
    )
    return ev.join(accept_owner, ["token_id", "seq"], "left")


def materialize_nfts(events: DataFrame) -> DataFrame:
    return finalize_nfts(nft_partial_state(events))


def _build_nft_aggs() -> list[Column]:
    t = F.col("msg_type")

    is_buyout_bid = (t == MSG_MAKE_BID) & F.col("event_attrs")["is_buyout"].isNotNull()

    sets_owner = (
        t.isin(MSG_MINT, MSG_TRANSFER, MSG_BUY, MSG_BUYOUT, MSG_FINISH_AUCTION, MSG_ACCEPT_OFFER)
        | is_buyout_bid
    )
    owner_val = (
        F.when(t == MSG_MINT, F.col("recipient"))
        .when(t == MSG_TRANSFER, F.col("recipient"))
        .when(t == MSG_BUY, F.col("buyer"))
        .when(t == MSG_BUYOUT, F.col("buyer"))
        .when(t == MSG_FINISH_AUCTION, F.col("event_attrs")["owner"])
        .when(t == MSG_ACCEPT_OFFER, F.col("resolved_buyer"))
        .when(is_buyout_bid, F.col("bidder"))
    )

    # mint resets every column to defaults (fresh row after burn+remint,
    # NewNFTFromMarketplaceNFT at types.go:55-62)
    is_mint = t == MSG_MINT
    sets_status = is_mint | t.isin(
        MSG_PUT_MARKET, MSG_REMOVE_MARKET, MSG_BUY, MSG_PUT_AUCTION,
        MSG_REMOVE_AUCTION, MSG_BUYOUT, MSG_FINISH_AUCTION,
    ) | is_buyout_bid
    status_val = F.when(t == MSG_PUT_MARKET, F.lit(STATUS_ON_MARKET)).when(
        t == MSG_PUT_AUCTION, F.lit(STATUS_ON_AUCTION)
    ).otherwise(F.lit(STATUS_DEFAULT))

    # a coin field absent from the message serializes as sdk.Coins{}.String()
    # == "" in the reference — never NULL
    def _coin(col: Column) -> Column:
        return F.coalesce(col, F.lit(EMPTY_COINS))

    sets_price = is_mint | t.isin(MSG_PUT_MARKET, MSG_REMOVE_MARKET, MSG_BUY)
    price_val = F.when(t == MSG_PUT_MARKET, _coin(F.col("price"))).otherwise(F.lit(EMPTY_COINS))

    sets_seller_beneficiary = is_mint | t.isin(
        MSG_PUT_MARKET, MSG_REMOVE_MARKET, MSG_PUT_AUCTION, MSG_REMOVE_AUCTION,
        MSG_BUYOUT, MSG_FINISH_AUCTION,
    ) | is_buyout_bid
    seller_beneficiary_val = F.when(
        t.isin(MSG_PUT_MARKET, MSG_PUT_AUCTION), F.col("beneficiary")
    ).otherwise(F.lit(""))

    sets_auction_cols = is_mint | t.isin(
        MSG_PUT_AUCTION, MSG_REMOVE_AUCTION, MSG_BUYOUT, MSG_FINISH_AUCTION
    ) | is_buyout_bid
    buyout_val = F.when(t == MSG_PUT_AUCTION, _coin(F.col("buyout_price"))).otherwise(F.lit(EMPTY_COINS))
    opening_val = F.when(t == MSG_PUT_AUCTION, _coin(F.col("opening_price"))).otherwise(F.lit(EMPTY_COINS))
    tts_val = F.when(t == MSG_PUT_AUCTION, F.col("time_to_sell")).otherwise(F.lit(None).cast("timestamp"))

    sets_uri = t.isin(MSG_MINT, MSG_EDIT)
    lifecycle = t.isin(MSG_MINT, MSG_BURN)
    # offer messages carry a token_id but never write nfts columns —
    # they must not advance updated_at
    writes_any = sets_owner | sets_status | sets_price | sets_seller_beneficiary | sets_auction_cols | sets_uri | lifecycle

    def _last_s(cond: Column, value: Column) -> Column:
        # the struct form of _last — the (seq, value) slot is KEPT so
        # partial states stay mergeable by per-column max
        return F.max(F.when(cond, F.struct(F.col("seq").alias("s"), value.alias("v"))))

    return [
        _last_s(is_mint, F.col("denom")).alias("denom_s"),
        _last_s(sets_owner, owner_val).alias("owner_s"),
        _last_s(sets_uri, F.col("token_uri")).alias("uri_s"),
        _last_s(sets_status, status_val).alias("status_s"),
        _last_s(sets_price, price_val).alias("price_s"),
        _last_s(sets_seller_beneficiary, seller_beneficiary_val).alias("sben_s"),
        _last_s(sets_auction_cols, buyout_val).alias("buyout_s"),
        _last_s(sets_auction_cols, opening_val).alias("opening_s"),
        _last_s(sets_auction_cols, tts_val).alias("tts_s"),
        _last_s(lifecycle, F.when(t == MSG_BURN, F.col("ts"))).alias("deleted_s"),
        _last_s(is_mint, F.col("ts")).alias("created_s"),
        F.max(F.when(writes_any, F.col("ts"))).alias("updated_at"),
        F.max(
            F.when(lifecycle, F.struct("seq", (t == MSG_MINT).alias("alive")))
        ).alias("alive_s"),
        F.min(F.when(is_mint, F.col("seq"))).alias("first_mint_seq"),
    ]


def nft_partial_state(
    events: DataFrame, makes_state: DataFrame | None = None
) -> DataFrame:
    ev = successful(events).withColumn("seq", _seq())
    ev = _resolve_accepts(ev, makes_state)
    return (
        ev.filter(F.col("token_id").isNotNull())
        .groupBy("token_id")
        .agg(*_memo("nft_aggs", _build_nft_aggs))
    )


# every aggregate in the partial state and its merge rule — max for the
# last-writer-wins structs (and the plain updated_at timestamp), min
# for the first-mint cursor
_NFT_MERGE = {
    "denom_s": "max", "owner_s": "max", "uri_s": "max", "status_s": "max",
    "price_s": "max", "sben_s": "max", "buyout_s": "max", "opening_s": "max",
    "tts_s": "max", "deleted_s": "max", "created_s": "max",
    "updated_at": "max", "alive_s": "max", "first_mint_seq": "min",
}


def merge_nft_partials(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two partial states into one — associativity of per-column
    max/min makes batch boundaries invisible to the result."""
    return (
        a.unionByName(b)
        .groupBy("token_id")
        .agg(*(getattr(F, fn)(c).alias(c) for c, fn in _NFT_MERGE.items()))
    )


def finalize_nfts(partial: DataFrame) -> DataFrame:
    """Extract the last-written values and apply lifecycle semantics —
    the only non-mergeable steps, so they run once at read time."""
    nfts = (
        # a token never minted in this log has no row (reference FK world)
        partial.filter(F.col("first_mint_seq").isNotNull())
        .select(
            "token_id",
            F.col("denom_s")["v"].alias("denom"),
            F.col("owner_s")["v"].alias("owner_address"),
            F.col("uri_s")["v"].alias("token_uri"),
            F.col("status_s")["v"].alias("status"),
            F.col("price_s")["v"].alias("price"),
            F.col("sben_s")["v"].alias("seller_beneficiary"),
            F.col("buyout_s")["v"].alias("buyout_price"),
            F.col("opening_s")["v"].alias("opening_price"),
            F.col("tts_s")["v"].alias("time_to_sell"),
            # a burn only sticks if no later mint revived the row
            F.when(~F.col("alive_s")["alive"], F.col("deleted_s")["v"]).alias(
                "deleted_at"
            ),
            F.col("created_s")["v"].alias("created_at"),
            "updated_at",
        )
    )
    return _assign_ids(nfts, order_by=["created_at", "token_id"])


# ---------------------------------------------------------------------------
# offers / auction_bids — insert + composite-key delete survivors
# ---------------------------------------------------------------------------
def materialize_offers(events: DataFrame) -> DataFrame:
    ev = successful(events).withColumn("seq", _seq())
    t = F.col("msg_type")
    made = ev.filter(t == MSG_MAKE_OFFER).select(
        F.col("event_attrs")["offer_id"].alias("offer_id"),
        F.col("buyer"),
        F.col("price"),
        F.col("beneficiary").alias("buyer_beneficiary"),
        F.col("event_attrs")["beneficiary_commission"].alias("beneficiary_commission"),
        F.col("token_id"),
        F.col("seq"),
        F.col("ts").alias("created_at"),
    )
    removed = (
        ev.filter(t.isin(MSG_ACCEPT_OFFER, MSG_REMOVE_OFFER))
        .select(
            F.col("token_id").alias("r_token_id"),
            F.col("event_attrs")["offer_id"].alias("r_offer_id"),
            F.col("seq").alias("r_seq"),
        )
        .groupBy("r_token_id", "r_offer_id")
        .agg(F.max("r_seq").alias("last_remove"))
    )
    survivors = (
        made.join(
            removed,
            (made.token_id == removed.r_token_id) & (made.offer_id == removed.r_offer_id),
            "left",
        )
        .filter(F.col("last_remove").isNull() | (F.col("seq") > F.col("last_remove")))
        .select("offer_id", "buyer", "price", "buyer_beneficiary",
                "beneficiary_commission", "token_id", "created_at")
        .withColumn("updated_at", F.col("created_at"))
        .withColumn("deleted_at", F.lit(None).cast("timestamp"))
    )
    return _assign_ids(survivors, order_by=["created_at", "token_id", "offer_id"])


def materialize_auction_bids(events: DataFrame) -> DataFrame:
    ev = successful(events).withColumn("seq", _seq())
    t = F.col("msg_type")
    is_buyout_bid = (t == MSG_MAKE_BID) & F.col("event_attrs")["is_buyout"].isNotNull()
    bids = ev.filter((t == MSG_MAKE_BID) & ~is_buyout_bid.eqNullSafe(True)).select(
        F.col("bidder").alias("bidder_address"),
        F.col("beneficiary").alias("bidder_beneficiary"),
        F.col("event_attrs")["beneficiary_commission"].alias("beneficiary_commission"),
        F.col("bid").alias("price"),
        F.col("token_id"),
        F.col("seq"),
        F.col("ts").alias("created_at"),
    )
    # bid-clearing transitions (marketplace.go:228,248,287,309)
    clears = (
        ev.filter(t.isin(MSG_REMOVE_AUCTION, MSG_BUYOUT, MSG_FINISH_AUCTION) | is_buyout_bid)
        .groupBy(F.col("token_id").alias("c_token_id"))
        .agg(F.max("seq").alias("last_clear"))
    )
    survivors = (
        bids.join(clears, bids.token_id == clears.c_token_id, "left")
        .filter(F.col("last_clear").isNull() | (F.col("seq") > F.col("last_clear")))
        .select("bidder_address", "bidder_beneficiary", "beneficiary_commission",
                "price", "token_id", "created_at")
        .withColumn("updated_at", F.col("created_at"))
        .withColumn("deleted_at", F.lit(None).cast("timestamp"))
    )
    return _assign_ids(survivors, order_by=["created_at", "token_id", "bidder_address"])


# ---------------------------------------------------------------------------
# offers / bids as mergeable partials (streaming twin of the two
# survivor materializations above): makes/bids are append-only facts
# kept as a per-key struct SET (array_distinct ∘ flatten merge —
# idempotent), deletions as a per-key max seq. State per key is bounded
# by that key's own make/bid count — the same rows the reference's
# table holds.
# ---------------------------------------------------------------------------
def _build_offer_exprs() -> tuple:
    t = F.col("msg_type")
    is_make = t == MSG_MAKE_OFFER
    is_remove = t.isin(MSG_ACCEPT_OFFER, MSG_REMOVE_OFFER)
    payload = F.struct(
        F.col("seq").alias("s"),
        F.col("buyer").alias("buyer"),
        F.col("price").alias("price"),
        F.col("beneficiary").alias("buyer_beneficiary"),
        F.col("event_attrs")["beneficiary_commission"].alias("beneficiary_commission"),
        F.col("ts").alias("created_at"),
    )
    return (
        is_make | is_remove,
        [
            "token_id",
            F.col("event_attrs")["offer_id"].alias("offer_id"),
            F.when(is_make, payload).alias("mk"),
            F.when(is_remove, F.col("seq")).alias("rm"),
        ],
    )


def offer_partial_state(events: DataFrame) -> DataFrame:
    ev = successful(events).withColumn("seq", _seq())
    keep, cols = _memo("offer_exprs", _build_offer_exprs)
    return (
        ev.filter(keep)
        .select(*cols)
        .groupBy("token_id", "offer_id")
        .agg(
            F.collect_set("mk").alias("makes"),
            F.max("rm").alias("removed_seq"),
        )
    )


def merge_offer_partials(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy("token_id", "offer_id")
        .agg(
            F.array_distinct(F.flatten(F.collect_list("makes"))).alias("makes"),
            F.max("removed_seq").alias("removed_seq"),
        )
    )


def finalize_offers(partial: DataFrame) -> DataFrame:
    survivors = (
        partial.select(
            "token_id", "offer_id", "removed_seq", F.explode("makes").alias("mk")
        )
        .filter(F.col("removed_seq").isNull() | (F.col("mk.s") > F.col("removed_seq")))
        .select(
            "offer_id",
            F.col("mk.buyer").alias("buyer"),
            F.col("mk.price").alias("price"),
            F.col("mk.buyer_beneficiary").alias("buyer_beneficiary"),
            F.col("mk.beneficiary_commission").alias("beneficiary_commission"),
            "token_id",
            F.col("mk.created_at").alias("created_at"),
        )
        .withColumn("updated_at", F.col("created_at"))
        .withColumn("deleted_at", F.lit(None).cast("timestamp"))
    )
    return _assign_ids(survivors, order_by=["created_at", "token_id", "offer_id"])


def _build_bid_exprs() -> tuple:
    t = F.col("msg_type")
    is_buyout_bid = (t == MSG_MAKE_BID) & F.col("event_attrs")["is_buyout"].isNotNull()
    is_bid = (t == MSG_MAKE_BID) & ~is_buyout_bid.eqNullSafe(True)
    is_clear = t.isin(MSG_REMOVE_AUCTION, MSG_BUYOUT, MSG_FINISH_AUCTION) | is_buyout_bid
    payload = F.struct(
        F.col("seq").alias("s"),
        F.col("bidder").alias("bidder_address"),
        F.col("beneficiary").alias("bidder_beneficiary"),
        F.col("event_attrs")["beneficiary_commission"].alias("beneficiary_commission"),
        F.col("bid").alias("price"),
        F.col("ts").alias("created_at"),
    )
    return (
        is_bid | is_clear,
        [
            "token_id",
            F.when(is_bid, payload).alias("bd"),
            F.when(is_clear, F.col("seq")).alias("cl"),
        ],
    )


def bid_partial_state(events: DataFrame) -> DataFrame:
    ev = successful(events).withColumn("seq", _seq())
    keep, cols = _memo("bid_exprs", _build_bid_exprs)
    return (
        ev.filter(keep)
        .select(*cols)
        .groupBy("token_id")
        .agg(F.collect_set("bd").alias("bids"), F.max("cl").alias("last_clear"))
    )


def merge_bid_partials(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy("token_id")
        .agg(
            F.array_distinct(F.flatten(F.collect_list("bids"))).alias("bids"),
            F.max("last_clear").alias("last_clear"),
        )
    )


def finalize_bids(partial: DataFrame) -> DataFrame:
    survivors = (
        partial.select("token_id", "last_clear", F.explode("bids").alias("bd"))
        .filter(F.col("last_clear").isNull() | (F.col("bd.s") > F.col("last_clear")))
        .select(
            F.col("bd.bidder_address").alias("bidder_address"),
            F.col("bd.bidder_beneficiary").alias("bidder_beneficiary"),
            F.col("bd.beneficiary_commission").alias("beneficiary_commission"),
            F.col("bd.price").alias("price"),
            "token_id",
            F.col("bd.created_at").alias("created_at"),
        )
        .withColumn("updated_at", F.col("created_at"))
        .withColumn("deleted_at", F.lit(None).cast("timestamp"))
    )
    return _assign_ids(survivors, order_by=["created_at", "token_id", "bidder_address"])


# ---------------------------------------------------------------------------
# fungible tokens + transfers (M16)
# ---------------------------------------------------------------------------
def ft_partial_state(events: DataFrame) -> DataFrame:
    """Per-denom mergeable partial: the create payload as a max-struct,
    the transfer count as a sum (non-idempotent — needs the high-water
    replay guard, like the users sums)."""
    ev = successful(events).withColumn("seq", _seq())

    def _build() -> tuple:
        t = F.col("msg_type")
        return (
            t.isin(MSG_CREATE_FT, MSG_TRANSFER_FT),
            [
                "denom",
                F.when(
                    t == MSG_CREATE_FT,
                    F.struct(
                        F.col("seq").alias("s"),
                        F.col("sender").alias("owner_address"),
                        F.col("amount").alias("emission_amount"),
                        F.col("ts").alias("created_at"),
                    ),
                ).alias("created"),
                F.when(t == MSG_TRANSFER_FT, F.lit(1)).otherwise(F.lit(0)).alias("n_transfers"),
            ],
        )

    keep, cols = _memo("ft_exprs", _build)
    return (
        ev.filter(keep)
        .select(*cols)
        .groupBy("denom")
        .agg(F.max("created").alias("created"), F.sum("n_transfers").alias("n_transfers"))
    )


def merge_ft_partials(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy("denom")
        .agg(F.max("created").alias("created"), F.sum("n_transfers").alias("n_transfers"))
    )


def finalize_ft_state(partial: DataFrame) -> DataFrame:
    """(denom, owner, emission, transfer count) — the shape
    marketplace_ft_state reports (the batch path derives it from the
    fts ⋈ transfers surrogate-id join)."""
    return partial.filter(F.col("created").isNotNull()).select(
        "denom",
        F.col("created.owner_address").alias("owner_address"),
        F.col("created.emission_amount").alias("emission_amount"),
        "n_transfers",
    )


def materialize_fungible_tokens(events: DataFrame) -> DataFrame:
    ev = successful(events).withColumn("seq", _seq())
    fts = ev.filter(F.col("msg_type") == MSG_CREATE_FT).select(
        F.col("sender").alias("owner_address"),
        F.col("denom"),
        F.col("amount").alias("emission_amount"),
        F.col("ts").alias("created_at"),
    )
    fts = fts.withColumn("updated_at", F.col("created_at")).withColumn(
        "deleted_at", F.lit(None).cast("timestamp")
    )
    return _assign_ids(fts, order_by=["created_at", "denom"])


def materialize_ft_transfers(events: DataFrame, fungible_tokens: DataFrame) -> DataFrame:
    ev = successful(events)
    transfers = ev.filter(F.col("msg_type") == MSG_TRANSFER_FT).select(
        F.col("sender").alias("sender_address"),
        F.col("recipient").alias("recipient_address"),
        F.col("denom"),
        F.col("amount"),
        F.col("ts").alias("created_at"),
        F.col("height"), F.col("tx_index"), F.col("msg_id"),
    )
    ft_ids = fungible_tokens.select(F.col("id").alias("fungible_token_id"), "denom")
    out = (
        transfers.join(F.broadcast(ft_ids), "denom")
        .select("sender_address", "recipient_address", "fungible_token_id", "amount",
                "created_at", "height", "tx_index", "msg_id")
        .withColumn("updated_at", F.col("created_at"))
        .withColumn("deleted_at", F.lit(None).cast("timestamp"))
    )
    return _assign_ids(out, order_by=["height", "tx_index", "msg_id"]).drop(
        "height", "tx_index", "msg_id"
    )


# ---------------------------------------------------------------------------
# users — find-or-create over every address in every message (M17/M18)
# ---------------------------------------------------------------------------
ADDRESS_COLUMNS = ("sender", "recipient", "buyer", "bidder", "beneficiary")


def materialize_users(events: DataFrame) -> DataFrame:
    return finalize_users(user_partial_state(events))


def user_partial_state(events: DataFrame) -> DataFrame:
    """Per-address mergeable aggregates (min/max/min/sum) — every one
    associative, so streaming micro-batches fold incrementally. The
    sum is NOT idempotent: the streaming fold must guard against
    double-applying a replayed batch (streaming/marketplace.py does,
    via the store's CURRENT pointer)."""
    ev = successful(events).withColumn("seq", _seq())

    def _build() -> tuple:
        addr_array = F.array_union(
            F.split(F.coalesce(F.col("signers"), F.lit("")), ","),
            F.array(*(F.coalesce(F.col(c), F.lit("")) for c in ADDRESS_COLUMNS)),
        )
        return (
            [F.explode(addr_array).alias("address"), F.col("seq"), F.col("ts"), F.col("signers")],
            [
                F.min("ts").alias("created_at"),
                F.max("ts").alias("updated_at"),
                F.min("seq").alias("first_seq"),
                # sequence_number parity: the reference bumps it per
                # signed msg (marketplace.go:78-86); = msgs signed
                F.sum(
                    F.when(
                        F.array_contains(
                            F.split(F.coalesce(F.col("signers"), F.lit("")), ","),
                            F.col("address"),
                        ),
                        1,
                    ).otherwise(0)
                ).alias("sequence_number"),
            ],
        )

    sel, aggs = _memo("user_exprs", _build)
    return (
        ev.select(*sel)
        .filter(F.col("address") != "")
        .groupBy("address")
        .agg(*aggs)
    )


def merge_user_partials(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy("address")
        .agg(
            F.min("created_at").alias("created_at"),
            F.max("updated_at").alias("updated_at"),
            F.min("first_seq").alias("first_seq"),
            F.sum("sequence_number").alias("sequence_number"),
        )
    )


def finalize_users(partial: DataFrame) -> DataFrame:
    users = (
        partial.withColumn("name", F.col("address"))
        .withColumn("balance", F.lit(""))  # chain-queried in the reference; not replayable
        .withColumn("deleted_at", F.lit(None).cast("timestamp"))
    )
    return (
        _assign_ids(users, order_by=["first_seq", "address"])
        .withColumn("account_number", F.col("id"))
        .drop("first_seq")
        .select("id", "created_at", "updated_at", "deleted_at", "name", "address",
                "balance", "account_number", "sequence_number")
    )


# ---------------------------------------------------------------------------
# txes / messages — always-on audit facts (M24), failed rows included
# ---------------------------------------------------------------------------
def materialize_txes(events: DataFrame) -> DataFrame:
    txes = events.groupBy("height", "tx_index").agg(
        F.first("tx_hash").alias("hash"),
        F.first("code").alias("code"),
        F.first("gas_wanted").alias("gas_wanted"),
        F.first("gas_used").alias("gas_used"),
        F.min("ts").alias("created_at"),
    )
    txes = (
        txes.withColumn("updated_at", F.col("created_at"))
        .withColumn("deleted_at", F.lit(None).cast("timestamp"))
        .withColumn("data", F.lit(None).cast("binary"))
        .withColumn("log", F.lit(None).cast("string"))
        .withColumn("info", F.lit(None).cast("string"))
    )
    return _assign_ids(txes, order_by=["height", "tx_index"])


def materialize_messages(events: DataFrame, txes: DataFrame) -> DataFrame:
    failed = (F.col("code") != 0) | ~F.col("route").isin(*KNOWN_ROUTES)
    msgs = events.select(
        "height", "tx_index", "msg_id", "route", "msg_type", "signers",
        F.lit(None).cast("string").alias("signature"),
        failed.alias("failed"),
        F.when(~F.col("route").isin(*KNOWN_ROUTES), F.concat(F.lit("no handler for route "), F.col("route")))
        .when(F.col("code") != 0, F.lit("tx failed"))
        .alias("error"),
        F.col("ts").alias("created_at"),
    )
    tx_ids = txes.select(F.col("id").alias("tx_id"), F.col("height").alias("t_h"), F.col("tx_index").alias("t_i"))
    msgs = (
        msgs.join(F.broadcast(tx_ids), (msgs.height == tx_ids.t_h) & (msgs.tx_index == tx_ids.t_i))
        .drop("t_h", "t_i")
        .withColumn("updated_at", F.col("created_at"))
        .withColumn("deleted_at", F.lit(None).cast("timestamp"))
    )
    return _assign_ids(msgs, order_by=["height", "tx_index", "msg_id"]).drop(
        "height", "tx_index", "msg_id"
    )


def _assign_ids(df: DataFrame, order_by: list[str]) -> DataFrame:
    """Surrogate id in reference insert order (gorm serial PK parity).

    Range-partitioned rank, not a global row_number window: rows are
    range-partitioned on the (unique) order key, ranked WITHIN each
    partition in parallel, and per-partition counts — one row per
    partition — get a cumulative offset that is broadcast back. The
    only global sort is over the partition-count rollup, so this holds
    at fact-table cardinality. Ids depend only on the total order of
    ``order_by``, never on where the range boundaries land.
    """
    part = df.repartitionByRange(*[F.col(c) for c in order_by]).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("__pid").orderBy(*order_by)
    within = part.withColumn("__rn", F.row_number().over(w_in))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        within.groupBy("__pid")
        .agg(F.count("*").alias("__n"))
        .withColumn("__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0)))
    )
    return (
        within.join(F.broadcast(offsets.select("__pid", "__off")), "__pid")
        .withColumn("id", (F.col("__rn") + F.col("__off")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )


def materialize_all(events: DataFrame) -> dict[str, DataFrame]:
    """Replay the full event log into the reference's 8 state tables."""
    txes = materialize_txes(events)
    fts = materialize_fungible_tokens(events)
    return {
        "txes": txes,
        "messages": materialize_messages(events, txes),
        "users": materialize_users(events),
        "nfts": materialize_nfts(events),
        "offers": materialize_offers(events),
        "auction_bids": materialize_auction_bids(events),
        "fungible_tokens": fts,
        "fungible_token_transfers": materialize_ft_transfers(events, fts),
    }
