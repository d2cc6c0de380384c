"""Explicit StructTypes for every table the engine serves.

Two families:

1. **Marketplace state tables** — the 8 mutable tables of the reference
   (SURVEY.md §1.4; reference DDL at
   ``x/indexer/handlers/marketplace.go:432-510`` and structs at
   ``x/common/types.go:35-195``). Every state table carries the audit
   columns the reference gets from ``gorm.Model`` (``types.go:36``):
   surrogate ``id``, ``created_at``/``updated_at`` timestamps and a
   nullable ``deleted_at`` soft-delete marker.

2. **Testdata tables** — the driver's TPC-H-ish fixtures
   (region/nation/customer/supplier/part/orders/lineitem) plus
   ``events``/``documents``/``embeddings``, declared explicitly so
   streaming reads and column pruning never depend on inference.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# gorm.Model audit columns (x/common/types.go:36) — present on every state
# table; deleted_at NULL means "live" (soft delete, SURVEY §2.3 Q7).
# ---------------------------------------------------------------------------
AUDIT_FIELDS = [
    StructField("id", LongType()),
    StructField("created_at", TimestampType()),
    StructField("updated_at", TimestampType()),
    StructField("deleted_at", TimestampType()),
]


def _with_audit(fields: list[StructField]) -> StructType:
    return StructType(AUDIT_FIELDS + fields)


# x/common/types.go:133-145
TXES = _with_audit([
    StructField("hash", StringType()),
    StructField("height", LongType()),
    StructField("tx_index", LongType()),
    StructField("code", IntegerType()),
    StructField("data", BinaryType()),
    StructField("log", StringType()),       # jsonb in reference
    StructField("info", StringType()),
    StructField("gas_wanted", LongType()),
    StructField("gas_used", LongType()),
])

# x/common/types.go:161-170
MESSAGES = _with_audit([
    StructField("route", StringType()),
    StructField("msg_type", StringType()),
    StructField("signature", StringType()),  # jsonb
    StructField("signers", StringType()),
    StructField("failed", BooleanType()),
    StructField("error", StringType()),
    StructField("tx_id", LongType()),
])

# x/common/types.go:111-120
USERS = _with_audit([
    StructField("name", StringType()),
    StructField("address", StringType()),
    StructField("balance", StringType()),    # coin string, e.g. "100token"
    StructField("account_number", LongType()),
    StructField("sequence_number", LongType()),
])

# x/common/types.go:35-53; status enum at types.go:41
NFTS = _with_audit([
    StructField("denom", StringType()),
    StructField("token_id", StringType()),
    StructField("owner_address", StringType()),
    StructField("token_uri", StringType()),
    StructField("status", IntegerType()),    # 0=default 1=on_market 2=on_auction
    StructField("price", StringType()),
    StructField("seller_beneficiary", StringType()),
    StructField("buyout_price", StringType()),
    StructField("opening_price", StringType()),
    StructField("time_to_sell", TimestampType()),
])

# x/common/types.go:65-73
OFFERS = _with_audit([
    StructField("offer_id", StringType()),
    StructField("buyer", StringType()),
    StructField("price", StringType()),
    StructField("buyer_beneficiary", StringType()),
    StructField("beneficiary_commission", StringType()),
    StructField("token_id", StringType()),
])

# x/common/types.go:86-93
AUCTION_BIDS = _with_audit([
    StructField("bidder_address", StringType()),
    StructField("bidder_beneficiary", StringType()),
    StructField("beneficiary_commission", StringType()),
    StructField("price", StringType()),
    StructField("token_id", StringType()),
])

# x/common/types.go:95-101
FUNGIBLE_TOKENS = _with_audit([
    StructField("owner_address", StringType()),
    StructField("denom", StringType()),
    StructField("emission_amount", LongType()),
])

# x/common/types.go:103-109
FUNGIBLE_TOKEN_TRANSFERS = _with_audit([
    StructField("sender_address", StringType()),
    StructField("recipient_address", StringType()),
    StructField("fungible_token_id", LongType()),
    StructField("amount", LongType()),
])

# Mongo token_metadata collection (x/tokenMetadataService/service.go:177-210)
TOKEN_METADATA = StructType([
    StructField("token_id", StringType()),
    StructField("owner", StringType()),
    StructField("url", StringType()),
    StructField("metadata_json", StringType()),   # free-form ERC-721 doc
    StructField("name", StringType()),
    StructField("description", StringType()),
    StructField("image", StringType()),
    StructField("is_valid", BooleanType()),
    StructField("change_hash", StringType()),
    StructField("last_updated", TimestampType()),
    StructField("last_checked", TimestampType()),
])

# Content-addressed image store rows (x/imgstorage/storage.go:16-84)
IMAGES = StructType([
    StructField("owner", StringType()),
    StructField("token_id", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mime", StringType()),
    StructField("content_md5", StringType()),
    StructField("content", BinaryType()),
    StructField("stored_at", TimestampType()),
])

# ---------------------------------------------------------------------------
# The marketplace *event stream* — one row per decoded message, chain order.
# Mirrors FIXTURES.md §1: Tx (types.go:133-145) ⋈ decoded msgs
# (indexer.go:234-248) ⋈ emitted event attrs (marketplace.go:555-566).
# ---------------------------------------------------------------------------
MARKETPLACE_EVENTS = StructType([
    StructField("height", LongType()),
    StructField("tx_index", IntegerType()),
    StructField("msg_id", IntegerType()),
    StructField("tx_hash", StringType()),
    StructField("code", IntegerType()),
    StructField("gas_wanted", LongType()),
    StructField("gas_used", LongType()),
    StructField("route", StringType()),
    StructField("msg_type", StringType()),
    StructField("signers", StringType()),
    StructField("token_id", StringType()),
    StructField("denom", StringType()),
    StructField("sender", StringType()),
    StructField("recipient", StringType()),
    StructField("buyer", StringType()),
    StructField("bidder", StringType()),
    StructField("beneficiary", StringType()),
    StructField("price", StringType()),
    StructField("buyout_price", StringType()),
    StructField("opening_price", StringType()),
    StructField("bid", StringType()),
    StructField("amount", LongType()),
    StructField("time_to_sell", TimestampType()),
    StructField("token_uri", StringType()),
    StructField("event_attrs", MapType(StringType(), StringType())),
    StructField("ts", TimestampType()),
])

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/, TESTDATA.md)
# ---------------------------------------------------------------------------
REGION = StructType([
    StructField("r_regionkey", IntegerType()),
    StructField("r_name", StringType()),
])
NATION = StructType([
    StructField("n_nationkey", IntegerType()),
    StructField("n_name", StringType()),
    StructField("n_regionkey", IntegerType()),
])
CUSTOMER = StructType([
    StructField("c_custkey", LongType()),
    StructField("c_name", StringType()),
    StructField("c_nationkey", IntegerType()),
    StructField("c_acctbal", DoubleType()),
    StructField("c_mktsegment", StringType()),
])
SUPPLIER = StructType([
    StructField("s_suppkey", LongType()),
    StructField("s_name", StringType()),
    StructField("s_nationkey", IntegerType()),
    StructField("s_acctbal", DoubleType()),
])
PART = StructType([
    StructField("p_partkey", LongType()),
    StructField("p_name", StringType()),
    StructField("p_brand", StringType()),
    StructField("p_type", StringType()),
    StructField("p_size", IntegerType()),
    StructField("p_retailprice", DoubleType()),
])
ORDERS = StructType([
    StructField("o_orderkey", LongType()),
    StructField("o_custkey", LongType()),
    StructField("o_orderstatus", StringType()),
    StructField("o_totalprice", DoubleType()),
    StructField("o_orderdate", TimestampType()),
    StructField("o_orderpriority", StringType()),
])
LINEITEM = StructType([
    StructField("l_orderkey", LongType()),
    StructField("l_partkey", LongType()),
    StructField("l_suppkey", LongType()),
    StructField("l_linenumber", IntegerType()),
    StructField("l_quantity", DoubleType()),
    StructField("l_extendedprice", DoubleType()),
    StructField("l_discount", DoubleType()),
    StructField("l_tax", DoubleType()),
    StructField("l_returnflag", StringType()),
    StructField("l_linestatus", StringType()),
    StructField("l_shipdate", TimestampType()),
])
EVENTS = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])
DOCUMENTS = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])
EMBEDDINGS = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
    StructField("label", IntegerType()),
])

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

STATE_TABLE_SCHEMAS: dict[str, StructType] = {
    "txes": TXES,
    "messages": MESSAGES,
    "users": USERS,
    "nfts": NFTS,
    "offers": OFFERS,
    "auction_bids": AUCTION_BIDS,
    "fungible_tokens": FUNGIBLE_TOKENS,
    "fungible_token_transfers": FUNGIBLE_TOKEN_TRANSFERS,
}
