"""Token-metadata pipeline operators (SURVEY.md §2.4, D1-D7).

The reference fetches each NFT's tokenURI JSON, validates it against
the ERC-721 metadata schema, detects changes by deep equality, and
refreshes the stalest 20% on a timer
(`x/tokenMetadataService/service.go:116-210`,
`x/mongoDaemon/service.go:98-176`). Spark-first equivalents:

- D1 parse: ``from_json`` with an explicit struct (JVM-side).
- D2 validate: struct-conformance + type checks — a column predicate,
  not a per-row Python validator.
- D3 change detection: md5 over the normalized parsed struct (a
  change-hash SCD-1 merge condition, not reflect.DeepEqual).
- D6/D7 scheduler: stalest-top-k selection + task append — see
  events_stalest_topk for the generic form.

Fetching (S7) is out of scope by design: inputs arrive pre-fetched as
a DataFrame column (deterministic in tests; at scale the fetch stage
is a rate-limited mapInPandas against an external service).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# ERC-721 metadata JSON schema (x/tokenMetadataService/types.go:3-21):
# properties name/description/image, all strings.
ERC721_SCHEMA = StructType([
    StructField("name", StringType()),
    StructField("description", StringType()),
    StructField("image", StringType()),
])


def parse_metadata(doc: Column) -> Column:
    """D1 — JSON bytes → typed struct. Malformed JSON → NULL struct
    (mode PERMISSIVE yields null fields; a fully null struct marks a
    parse failure downstream)."""
    return F.from_json(doc, ERC721_SCHEMA)


def is_valid_erc721(doc: Column) -> Column:
    """D2 — the reference's JSON-schema check: document parses as a
    JSON *object* and the three properties, when present, are JSON
    *strings* (`x/tokenMetadataService/types.go:3-21`).

    ``from_json`` into StringType is lenient (stringifies numbers and
    arrays), so type violations need the variant path: ``parse_json``
    preserves the source JSON type, ``schema_of_variant`` reads it
    back. All JVM-side expressions — no Python in the hot path.

    Truth table: malformed / non-object → invalid; field missing →
    valid; field present with non-string value (incl. JSON null) →
    invalid.
    """
    v = F.try_parse_json(doc)

    def field_is_string(name: str) -> Column:
        fv = F.variant_get(v, f"$.{name}", "variant")
        return fv.isNull() | (F.schema_of_variant(fv) == F.lit("STRING"))

    is_object = v.isNotNull() & F.schema_of_variant(v).startswith("OBJECT")
    return (
        is_object
        & field_is_string("name")
        & field_is_string("description")
        & field_is_string("image")
    )


def extract_field(doc: Column, name: str) -> Column:
    """String-typed field extraction from a raw metadata doc. NULL when
    the doc is malformed or the field is absent. (Coerces scalars like
    get_json_object would — gate on :func:`is_valid_erc721` when strict
    string typing matters.)"""
    return F.try_variant_get(F.try_parse_json(doc), f"$.{name}", "string")


def change_hash(doc: Column) -> Column:
    """D3 — deterministic content hash of the *parsed, normalized*
    document (key order / whitespace insensitive), the SCD-1 merge
    condition replacing reflect.DeepEqual."""
    return F.md5(F.to_json(parse_metadata(doc)))


def scd1_merge(
    current: DataFrame,
    incoming: DataFrame,
    key: str = "token_id",
    now_col: str = "fetched_at",
) -> DataFrame:
    """D3 merge semantics (service.go:177-210), batch-replay form:

    - row only in current   → kept as-is
    - row in both, same change_hash → last_checked := now
    - row in both, different hash   → doc replaced, last_updated :=
      last_checked := now
    - row only in incoming → inserted with both timestamps = now

    Emulates MERGE with a full outer join (no Delta in this env; on a
    cluster with Delta this is a single MERGE INTO).
    """
    cur = current.select(
        F.col(key), F.col("doc").alias("cur_doc"), F.col("change_hash").alias("cur_hash"),
        F.col("last_updated").alias("cur_updated"), F.col("last_checked").alias("cur_checked"),
    )
    inc = incoming.select(
        F.col(key), F.col("doc").alias("new_doc"), change_hash(F.col("doc")).alias("new_hash"),
        F.col(now_col).alias("now_ts"),
    )
    joined = cur.join(inc, key, "full_outer")
    changed = F.col("new_hash").isNotNull() & (
        F.col("cur_hash").isNull() | (F.col("new_hash") != F.col("cur_hash"))
    )
    return joined.select(
        F.col(key),
        F.when(changed, F.col("new_doc")).otherwise(F.col("cur_doc")).alias("doc"),
        F.when(changed, F.col("new_hash")).otherwise(F.col("cur_hash")).alias("change_hash"),
        F.when(changed, F.col("now_ts")).otherwise(F.col("cur_updated")).alias("last_updated"),
        F.when(F.col("new_hash").isNotNull(), F.col("now_ts"))
        .otherwise(F.col("cur_checked")).alias("last_checked"),
    )


def staleness_schedule(
    metadata: DataFrame,
    percent: int = 20,
    key_col: str = "token_id",
    order_col: str = "last_checked",
) -> DataFrame:
    """D6/D7 — the mongoDaemon scheduler: the stalest ``percent``% of
    docs by ``order_col`` (oldest first, key tie-break), as the
    re-fetch task batch (`x/mongoDaemon/service.go:99-103`, percent
    from `config.toml:47`).

    Scale note: ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject — a per-partition top-k then a single merge
    of k-row heaps — NOT a global sort; an unpartitioned row_number
    window here would funnel the whole table through one task.
    """
    n = metadata.count()
    k = -(-n * percent // 100)  # ceil
    return metadata.orderBy(F.asc(order_col), F.asc(key_col)).limit(int(k))
