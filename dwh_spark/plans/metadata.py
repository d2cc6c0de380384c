"""Token-metadata pipeline queries (SURVEY.md §2.4, D1-D7).

The reference's metadata worker fetches ERC-721 JSON per NFT, schema-
validates it, upserts into Mongo with deep-equality change detection,
and a daemon re-checks the stalest 20% on a timer
(`x/tokenMetadataService/service.go:116-210`,
`x/mongoDaemon/service.go:98-176`). Here the fetch results are derived
deterministically from the `documents` table — both engines build the
exact same raw JSON strings, so the oracle exercises identical inputs:

- doc_id % 10 == 9 → truncated JSON       (malformed; D1 failure)
- doc_id % 10 == 7 → numeric "name"       (schema violation; D2)
- doc_id % 10 == 3 → no "image" key       (valid; no image task, D4)
- otherwise        → fully valid document

Generation 1 (a later re-fetch) additionally changes the description
of every doc_id % 3 == 0 document, driving the D3 change detector.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dwh_spark.operators.metadata import (
    extract_field,
    is_valid_erc721,
    scd1_merge,
    staleness_schedule,
)
from dwh_spark.plans.registry import query
from dwh_spark.sources.catalog import load_table

# ---------------------------------------------------------------- fixture

REFRESH_TS = 100  # "now" of the generation-1 re-fetch batch


def _raw_doc(gen: int) -> Column:
    did = F.col("doc_id").cast("string")
    name = F.concat(F.lit('"name": "doc-'), did, F.lit('"'))
    name_num = F.concat(F.lit('"name": '), did)
    suffix = (
        F.when((F.lit(gen) == 1) & (F.col("doc_id") % 3 == 0), F.lit("-v2"))
        .otherwise(F.lit(""))
    )
    desc = F.concat(
        F.lit('"description": "'), F.col("lang"), F.lit("-"),
        F.col("n_chars").cast("string"), suffix, F.lit('"'),
    )
    img = F.concat(F.lit('"image": "http://img/'), did, F.lit('.png"'))
    mod = F.col("doc_id") % 10
    return (
        F.when(mod == 9, F.concat(F.lit("{"), name, F.lit(", "), desc, F.lit(", "), img))
        .when(mod == 7, F.concat(F.lit("{"), name_num, F.lit(", "), desc, F.lit(", "), img, F.lit("}")))
        .when(mod == 3, F.concat(F.lit("{"), name, F.lit(", "), desc, F.lit("}")))
        .otherwise(F.concat(F.lit("{"), name, F.lit(", "), desc, F.lit(", "), img, F.lit("}")))
    )


def _fetched(spark: SparkSession, sf_dir: str, gen: int) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", _raw_doc(gen).alias("doc")
    )


def _raw_docs_sql(gen: int) -> str:
    suffix = "CASE WHEN doc_id % 3 = 0 THEN '-v2' ELSE '' END" if gen == 1 else "''"
    return f"""
    SELECT doc_id,
      CASE
        WHEN doc_id % 10 = 9 THEN '{{' || nm || ', ' || de || ', ' || im
        WHEN doc_id % 10 = 7 THEN '{{"name": ' || CAST(doc_id AS VARCHAR) || ', ' || de || ', ' || im || '}}'
        WHEN doc_id % 10 = 3 THEN '{{' || nm || ', ' || de || '}}'
        ELSE '{{' || nm || ', ' || de || ', ' || im || '}}'
      END AS doc
    FROM (
      SELECT doc_id,
        '"name": "doc-' || CAST(doc_id AS VARCHAR) || '"' AS nm,
        '"description": "' || lang || '-' || CAST(n_chars AS VARCHAR) || {suffix} || '"' AS de,
        '"image": "http://img/' || CAST(doc_id AS VARCHAR) || '.png"' AS im
      FROM documents)
    """


# DuckDB mirror of is_valid_erc721: object-typed root, string-typed
# fields when present (json_extract → SQL NULL only when absent).
# CASE guards the json_type calls — DuckDB's AND does not short-circuit,
# and json_type raises on malformed input.
_VALID_SQL = (
    "(CASE WHEN json_valid(doc) THEN json_type(doc) = 'OBJECT'"
    + "".join(
        f" AND (json_extract(doc, '$.{f}') IS NULL"
        f" OR json_type(doc, '$.{f}') = 'VARCHAR')"
        for f in ("name", "description", "image")
    )
    + " ELSE FALSE END)"
)

# ---------------------------------------------------------------- queries


@query(
    "metadata_validate",
    oracle=f"""
    WITH raw AS ({_raw_docs_sql(0)})
    SELECT doc_id,
      CAST({_VALID_SQL} AS INT) AS valid,
      CAST(CASE WHEN {_VALID_SQL}
           THEN json_extract(doc, '$.image') IS NOT NULL
           ELSE FALSE END AS INT) AS image_task,
      CASE WHEN {_VALID_SQL} THEN json_extract_string(doc, '$.name') END AS name
    FROM raw
    """,
)
def metadata_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1+D2+D4: parse, JSON-schema validate, and flag docs that cascade
    an image-fetch task (valid AND has image — service.go:146-150)."""
    docs = _fetched(spark, sf_dir, 0)
    valid = is_valid_erc721(F.col("doc"))
    image = extract_field(F.col("doc"), "image")
    return docs.select(
        "doc_id",
        valid.cast("int").alias("valid"),
        (valid & image.isNotNull()).cast("int").alias("image_task"),
        F.when(valid, extract_field(F.col("doc"), "name")).alias("name"),
    )


# The merged collection is the shared input of the scd1/schedule/
# priority queries — cache it per (session, sf_dir) like the
# materialized state table it models (recompute would re-parse JSON
# and re-join per query).
_STATE_CACHE: dict[tuple[str, str], DataFrame] = {}


def _merged_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    if cache_key in _STATE_CACHE:
        return _STATE_CACHE[cache_key]
    merged = _merged_state_uncached(spark, sf_dir).cache()
    _STATE_CACHE[cache_key] = merged
    return merged


def _merged_state_uncached(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen0 = _fetched(spark, sf_dir, 0).filter(is_valid_erc721(F.col("doc")))
    current = (
        gen0.filter(F.col("doc_id") % 11 != 0)
        .select(
            "doc_id", "doc",
            F.md5(F.to_json(F.from_json("doc", "name string, description string, image string"))).alias("change_hash"),
            F.lit(0).cast("long").alias("last_updated"),
            F.lit(0).cast("long").alias("last_checked"),
        )
    )
    incoming = (
        _fetched(spark, sf_dir, 1)
        .filter(is_valid_erc721(F.col("doc")) & (F.col("doc_id") % 5 != 0))
        .select("doc_id", "doc", F.lit(REFRESH_TS).cast("long").alias("fetched_at"))
    )
    return scd1_merge(current, incoming, key="doc_id")


_MERGE_SQL = f"""
    WITH cur AS (
      SELECT * FROM ({_raw_docs_sql(0)}) WHERE ({_VALID_SQL}) AND doc_id % 11 != 0
    ), inc AS (
      SELECT * FROM ({_raw_docs_sql(1)}) WHERE ({_VALID_SQL}) AND doc_id % 5 != 0
    )
    SELECT COALESCE(c.doc_id, i.doc_id) AS doc_id,
      CASE WHEN i.doc IS NOT NULL AND (c.doc IS NULL OR i.doc != c.doc)
           THEN i.doc ELSE c.doc END AS doc,
      CAST(CASE WHEN i.doc IS NOT NULL AND (c.doc IS NULL OR i.doc != c.doc)
           THEN {REFRESH_TS} ELSE 0 END AS BIGINT) AS last_updated,
      CAST(CASE WHEN i.doc IS NOT NULL THEN {REFRESH_TS} ELSE 0 END AS BIGINT)
        AS last_checked
    FROM cur c FULL OUTER JOIN inc i ON c.doc_id = i.doc_id
"""


@query("metadata_scd1_merge", oracle=_MERGE_SQL)
def metadata_scd1_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: change-hash SCD-1 merge of a re-fetch batch into the stored
    collection — updated docs get last_updated+last_checked bumped,
    unchanged ones only last_checked, unfetched ones neither, and
    never-seen docs are inserted (service.go:177-210)."""
    return _merged_state(spark, sf_dir).select(
        "doc_id", "doc", "last_updated", "last_checked"
    )


@query(
    "metadata_refresh_schedule",
    oracle=f"""
    WITH state AS ({_MERGE_SQL}),
    ranked AS (
      SELECT doc_id, last_checked,
        row_number() OVER (ORDER BY last_checked, doc_id) AS rn,
        count(*) OVER () AS n
      FROM state)
    SELECT doc_id, last_checked FROM ranked
    WHERE rn <= CAST(CEIL(n * 20.0 / 100.0) AS BIGINT)
    """,
)
def metadata_refresh_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6+D7: the mongoDaemon wake-up — select the stalest 20% of the
    merged collection by last_checked as the re-fetch task batch."""
    state = _merged_state(spark, sf_dir)
    return staleness_schedule(state, percent=20, key_col="doc_id").select(
        "doc_id", "last_checked"
    )


@query(
    "metadata_task_priority_order",
    oracle=f"""
    WITH state AS ({_MERGE_SQL}),
    tasks AS (
      SELECT doc_id, last_checked,
        CASE WHEN last_checked = 0 AND last_updated = 0 THEN 1
             WHEN last_updated = {REFRESH_TS} THEN 2
             ELSE 4 END AS priority
      FROM state),
    ranked AS (
      SELECT doc_id, priority,
        row_number() OVER (ORDER BY priority DESC, last_checked, doc_id)
          AS consume_rank
      FROM tasks)
    SELECT doc_id, priority, consume_rank FROM ranked
    WHERE consume_rank <= 50
    """,
)
def metadata_task_priority_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/S12: the RabbitMQ priority queue as a tasks DataFrame —
    4-level priority (x/common/types.go:15-22: fresh-mint > forced >
    transfer > regular), consumed highest-priority-first, stalest
    tie-break. Rendered here: never-checked docs rank above
    just-updated ones above the rest; the consumer takes the top 50."""
    state = _merged_state(spark, sf_dir)
    priority = (
        F.when((F.col("last_checked") == 0) & (F.col("last_updated") == 0), 1)
        .when(F.col("last_updated") == REFRESH_TS, 2)
        .otherwise(4)
    )
    tasks = state.select("doc_id", "last_checked", priority.alias("priority"))
    return (
        tasks.orderBy(F.desc("priority"), F.asc("last_checked"), F.asc("doc_id"))
        .limit(50)
        .select(
            "doc_id", "priority",
            F.row_number().over(
                Window.orderBy(F.desc("priority"), F.asc("last_checked"), F.asc("doc_id"))
            ).alias("consume_rank"),
        )
    )


# ---------------------------------------------------------------------------
# S7/S8: the fetch boundary itself — batched, rate-limitable HTTP stage
# with the deterministic offline transport (fixture urls derived from
# doc_id; doc_id % 13 == 0 targets a "missing" path).
# ---------------------------------------------------------------------------
from dwh_spark.sources.fetch import fetch_urls  # noqa: E402


@query(
    "metadata_fetch_stage",
    oracle="""
    WITH urls AS (
      SELECT 'http://meta/' ||
             CASE WHEN doc_id % 13 = 0 THEN 'missing/' ELSE '' END ||
             CAST(doc_id AS VARCHAR) AS url
      FROM documents
    )
    SELECT url,
           CASE WHEN contains(url, 'missing') THEN 404 ELSE 200 END AS status,
           CASE WHEN contains(url, 'missing') THEN ''
                ELSE '{"url": "' || url || '", "ok": true}' END AS body,
           CAST(strlen(CASE WHEN contains(url, 'missing') THEN ''
                ELSE '{"url": "' || url || '", "ok": true}' END) AS BIGINT)
             AS n_bytes
    FROM urls
    """,
)
def metadata_fetch_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest boundary as a real mapInPandas fetch stage (batched,
    connection-reusing, rate-limitable) running the deterministic
    offline transport — per-url result rows including failures, never
    task errors."""
    urls = load_table(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("http://meta/"),
            F.when(F.col("doc_id") % 13 == 0, F.lit("missing/")).otherwise(F.lit("")),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    return fetch_urls(urls)
