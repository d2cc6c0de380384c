"""dwh_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of p2p-org/dwh (reference: /root/reference).

The reference is a CDC/ETL warehouse for a Cosmos-SDK NFT marketplace:
an ordered message stream materialized into 8 mutable relational tables,
a Hasura/PostgreSQL query surface over them, and derived metadata/image
pipelines. This package re-expresses those capabilities Spark-first:

- ``dwh_spark.session``      — tuned SparkSession builder
- ``dwh_spark.schemas``      — StructTypes for all tables
- ``dwh_spark.sources``      — parquet catalog + streaming sources
- ``dwh_spark.operators``    — state transitions, latest-state compaction,
                               dedup (exact/minhash/simhash/jaccard),
                               similarity search, top-k scheduling
- ``dwh_spark.functions``    — coin parsing, text analysis, JSON schema
                               validation
- ``dwh_spark.plans``        — the relational query surface (Q1-Q8 of
                               SURVEY.md §2.3) as composable builders
- ``dwh_spark.streaming``    — Structured Streaming ingest with
                               exactly-once checkpointing
- ``dwh_spark.multimodal``   — binary-column (image) pipeline plumbing
"""

__version__ = "0.1.0"
