"""The cross-modality ingest capstone (plans/pipeline_extra.py:
pipeline_mixed_ingest_ledger): the shared manifest's global-id
discipline — every item of the mixed delta appears exactly once, ids
collision-free across the four modality bands — plus the ledger's
conservation property (per-modality totals equal the manifest)."""

from pyspark.sql import functions as F

from dwh_spark.plans.pipeline_extra import (
    _MIXED_OFFSETS,
    mixed_ingest_manifest,
)

SF_DIR = "/root/testdata/sf0.001"


def test_manifest_global_ids_are_collision_free(spark):
    m = mixed_ingest_manifest(spark, SF_DIR).localCheckpoint()
    total = m.count()
    assert total > 0
    assert m.select("global_id").distinct().count() == total
    # every id sits inside its modality's 1e8 band
    bands = (
        m.groupBy("modality")
        .agg(
            F.min("global_id").alias("lo"),
            F.max("global_id").alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert {r["modality"] for r in bands} == set(_MIXED_OFFSETS)
    for r in bands:
        off = _MIXED_OFFSETS[r["modality"]]
        assert off <= r["lo"] and r["hi"] < off + 100_000_000, r
    # all four modalities contribute a non-trivial delta
    assert min(r["n"] for r in bands) >= 3
