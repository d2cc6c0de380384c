"""The unified erasure capstone (plans/pipeline_extra.py:
pipeline_unified_erasure_ledger): one GDPR manifest through every
stored index family's forget path, one verification ledger. Pins the
structural invariants the oracle hash alone wouldn't localize on
failure: zero ghost hits in every family, every family reporting both
arms, survivors present, and disjoint global id bands.
"""

from pyspark.sql import functions as F

from dwh_spark.plans.pipeline_extra import (
    _ERASURE_OFFSETS,
    pipeline_unified_erasure_ledger,
)

SF_DIR = "/root/testdata/sf0.001"


def _ledger(spark):
    return pipeline_unified_erasure_ledger(spark, SF_DIR).localCheckpoint()


def test_every_family_reports_and_no_ghosts(spark):
    led = _ledger(spark)
    rows = led.collect()
    fams = {r["family"] for r in rows}
    assert fams == set(_ERASURE_OFFSETS)
    # the deletion proof: no surviving row in ANY family still pairs
    # with a forgotten base id
    assert all(r["n_ghost_hits"] == 0 for r in rows), rows
    # per-family arm coverage: docs/emb report both re-arrival arms,
    # audio/video the pairs + ghost_probe arms
    by_fam = {}
    for r in rows:
        by_fam.setdefault(r["family"], set()).add(r["arm"])
    assert by_fam["doc"] == {"forgot_rearrival", "kept_rearrival"}
    assert by_fam["emb"] == {"forgot_rearrival", "kept_rearrival"}
    assert by_fam["image"] == {"pairs", "ghost_probe"}
    assert by_fam["audio"] == {"pairs", "ghost_probe"}
    assert by_fam["video"] == {"pairs", "ghost_probe"}
    # non-collateral: every arm still carries surviving matches (kept
    # re-arrivals find their originals; trimmed copies pair with each
    # other after the base is forgotten)
    assert all(r["n_rows"] > 0 for r in rows), rows


def test_ghost_counter_detects_a_leaked_row(spark):
    """The ledger's value rests on 'one leftover index row would
    surface as a nonzero ghost counter' — prove the detector fires,
    not just that it reports zeros on correct forgets: run the image
    family's arm with an INCOMPLETE forget (one marked id left in the
    index) and assert the same ghost expression the ledger uses goes
    positive on exactly that id."""
    from pyspark.sql import functions as F

    from dwh_spark.multimodal.perceptual import DHASH_BITS, dhash_frame
    from dwh_spark.operators.dedup import simhash_blocked_probe
    from dwh_spark.operators.forget import forget_rows
    from dwh_spark.plans.images import _imgs_forget_fixture
    from dwh_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    sh = (
        dhash_frame(_imgs_forget_fixture(docs, base=True, variants=True))
        .select("image_id", F.col("dhash").alias("simhash"))
        .localCheckpoint()
    )
    marked = docs.filter(F.col("doc_id") % 10 == 3).select(
        F.col("doc_id").alias("image_id")
    )
    leaked = marked.orderBy("image_id").limit(1)
    fids = marked.join(leaked, "image_id", "left_anti")  # forget all but one
    dead = sh.join(F.broadcast(marked), "image_id", "left_semi")
    kept = forget_rows(sh, fids, key="image_id")
    ghost = simhash_blocked_probe(
        kept, dead, key="image_id",
        n_blocks=4, block_bits=DHASH_BITS // 4, max_hamming=3,
    )
    # the ledger's ghost expression: a surviving partner that is a
    # forgotten-marked base id
    hits = ghost.filter(
        (F.col("index_id") % 10 == 3) & (F.col("index_id") < 1000000)
    )
    leaked_id = leaked.collect()[0]["image_id"]
    got = {r["index_id"] for r in hits.select("index_id").distinct().collect()}
    assert got == {leaked_id}, got


def test_global_id_bands_disjoint(spark):
    # id_sum per row is a sum of 2*n_rows global ids from ONE band;
    # its mean must land strictly inside [off, off + 1e8) — a
    # misrouted family (audio ids summed under the video offset, or a
    # raw local id leaking through unshifted) lands outside.
    led = _ledger(spark)
    for r in led.collect():
        off = _ERASURE_OFFSETS[r["family"]]
        mean_gid = r["id_sum"] / (2 * r["n_rows"])
        assert off <= mean_gid < off + 100_000_000, r


def test_band_discipline_guard_fires_on_big_raw_ids(spark, tmp_path):
    """ADVICE r15: _GHOST_SQL and the re-arrival arm split hard-code
    raw ids < 1e6. The runtime guard must raise loudly on a fixture
    whose raw ids reach the variant band, and pass on the real one."""
    import shutil

    import pytest

    from dwh_spark.plans.pipeline_extra import _assert_band_discipline

    _assert_band_discipline(spark, "/root/testdata/sf0.001")  # real: fine

    bad = tmp_path / "sfbad"
    bad.mkdir()
    for name in ("documents", "embeddings"):
        shutil.copy(f"/root/testdata/sf0.001/{name}.parquet", bad / f"{name}.parquet")
    spark.createDataFrame(
        [(1_000_000, "collides")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(bad / "documents.parquet"))
    with pytest.raises(AssertionError, match="variant band"):
        _assert_band_discipline(spark, str(bad))
