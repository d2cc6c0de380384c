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
