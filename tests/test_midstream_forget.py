"""Non-vacuity pins for the mid-stream history-rewrite queries
(forget AND retention/TTL).

Each such query's oracle excludes exactly the (rewritten-away-earlier,
batch-3-partner) pairs — an id cohort for the forget family, the whole
batch-1 horizon for TTL. Oracle parity proves Spark == oracle; these
tests prove the exclusion BITES — the rewrite oracle differs from the
same chain without the exclusion — so a future fixture change can't
silently turn any binding into a no-op that parity would still wave
through. Pure DuckDB, no Spark session.
"""

import glob
import os

import duckdb
import pytest

from dwh_spark.plans.streaming import (
    _AUDIO_OFFSET_FORGET_INGEST_ORACLE,
    _MINHASH_FORGET_INGEST_ORACLE,
    _MINHASH_TTL_INGEST_ORACLE,
    _PHASH_FORGET_INGEST_ORACLE,
    _VIDEO_OFFSET_FORGET_INGEST_ORACLE,
)

SF_DIR = "/root/testdata/sf0.001"

# the exact exclusion predicate of each oracle; removing it yields the
# no-forget form of the same chain. A failed replacement means the
# oracle text drifted — update BOTH the oracle and this pin together.
_CASES = {
    "minhash": (
        _MINHASH_FORGET_INGEST_ORACLE,
        """WHERE NOT (a.doc_id % 20 = 3 AND a.doc_id < 1000000
                 AND ba.b <= 2 AND bb.b = 3)""",
    ),
    "phash": (
        _PHASH_FORGET_INGEST_ORACLE,
        """AND NOT (h2.image_id % 20 = 4 AND h2.image_id < 1000000
               AND t2.b <= 2 AND t1.b = 3)""",
    ),
    "audio_offset": (
        _AUDIO_OFFSET_FORGET_INGEST_ORACLE,
        """WHERE NOT (x.audio_id % 20 = 3 AND x.audio_id < 1000000
                 AND x.b <= 2 AND n.b = 3)""",
    ),
    "video_offset": (
        _VIDEO_OFFSET_FORGET_INGEST_ORACLE,
        """AND NOT (a.video_id % 20 = 3 AND a.video_id < 1000000
                 AND a.b <= 2 AND b.b = 3)""",
    ),
    "minhash_ttl": (
        _MINHASH_TTL_INGEST_ORACLE,
        "WHERE NOT (ba.b = 1 AND bb.b = 3)",
    ),
}


def _con():
    con = duckdb.connect()
    for p in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_ttl_compact_straddle_is_behavioral():
    """The compact+expire straddle query's oracle is the TTL chain
    minus its exclusion (derived by construction in plans/streaming).
    Pin the three-way relationship: straddle == plain chain (the
    merged [0,1] segment keeps batch-0 visible), and straddle !=
    plain TTL (the horizon DID drop batch-0 when segments were not
    merged) — so the query is provably behavioral, not a copy of
    either neighbor."""
    from dwh_spark.plans.streaming import (
        _MINHASH_TTL_COMPACT_INGEST_ORACLE,
        _TTL_EXCLUSION,
    )

    ttl_sql, exclusion = _CASES["minhash_ttl"]
    assert _TTL_EXCLUSION == exclusion
    assert _MINHASH_TTL_COMPACT_INGEST_ORACLE == ttl_sql.replace(exclusion, "")
    con = _con()
    diff = con.execute(
        f"SELECT count(*) FROM (({_MINHASH_TTL_COMPACT_INGEST_ORACLE}) "
        f"EXCEPT ({ttl_sql}))"
    ).fetchone()[0]
    assert diff > 0, "straddle and TTL oracles coincide — nothing straddles"


@pytest.mark.parametrize("family", sorted(_CASES))
def test_forget_exclusion_bites(family):
    forget_sql, exclusion = _CASES[family]
    assert exclusion in forget_sql, (
        f"{family}: exclusion predicate drifted out of the oracle text"
    )
    plain_sql = forget_sql.replace(exclusion, "")
    con = _con()
    dropped = con.execute(
        f"SELECT count(*) FROM (({plain_sql}) EXCEPT ({forget_sql}))"
    ).fetchone()[0]
    assert dropped > 0, (
        f"{family}: the forget exclusion is vacuous at sf0.001 — no "
        "cross-batch partner of a forgotten id exists in the fixture"
    )
