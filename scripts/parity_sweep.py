"""Full-registry mirror of the driver's correctness gate, recorded as a
per-round artifact.

Runs every registered query against its DuckDB oracle at sf0.01 (the
driver compares at sf0.01; the repo's pytest gate runs at sf0.001),
prints per-query PASS/FAIL, and writes ``PARITY_r{N}.json`` at the repo
root — one row per query, ``{"status": "PASS"|"ROWS-ONLY"|"FAIL",
"secs": ..., "err": ...}``.

The artifact is a VERDICT SOURCE for the rotation policy (VERDICT r15
What's-wrong #1): the driver's CORRECTNESS gate samples only ~50
queries per round, so at 258 registered queries a 3-round staleness
bound is unreachable from driver rows alone. The committed per-round
full-registry sweep is strictly stronger evidence, and
``tests/test_entry_contract.py::test_rotation_covers_stalest_verdicts``
and ``scripts/rotate_check_first.py`` both union green PARITY rows into
the ledger. FAIL rows are recorded but never count as a verdict.

Usage:

    python scripts/parity_sweep.py [sf_dir] [--round N]

The round defaults to (newest committed CORRECTNESS round) + 1 — the
sweep runs DURING a round, before the driver writes that round's
CORRECTNESS artifact.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import dwh_spark.plans.all  # noqa: F401
from dwh_spark.plans.registry import ORACLES, QUERIES
from tests.oracle_harness import compare, duckdb_connection

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def infer_round(root: str = ROOT) -> int:
    """``max(newest CORRECTNESS + 1, newest PARITY)``: the driver
    writes CORRECTNESS_r{N} AFTER the builder's round-N session, so a
    sweep run mid-round belongs to the round in progress, and a re-run
    within the same round overwrites its own artifact (intended — the
    artifact should describe HEAD). Considering existing PARITY rounds
    keeps the clock from REWINDING if a prior round's sweep landed but
    its driver artifact did not; for that aborted-round case pass
    ``--round`` explicitly to start a fresh artifact instead of
    refreshing the stranded one."""
    newest_c, newest_p = 0, 0
    for pattern, is_parity in (("CORRECTNESS_r*.json", False), ("PARITY_r*.json", True)):
        for path in glob.glob(os.path.join(root, pattern)):
            m = re.search(r"_r(\d+)\.json$", path)
            if m is None:
                continue
            r = int(m.group(1))
            if is_parity:
                newest_p = max(newest_p, r)
            else:
                newest_c = max(newest_c, r)
    return max(newest_c + 1, newest_p)


def main() -> int:
    argv = list(sys.argv[1:])
    rnd = None
    if "--round" in argv:
        i = argv.index("--round")
        rnd = int(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    if rnd is None:
        rnd = infer_round()
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("parity-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    con = duckdb_connection(sf_dir)
    record: dict[str, dict] = {}
    failures = []
    for name in sorted(QUERIES):
        t0 = time.time()
        err = None
        try:
            df = QUERIES[name](spark, sf_dir)
            if name in ORACLES:
                compare(df, con, ORACLES[name], name)
                status = "PASS"
            else:
                assert df.count() >= 0
                status = "ROWS-ONLY"
        except Exception as exc:  # noqa: BLE001
            status = "FAIL"
            err = f"{type(exc).__name__}: {exc}"[:500]
            failures.append(name)
            traceback.print_exc(limit=3)
        secs = time.time() - t0
        record[name] = {"status": status, "secs": round(secs, 2), "err": err}
        print(f"{name:45s} {secs:6.2f}s  {status}{': ' + err if err else ''}", flush=True)
    out = os.path.join(ROOT, f"PARITY_r{rnd:02d}.json")
    tmp = out + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(record, fh, indent=0, sort_keys=True)
    os.replace(tmp, out)
    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} green; failures: {failures}")
    print(f"wrote {out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
