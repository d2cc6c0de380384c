"""One-off mirror of the driver's correctness gate at its own scale factor.

Runs every registered query against its DuckDB oracle at sf0.01 (the
driver compares at sf0.01; the repo's pytest gate runs at sf0.001), and
prints per-query PASS/FAIL. Usage:

    python scripts/parity_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import dwh_spark.plans.all  # noqa: F401
from dwh_spark.plans.registry import ORACLES, QUERIES
from tests.oracle_harness import compare, duckdb_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("parity-sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    con = duckdb_connection(sf_dir)
    failures = []
    for name in sorted(QUERIES):
        t0 = time.time()
        try:
            df = QUERIES[name](spark, sf_dir)
            if name in ORACLES:
                compare(df, con, ORACLES[name], name)
                status = "PASS"
            else:
                assert df.count() >= 0
                status = "ROWS-ONLY"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL: {exc}"
            failures.append(name)
            traceback.print_exc(limit=3)
        print(f"{name:45s} {time.time() - t0:6.2f}s  {status}", flush=True)
    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES)} green; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
