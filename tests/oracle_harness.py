"""Mirror of the driver's DuckDB-oracle comparison, run locally in tests.

Compares a Spark DataFrame result against DuckDB executing the oracle
SQL on the same parquet files: row count, column-name set, and
order-insensitive exact value equality (the driver hashes, so any
nondeterminism or float drift must be fixed in the *query*, not
papered over here).

The comparison is TYPE-STRICT, matching the driver's behavior: DuckDB
results are fetched through Arrow (so a HUGEINT ``sum()`` arrives as
``decimal128`` / ``Decimal``, exactly as the driver sees it), and values
are tagged with their Python type class before hashing. A Spark BIGINT
``5`` therefore does NOT equal a DuckDB HUGEINT ``Decimal('5')`` — the
oracle must ``CAST(sum(...) AS BIGINT)``. Round 1 proved the driver
distinguishes these even when the repr'd values coincide.
"""

from __future__ import annotations

import glob
import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(path)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, Decimal):
        # scale-preserving: Decimal('5.00') != Decimal('5') on purpose —
        # if the engines disagree on scale the driver's hash likely does too
        return ("dec", str(v))
    if isinstance(v, float):
        v = v + 0.0  # normalize -0.0 to 0.0 BEFORE repr (repr(-0.0) != repr(0.0))
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v).hex())
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(_norm(r[i])) for i in order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    # Arrow fetch, not fetchall(): fetchall() downcasts HUGEINT to Python
    # int and would hide exactly the type divergence the driver flags.
    tbl = con.execute(sql).arrow()
    d_cols = list(tbl.column_names)
    d_rows = [tuple(d[c] for c in d_cols) for d in tbl.to_pylist()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_set = _rowset(s_cols, s_rows)
    d_set = _rowset(d_cols, d_rows)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
