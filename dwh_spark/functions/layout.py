"""Data-layout keys: Z-order (Morton) interleaving for multi-column
scan locality.

A linear sort key gives parquet row-group min/max skipping on ONE
column; queries filtering the other column scan everything. Bit-
interleaving two bucketed dimensions into a Morton key bounds the
per-file value range of BOTH columns, so either filter skips files —
Delta's OPTIMIZE ZORDER BY, as a pure column expression.

Usage: bucket each dimension to ``bits`` bits (e.g. ``pmod(hash, 2^b)``
for ids, day-number for time), then
``df.repartitionByRange(n, zorder_key(b1, b2))`` (or
``sortWithinPartitions``) before writing.

All shift/mask algebra — whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Morton interleave of two non-negative ints bucketed to ``bits``
    bits each: bit i of c1 lands at position 2i, of c2 at 2i+1. Values
    are masked to ``bits`` so out-of-range inputs wrap rather than
    corrupt high bits."""
    mask = (1 << bits) - 1
    a = c1.cast("long").bitwiseAND(F.lit(mask))
    b = c2.cast("long").bitwiseAND(F.lit(mask))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out
