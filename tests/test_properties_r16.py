"""Property-based tests for the round-16 surface (hypothesis): the
ParquetAppendLog lifecycle — random interleavings of append / compact /
rewrite_each / expire — replayed against a pure-python reference model,
with current() and the as-of faithful-or-loud contract checked after
every step. Same discipline as tests/test_properties.py: one spark
frame per op, small max_examples, short sequences."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dwh_spark.streaming.ingest import ParquetAppendLog, SnapshotUnreadableError


class _Model:
    """Pure-python twin of ParquetAppendLog: segments are
    (lo, hi, Counter-of-rows); transforms are row predicates."""

    def __init__(self):
        self.segments: list[tuple[int, int, Counter]] = []
        self.last_committed: int | None = None
        self.expired_through: int | None = None

    def append(self, batch_id: int, rows: list[int]) -> None:
        self.segments.append((batch_id, batch_id, Counter(rows)))
        self.last_committed = (
            batch_id
            if self.last_committed is None
            else max(self.last_committed, batch_id)
        )

    def compact(self, keep=None) -> None:
        if not self.segments or (len(self.segments) < 2 and keep is None):
            return
        lo = min(s[0] for s in self.segments)
        hi = max(s[1] for s in self.segments)
        merged = Counter()
        for _, _, c in self.segments:
            merged.update(c)
        if keep is not None:
            merged = Counter({x: n for x, n in merged.items() if keep(x)})
        self.segments = [(lo, hi, merged)]

    def rewrite_each(self, keep) -> None:
        self.segments = [
            (lo, hi, Counter({x: n for x, n in c.items() if keep(x)}))
            for lo, hi, c in self.segments
        ]

    def expire(self, keep_from: int) -> None:
        dropped = [s for s in self.segments if s[1] < keep_from]
        self.segments = [s for s in self.segments if s[1] >= keep_from]
        if dropped:
            hi = max(s[1] for s in dropped)
            self.expired_through = (
                hi
                if self.expired_through is None
                else max(self.expired_through, hi)
            )

    def current(self) -> Counter:
        total = Counter()
        for _, _, c in self.segments:
            total.update(c)
        return total

    def asof(self, n: int):
        """Counter, None (nothing to serve), or 'loud'."""
        if not self.segments:
            return None
        if self.expired_through is not None:
            return "loud"
        total, any_included = Counter(), False
        for lo, hi, c in self.segments:
            if hi <= n:
                total.update(c)
                any_included = True
            elif lo <= n:
                return "loud"
        return total if any_included else None


def _rows(df) -> Counter:
    return Counter(r["x"] for r in df.collect())


_OPS = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.lists(st.integers(0, 30), min_size=1, max_size=6),
        ),
        st.tuples(st.just("compact"), st.sampled_from([None, 2, 3])),
        st.tuples(st.just("rewrite"), st.sampled_from([2, 3, 5])),
        st.tuples(st.just("expire"), st.integers(0, 4)),
    ),
    min_size=2,
    max_size=6,
).filter(lambda ops: any(op[0] == "append" for op in ops))


@settings(max_examples=8, deadline=None)
@given(_OPS, st.integers(-1, 6))
def test_append_log_lifecycle_matches_model(spark, tmp_path_factory, ops, probe_n):
    """Any interleaving of the four lifecycle operations keeps the real
    log equal to the model: current() row multiset, last_committed, and
    the as-of contract (exact history, nothing-to-serve, or the loud
    SnapshotUnreadableError) after EVERY step."""
    root = tmp_path_factory.mktemp("plog")
    log = ParquetAppendLog(str(root / "log"), write_partitions=1)
    model = _Model()
    next_batch = 0
    for op in ops:
        kind, arg = op
        if kind == "append":
            df = spark.createDataFrame([(x,) for x in arg], "x long")
            log.append(df, next_batch)
            model.append(next_batch, arg)
            next_batch += 1
        elif kind == "compact":
            if arg is None:
                log.compact(spark)
                model.compact()
            else:
                k = arg
                log.compact(spark, transform=lambda d, k=k: d.filter(F.col("x") % k != 0))
                model.compact(keep=lambda x, k=k: x % k != 0)
        elif kind == "rewrite":
            k = arg
            log.rewrite_each(spark, lambda d, k=k: d.filter(F.col("x") % k != 0))
            model.rewrite_each(lambda x, k=k: x % k != 0)
        elif kind == "expire":
            log.expire(arg)
            model.expire(arg)
        # -- invariants after every step
        cur = log.current(spark)
        assert (Counter() if cur is None else _rows(cur)) == model.current()
        assert log.last_committed() == model.last_committed
        expect = model.asof(probe_n)
        if expect == "loud":
            with pytest.raises(SnapshotUnreadableError):
                log.current(spark, as_of_batch=probe_n)
        else:
            got = log.current(spark, as_of_batch=probe_n)
            if expect is None:
                assert got is None
            else:
                assert _rows(got) == expect
