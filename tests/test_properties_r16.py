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


def _ceil_rank_q(counts: list[int], q: float) -> int:
    import math

    hist = sorted(Counter(counts).items())
    k = math.ceil(q * len(counts))
    cum = 0
    for v, c in hist:
        cum += c
        if cum >= k:
            return v
    return hist[-1][0]


_FP_CASES = st.tuples(
    st.lists(  # postings: (clip, word) — clip ids 0..11, word ids 0..9
        st.tuples(st.integers(0, 11), st.integers(0, 9)),
        min_size=8,
        max_size=40,
    ),
    st.sets(st.integers(0, 11), max_size=4),  # forget manifest
    st.integers(0, 3),  # expire horizon
)


@settings(max_examples=4, deadline=None)
@given(_FP_CASES)
def test_fp_window_matches_model(spark, tmp_path_factory, case):
    """run_fp_maintenance_window against a pure-python model on random
    posting tables: retained index, exact stats (== rebuild over
    retained), the ceil-rank cap from POST-forget stats, and the
    post-window hot set must all match; the calibration guard firing
    is mirrored by the model's band check."""
    from dwh_spark.operators.caps import CapCalibrationError, band_split
    from dwh_spark.streaming.maintenance import run_fp_maintenance_window

    postings, forget, keep_from = case
    root = tmp_path_factory.mktemp("fpw")
    index_store = ParquetAppendLog(str(root / "idx"), write_partitions=1)
    stats_store = ParquetAppendLog(str(root / "st"), write_partitions=1)
    # 3 batches by clip id band
    batches = [
        [(c, i, w) for i, (c, w) in enumerate(postings) if c % 3 == b]
        for b in range(3)
    ]
    for b, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows or [(None, None, None)], "audio_id long, pos long, sub32 long"
        )
        if not rows:
            df = df.filter(F.lit(False))
        index_store.append(df, b)
        stats_store.append(
            df.groupBy("sub32").agg(F.count("*").alias("df")), b
        )
    fids = spark.createDataFrame(
        [(c,) for c in sorted(forget)] or [(None,)], "audio_id long"
    )
    if not forget:
        fids = fids.filter(F.lit(False))

    # the model
    surv = [(c, i, w) for b, rows in enumerate(batches) for c, i, w in rows
            if c not in forget]
    pf_counts = list(Counter(w for _, _, w in surv).values())
    retained = [
        (c, i, w)
        for b, rows in enumerate(batches)
        for c, i, w in rows
        if c not in forget and b >= keep_from
    ]
    if not pf_counts:
        # every posting forgotten: the post-forget stats merge is empty
        # and the calibration raises its empty-stats ValueError loudly
        with pytest.raises(ValueError):
            run_fp_maintenance_window(
                spark, index_store, stats_store,
                forgotten_ids=fids, expire_keep_from=keep_from,
            )
        return
    hist = sorted(Counter(pf_counts).items())
    qv = _ceil_rank_q(pf_counts, 0.99)
    guard_top = band_split(hist)
    if guard_top is not None and qv > guard_top:
        with pytest.raises(CapCalibrationError):
            run_fp_maintenance_window(
                spark, index_store, stats_store,
                forgotten_ids=fids, expire_keep_from=keep_from,
            )
        return
    rep = run_fp_maintenance_window(
        spark, index_store, stats_store,
        forgotten_ids=fids, expire_keep_from=keep_from,
    )
    assert rep.cap == 4 * qv
    got_index = sorted(
        (r["audio_id"], r["pos"], r["sub32"])
        for r in (index_store.current(spark) or spark.createDataFrame(
            [], "audio_id long, pos long, sub32 long")).collect()
    ) if index_store.current(spark) is not None else []
    assert got_index == sorted(retained)
    model_stats = Counter(w for _, _, w in retained)
    cur_stats = stats_store.current(spark)
    got_stats = {
        r["sub32"]: r["df"]
        for r in cur_stats.groupBy("sub32").agg(F.sum("df").alias("df")).collect()
        if r["df"] and r["df"] > 0
    } if cur_stats is not None else {}
    assert got_stats == dict(model_stats)
    assert rep.hot_words == sorted(
        w for w, c in model_stats.items() if c > rep.cap
    )
    assert rep.rows_forgotten == sum(
        1 for c, _, _ in (
            (c, i, w) for rows in batches for c, i, w in rows
        ) if c in forget
    )
