"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's indexer is itself a stateful stream consumer: it folds
each message into mutable per-entity state as it arrives
(`x/indexer/indexer.go:167-198`). ``foreachBatch`` + MERGE (ingest.py)
is the table-sink form; this module is the operator form — state lives
in the streaming state store, keyed by entity, surviving across
micro-batches and restarts via the checkpoint.

Used here for a running per-user activity accumulator (count / value
sum / last-seen), the shape that generalizes to: session aggregates,
fraud counters, rate limits, online feature stores.

Scale notes: state is partitioned by the grouping key across
executors; each micro-batch shuffles only that batch's rows to their
key's partition. State size is O(distinct keys), not O(events). Use
watermark-based state TTL (``GroupStateTimeout.EventTimeTimeout``) when
keys churn, or the store grows forever.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("sum_cents", LongType()),
    StructField("last_ts", TimestampType()),
    # persisted (not derived per batch): an all-late micro-batch must
    # re-emit the prior last_type, not NULL it out
    StructField("last_type", StringType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_cents", LongType()),
    StructField("last_ts", TimestampType()),
    StructField("last_type", StringType()),
])


def _accumulate(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this batch's events for one user into running state and
    emit the updated row. Deterministic: batch rows are folded by
    (ts, event_id) order, and money accumulates as integer CENTS, so
    replay (or a different batch split) produces bit-identical totals —
    float summation order would drift."""
    if state.exists:
        n, total, last_ts, last_type = state.get
    else:
        n, total, last_ts, last_type = 0, 0, None, None
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        n += len(pdf)
        total += int((pdf["value"].fillna(0.0) * 100).round().astype("int64").sum())
        batch_last = pdf["ts"].iloc[-1]
        # micro-batches need not arrive in event-time order (file-source
        # batch boundaries are physical): advance last-seen only forward
        if last_ts is None or batch_last > last_ts:
            last_ts = batch_last
            last_type = pdf["event_type"].iloc[-1]
    state.update((n, total, last_ts, last_type))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_cents": [total],
            "last_ts": [last_ts],
            "last_type": [last_type],
        }
    )


def running_user_state(events: DataFrame) -> DataFrame:
    """Streaming per-user accumulator: one output row per user per
    micro-batch with the running totals (update semantics)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EVICTED_SCHEMA = StructType(
    OUTPUT_SCHEMA.fields + [StructField("evicted", StringType())]
)


def running_user_state_with_ttl(events: DataFrame, ttl_ms: int) -> DataFrame:
    """The accumulator with event-time state TTL: a key idle past
    ``ttl_ms`` of WATERMARK progress is evicted (final row emitted with
    ``evicted='ttl'``, state removed). This is the production form —
    without a timeout the state store is O(all keys ever seen) and
    grows forever; with it, state is O(keys active within the TTL
    horizon). ``events`` must carry a watermark (event-time timeouts
    are measured against it)."""

    def _acc(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, total, last_ts, last_type = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]], "n_events": [n], "sum_cents": [total],
                    "last_ts": [last_ts], "last_type": [last_type],
                    "evicted": ["ttl"],
                }
            )
            return
        out = list(_accumulate(key, pdfs, state))
        # TTL measured from the key's OWN last event time — anchoring on
        # the current watermark would evict keys that are still active
        # (the watermark lags a batch; an active key's freshly-set
        # timeout could land behind the very next watermark advance).
        # Clamped above the watermark: setTimeoutTimestamp rejects
        # timestamps at or below it.
        _, _, last_ts, _ = state.get
        deadline = int(last_ts.timestamp() * 1000) + ttl_ms
        state.setTimeoutTimestamp(max(deadline, state.getCurrentWatermarkMs() + 1))
        for pdf in out:
            pdf["evicted"] = None
            yield pdf

    return events.groupBy("user_id").applyInPandasWithState(
        _acc,
        outputStructType=EVICTED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
