"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The declarative ``session_window`` (aggregate.py) covers counting;
this operator carries ARBITRARY per-session state the built-in can't
express — running event count, value sum, first/last timestamps —
and emits one row per CLOSED session: on a stream, when the
inactivity gap expires via processing-time timeout; at end-of-stream
(availableNow) the final state flushes through the timeout path.

State per key (user_id): the OPEN session only — O(keys) memory, the
canonical keyed-state shape. Correctness is testable against the
batch lag-window sessionizer (entry_queries.q_events_sessionize): on
the same bounded input, closed+flushed sessions must agree exactly.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sv", T.DoubleType()),
    ]
)

_US = 1_000_000


def _session_step(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_s: int,
    flush_open: bool = False,
) -> Iterator[pd.DataFrame]:
    """One micro-batch step for one user: fold sorted events into the
    open session, emitting every session closed by a > gap hole."""
    user_id = key[0]
    closed: list[tuple[int, int, int, float]] = []

    if state.hasTimedOut:
        if state.exists:
            closed.append(tuple(state.get))
            state.remove()
    else:
        cur = tuple(state.get) if state.exists else None
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        ts_us = (batch["ts"].astype("int64") // 1000).to_numpy()  # ns→µs
        vals = batch["value"].to_numpy()
        for t, v in zip(ts_us, vals):
            t, v = int(t), float(v)
            if cur is None:
                cur = (t, t, 1, v)
            elif t - cur[1] > gap_s * _US:
                closed.append(cur)
                cur = (t, t, 1, v)
            else:
                cur = (cur[0], t, cur[2] + 1, cur[3] + v)
        if cur is not None:
            if flush_open:
                # batch mode: all of the key's data is in this one
                # call and timeouts never fire — emit the open
                # session so the result is complete
                closed.append(cur)
            else:
                state.update(cur)
                # close the open session once the gap elapses with no
                # new events (processing-time timeout)
                state.setTimeoutDuration(gap_s * 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [
                    dt.datetime.utcfromtimestamp(c[0] / _US) for c in closed
                ],
                "session_end": [
                    dt.datetime.utcfromtimestamp(c[1] / _US) for c in closed
                ],
                "n_events": [c[2] for c in closed],
                "sum_value": [c[3] for c in closed],
            }
        )


class _NoState:
    """Inert GroupState stand-in for batch execution (a batch group
    sees ALL its rows in one call, so there is nothing to carry)."""

    hasTimedOut = False
    exists = False
    get = None

    def update(self, *_):
        pass

    def remove(self):
        pass

    def setTimeoutDuration(self, *_):
        pass


def stateful_sessionize(
    events: DataFrame, gap_s: int = 1800, flush_open: bool = False
) -> DataFrame:
    """events(ts, user_id, event_id, value) → one row per closed
    session. On a STREAM: keyed state carries the open session across
    micro-batches (applyInPandasWithState) and sessions close on the
    inactivity timeout. On a BATCH DataFrame (where Spark forbids
    applyInPandasWithState) the SAME fold runs under applyInPandas —
    one call sees the whole group, so open sessions flush when
    ``flush_open`` — which makes the batch result an exact twin of
    the lag-window sessionizer oracle."""
    src = events.select("user_id", "event_id", "ts", "value")

    if not events.isStreaming:
        def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            key = (int(pdf["user_id"].iloc[0]),)
            out = list(_session_step(key, [pdf], _NoState(), gap_s, flush_open))
            if out:
                return out[0]
            return pd.DataFrame(
                {f.name: pd.Series(dtype=object) for f in OUT_SCHEMA.fields}
            )

        return src.groupBy("user_id").applyInPandas(batch_fn, OUT_SCHEMA)

    def step(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        yield from _session_step(key, pdfs, state, gap_s, flush_open)

    return src.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
