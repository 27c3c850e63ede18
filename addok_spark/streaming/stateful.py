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

import numpy as np
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


def _fold_sorted_runs(gap_s: int, flush_open: bool):
    """mapInPandas fn for BATCH execution: rows arrive sorted by
    (user_id, ts, event_id) within the partition; fold them into
    sessions with ONE (user, open-session) carry across Arrow batches.

    Bounded-memory by construction — no task ever materializes a
    user's full history (the applyInPandas twin this replaces pulled
    the whole group into one pandas frame, which a power user breaks
    at scale). Per batch the fold is vectorized: gap/user breaks via
    array compare, per-segment sums via ``np.add.reduceat``
    (pairwise association — within ~1e-13 relative of the
    event-at-a-time fold in _session_step, absorbed by the oracle's
    6-dp rounding); the carry-continuing first segment folds
    element-wise."""
    gap_us = gap_s * _US

    def _emit(rows: list[tuple[int, int, int, int, float]]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": np.array([r[0] for r in rows], dtype=np.int64),
                "session_start": pd.to_datetime(
                    [r[1] for r in rows], unit="us"
                ),
                "session_end": pd.to_datetime(
                    [r[2] for r in rows], unit="us"
                ),
                "n_events": np.array([r[3] for r in rows], dtype=np.int64),
                "sum_value": np.array([r[4] for r in rows], dtype=np.float64),
            }
        )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: tuple[int, int, int, int, float] | None = None
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            uids = pdf["user_id"].to_numpy()
            ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
            vals = pdf["value"].to_numpy(dtype=np.float64)
            brk = np.empty(n, dtype=bool)
            brk[0] = True
            if n > 1:
                brk[1:] = (uids[1:] != uids[:-1]) | (
                    ts_us[1:] - ts_us[:-1] > gap_us
                )
            starts = np.flatnonzero(brk)
            ends = np.append(starts[1:], n)
            seg_uid = uids[starts].astype(np.int64)
            seg_start = ts_us[starts].copy()
            seg_end = ts_us[ends - 1]
            seg_n = (ends - starts).astype(np.int64)
            seg_sum = np.add.reduceat(vals, starts)
            head: list[tuple[int, int, int, int, float]] = []
            if carry is not None:
                if (
                    int(seg_uid[0]) == carry[0]
                    and int(ts_us[0]) - carry[2] <= gap_us
                ):
                    # first segment continues the carried session:
                    # element-wise fold keeps float order identical
                    s = carry[4]
                    for v in vals[: ends[0]]:
                        s += float(v)
                    seg_start[0] = carry[1]
                    seg_n[0] += carry[3]
                    seg_sum[0] = s
                else:
                    # carry terminated — by a same-user gap (closed)
                    # or by a user change (user's final open session)
                    if int(seg_uid[0]) == carry[0] or flush_open:
                        head.append(carry)
            # segments followed by a SAME-user segment closed on a
            # gap; a user-change boundary means the user's last
            # session, emitted only under flush_open
            k = len(starts)
            if flush_open:
                emit = np.ones(k - 1, dtype=bool)
            else:
                emit = seg_uid[1:] == seg_uid[:-1]
            idx = np.flatnonzero(emit)
            carry = (
                int(seg_uid[-1]), int(seg_start[-1]), int(seg_end[-1]),
                int(seg_n[-1]), float(seg_sum[-1]),
            )
            if head or len(idx):
                body = pd.DataFrame(
                    {
                        "user_id": seg_uid[idx],
                        "session_start": pd.to_datetime(
                            seg_start[idx], unit="us"
                        ),
                        "session_end": pd.to_datetime(
                            seg_end[idx], unit="us"
                        ),
                        "n_events": seg_n[idx],
                        "sum_value": seg_sum[idx],
                    }
                )
                yield pd.concat(
                    [_emit(head), body], ignore_index=True
                ) if head else body
        if carry is not None and flush_open:
            yield _emit([carry])

    return run


def stateful_sessionize(
    events: DataFrame, gap_s: int = 1800, flush_open: bool = False
) -> DataFrame:
    """events(ts, user_id, event_id, value) → one row per closed
    session. On a STREAM: keyed state carries the open session across
    micro-batches (applyInPandasWithState) and sessions close on the
    inactivity timeout. On a BATCH DataFrame (where Spark forbids
    applyInPandasWithState) the same semantics run as a sort-merge
    streaming fold (``_fold_sorted_runs``) whose memory is bounded by
    the Arrow batch size, never by a user's history; open sessions
    flush when ``flush_open``, making the batch result an exact twin
    of the lag-window sessionizer oracle."""
    src = events.select("user_id", "event_id", "ts", "value")

    if not events.isStreaming:
        # sort-merge streaming fold: repartition by user then sort
        # each partition (external, spill-safe) so every user's
        # events form one contiguous sorted run — the fold then
        # carries a single open session across Arrow batches
        return (
            src.repartition("user_id")
            .sortWithinPartitions("user_id", "ts", "event_id")
            .mapInPandas(_fold_sorted_runs(gap_s, flush_open), OUT_SCHEMA)
        )

    def step(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        yield from _session_step(key, pdfs, state, gap_s, flush_open)

    return src.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
