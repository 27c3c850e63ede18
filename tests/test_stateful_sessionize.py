"""Custom stateful operator (applyInPandasWithState): gap-based
sessionization with per-session running aggregates. Batch-mode result
must match the lag-window sessionizer on the sf0.001 events table;
stream-mode state must span micro-batches."""

import json

import pytest

from pyspark.sql import functions as F

from addok_spark.streaming.stateful import stateful_sessionize

SF_DIR = "/root/testdata/sf0.001"


def test_batch_matches_lag_window_sessionizer(spark):
    from addok_spark.entry_queries import q_events_sessionize

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = (
        stateful_sessionize(ev, gap_s=1800, flush_open=True)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        q_events_sessionize(spark, SF_DIR)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    assert got[["user_id", "n_sessions", "n_events"]].equals(
        want[["user_id", "n_sessions", "n_events"]]
    )


def test_stream_state_spans_microbatches(spark, tmp_path):
    """A session whose events arrive in two different micro-batches
    must still be folded into ONE session (keyed state carries the
    open session across batches)."""
    src = tmp_path / "ev_src"
    src.mkdir()

    def write(fname, rows):
        (src / fname).write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n"
        )

    # user 1: batch-1 events at t=0,10min; batch-2 event at t=20min
    # (same session: every hop < 30min) then t=2h (new session, which
    # CLOSES the first one)
    write("b1.json", [
        {"event_id": 1, "ts": "2026-01-01T00:00:00", "user_id": 1,
         "event_type": "click", "value": 1.0},
        {"event_id": 2, "ts": "2026-01-01T00:10:00", "user_id": 1,
         "event_type": "click", "value": 2.0},
    ])
    write("b2.json", [
        {"event_id": 3, "ts": "2026-01-01T00:20:00", "user_id": 1,
         "event_type": "click", "value": 3.0},
        {"event_id": 4, "ts": "2026-01-01T02:00:00", "user_id": 1,
         "event_type": "click", "value": 4.0},
    ])
    schema = (
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .json(str(src))
    )
    out = stateful_sessionize(stream, gap_s=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_out ORDER BY session_start").collect()
    # the first session (3 events across two micro-batches) is closed
    # by the 02:00 event; the 02:00 session stays open in state
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1
    assert r["n_events"] == 3
    assert r["sum_value"] == pytest.approx(6.0)
    assert str(r["session_start"]).startswith("2026-01-01 00:00:00")
    assert str(r["session_end"]).startswith("2026-01-01 00:20:00")


def test_batch_fold_bounded_across_arrow_batches(spark):
    """Power-user shape: ONE user whose 50k-event history spans many
    Arrow batches (maxRecordsPerBatch=1000) — the sort-merge fold must
    carry the open session across batch boundaries and never needs
    the whole group in memory. Results checked against a local
    sequential fold."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    n = 50_000
    rng = np.random.default_rng(7)
    # ~1% of steps exceed the 1800s gap -> a few hundred sessions
    steps = np.where(rng.random(n - 1) < 0.01, 2000, 60)
    ts_s = np.concatenate([[0], np.cumsum(steps)]) + 1_700_000_000
    pdf = pd.DataFrame(
        {
            "user_id": np.int64(42),
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts_s, unit="s"),
            "value": rng.random(n),
        }
    )
    # local sequential reference fold
    sessions = []
    cur = None
    for t, v in zip(ts_s, pdf["value"].to_numpy()):
        if cur is None or t - cur[1] > 1800:
            if cur is not None:
                sessions.append(cur)
            cur = [int(t), int(t), 1, float(v)]
        else:
            cur[1] = int(t)
            cur[2] += 1
            cur[3] += float(v)
    sessions.append(cur)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
    try:
        got = (
            stateful_sessionize(
                spark.createDataFrame(pdf), gap_s=1800, flush_open=True
            )
            .toPandas()
            .sort_values("session_start")
            .reset_index(drop=True)
        )
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    assert len(got) == len(sessions) > 100
    assert int(got["n_events"].sum()) == n
    np.testing.assert_array_equal(
        got["n_events"].to_numpy(), [s[2] for s in sessions]
    )
    # reduceat segment sums associate differently than the
    # event-at-a-time fold: equal to ~1e-13 relative, which the
    # oracle's round-to-6dp absorbs
    np.testing.assert_allclose(
        got["sum_value"].to_numpy(), [s[3] for s in sessions], rtol=1e-9
    )
    assert (
        got["session_start"].astype("int64") // 10**9
    ).tolist() == [s[0] for s in sessions]
