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
