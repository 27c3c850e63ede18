"""Streaming windowed/session aggregation: stream results must equal
the batch twin on the same data (stream-batch parity), plus synonyms
end-to-end through the engine."""

import json

import pytest

from pyspark.sql import functions as F

from addok_spark.streaming.aggregate import (
    run_stream_to_memory,
    session_windows,
    windowed_turn_counts,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string,"
    " tool string, ts timestamp"
)


@pytest.fixture()
def stream_dir(tmp_path):
    rows = [
        ("c1", 0, "user", "hello", None, "2026-01-01T00:05:00"),
        ("c1", 1, "assistant", "hi", None, "2026-01-01T00:06:00"),
        ("c1", 2, "user", "later", None, "2026-01-01T01:10:00"),
        ("c2", 0, "user", "other", None, "2026-01-01T00:20:00"),
        ("c2", 1, "tool", "out", "bash", "2026-01-01T02:30:00"),
    ]
    p = tmp_path / "src"
    p.mkdir()
    (p / "batch1.json").write_text(
        "\n".join(
            json.dumps(
                dict(zip(["conv_id", "turn_idx", "role", "text", "tool", "ts"], r))
            )
            for r in rows
        )
    )
    return str(p)


def test_windowed_counts_stream_equals_batch(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).json(stream_dir)
    q = run_stream_to_memory(
        windowed_turn_counts(stream), "win_counts", str(tmp_path / "ck1")
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["role"]): r["n"]
        for r in spark.sql("select * from win_counts").collect()
    }
    batch = spark.read.schema(SCHEMA).json(stream_dir)
    want = {
        (str(r["window_start"]), r["role"]): r["n"]
        for r in windowed_turn_counts(batch).collect()
    }
    assert got == want
    assert got[("2026-01-01 00:00:00", "user")] == 2


def test_session_windows_stream_equals_batch(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).json(stream_dir)
    q = run_stream_to_memory(
        session_windows(stream), "sessions", str(tmp_path / "ck2")
    )
    q.awaitTermination(120)
    got = sorted(
        (r["conv_id"], r["n_events"])
        for r in spark.sql("select * from sessions").collect()
    )
    batch = spark.read.schema(SCHEMA).json(stream_dir)
    want = sorted(
        (r["conv_id"], r["n_events"]) for r in session_windows(batch).collect()
    )
    assert got == want
    # c1: turns at 00:05/00:06 (one session) + 01:10 (new session)
    assert got.count(("c1", 2)) == 1 and got.count(("c1", 1)) == 1


def test_synonyms_end_to_end(spark, tmp_path):
    """Synonym expansion at index AND query time (reference
    text.py:112-133 semantics through the whole engine)."""
    from addok_spark.config import EngineConfig
    from addok_spark.data.transcripts import transcripts_pdf
    from addok_spark.functions.text import load_synonyms
    from addok_spark.index.build import build_index
    from addok_spark.oracle.bm25_oracle import OracleIndex, oracle_search
    from addok_spark.query.engine import Query, SearchEngine

    syn = load_synonyms(["bd, blvd => boulevard", "18e => dix huitieme"])
    cfg = EngineConfig(
        build_partitions=4, doc_bucket_bits=8, posting_block_size=16,
        common_threshold=400, synonyms=syn,
    )
    rows = [
        ("conv-x", 0, "user", "le blvd Voltaire", None, 0.5),
        ("conv-x", 1, "user", "le boulevard Haussmann", None, 0.5),
        ("conv-y", 0, "user", "la rue du 18e", None, 0.2),
    ]
    sdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double"
    )
    paths = build_index(spark, sdf, cfg, str(tmp_path / "syn_idx"))
    engine = SearchEngine(spark, paths, cfg)
    import pandas as pd

    oracle = OracleIndex(pd.DataFrame(rows, columns=[
        "conv_id", "turn_idx", "role", "text", "tool", "importance"
    ]), cfg)
    queries = [
        Query(qid="q1", q="bd voltaire", k=5),       # bd → boulevard
        Query(qid="q2", q="dix huitieme rue", k=5),  # matches 18e doc
    ]
    got = engine.search(queries).toPandas()
    want = oracle_search(oracle, queries, cfg)
    g1 = got[got.qid == "q1"].sort_values("rank")
    assert list(g1["turn_idx"])[:1] == [0] and list(g1["conv_id"])[:1] == ["conv-x"]
    g2 = got[got.qid == "q2"].sort_values("rank")
    assert list(g2["conv_id"])[:1] == ["conv-y"]
    for qid in ("q1", "q2"):
        assert list(got[got.qid == qid].sort_values("rank")["doc_index"]) == list(
            want[want.qid == qid].sort_values("rank")["doc_index"]
        )
