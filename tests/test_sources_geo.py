"""Source loaders (S1-S5) and geo scalar ops (T14/T15)."""

import math

import pytest

from pyspark.sql import functions as F

from addok_spark.functions.geo import haversine_km, km_to_score
from addok_spark.sources import load_csv, load_ndjson, load_msgpack, valid_rows


def test_ndjson_loader_with_corrupt_rows(spark, tmp_path):
    p = tmp_path / "docs.ndjson"
    p.write_text(
        '{"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello world"}\n'
        "this is not json\n"
        '{"conv_id": "c1", "turn_idx": 1, "role": "tool", "text": "output", "tool": "bash"}\n'
        '{"turn_idx": 9, "text": "missing key"}\n'
    )
    raw = load_ndjson(spark, str(p))
    ok = valid_rows(raw)
    assert raw.count() == 4
    assert ok.count() == 2
    assert {r["conv_id"] for r in ok.collect()} == {"c1"}


def test_csv_loader(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "conv_id,turn_idx,role,text,tool,ts,importance,_action\n"
        'c2,0,user,"rue des lilas",,,0.5,\n'
        'c2,1,assistant,"answer text",grep,,0.5,index\n'
    )
    df = valid_rows(load_csv(spark, str(p)))
    rows = {(r["conv_id"], r["turn_idx"]): r for r in df.collect()}
    assert rows[("c2", 1)]["tool"] == "grep"
    assert rows[("c2", 0)]["text"] == "rue des lilas"


def test_msgpack_codec_roundtrip():
    from addok_spark.msgpack_codec import packb, unpack_stream

    objs = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "héllo " * 10, "tool": None, "importance": 0.25,
         "nested": [1, -5, 2.5, True, b"\x00\x01", {"k": "v"}]},
        "bare string",
        12345678901234,
        -129,
        [None, False] * 20,             # array16
        {str(i): i for i in range(20)},  # map16
        "x" * 300,                       # str16
    ]
    blob = b"".join(packb(o) for o in objs)
    assert list(unpack_stream(blob)) == objs


def test_msgpack_loader(spark, tmp_path):
    """S2: concatenated msgpack maps → typed rows; non-map records
    and truncated tails land in _corrupt_record."""
    from addok_spark.msgpack_codec import packb

    d = tmp_path / "mp"
    d.mkdir()
    good = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "hello msgpack", "tool": None,
         "ts": "2026-01-01T00:00:00", "importance": 0.5},
        {"conv_id": "c1", "turn_idx": 1, "role": "tool",
         "text": "grep output", "tool": "grep",
         "ts": "2026-01-01T00:00:01", "importance": 0.25},
    ]
    (d / "a.msgpack").write_bytes(
        b"".join(packb(o) for o in good) + packb("not a map")
    )
    (d / "b.msgpack").write_bytes(packb(good[0])[:-3])  # truncated
    df = load_msgpack(spark, str(d)).toPandas()
    ok = df[df["_corrupt_record"].isnull()].sort_values("turn_idx")
    assert list(ok["conv_id"]) == ["c1", "c1"]
    assert list(ok["text"]) == ["hello msgpack", "grep output"]
    assert str(ok["ts"].iloc[0]).startswith("2026-01-01")
    bad = df[df["_corrupt_record"].notnull()]
    assert len(bad) == 2  # the non-map record + the truncated file
    vr = valid_rows(load_msgpack(spark, str(d)))
    assert vr.count() == 2


def test_haversine_paris_london(spark):
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    km = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("km")
    ).collect()[0]["km"]
    assert km == pytest.approx(343.5, abs=2.0)  # Paris-London ≈ 344 km


def test_km_to_score_decay(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (150.0,)], "km double")
    scores = [
        r["s"] for r in df.select(km_to_score(F.col("km")).alias("s")).orderBy("km").collect()
    ]
    assert scores[0] == pytest.approx(1.0)
    assert scores[1] == pytest.approx(math.exp(-1.0))
    assert scores[2] == 0.0
