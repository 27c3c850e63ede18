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


def test_msgpack_stub():
    with pytest.raises(NotImplementedError):
        load_msgpack(None, "x")


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
