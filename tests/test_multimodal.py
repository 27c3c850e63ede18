"""Multimodal column plumbing: schema, batching, deterministic stub
decode, byte-aware repartitioning (decode itself is stubbed — no
media libs in this environment)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from addok_spark.pipelines import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.synthetic_media(spark, n=60, seed=11)
    df.persist()
    df.count()
    return df


def test_media_schema(media):
    assert media.schema == mm.MEDIA_SCHEMA
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_feature_extraction_deterministic(spark, media):
    f1 = mm.extract_features(media).orderBy("media_id").collect()
    f2 = mm.extract_features(media.repartition(7)).orderBy("media_id").collect()
    assert len(f1) == 60
    for a, b in zip(f1, f2):
        assert a["media_id"] == b["media_id"]
        assert a["payload_sha"] == b["payload_sha"]  # content-addressed
        assert a["feature"] == b["feature"]          # partition-invariant
        assert len(a["feature"]) == 8
        assert a["n_bytes"] > 0


def test_feature_matches_local_stub(spark, media):
    row = media.filter(F.col("media_id") == 0).collect()[0]
    want = mm.deterministic_fake_decoder(row["kind"], bytes(row["payload"]))
    got = (
        mm.extract_features(media.filter(F.col("media_id") == 0))
        .collect()[0]["feature"]
    )
    assert np.allclose(got, want)


def test_media_repartition_bounds_bytes(spark, media):
    out = mm.media_repartition(media, target_mb=1)
    assert out.rdd.getNumPartitions() >= 1
    assert out.count() == 60


def test_custom_decoder_hook(spark, media):
    mm.set_decoder(lambda kind, b: np.zeros(8, dtype=np.float32))
    try:
        feats = mm.extract_features(media.limit(3)).collect()
        assert all(all(v == 0.0 for v in r["feature"]) for r in feats)
    finally:
        mm.set_decoder(None)
