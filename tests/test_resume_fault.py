"""Checkpoint-resume under simulated mid-build failure (north_rule:
resumable from per-partition checkpoints with lineage + metrics)."""

import json
import shutil
from pathlib import Path

import pytest

from addok_spark.config import EngineConfig
from addok_spark.data.transcripts import transcripts_df
from addok_spark.index.build import build_index
from addok_spark.oracle.bm25_oracle import OracleIndex, oracle_search
from addok_spark.query.engine import Query, SearchEngine


@pytest.fixture()
def cfg():
    return EngineConfig(
        build_partitions=4, doc_bucket_bits=8, posting_block_size=32,
        common_threshold=400,
    )


def test_resume_after_partial_failure(spark, cfg, tmp_path):
    out = str(tmp_path / "idx")
    corpus = transcripts_df(spark, 15, seed=42)
    paths = build_index(spark, corpus, cfg, out)

    # simulate a crash after the 'analyzed' stage: later stages lost
    manifest = json.loads(paths.manifest.read_text())
    full_stages = dict(manifest["stages"])
    for stage, d in (
        ("blocks", paths.blocks),
        ("dictionary", paths.dictionary),
        ("prefixes", paths.prefixes),
        ("pairs", paths.pairs),
    ):
        manifest["stages"].pop(stage, None)
        shutil.rmtree(d, ignore_errors=True)
    paths.manifest.write_text(json.dumps(manifest))

    # resume: completes ONLY the missing stages (analyzed/docs kept)
    build_index(spark, corpus, cfg, out, resume=True)
    m2 = json.loads(paths.manifest.read_text())["stages"]
    assert m2["analyzed"] == full_stages["analyzed"]  # untouched
    assert m2["docs"] == full_stages["docs"]
    assert m2["blocks"]["rows"] == full_stages["blocks"]["rows"]
    assert m2["dictionary"]["rows"] == full_stages["dictionary"]["rows"]

    # the resumed index answers queries rank-identically to the oracle
    corpus_pdf = corpus.toPandas()
    oracle = OracleIndex(corpus_pdf, cfg)
    phrase = " ".join(corpus_pdf["text"].iloc[3].split()[:3])
    q = [Query(qid="r1", q=phrase, k=5)]
    got = SearchEngine(spark, paths, cfg).search(q).toPandas()
    want = oracle_search(oracle, q, cfg)
    assert list(got.sort_values("rank")["doc_index"]) == list(
        want.sort_values("rank")["doc_index"]
    )


def test_metrics_sidecars_exist(spark, cfg, tmp_path):
    """Per-snapshot metrics (lineage + counts) alongside each table
    (north_rule: 'metrics written alongside each Iceberg snapshot')."""
    out = str(tmp_path / "idx2")
    paths = build_index(spark, transcripts_df(spark, 8, seed=1), cfg, out)
    for d in (paths.docs, paths.blocks, paths.dictionary, paths.prefixes):
        side = Path(d) / "_metrics.json"
        assert side.exists(), d
        m = json.loads(side.read_text())
        assert m["rows"] > 0 and m["seconds"] >= 0
    meta = json.loads(paths.meta.read_text())
    assert meta["n_docs"] > 0 and "build_metrics" in meta
