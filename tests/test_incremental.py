"""CDC (_action index/update/delete) tests — the analog of the
reference's batch/deindex golden tests
(``/root/reference/tests/test_batch.py:8-29``,
``tests/test_index_utils.py:94-167``: update replaces postings,
delete leaves no orphans) plus streaming ingestion."""

import json
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from addok_spark.config import EngineConfig, FieldSpec
from addok_spark.index.build import build_index
from addok_spark.index.incremental import apply_actions, stream_transcripts
from addok_spark.query.engine import Query, SearchEngine


@pytest.fixture()
def cfg():
    return EngineConfig(
        fields=(FieldSpec("text", 1.0), FieldSpec("tool", 4.0)),
        build_partitions=4,
        doc_bucket_bits=2,
        pbucket_shift=1,
        posting_block_size=2,
        common_threshold=1000,
    )


def _corpus(spark):
    rows = [
        ("conv-a", 0, "user", "rue des Lilas", None, 0.5),
        ("conv-a", 1, "assistant", "avenue des Champs", "grep", 0.5),
        ("conv-b", 0, "user", "boulevard Voltaire", None, 0.25),
        ("conv-b", 1, "tool", "rue du General", "bash", 0.25),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double"
    )


@pytest.fixture()
def built(spark, cfg, tmp_path):
    out = str(tmp_path / "idx")
    return build_index(spark, _corpus(spark), cfg, out)


def _tokens(spark, paths):
    return {
        r["token"]: r["df"]
        for r in spark.read.parquet(paths.dictionary).collect()
    }


def test_delete_leaves_no_orphans(spark, cfg, built):
    changes = spark.createDataFrame(
        [("conv-a", 0, "user", "rue des Lilas", None, 0.5, "delete")],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double, _action string",
    )
    m = apply_actions(spark, built, changes, cfg)
    assert m["deletes"] == 1
    d = _tokens(spark, built)
    assert "lilas" not in d           # only doc with 'lilas' is gone
    assert d["rue"] == 1              # conv-b/1 still has it
    docs = spark.read.parquet(built.docs)
    assert docs.count() == 3
    assert docs.filter(
        (F.col("conv_id") == "conv-a") & (F.col("turn_idx") == 0)
    ).count() == 0
    # prefix table follows the dictionary
    pfx = spark.read.parquet(built.prefixes)
    assert pfx.filter(F.col("token") == "lilas").count() == 0
    meta = json.loads(built.meta.read_text())
    assert meta["n_docs"] == 3


def test_update_replaces_postings(spark, cfg, built):
    changes = spark.createDataFrame(
        [("conv-a", 0, "user", "place de la Concorde", None, 0.5, "update")],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double, _action string",
    )
    old_idx = {
        (r["conv_id"], r["turn_idx"]): r["doc_index"]
        for r in spark.read.parquet(built.docs).collect()
    }
    apply_actions(spark, built, changes, cfg)
    d = _tokens(spark, built)
    assert "lilas" not in d and "concorde" in d
    new_idx = {
        (r["conv_id"], r["turn_idx"]): r["doc_index"]
        for r in spark.read.parquet(built.docs).collect()
    }
    assert new_idx == old_idx  # update keeps doc ids (stable ordering)


def test_insert_appends_and_searchable(spark, cfg, built):
    changes = spark.createDataFrame(
        [
            ("conv-c", 0, "user", "jardin du Luxembourg", None, 0.9, "index"),
            ("conv-c", 1, "tool", "jardin des Tuileries", "bash", 0.9, None),
        ],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double, _action string",
    )
    m = apply_actions(spark, built, changes, cfg)
    assert m["upserts"] == 2
    docs = spark.read.parquet(built.docs)
    assert docs.count() == 6
    ids = [
        r["doc_index"]
        for r in docs.orderBy("conv_id", "turn_idx").collect()
    ]
    assert ids == sorted(ids) and len(set(ids)) == 6  # dense-ish, ordered
    eng = SearchEngine(spark, built, cfg)
    res = eng.search([Query(qid="q", q="jardin luxembourg", k=5)]).toPandas()
    assert list(res["conv_id"])[0] == "conv-c"
    assert list(res["turn_idx"])[0] == 0


def test_pairs_follow_cdc(spark, cfg, built):
    """Pairs (co-occurrence) must be re-derived after CDC: edges from
    deleted docs disappear, edges from new docs appear (otherwise the
    relation round uses stale edges)."""

    def pairset():
        return {
            (r["token_a"], r["token_b"])
            for r in spark.read.parquet(built.pairs).collect()
        }

    assert ("des", "lilas") in pairset()  # from conv-a/0
    changes = spark.createDataFrame(
        [
            ("conv-a", 0, "user", "rue des Lilas", None, 0.5, "delete"),
            ("conv-d", 0, "user", "quai branly musee", None, 0.3, "index"),
        ],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double, _action string",
    )
    apply_actions(spark, built, changes, cfg)
    ps = pairset()
    assert ("des", "lilas") not in ps          # stale edge gone
    assert ("branly", "quai") in ps            # new doc's edges present


def test_last_action_per_key_is_deterministic(spark, cfg, built):
    """A micro-batch carrying index THEN delete for one key must
    resolve by the sequence column (_seq), not row luck."""
    changes = spark.createDataFrame(
        [
            ("conv-a", 1, "assistant", "replaced text one", "grep", 0.5, "index", 1),
            ("conv-a", 1, "assistant", "replaced text two", "grep", 0.5, "delete", 2),
        ],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double, _action string, _seq int",
    )
    m = apply_actions(spark, built, changes, cfg)
    assert m["deletes"] == 1 and m["upserts"] == 0
    docs = spark.read.parquet(built.docs)
    assert docs.filter(
        (F.col("conv_id") == "conv-a") & (F.col("turn_idx") == 1)
    ).count() == 0


def test_streaming_foreachbatch(spark, cfg, built, tmp_path):
    """File-source micro-batches → foreachBatch(apply_actions)."""
    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (src / "b1.json").write_text(
        json.dumps(
            {
                "conv_id": "conv-z", "turn_idx": 0, "role": "user",
                "text": "streaming ingestion works", "tool": None,
                "importance": 0.1, "_action": "index",
            }
        )
        + "\n"
    )
    schema = (
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double, _action string"
    )
    stream = spark.readStream.schema(schema).json(str(src))
    q = stream_transcripts(spark, stream, built, cfg, ckpt, trigger_once=True)
    q.awaitTermination(120)
    d = _tokens(spark, built)
    assert "streaming" in d and "ingestion" in d
    eng = SearchEngine(spark, built, cfg)
    res = eng.search([Query(qid="s", q="streaming ingestion", k=3)]).toPandas()
    assert list(res["conv_id"])[0] == "conv-z"
