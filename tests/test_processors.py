"""Pluggable token-processor chain (cfg.token_processors ≙ the
reference's PROCESSORS pipeline, addok/config/default.py:51-56 +
helpers/__init__.py:40-61): import_by_path resolution, analyzer
semantics, and four-way consistency — the processor must apply
identically at index build (Arrow analyzer), query planning, oracle
and serving, or a stemmed index would be queried unstemmed."""

import json
from pathlib import Path

import pandas as pd
import pytest

from addok_spark.config import EngineConfig
from addok_spark.functions.text import (
    analyze_series,
    analyze_str,
    apply_processors,
    import_by_path,
)
from addok_spark.oracle.bm25_oracle import OracleIndex, oracle_search
from addok_spark.query.engine import Query, SearchEngine


def test_import_by_path():
    # ≙ reference tests/test_utils.py:14-16
    assert import_by_path("json.dumps") is json.dumps
    assert import_by_path("json") is json

    def fn():
        return 1

    assert import_by_path(fn) is fn  # pass-through for callables


def _stem(tokens):
    """Naive plural stemmer: strip a trailing s from long tokens."""
    return [t[:-1] if t.endswith("s") and len(t) > 3 else t for t in tokens]


def _dedup(tokens):
    seen = set()
    return [t for t in tokens if not (t in seen or seen.add(t))]


def test_apply_processors_order_and_analyzer():
    assert apply_processors(["tools", "tools"], (_stem, _dedup)) == ["tool"]
    # chain order matters: dedup-then-stem keeps both pre-stem uniques
    assert apply_processors(["tool", "tools"], (_dedup, _stem)) == [
        "tool", "tool"
    ]
    assert analyze_str("Tools and tools!", processors=(_stem, _dedup)) == [
        "tool", "and"
    ]
    got = analyze_series(
        pd.Series(["Tools and tools!"]), processors=(_stem, _dedup)
    )
    assert got.iloc[0] == ["tool", "and"]
    # empty processors = unchanged analyzer
    assert analyze_str("Tools and tools!") == ["tools", "and", "tools"]


@pytest.fixture(scope="module")
def stem_setup(spark, tmp_index_root):
    from addok_spark.index.build import build_index

    # nested def, not the module-level _stem: cloudpickle serializes
    # closures by VALUE, so the processor ships inside the analyzer
    # UDF without the test module being importable on executors
    # (production configs use dotted paths into real packages)
    def stem(tokens):
        return [t[:-1] if t.endswith("s") and len(t) > 3 else t for t in tokens]

    cfg = EngineConfig(
        build_partitions=4,
        doc_bucket_bits=8,
        posting_block_size=64,
        common_threshold=400,
        build_pairs=False,
        token_processors=(stem,),
    )
    rows = [
        ("c0", 0, "user", "please list the available tools", None, 0.5),
        ("c0", 1, "assistant", "three tools are installed here", None, 0.6),
        ("c1", 0, "user", "what is a tool anyway", None, 0.4),
        ("c1", 1, "assistant", "a tool automates one task", None, 0.3),
        ("c2", 0, "user", "unrelated weather conversation", None, 0.2),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "role", "text", "tool", "importance"],
    )
    sdf = spark.createDataFrame(pdf)
    out = str(Path(tmp_index_root) / "procs_test")
    paths = build_index(spark, sdf, cfg, out)
    return cfg, pdf, paths


def test_processor_applies_at_index_and_query_time(spark, stem_setup):
    cfg, pdf, paths = stem_setup
    eng = SearchEngine(spark, paths, cfg)
    # "tool" and "tools" are ONE stemmed term now: a singular query
    # must match plural docs (and vice versa)
    got = eng.search([
        Query(qid="a", q="tool installed", k=5),
        Query(qid="b", q="tools task", k=5),
    ]).toPandas()
    a = got[got.qid == "a"]
    assert list(a.sort_values("rank")["conv_id"])[:1] == ["c0"]
    assert set(got[got.qid == "b"]["conv_id"]) >= {"c1"}
    # oracle agrees rank-identically (same processors via same cfg)
    oracle = OracleIndex(pdf, cfg)
    want = oracle_search(
        oracle,
        [Query(qid="a", q="tool installed", k=5),
         Query(qid="b", q="tools task", k=5)],
        cfg,
    )
    for qid in ("a", "b"):
        g = got[got.qid == qid].sort_values("rank")
        w = want[want.qid == qid].sort_values("rank")
        assert list(g["conv_id"]) == list(w["conv_id"])
        assert list(g["turn_idx"]) == list(w["turn_idx"])


def test_processor_applies_in_serving(stem_setup):
    from addok_spark.serving.local import LocalSearchEngine

    cfg, _, paths = stem_setup
    srv = LocalSearchEngine(str(paths.root), cfg)
    got = srv.search([Query(qid="a", q="tool installed", k=5)])
    assert list(got.sort_values("rank")["conv_id"])[:1] == ["c0"]
