"""Phrase-mode queries (Query.phrase): candidates are docs whose
analyzed token stream contains the query tokens CONSECUTIVELY in
order, counted per positional anchor, then scored by the normal BM25
pipeline. Three-way identity: Spark engine ≡ corpus oracle ≡ warm
serving tier (fast and sharded) over the same index files.

NB positions are one continuous counter across indexed fields (the
build's analyzer semantics), so all surfaces agree on boundaries.
"""

from pathlib import Path

import pandas as pd
import pytest

from addok_spark.config import EngineConfig, FieldSpec
from addok_spark.index.build import build_index
from addok_spark.oracle.bm25_oracle import OracleIndex, oracle_search
from addok_spark.query.engine import Query, SearchEngine
from addok_spark.serving.local import LocalSearchEngine

DOCS = [
    # conv_id, text, role
    ("d-ab", "alpha beta gamma delta", "user"),
    ("d-ba", "beta alpha gamma delta", "assistant"),
    ("d-2x", "alpha beta filler alpha beta tail", "user"),
    ("d-far", "alpha filler filler beta", "user"),
    ("d-dup", "alpha beta alpha common common", "assistant"),
    ("d-common", "common common common words here", "user"),
    ("d-c2", "words common here common", "user"),
]


@pytest.fixture(scope="module")
def env(spark, tmp_index_root):
    pdf = pd.DataFrame(
        {
            "conv_id": [d[0] for d in DOCS],
            "turn_idx": 0,
            "role": [d[2] for d in DOCS],
            "text": [d[1] for d in DOCS],
            "tool": None,
            "ts": pd.Timestamp("2026-01-01"),
            "importance": 0.0,
        }
    )
    cfg = EngineConfig(
        fields=(FieldSpec("text", 1.0),),
        build_partitions=2,
        doc_bucket_bits=2,
        pbucket_shift=1,
        posting_block_size=4,
        common_threshold=1000,
    )
    out = str(Path(tmp_index_root) / "phrase_mode")
    paths = build_index(spark, spark.createDataFrame(pdf), cfg, out)
    return {
        "engine": SearchEngine(spark, paths, cfg),
        "oracle": OracleIndex(pdf, cfg),
        "serving": LocalSearchEngine(paths, cfg),
        "sharded": LocalSearchEngine(paths, cfg, shards=3),
        "cfg": cfg,
        "pdf": pdf,
    }


def _run(env, queries):
    got_e = env["engine"].search(queries).toPandas()
    want = oracle_search(env["oracle"], queries, env["cfg"])
    got_s = env["serving"].search(queries)
    got_sh = env["sharded"].search(queries)
    for name, got in [("engine", got_e), ("serving", got_s), ("sharded", got_sh)]:
        gg = {q: list(g.sort_values("rank")["doc_index"])
              for q, g in got.groupby("qid")}
        ww = {q: list(g.sort_values("rank")["doc_index"])
              for q, g in want.groupby("qid")}
        assert gg == ww, f"{name} diverges:\n{got}\n{want}"
    return want


def _ids(frame, pdf, qid):
    sub = frame[frame.qid == qid].sort_values("rank")
    return [pdf.iloc[int(d)]["conv_id"] for d in sub["doc_index"]]


def test_phrase_matches_only_consecutive_in_order(env):
    pdf_sorted = env["pdf"].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = _run(env, [
        Query(qid="p1", q="alpha beta", k=10, phrase=True),
        Query(qid="p2", q="beta alpha", k=10, phrase=True),
        Query(qid="p3", q="alpha beta gamma", k=10, phrase=True),
    ])
    ids1 = set(_ids(want, pdf_sorted, "p1"))
    assert ids1 == {"d-ab", "d-2x", "d-dup"}          # not d-ba / d-far
    ids2 = set(_ids(want, pdf_sorted, "p2"))
    assert ids2 == {"d-ba", "d-dup"}                  # "beta alpha" in d-dup
    ids3 = set(_ids(want, pdf_sorted, "p3"))
    assert ids3 == {"d-ab"}


def test_phrase_occurrence_count_orders_candidates(env):
    pdf_sorted = env["pdf"].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = _run(env, [Query(qid="p", q="common", k=10, phrase=True)])
    # single-token phrase: occurrences = tf; d-common (tf 3) collects
    # first, but ordering of RESULTS is BM25 — just assert the set
    assert set(_ids(want, pdf_sorted, "p")) == {"d-common", "d-c2", "d-dup"}


def test_phrase_with_duplicate_tokens(env):
    pdf_sorted = env["pdf"].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = _run(env, [Query(qid="p", q="alpha beta alpha", k=10, phrase=True)])
    assert set(_ids(want, pdf_sorted, "p")) == {"d-dup"}


def test_phrase_absent_token_and_no_match(env):
    want = _run(env, [
        Query(qid="p1", q="alpha zzzznotfound", k=10, phrase=True),
        Query(qid="p2", q="gamma beta", k=10, phrase=True),  # never adjacent
    ])
    assert len(want) == 0


def test_phrase_with_filters(env):
    pdf_sorted = env["pdf"].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = _run(env, [
        Query(qid="p", q="alpha beta", k=10, phrase=True,
              filters={"role": ["assistant"]}),
    ])
    assert set(_ids(want, pdf_sorted, "p")) == {"d-dup"}


def test_phrase_mixed_with_normal_queries_in_one_batch(env):
    pdf_sorted = env["pdf"].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = _run(env, [
        Query(qid="n1", q="beta alpha", k=10),                # normal: bag
        Query(qid="p1", q="beta alpha", k=10, phrase=True),   # phrase: order
    ])
    assert set(_ids(want, pdf_sorted, "n1")) >= {"d-ab", "d-ba", "d-2x", "d-dup"}
    assert set(_ids(want, pdf_sorted, "p1")) == {"d-ba", "d-dup"}


def test_phrase_rare_pruned_path_identical(env, spark, tmp_index_root):
    """The rarest-token doc conjunction + broadcast semi-join (the
    100-TB bound, engaged above prune_min_postings) must be
    result-identical to the decode-everything path on the same
    index — forced open here with a zero floor."""
    import dataclasses

    from pathlib import Path

    cfg = dataclasses.replace(env["cfg"], prune_min_postings=0)
    eng = SearchEngine(spark, str(Path(tmp_index_root) / "phrase_mode"), cfg)
    queries = [
        Query(qid="p1", q="alpha beta", k=10, phrase=True),
        Query(qid="p2", q="common here", k=10, phrase=True),
        Query(qid="p3", q="alpha beta gamma", k=10, phrase=True),
        Query(qid="p4", q="common here", k=10, phrase=True,
              filters={"role": ["user"]}),
    ]
    pruned = eng.search(queries).toPandas()
    want = oracle_search(env["oracle"], queries, env["cfg"])
    gg = {q: list(g.sort_values("rank")["doc_index"])
          for q, g in pruned.groupby("qid")}
    ww = {q: list(g.sort_values("rank")["doc_index"])
          for q, g in want.groupby("qid")}
    assert gg == ww
    # tiny-volume batches skip the extra rare-decode job entirely
    cfg_off = dataclasses.replace(env["cfg"], prune_min_postings=10**9)
    eng_off = SearchEngine(
        spark, str(Path(tmp_index_root) / "phrase_mode"), cfg_off
    )
    off = eng_off.search(queries).toPandas()
    assert {q: list(g.sort_values("rank")["doc_index"])
            for q, g in off.groupby("qid")} == ww


def test_serving_restricted_position_decode_identical(env):
    """token_position_arrays(within_docs=...) (block-granular decode
    restriction, the serving twin of the engine's rare-token
    conjunction) must equal full-decode-then-slice on every token,
    on both the unsharded and the sharded index — and the
    whole-phrase LRU must return independent copies."""
    import numpy as np

    for srv in (env["serving"], env["sharded"]):
        idx = srv.index
        rare_docs, _ = idx.token_position_arrays("gamma")
        rare_docs = np.unique(rare_docs)
        assert len(rare_docs)
        for tok in ("alpha", "beta", "common", "gamma"):
            full_d, full_p = idx.token_position_arrays(tok)
            m = np.isin(full_d, rare_docs)
            got_d, got_p = idx.token_position_arrays(
                tok, within_docs=rare_docs
            )
            o = np.lexsort((got_p, got_d))
            w = np.lexsort((full_p[m], full_d[m]))
            assert np.array_equal(got_d[o], full_d[m][w])
            assert np.array_equal(got_p[o], full_p[m][w])
        # restricted reads bypass the per-token memo: a later full
        # decode must still return the complete stream
        idx_fresh_d, _ = idx.token_position_arrays("common")
        assert len(idx_fresh_d) >= len(rare_docs) or len(idx_fresh_d)

    fs = env["serving"]._searcher
    r1 = fs.phrase_occurrences(["alpha", "beta"])
    assert r1
    r1[99999] = 1  # caller mutation must not poison the memo
    r2 = fs.phrase_occurrences(["alpha", "beta"])
    assert 99999 not in r2
    assert fs.phrase_occurrences(["alpha", "beta"]) == r2
