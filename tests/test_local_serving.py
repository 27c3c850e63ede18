"""Serving-tier rank identity: LocalSearchEngine (parquet-backed,
no Spark job per query — serving/local.py) must answer the reference
query set identically to the corpus-built oracle, and therefore (by
the rank-identity suite in test_query_engine.py) to the Spark engine.
"""

from pathlib import Path

import numpy as np
import pytest

from addok_spark.config import EngineConfig
from addok_spark.data.transcripts import (
    reference_queries,
    transcripts_df,
    transcripts_pdf,
)
from addok_spark.index.build import build_index
from addok_spark.oracle.bm25_oracle import OracleIndex, oracle_search
from addok_spark.query.engine import Query, SearchEngine
from addok_spark.serving.local import LocalSearchEngine

N_CONVS = 40


@pytest.fixture(scope="module")
def cfg():
    return EngineConfig(
        build_partitions=8,
        doc_bucket_bits=8,
        posting_block_size=64,
        common_threshold=400,
    )


@pytest.fixture(scope="module")
def corpus_pdf():
    return transcripts_pdf(N_CONVS, seed=42)


@pytest.fixture(scope="module")
def index_paths(spark, cfg, tmp_index_root, corpus_pdf):
    sdf = transcripts_df(spark, N_CONVS, seed=42)
    out = str(Path(tmp_index_root) / "serving_test")
    return build_index(spark, sdf, cfg, out)


@pytest.fixture(scope="module")
def server(index_paths, cfg):
    return LocalSearchEngine(index_paths, cfg)


@pytest.fixture(scope="module")
def oracle(corpus_pdf, cfg):
    return OracleIndex(corpus_pdf, cfg)


def _queries(corpus_pdf):
    qdf = reference_queries(corpus_pdf, n=36, seed=7)
    return [
        Query(qid=r.qid, q=r.q, k=int(r.k), autocomplete=(r.kind == "prefix"))
        for r in qdf.itertuples(index=False)
    ]


def _assert_identical(got, want, min_nonempty=0, score_rtol=0.0):
    got_g = {qid: g.sort_values("rank") for qid, g in got.groupby("qid")}
    want_g = {qid: g.sort_values("rank") for qid, g in want.groupby("qid")}
    assert set(got_g) == set(want_g), "queries answered differ"
    n_nonempty = 0
    for qid in sorted(want_g):
        g, w = got_g[qid], want_g[qid]
        assert list(g["doc_index"]) == list(w["doc_index"]), (
            f"{qid}: rank mismatch\nserve=\n{g}\nwant=\n{w}"
        )
        np.testing.assert_allclose(
            g["score"].to_numpy(), w["score"].to_numpy(), rtol=score_rtol,
            err_msg=f"{qid}: scores differ",
        )
        n_nonempty += 1
    assert n_nonempty >= min_nonempty


def test_serving_rank_identity_reference_set(server, oracle, corpus_pdf, cfg):
    """Full reference set (exact / case / typo / autocomplete /
    common / notfound) — ranks exact, scores bit-equal: the serving
    tier runs the same oracle_search spec over decoded parquet
    postings, so any drift means the on-disk index diverged."""
    queries = _queries(corpus_pdf)
    got = server.search(queries)
    want = oracle_search(oracle, queries, cfg)
    _assert_identical(got, want, min_nonempty=25, score_rtol=0.0)


def test_serving_matches_spark_engine(spark, index_paths, server, cfg, corpus_pdf):
    """Direct three-way anchor: a handful of queries through the
    Spark engine vs the serving tier over the SAME index files."""
    engine = SearchEngine(spark, index_paths, cfg)
    queries = _queries(corpus_pdf)[:8]
    got = server.search(queries)
    want = engine.search(queries).toPandas()
    _assert_identical(got, want, score_rtol=1e-9)


def test_serving_filters_and_autocomplete(server, oracle, corpus_pdf, cfg):
    words = corpus_pdf["text"].iloc[0].split()[:2]
    queries = [
        Query(qid="qf1", q=" ".join(words), k=10, filters={"role": ["user"]}),
        Query(qid="qf2", q=" ".join(words), k=10,
              filters={"role": ["user", "assistant"], "tool": ["python"]}),
        Query(qid="qf3", q=" ".join(words), k=10, filters={"role": ["nope"]}),
        Query(qid="qa1", q=words[0][:4], k=10, autocomplete=True),
    ]
    got = server.search(queries)
    want = oracle_search(oracle, queries, cfg)
    _assert_identical(got, want, score_rtol=0.0)
    if "qf1" in set(got["qid"]):
        roles = [
            server.index.doc(d)["role"] for d in got[got.qid == "qf1"]["doc_index"]
        ]
        assert set(roles) <= {"user"}


def test_serving_fast_matches_spec(index_paths, oracle, corpus_pdf, cfg):
    """The vectorized collection kernel (FastSearch.run_gids) must be
    bit-identical to the pure-dict spec flow over the same parquet
    index — including scan-mode, relaxation variants, and filter
    groups — and both must equal the corpus-built oracle."""
    fast = LocalSearchEngine(index_paths, cfg, mode="fast")
    spec = LocalSearchEngine(index_paths, cfg, mode="spec")
    queries = _queries(corpus_pdf) + [
        Query(qid="qsf", q="the of", k=10),
        Query(qid="qsf2", q="the of to and", k=10),
        Query(qid="qsff", q="the of", k=10, filters={"role": ["user"]}),
    ]
    got = fast.search(queries)
    want = spec.search(queries)
    _assert_identical(got, want, min_nonempty=25, score_rtol=0.0)
    _assert_identical(
        got, oracle_search(oracle, queries, cfg), score_rtol=0.0
    )


def test_serving_lazy_loading(index_paths, cfg):
    """A single query must fault in only its own expansion tokens,
    never the whole posting store (the at-scale contract)."""
    srv = LocalSearchEngine(index_paths, cfg)
    assert len(srv.index._blocks) == 0
    srv.search([Query(qid="q", q="error file", k=5)])
    assert 0 < len(srv.index._blocks) < max(10, len(srv.index.df) // 10)
    # doc partitions fetched only for candidate pbuckets
    n_pbuckets = {int(d) >> srv.index._doc_shift for d in range(srv.index.n_docs)}
    assert len(srv.index._doc_cache) <= len(n_pbuckets)


def test_serving_query_length_guard(server, cfg):
    with pytest.raises(ValueError):
        server.search([Query(qid="qlong", q="x " * 200, k=5)])


def test_serving_empty_result(server):
    out = server.search([Query(qid="qx", q="zzzz qqqq xxxx", k=5)])
    assert len(out) == 0


def test_serving_http_local_backend(index_paths, cfg, corpus_pdf):
    """The HTTP layer duck-types the serving tier: same contract,
    no Spark session behind the socket."""
    import json
    import urllib.request

    from addok_spark.http_api import serve_background

    srv_engine = LocalSearchEngine(index_paths, cfg)
    srv, port = serve_background(srv_engine)
    try:
        words = "+".join(corpus_pdf["text"].iloc[0].split()[:2])
        r = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/search/?q={words}&limit=5", timeout=60
        )
        body = json.loads(r.read())
        assert r.status == 200
        assert len(body["hits"]) <= 5
        if body["hits"]:
            assert body["hits"][0]["rank"] == 1
            assert "text" in body["hits"][0]
    finally:
        srv.shutdown()


def test_serving_refresh_after_cdc(spark, tmp_path):
    """A CDC batch rewrites index partitions; refresh() must make the
    warm server see it (deleted doc gone, new doc findable)."""
    from addok_spark.config import FieldSpec
    from addok_spark.index.incremental import apply_actions

    cdc_cfg = EngineConfig(
        fields=(FieldSpec("text", 1.0), FieldSpec("tool", 4.0)),
        build_partitions=4,
        doc_bucket_bits=2,
        pbucket_shift=1,
        posting_block_size=2,
        common_threshold=1000,
    )
    rows = [
        ("conv-a", 0, "user", "rue des Lilas", None, 0.5),
        ("conv-a", 1, "assistant", "avenue des Champs", "grep", 0.5),
        ("conv-b", 0, "user", "boulevard Voltaire", None, 0.25),
        ("conv-b", 1, "tool", "rue du General", "bash", 0.25),
    ]
    corpus = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double"
    )
    paths = build_index(spark, corpus, cdc_cfg, str(tmp_path / "cdc_idx"))
    srv = LocalSearchEngine(paths, cdc_cfg)
    before = srv.search([Query(qid="q", q="lilas", k=5)])
    assert len(before) == 1

    changes = spark.createDataFrame(
        [
            ("conv-a", 0, "user", "rue des Lilas", None, 0.5, "delete"),
            ("conv-c", 0, "user", "impasse Mimosas", None, 0.9, "index"),
        ],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, importance double, _action string",
    )
    apply_actions(spark, paths, changes, cdc_cfg)
    # stale caches still answer the old index; refresh picks up CDC
    srv.refresh()
    assert len(srv.search([Query(qid="q1", q="lilas", k=5)])) == 0
    after = srv.search([Query(qid="q2", q="mimosas", k=5)])
    assert list(after["conv_id"]) == ["conv-c"]


def test_serving_get_by_natural_key(server, corpus_pdf):
    """≙ Result.from_id (reference test_search.py:567-570): direct
    doc fetch by (conv_id, turn_idx) without a search."""
    row = corpus_pdf.iloc[5]
    got = server.get(row["conv_id"], int(row["turn_idx"]))
    assert got is not None
    assert got["text"] == row["text"]
    assert got["role"] == row["role"]
    assert server.get("conv-does-not-exist", 0) is None


def test_serving_sharded_rank_identity(spark, tmp_index_root, corpus_pdf):
    """Horizontal-scaling evidence: a coordinator over pbucket-range
    shards (scatter-gather posting reads, doc fetches routed to the
    owning shard) must be rank-identical to the unsharded server —
    pbucket is the high bits of doc_index, so shard-order concat IS
    the global doc order. The index layout here forces MANY pbuckets
    (doc_bucket_bits=2, pbucket_shift=1 → 8 docs per pbucket) so
    every shard provably owns real postings — a coarse layout would
    park the whole small corpus in shard 0 and prove nothing."""
    shard_cfg = EngineConfig(
        build_partitions=8,
        doc_bucket_bits=2,
        pbucket_shift=1,
        posting_block_size=16,
        common_threshold=400,
    )
    sdf = transcripts_df(spark, N_CONVS, seed=42)
    paths = build_index(
        spark, sdf, shard_cfg, str(Path(tmp_index_root) / "sharded_test")
    )
    single = LocalSearchEngine(paths, shard_cfg)
    sharded = LocalSearchEngine(paths, shard_cfg, shards=3)
    assert len(sharded.index.shards) == 3
    queries = _queries(corpus_pdf) + [
        Query(qid="shf", q="error file", k=10, filters={"role": ["user"]}),
    ]
    got = sharded.search(queries)
    want = single.search(queries)
    _assert_identical(got, want, min_nonempty=25, score_rtol=0.0)
    # every shard actually decoded nonempty postings (its pbucket
    # range holds real docs)
    served = [
        sum(int(tb.n.sum()) for tb in sh._blocks.values())
        for sh in sharded.index.shards
    ]
    assert all(n > 0 for n in served), served
    # and the sharded engine agrees with the corpus oracle too
    want_o = oracle_search(OracleIndex(corpus_pdf, shard_cfg), queries, shard_cfg)
    _assert_identical(got, want_o, score_rtol=0.0)


def test_serving_scan_blockmax_partial_decode(spark, tmp_index_root, corpus_pdf):
    """Manual-scan mode with block-max pruning: identity with the
    pure-dict spec flow under a config where EVERY query group is
    'common' (intersect_limit=50), plus direct scan_top_docs
    equivalence against a brute-force reduce — including boost-tied
    blocks, where the stop rule must keep decoding equal-upper-bound
    blocks for the doc-index tie-break."""
    scan_cfg = EngineConfig(
        build_partitions=8,
        doc_bucket_bits=8,
        posting_block_size=16,
        common_threshold=30,
        intersect_limit=50,
        scan_limit=60,
    )
    sdf = transcripts_df(spark, N_CONVS, seed=42)
    paths = build_index(
        spark, sdf, scan_cfg, str(Path(tmp_index_root) / "scan_test")
    )
    fast = LocalSearchEngine(paths, scan_cfg, mode="fast")
    spec = LocalSearchEngine(paths, scan_cfg, mode="spec")
    queries = [
        Query(qid="sc1", q="the of", k=10),
        Query(qid="sc2", q="the of to and", k=10),
        Query(qid="sc3", q="error file", k=10),
        Query(qid="sc4", q="the of", k=10, filters={"role": ["user"]}),
    ]
    got = fast.search(queries)
    want = spec.search(queries)
    _assert_identical(got, want, min_nonempty=3, score_rtol=0.0)

    # direct probe equivalence vs brute force, on a common token
    idx = LocalSearchEngine(paths, scan_cfg).index
    tok = max(idx.df, key=lambda t: idx.df[t])
    for limit in (5, 60, 10_000):
        got_docs = idx.scan_top_docs([tok], limit)
        docs, _, boosts = idx._token_arrays(tok)
        bo = boosts.astype(np.float64)
        top = np.lexsort((docs, -bo))[:limit]
        want_docs = np.sort(docs[top])
        assert np.array_equal(got_docs, want_docs), (tok, limit)

    # pruning actually happened for a small probe limit on a fresh
    # store (no full decode yet)
    fresh = LocalSearchEngine(paths, scan_cfg).index
    fresh.scan_top_docs([tok], 5)
    tb = fresh._blocks[tok]
    assert tb.n_blocks > 3
    assert 0 < tb.blocks_decoded < tb.n_blocks, (
        tb.blocks_decoded, tb.n_blocks
    )


def test_serving_trace_and_bounded_caches(index_paths, cfg):
    """Per-query trace (latency, result rows, tokens faulted) and
    LRU-bounded caches — a serving node's working set must not grow
    without bound at 10^12 turns."""
    from addok_spark.serving.local import _LRU

    srv = LocalSearchEngine(index_paths, cfg)
    srv.search([Query(qid="t1", q="error file", k=5),
                Query(qid="t2", q="zzzz qqqq", k=5)])
    assert [e["qid"] for e in srv.last_trace] == ["t1", "t2"]
    assert srv.last_trace[0]["rows"] >= 0
    assert srv.last_trace[0]["tokens_faulted"] > 0
    assert srv.last_trace[0]["seconds"] >= 0

    lru = _LRU(3)
    for i in range(10):
        lru[i] = i
    assert len(lru) == 3 and set(lru) == {7, 8, 9}
    lru[8] = 80  # re-insert does not evict
    assert set(lru) == {7, 8, 9}


def test_serving_without_side_tables(spark, tmp_path, corpus_pdf):
    """An index built without prefixes/pairs (the reference's
    mass-import shape, ngrams deferred) must still serve: autocomplete
    degrades to no expansions, fuzzy to presence-only — same as the
    Spark engine's behavior on the same index."""
    bare_cfg = EngineConfig(
        build_partitions=4,
        doc_bucket_bits=8,
        posting_block_size=64,
        common_threshold=400,
        build_prefixes=False,
        build_pairs=False,
    )
    sdf = transcripts_df(spark, 10, seed=42)
    paths = build_index(spark, sdf, bare_cfg, str(tmp_path / "bare_idx"))
    srv = LocalSearchEngine(paths, bare_cfg)
    assert srv.index._prefix_ds is None and srv.index._pairs_ds is None
    assert srv.index.have_pairs is False
    words = corpus_pdf["text"].iloc[0].split()[:3]
    r = srv.search([
        Query(qid="b1", q=" ".join(words), k=5),
        Query(qid="b2", q=words[0][:4], k=5, autocomplete=True),
        Query(qid="b3", q=words[0][:-1] + "x " + words[1], k=5),  # typo
    ])
    assert len(r[r.qid == "b1"]) > 0
    # and the Spark engine agrees on the same bare index
    eng = SearchEngine(spark, paths, bare_cfg)
    for qid, q in [("b1", " ".join(words))]:
        got = eng.search([Query(qid=qid, q=q, k=5)]).toPandas()
        want = r[r.qid == qid]
        assert list(got["doc_index"]) == list(want["doc_index"])


def test_serving_preload_hot(index_paths, cfg, oracle, corpus_pdf):
    eng = LocalSearchEngine(index_paths, cfg)
    n = eng.preload(25)
    assert n == 25
    # the 25 highest-df tokens' blocks are resident before any query
    hot = sorted(
        eng.index.df.items(), key=lambda kv: (-kv[1], kv[0])
    )[:25]
    assert all(eng.index._blocks.get(t) is not None for t, _ in hot)
    # results are unchanged by preloading
    q = Query(qid="p", q="the model output", k=5)
    got = eng.search([q])
    want = oracle_search(oracle, [q], cfg)
    assert list(got["doc_index"]) == list(want["doc_index"])
    # n larger than the vocabulary preloads everything and stops
    assert eng.preload(10**9) == len(eng.index.df)
    # sharded coordinator preloads every shard's slice
    sharded = LocalSearchEngine(index_paths, cfg, shards=2)
    assert sharded.preload(10) == 10
    got2 = sharded.search([q])
    assert list(got2["doc_index"]) == list(want["doc_index"])


def test_lru_concurrent_hits_are_safe():
    """ADVICE r4 (medium): the serving caches are shared across
    ThreadingHTTPServer request threads; the LRU hit path is a
    delete+reinsert that raced before the per-cache lock (loser's
    delitem → KeyError → HTTP 500). Hammer one hot key plus churn
    from many threads: no exception, size stays bounded, the hot key
    survives."""
    import threading

    from addok_spark.serving.local import _LRU

    lru = _LRU(maxsize=64)
    lru["hot"] = "v"
    errors = []
    stop = threading.Event()

    def hammer(tid):
        try:
            i = 0
            while not stop.is_set():
                assert lru.get("hot") in ("v", None)
                _ = lru.get(("miss", tid, i))
                lru[("churn", tid, i % 100)] = i
                lru["hot"] = "v"
                _ = lru["hot"]
                i += 1
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=hammer, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    import time as _time

    _time.sleep(1.5)
    stop.set()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(lru) <= 64
    assert lru.get("hot") == "v"


def test_sharded_rebalance_after_cdc(spark, tmp_path):
    """VERDICT r4 #8: after a CDC batch grows the pbucket space, a
    sharded coordinator's refresh() must RE-SHARD (bounds recomputed
    from the new doc count), keep every shard owning real postings,
    and stay rank-identical to an unsharded server over the new
    snapshot — old docs and the appended batch both served."""
    from addok_spark.config import FieldSpec
    from addok_spark.index.incremental import apply_actions

    cfg = EngineConfig(
        fields=(FieldSpec("text", 1.0), FieldSpec("tool", 4.0)),
        build_partitions=4,
        doc_bucket_bits=2,
        pbucket_shift=1,   # 8 docs per pbucket: many pbuckets
        posting_block_size=4,
        common_threshold=1000,
    )
    rows = [
        (f"conv-{i:03d}", 0, "user", f"alpha tok{i:03d} omega", None, 0.1)
        for i in range(32)
    ]
    schema = ("conv_id string, turn_idx int, role string, text string,"
              " tool string, importance double")
    corpus = spark.createDataFrame(rows, schema)
    paths = build_index(spark, corpus, cfg, str(tmp_path / "reshard"))
    srv = LocalSearchEngine(paths, cfg, shards=3)
    bounds_before = list(srv.index._bounds)
    assert len(srv.search([Query(qid="a", q="alpha tok001", k=5)])) > 0

    # append a batch that DOUBLES the doc space → max pbucket grows
    new_rows = [
        (f"conv-{i:03d}", 0, "user", f"beta new{i:03d} gamma", None, 0.3,
         "index")
        for i in range(32, 64)
    ]
    apply_actions(
        spark, paths,
        spark.createDataFrame(new_rows, schema + ", _action string"),
        cfg,
    )
    srv.refresh()
    bounds_after = list(srv.index._bounds)
    assert bounds_after != bounds_before, "shard bounds must rebalance"
    assert len(srv.index.shards) == 3
    # every shard owns real postings in the rebalanced layout
    qs = [
        Query(qid="old", q="alpha tok001", k=10),
        Query(qid="new", q="beta new050", k=10),
        Query(qid="mix", q="alpha omega", k=10),
        Query(qid="mix2", q="beta gamma", k=10),
    ]
    got = srv.search(qs)
    served = [
        sum(int(tb.n.sum()) for tb in sh._blocks.values())
        for sh in srv.index.shards
    ]
    assert all(n > 0 for n in served), served
    # rank identity with a fresh unsharded server on the new snapshot
    single = LocalSearchEngine(paths, cfg)
    want = single.search(qs)
    got_t = [tuple(r) for r in got[["qid", "conv_id", "turn_idx"]].values]
    want_t = [tuple(r) for r in want[["qid", "conv_id", "turn_idx"]].values]
    assert got_t == want_t
    assert np.allclose(got["score"].values, want["score"].values)
    assert ("new", "conv-050", 0) in got_t
    assert ("old", "conv-001", 0) in got_t
