"""Distributed bulk retrieval (pipelines/retrieval.py): top-k BM25
per query-table row, df-banded query tokens, self-exclusion,
partition invariance."""

import pytest
from pyspark.sql import functions as F

from addok_spark.pipelines.retrieval import retrieval_topk

DOCS = [
    # doc 0 is the query; docs 1-2 share its rare tokens, 3 only
    # shares the ubiquitous "common" token
    (0, "zebra quagga common alpha"),
    (1, "zebra quagga common beta"),
    (2, "zebra common gamma delta"),
    (3, "common epsilon zeta eta"),
    (4, "common theta iota kappa"),
    (5, "common lambda mu nu"),
    (6, "common xi omicron pi"),
    (7, "common rho sigma tau"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _run(spark, docs, **kw):
    qids = spark.createDataFrame([(0,)], "qid long")
    return retrieval_topk(
        docs, "doc_id", "text", qids, k=5, min_df=2, max_df_frac=0.5, **kw
    ).toPandas().sort_values("rank")


def test_ranking_and_self_exclusion(spark, docs):
    out = _run(spark, docs)
    assert list(out["qid"].unique()) == [0]
    assert 0 not in set(out["doc_id"]), "query doc must be excluded"
    # doc 1 shares both rare tokens (zebra, quagga) -> rank 1;
    # doc 2 shares only zebra -> rank 2
    assert list(out["doc_id"][:2]) == [1, 2]
    assert out.iloc[0]["n_terms"] == 2
    # "common" (df=8 of 8 docs > max_df_frac) generates no candidates:
    # docs 3-7 match nothing
    assert set(out["doc_id"]) == {1, 2}


def test_partition_invariance(spark, docs):
    a = _run(spark, docs.repartition(1))
    b = _run(spark, docs.repartition(7))
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_include_self_ranks_first(spark, docs):
    out = _run(spark, docs, exclude_self=False)
    assert int(out.iloc[0]["doc_id"]) == 0, "query doc is its own best match"


def test_lm_dirichlet_scorer(spark, docs):
    """Query-likelihood LM (Dirichlet): same candidate semantics as
    BM25 — doc 1 (both rare terms) outranks doc 2 (one) — plus
    partition invariance, and the dl-penalty term is present (scores
    differ from BM25's)."""
    qids = spark.createDataFrame([(0,)], "qid long")

    def run(d):
        return retrieval_topk(
            d, "doc_id", "text", qids, k=5, min_df=2, max_df_frac=0.5,
            scorer="lm_dirichlet",
        ).toPandas().sort_values("rank")

    out = run(docs)
    assert list(out["doc_id"][:2]) == [1, 2]
    assert set(out["doc_id"]) == {1, 2}
    a = run(docs.repartition(1)).reset_index(drop=True)
    b = run(docs.repartition(7)).reset_index(drop=True)
    assert a.equals(b)
    bm = retrieval_topk(
        docs, "doc_id", "text", qids, k=5, min_df=2, max_df_frac=0.5
    ).toPandas().sort_values("rank")
    assert list(out["score"]) != list(bm["score"])


def test_unknown_scorer_raises(spark, docs):
    qids = spark.createDataFrame([(0,)], "qid long")
    with pytest.raises(ValueError, match="scorer"):
        retrieval_topk(docs, "doc_id", "text", qids, scorer="nope")


def test_hybrid_rrf_fuses_both_lists(spark):
    """RRF semantics: a doc ranked well in BOTH lists beats a doc
    ranked equally well in only one; absence from a list is encoded
    rank 0 and contributes nothing to the fused score."""
    from addok_spark.pipelines.retrieval import hybrid_rrf_topk

    # corpus: doc 100 lexically AND semantically close to query 0;
    # doc 200 only lexically close; doc 300 only semantically close
    docs = spark.createDataFrame(
        [
            (0, "quantum flux capacitor drives temporal engine"),
            (100, "quantum flux capacitor powers temporal engine"),
            (200, "quantum flux capacitor drives temporal engine"),
            (300, "completely different words about gardening soil"),
            (400, "unrelated filler text concerning cooking recipes"),
        ],
        "doc_id long, text string",
    )
    base = [1.0] + [0.0] * 7

    def vec(*overrides):
        v = list(base)
        for i, x in overrides:
            v[i] = x
        return [float(y) for y in v]

    emb = spark.createDataFrame(
        [
            (0, vec()),
            (100, vec((1, 0.1))),          # near the query vector
            (200, vec((0, -1.0))),         # opposite: semantically far
            (300, vec((1, 0.05))),         # near the query vector
            (400, vec((0, -1.0), (2, 1.0))),
        ],
        "vec_id long, embedding array<float>",
    )
    qids = docs.filter(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("qid")
    )
    out = hybrid_rrf_topk(
        docs, "doc_id", "text", emb, "vec_id", "embedding", qids,
        k=4, pool=3, max_df_frac=1.0,
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    assert 0 not in rows  # self excluded from both lists
    # doc 100 is in both lists → highest fused score
    assert rows[100]["lex_rank"] > 0 and rows[100]["sem_rank"] > 0
    assert min(rows, key=lambda d: rows[d]["rank"]) == 100
    # single-list docs carry rank 0 on the missing side
    assert rows[300]["lex_rank"] == 0 and rows[300]["sem_rank"] > 0
    # fused ordering: both-lists doc beats one-list docs
    assert rows[100]["rrf_score"] > rows[300]["rrf_score"]


def test_prf_expansion_retrieves_vocabulary_mismatch(spark):
    """The RM3 point: a document sharing NO query tokens but sharing
    the feedback docs' vocabulary is reachable after expansion.
    Query doc 0 says 'automobile'; feedback docs pair 'automobile'
    with 'engine'; doc 30 only says 'engine' — invisible to plain
    BM25, retrieved by PRF."""
    from addok_spark.pipelines.retrieval import (
        retrieval_prf_topk, retrieval_topk,
    )

    rows = [(0, "automobile repair manual guide")]
    # feedback docs: share query terms AND carry the expansion term
    for i in (10, 11, 12):
        rows.append((i, "automobile repair engine overhaul notes"))
    # the vocabulary-mismatch target: expansion term only
    rows.append((30, "engine overhaul procedure steps"))
    # background noise so df stats are sane
    for i in range(40, 52):
        rows.append((i, f"unrelated filler topic{i} words here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qids = docs.filter(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("qid")
    )
    plain = retrieval_topk(
        docs, "doc_id", "text", qids, k=10, max_df_frac=1.0, min_df=2
    ).collect()
    assert 30 not in {r["doc_id"] for r in plain}
    prf = retrieval_prf_topk(
        docs, "doc_id", "text", qids, k=10, pool=3, n_expand=3,
        alpha=0.5, max_df_frac=1.0, min_df=2,
    ).collect()
    assert 30 in {r["doc_id"] for r in prf}
    # feedback docs still outrank the expansion-only doc
    by_id = {r["doc_id"]: r["rank"] for r in prf}
    assert by_id[10] < by_id[30]
