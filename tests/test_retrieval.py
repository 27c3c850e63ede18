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
