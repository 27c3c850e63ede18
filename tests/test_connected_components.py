"""Large-star/small-star connected components: log-round convergence
on an adversarial duplicate *chain* (diameter = n, the case that
breaks label propagation), multi-component labeling, and determinism
across partition counts."""

import pytest

from addok_spark.pipelines.dedup import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df, **kw)
    return {(r.id, r.cluster_id) for r in out.collect()}


def test_chain_converges_in_log_rounds(spark):
    # path 0-1-2-...-40: diameter 40, but max_iter=8 must suffice
    # (large/small-star halves star depth per round)
    edges = [(i, i + 1) for i in range(40)]
    got = _cc(spark, edges, max_iter=8)
    assert got == {(i, 0) for i in range(41)}


def test_multiple_components_and_edge_order(spark):
    edges = [(5, 3), (3, 9), (20, 21), (7, 7), (21, 20), (100, 50)]
    got = _cc(spark, edges)
    assert got == {
        (3, 3), (5, 3), (9, 3),
        (20, 20), (21, 20),
        (50, 50), (100, 50),
    }


def test_partition_invariance(spark):
    edges = [(i, i + 1) for i in range(0, 30, 2)]  # 15 two-node comps
    df1 = spark.createDataFrame(edges, "id_a long, id_b long").repartition(1)
    df7 = spark.createDataFrame(edges, "id_a long, id_b long").repartition(7)
    a = {(r.id, r.cluster_id) for r in connected_components(df1).collect()}
    b = {(r.id, r.cluster_id) for r in connected_components(df7).collect()}
    assert a == b
    assert a == {(i, i - i % 2) for i in range(30)}


def test_nonconvergence_raises_not_corrupts(spark):
    # max_iter too small for the chain → loud RuntimeError, never a
    # silent multi-label result
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1, local_threshold=0)


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_local_and_distributed_paths_identical(spark):
    """r6: the adaptive small-graph union-find must produce exactly
    the distributed star rounds' labels."""
    import random

    rng = random.Random(11)
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(90)
    ] + [(i, i + 1) for i in range(0, 20)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    local = {
        (r.id, r.cluster_id)
        for r in connected_components(df).collect()
    }
    dist = {
        (r.id, r.cluster_id)
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert local == dist and local
