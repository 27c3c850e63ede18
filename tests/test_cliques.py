"""Clique extraction for relation extrapolation (Q13)."""

from addok_spark.query.cliques import maximal_cliques, ordered_cliques


def test_maximal_cliques_triangle_plus_tail():
    nodes = [1, 2, 3, 4]
    edges = {(1, 2), (2, 3), (1, 3), (3, 4)}
    cs = maximal_cliques(nodes, edges)
    assert (1, 2, 3) in cs
    assert (3, 4) in cs
    # no non-maximal cliques
    assert (1, 2) not in cs


def test_ordered_cliques_by_avg_df():
    nodes = [1, 2, 3, 4]
    edges = {(1, 2), (3, 4)}
    dfs = {1: 100, 2: 100, 3: 5, 4: 5}
    cs = ordered_cliques(nodes, edges, dfs)
    assert cs == [(3, 4), (1, 2)]  # least-frequent relation first


def test_deterministic():
    nodes = [5, 1, 3]
    edges = {(1, 3), (3, 5), (1, 5)}
    assert maximal_cliques(nodes, edges) == maximal_cliques(list(reversed(nodes)), edges)
