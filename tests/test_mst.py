"""Borůvka spanning forest vs sequential Prim oracle
(reference semantics: algo/.../impl/MSTPrim.java, KSpanningTree.java).
"""

import numpy as np
import pytest

from neo4j_graph_algorithms_ray.pipelines.mst import (
    boruvka_forest,
    k_spanning_tree,
    prim_numpy_oracle,
    spanning_tree,
)
from neo4j_graph_algorithms_ray.state.graph import GraphTables


@pytest.fixture(scope="module")
def weighted_graph():
    rng = np.random.default_rng(11)
    n, m = 120, 600
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = np.round(rng.uniform(0.1, 9.9, len(src)), 3)
    g = GraphTables.from_arrays(src, dst, weight=w, extra_vids=np.arange(n))
    return g, src, dst, w


def test_boruvka_matches_prim_total(weighted_graph):
    g, src, dst, w = weighted_graph
    res = boruvka_forest(g)
    # forest spans each component: n - #components edges
    assert res.edges.num_rows == g.n - res.metrics["components"]
    # per-component total weight equals Prim's from any member
    tree = spanning_tree(g, start_vid=0)
    assert tree.effective_node_count >= 1
    oracle = prim_numpy_oracle(src, dst, w, g.n, start=0)
    assert tree.total_weight == pytest.approx(oracle, abs=1e-9)


def test_boruvka_engines_agree(weighted_graph):
    # local small-graph gate vs actor-pool rounds: bit-identical
    # forest (shared candidate kernel + shared fold)
    g, *_ = weighted_graph
    loc = boruvka_forest(g, engine="local")
    act = boruvka_forest(g, engine="actor")
    assert loc.metrics["engine"] == "local"
    assert act.metrics["engine"] == "actor"
    assert loc.total_weight == act.total_weight
    assert loc.edges.equals(act.edges)


def test_maximum_spanning_tree(weighted_graph):
    g, src, dst, w = weighted_graph
    res_max = boruvka_forest(g, minimum=False)
    oracle = -prim_numpy_oracle(src, dst, -w, g.n, start=0)
    tree = spanning_tree(g, start_vid=0, minimum=False)
    assert tree.total_weight == pytest.approx(oracle, abs=1e-9)
    assert res_max.total_weight >= boruvka_forest(g).total_weight


def test_k_spanning_tree_clusters(weighted_graph):
    g, *_ = weighted_graph
    k = 4
    clusters = k_spanning_tree(g, k=k, start_vid=0)
    tree = spanning_tree(g, start_vid=0)
    # cutting k-1 edges of a tree leaves exactly k clusters
    assert clusters["cluster"].nunique() == k
    assert len(clusters) == tree.effective_node_count


def test_path_graph_mst_exact():
    # path a-b-c-d with weights 1,2,3 → MST = all edges, total 6
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 3])
    w = np.array([1.0, 2.0, 3.0])
    g = GraphTables.from_arrays(src, dst, weight=w)
    res = boruvka_forest(g)
    assert res.total_weight == 6.0
    assert res.edges.num_rows == 3
    two = k_spanning_tree(g, k=2, start_vid=0)
    # cutting the max edge (2-3) splits {0,1,2} and {3}
    assert set(two[two["cluster"] == 0]["vid"]) == {0, 1, 2}
    assert set(two[two["cluster"] == 3]["vid"]) == {3}
