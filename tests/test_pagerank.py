import numpy as np
import pytest

from neo4j_graph_algorithms_ray.pipelines.pagerank import (
    PageRankConfig,
    pagerank,
    pagerank_numpy_oracle,
)
from neo4j_graph_algorithms_ray.state.graph import GraphTables

from .conftest import (
    PAGERANK_WIKI_EDGES,
    PAGERANK_WIKI_NODES,
    edge_arrays,
    names_to_ids,
)


@pytest.fixture(scope="module")
def wiki_graph():
    ids = names_to_ids(PAGERANK_WIKI_NODES)
    src, dst = edge_arrays(PAGERANK_WIKI_EDGES, ids)
    return ids, src, dst, GraphTables.from_arrays(src, dst)


def test_pagerank_converged_matches_oracle(wiki_graph):
    ids, src, dst, g = wiki_graph
    assert g.n == len(ids)
    res = pagerank(g, PageRankConfig(tolerance=1e-6, max_iterations=200))
    oracle = pagerank_numpy_oracle(src, dst, g.n, iterations=200, tol=1e-6)
    assert res.converged
    np.testing.assert_allclose(res.ranks, oracle, atol=1e-6)
    # reference ordering: b highest, then c, then e (FIXTURES.md §3.1)
    r = {name: res.ranks[i] for name, i in ids.items()}
    top = sorted(r, key=r.get, reverse=True)[:3]
    assert top == ["b", "c", "e"]


@pytest.mark.parametrize("k", [1, 5, 20, 40])
def test_pagerank_fixed_iterations(wiki_graph, k):
    ids, src, dst, g = wiki_graph
    res = pagerank(g, PageRankConfig(fixed_iterations=k))
    oracle = pagerank_numpy_oracle(src, dst, g.n, iterations=k, tol=None)
    assert res.iterations == k
    np.testing.assert_allclose(res.ranks, oracle, rtol=1e-12, atol=1e-12)


def test_pagerank_combine_modes_agree(wiki_graph):
    _, _, _, g = wiki_graph
    a = pagerank(g, PageRankConfig(fixed_iterations=3, combine="driver"))
    b = pagerank(g, PageRankConfig(fixed_iterations=3, combine="shuffle"))
    np.testing.assert_allclose(a.ranks, b.ranks, rtol=0, atol=1e-12)


def test_pagerank_weighted():
    # two sources into one sink with weights 3 and 1: contributions split 3:1
    src = np.array([0, 0, 1], dtype=np.int64)
    dst = np.array([1, 2, 2], dtype=np.int64)
    w = np.array([3.0, 1.0, 2.0])
    g = GraphTables.from_arrays(src, dst, w)
    res = pagerank(g, PageRankConfig(weighted=True, fixed_iterations=20))
    oracle = pagerank_numpy_oracle(src, dst, 3, iterations=20, tol=None, weight=w)
    np.testing.assert_allclose(res.ranks, oracle, atol=1e-12)


def test_pagerank_zipf_skew_matches_oracle():
    # FIXTURES.md §3.6: power-law graph w/ heavy-hitter hub; pre-aggregated
    # combine must equal the dense oracle exactly-ish
    rng = np.random.default_rng(42)
    n = 2000
    deg = np.clip(rng.zipf(1.8, size=n), 1, 500)
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    dst = rng.integers(0, n, size=len(src))
    hub = src % 10 == 3  # ~10% of edges → one hub vertex
    dst[hub] = 7
    g = GraphTables.from_arrays(src, dst)
    res = pagerank(g, PageRankConfig(fixed_iterations=8))
    # graph densification is identity here (all vids 0..n-1 present)
    oracle = pagerank_numpy_oracle(src, dst.astype(np.int64), n, iterations=8, tol=None)
    np.testing.assert_allclose(res.ranks, oracle, rtol=1e-9, atol=1e-9)
