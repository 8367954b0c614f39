"""A* single-pair shortest path and personalized PageRank (round-4
breadth additions from the reference's [later-branch] surface:
``algo.shortestPath.astar`` and ``algo.pageRank`` sourceNodes)."""

import numpy as np
import pytest

from neo4j_graph_algorithms_ray.pipelines.pagerank import (
    PageRankConfig,
    personalized_pagerank,
)
from neo4j_graph_algorithms_ray.pipelines.paths import dijkstra_numpy_oracle
from neo4j_graph_algorithms_ray.pipelines.walks import astar_path
from neo4j_graph_algorithms_ray.state.graph import GraphTables


def _random_weighted(seed: int, n: int = 100, m: int = 350):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.uniform(0.1, 5.0, m)
    return src, dst, w, GraphTables.from_arrays(src, dst, w, extra_vids=np.arange(n))


def test_astar_zero_heuristic_matches_dijkstra():
    src, dst, w, g = _random_weighted(11)
    oracle = dijkstra_numpy_oracle(src, dst, w, g.n, 0)
    # pick a reachable far-ish target deterministically
    finite = np.flatnonzero(np.isfinite(oracle))
    t = int(finite[np.argmax(oracle[finite])])
    res = astar_path(g, 0, t)
    assert res["found"]
    np.testing.assert_allclose(res["total_cost"], oracle[t], rtol=1e-12)
    # returned path must be a real path of exactly that cost
    lut = {}
    for s_, d_, w_ in zip(src, dst, w):
        key = (int(s_), int(d_))
        lut[key] = min(lut.get(key, np.inf), float(w_))
    cost = 0.0
    for a, b in zip(res["path"], res["path"][1:]):
        assert (a, b) in lut
        cost += lut[(a, b)]
    np.testing.assert_allclose(cost, res["total_cost"], rtol=1e-12)


def test_astar_consistent_heuristic_prunes_and_stays_optimal():
    src, dst, w, g = _random_weighted(12)
    oracle = dijkstra_numpy_oracle(src, dst, w, g.n, 0)
    finite = np.flatnonzero(np.isfinite(oracle))
    t = int(finite[np.argmax(oracle[finite])])
    # exact distance-to-target (reverse Dijkstra) is the tightest
    # consistent heuristic; A* with it must expand no more vertices
    # than h=0 and land on the same optimal cost
    h = dijkstra_numpy_oracle(dst, src, w, g.n, t)
    h = np.where(np.isfinite(h), h, 0.0)
    plain = astar_path(g, 0, t)
    guided = astar_path(g, 0, t, heuristic=h)
    assert guided["found"]
    np.testing.assert_allclose(guided["total_cost"], plain["total_cost"], rtol=1e-12)
    assert guided["expanded"] <= plain["expanded"]
    assert guided["expanded"] < g.n  # actually pruned on this fixture


def test_astar_unreachable_and_bad_vid():
    # two disconnected directed edges: 0->1, 2->3
    src = np.array([0, 2], dtype=np.int64)
    dst = np.array([1, 3], dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)
    res = astar_path(g, 0, 3)
    assert not res["found"] and res["path"] == []
    with pytest.raises(KeyError):
        astar_path(g, 0, 99)


def _ppr_numpy(src, dst, n, sources, k, d=0.85):
    alpha = 1.0 - d
    deg = np.bincount(src, minlength=n).astype(np.float64)
    with np.errstate(divide="ignore"):
        inv = np.where(deg > 0, 1.0 / deg, 0.0)
    tele = np.zeros(n)
    tele[sources] = alpha
    r = tele.copy()
    for _ in range(k):
        acc = np.bincount(dst, weights=r[src] * inv[src], minlength=n)
        r = tele + d * acc
    return r


def test_personalized_pagerank_matches_numpy():
    rng = np.random.default_rng(21)
    n, m = 200, 900
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    g = GraphTables.from_arrays(src, dst, extra_vids=np.arange(n))
    sources = np.array([0, 3, 17], dtype=np.int64)
    res = personalized_pagerank(g, sources, PageRankConfig(fixed_iterations=7))
    oracle = _ppr_numpy(src, dst, n, sources, 7)
    np.testing.assert_allclose(res.ranks, oracle, rtol=0, atol=1e-12)


def test_personalized_pagerank_unreachable_is_zero():
    # 0 -> 1 -> 2 plus isolated component 3 -> 4; sources = {0}
    src = np.array([0, 1, 3], dtype=np.int64)
    dst = np.array([1, 2, 4], dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)
    res = personalized_pagerank(
        g, np.array([0]), PageRankConfig(tolerance=1e-12)
    )
    assert res.converged
    assert res.ranks[0] > 0 and res.ranks[1] > 0 and res.ranks[2] > 0
    np.testing.assert_allclose(res.ranks[3], 0.0)
    np.testing.assert_allclose(res.ranks[4], 0.0)


def test_personalized_pagerank_bad_source_raises():
    g = GraphTables.from_arrays(
        np.array([0], dtype=np.int64), np.array([1], dtype=np.int64)
    )
    with pytest.raises(KeyError):
        personalized_pagerank(g, np.array([42]))
    # empty graph: still KeyError (not IndexError) for any source
    g0 = GraphTables.from_arrays(np.empty(0, np.int64), np.empty(0, np.int64))
    with pytest.raises(KeyError):
        personalized_pagerank(g0, np.array([5]))
