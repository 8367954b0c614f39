import numpy as np
import pytest

from neo4j_graph_algorithms_ray.pipelines.paths import (
    bfs_depths,
    betweenness_table,
    closeness_table,
    dijkstra_numpy_oracle,
    sssp,
)
from neo4j_graph_algorithms_ray.state.graph import GraphTables

from .conftest import edge_arrays, names_to_ids


def test_bfs_depths_chain_with_branch():
    ids = names_to_ids("a b c d e")
    src, dst = edge_arrays(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")], ids
    )
    g = GraphTables.from_arrays(src, dst, extra_vids=np.array([ids["e"]]))
    depth = bfs_depths(g, ids["a"])
    np.testing.assert_array_equal(depth, [0, 1, 1, 2, -1])


def test_sssp_matches_dijkstra():
    rng = np.random.default_rng(3)
    n, m = 120, 400
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.uniform(0.1, 5.0, m)
    g = GraphTables.from_arrays(src, dst, w, extra_vids=np.arange(n))
    res = sssp(g, 0)
    oracle = dijkstra_numpy_oracle(src, dst, w, n, 0)
    np.testing.assert_allclose(res.distances, oracle, rtol=1e-12, atol=1e-12)


def test_sssp_unweighted_equals_bfs():
    src = np.array([0, 1, 2, 0], dtype=np.int64)
    dst = np.array([1, 2, 3, 2], dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)
    d1 = sssp(g, 0).distances
    d2 = bfs_depths(g, 0).astype(np.float64)
    np.testing.assert_array_equal(d1, d2)


def _path5():
    # undirected path a-b-c-d-e: reference betweenness fixture
    ids = names_to_ids("a b c d e")
    src, dst = edge_arrays([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ids)
    return ids, GraphTables.from_arrays(src, dst)


def test_betweenness_path5():
    # reference BetweennessCentralityTest: 5-path → {0, 3, 4, 3, 0}
    _, g = _path5()
    t = betweenness_table(g, directed=False).to_pandas()
    np.testing.assert_allclose(t["centrality"].values, [0, 3, 4, 3, 0])


def test_betweenness_sampled_full_probability_matches():
    _, g = _path5()
    full = betweenness_table(g, directed=False).to_pandas()["centrality"]
    samp = betweenness_table(g, directed=False, sample_probability=0.999999).to_pandas()[
        "centrality"
    ]
    np.testing.assert_allclose(full, samp)


def test_closeness_path3():
    # path a-b-c undirected: closeness a = 2/(1+2) = 2/3, b = 1.0
    ids = names_to_ids("a b c")
    src, dst = edge_arrays([("a", "b"), ("b", "c")], ids)
    g = GraphTables.from_arrays(src, dst)
    t = closeness_table(g).to_pandas()
    np.testing.assert_allclose(t["centrality"].values, [2 / 3, 1.0, 2 / 3])


def test_harmonic_and_dangalchev_path3():
    ids = names_to_ids("a b c")
    src, dst = edge_arrays([("a", "b"), ("b", "c")], ids)
    g = GraphTables.from_arrays(src, dst)
    h = closeness_table(g, variant="harmonic").to_pandas()["centrality"].values
    np.testing.assert_allclose(h, [(1 + 0.5) / 2, (1 + 1) / 2, (1 + 0.5) / 2])
    dv = closeness_table(g, variant="dangalchev").to_pandas()["centrality"].values
    np.testing.assert_allclose(dv, [0.5 + 0.25, 0.5 + 0.5, 0.5 + 0.25])


def test_msbfs_many_sources():
    # >64 vertices forces multiple bitmask batches
    n = 100
    src = np.arange(n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)  # path graph
    t = closeness_table(g, variant="harmonic").to_pandas()
    # middle vertex has highest harmonic closeness
    assert t["centrality"].idxmax() == n // 2 or t["centrality"].idxmax() == n // 2 - 1


def test_delta_stepping_matches_dijkstra():
    from neo4j_graph_algorithms_ray.pipelines.paths import (
        delta_stepping,
        dijkstra_numpy_oracle,
    )
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    rng = np.random.default_rng(13)
    n, m = 150, 900
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = np.round(rng.uniform(0.1, 5.0, len(src)), 3)
    g = GraphTables.from_arrays(src, dst, weight=w, extra_vids=np.arange(n))
    want = dijkstra_numpy_oracle(src, dst, w, n, 0)
    for delta in (0.5, 2.0, 10.0):
        got = delta_stepping(g, 0, delta=delta)
        np.testing.assert_allclose(got.distances, want, atol=1e-9)
    # undirected agrees with oracle over symmetrized edges
    und = dijkstra_numpy_oracle(
        np.concatenate([src, dst]), np.concatenate([dst, src]),
        np.concatenate([w, w]), n, 0,
    )
    got_u = delta_stepping(g, 0, delta=1.0, directed=False)
    np.testing.assert_allclose(got_u.distances, und, atol=1e-9)


def test_msbfs_depth_table_matches_bfs():
    # depth table per (source, vid) must agree with per-source BFS on a
    # >64-vertex path graph (forces multiple bitmask batches)
    from neo4j_graph_algorithms_ray.pipelines.paths import msbfs_depth_table

    n = 70
    src = np.arange(n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)  # path graph
    sources = np.array([0, 3, 69])
    t = msbfs_depth_table(g, sources, directed=False).to_pandas()
    for s in sources:
        ref = bfs_depths(GraphTables.from_arrays(
            np.concatenate([src, dst]), np.concatenate([dst, src])), int(s))
        got = t[t["source"] == s].set_index("vid")["depth"]
        for v in range(n):
            if v == s:
                assert v not in got.index
            else:
                assert got.get(v, -1) == ref[v]


def test_msbfs_depth_table_consistent_with_closeness():
    # harmonic closeness recomputed from the depth table equals the
    # closeness_table kernel (same wave generator, different fold)
    from neo4j_graph_algorithms_ray.pipelines.paths import msbfs_depth_table

    ids = names_to_ids("a b c d e")
    src, dst = edge_arrays(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "e")], ids
    )
    g = GraphTables.from_arrays(src, dst)
    t = msbfs_depth_table(g, np.arange(g.n), directed=False).to_pandas()
    har = t.groupby("vid").apply(lambda d: (1.0 / d["depth"]).sum()) / (g.n - 1)
    ref = closeness_table(g, variant="harmonic").to_pandas()
    np.testing.assert_allclose(
        har.reindex(ref["vid"]).fillna(0).to_numpy(), ref["centrality"].to_numpy()
    )


def test_weighted_allpairs_matches_dijkstra_per_source():
    from neo4j_graph_algorithms_ray.pipelines.paths import weighted_allpairs_table

    rng = np.random.default_rng(11)
    n, m = 60, 220
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.uniform(0.1, 5.0, m)
    g = GraphTables.from_arrays(src, dst, w, extra_vids=np.arange(n))
    sources = np.array([0, 7, 23], dtype=np.int64)
    out = weighted_allpairs_table(g, sources=sources).to_pandas()
    for s in sources:
        oracle = dijkstra_numpy_oracle(src, dst, w, n, int(s))
        got = out[out["source"] == s].set_index("target")["distance"]
        expect_t = np.flatnonzero(np.isfinite(oracle))
        expect_t = expect_t[expect_t != s]
        assert set(got.index) == set(expect_t)
        np.testing.assert_allclose(
            got.loc[expect_t].to_numpy(), oracle[expect_t], rtol=1e-12
        )
    # max_distance caps rows
    capped = weighted_allpairs_table(
        g, sources=sources[:1], max_distance=3.0
    ).to_pandas()
    assert (capped["distance"] <= 3.0).all()


def test_hyperanf_tracks_exact_neighborhood_function():
    import numpy as np

    from neo4j_graph_algorithms_ray.pipelines.anf import hyperanf
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    # ring of 64 vertices: ball(v, t) = 2t+1 exactly, N(t) = 64*(2t+1)
    n = 64
    src = np.arange(n, dtype=np.int64)
    dst = (src + 1) % n
    g = GraphTables.from_arrays(src, dst)
    t = hyperanf(g, rounds=4, directed=False).to_pandas().set_index("t")["n_pairs"]
    for k in range(5):
        exact = n * (2 * k + 1)
        # HLL sigma at m=64 is ~13%; the SUM over 64 vertices keeps the
        # relative error of the total well inside that
        assert abs(t[k] - exact) / exact < 0.25, (k, t[k], exact)
    # monotone in t
    assert (np.diff(t.to_numpy()) >= 0).all()


def test_hyperanf_sharded_matches_single_task_bit_exact():
    """The range-sharded shard-pool engine and the single-task gate
    produce identical n_pairs curves (max-merge is order-independent;
    the estimator is per-vertex) — directed and undirected, on a
    random multigraph with self-loops and reciprocal pairs."""
    import numpy as np

    from neo4j_graph_algorithms_ray.pipelines.anf import hyperanf
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    rng = np.random.default_rng(7)
    n, m = 300, 2400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = GraphTables.from_arrays(src, dst)
    for directed in (False, True):
        a = hyperanf(g, rounds=3, directed=directed, sharded=False).to_pandas()
        b = hyperanf(g, rounds=3, directed=directed, sharded=True).to_pandas()
        assert a["t"].tolist() == b["t"].tolist()
        np.testing.assert_array_equal(
            a["n_pairs"].to_numpy(), b["n_pairs"].to_numpy()
        )


def test_effective_diameter_star_is_short():
    import numpy as np

    from neo4j_graph_algorithms_ray.pipelines.anf import effective_diameter
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    # star: every vertex within 2 hops of every other -> d_eff <= 2
    n = 32
    src = np.zeros(n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)
    t = effective_diameter(g, rounds=4, directed=False).to_pandas()
    assert int(t["eff_diameter"].iloc[0]) <= 2
    assert t["n_pairs_final"].iloc[0] > n  # far beyond the t=0 diagonal


def test_skipgram_pairs_window_counts():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.pipelines.walks import skipgram_pairs

    # one walk a-b-c-a: window 2 pairs (both directions) hand-counted
    walks = rd.from_arrow(
        pa.table(
            {
                "walk_id": np.zeros(4, dtype=np.int64),
                "step": np.arange(4, dtype=np.int64),
                "vid": np.array([10, 11, 12, 10], dtype=np.int64),
            }
        )
    )
    out = (
        skipgram_pairs(walks, window=2)
        .to_pandas()
        .set_index(["center", "context"])["cnt"]
        .to_dict()
    )
    # d=1 position pairs: (10,11),(11,12),(12,10); d=2: (10,12),(11,10);
    # each counted in BOTH directions
    assert out[(10, 11)] == 2  # d=1 forward + reverse of d=2 (11,10)
    assert out[(11, 10)] == 2  # reverse of d=1 (10,11) + d=2 forward
    assert out[(12, 10)] == 2  # d=1 forward + reverse of d=2 (10,12)
    assert out[(11, 12)] == 1 and out[(12, 11)] == 1
    assert sum(out.values()) == 2 * (3 + 2)  # 5 position pairs, both directions
