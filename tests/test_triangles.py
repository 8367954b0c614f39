import numpy as np

from neo4j_graph_algorithms_ray.pipelines.triangles import (
    triangle_count,
    triangle_count_numpy_oracle,
    triangle_stream,
)
from neo4j_graph_algorithms_ray.state.graph import GraphTables

from .conftest import K4_TAIL_EDGES, K4_TAIL_NODES, edge_arrays, names_to_ids


def test_triangles_k4_plus_tail():
    # FIXTURES.md §3.4: K4 {a,b,c,d} + tail d-e
    ids = names_to_ids(K4_TAIL_NODES)
    src, dst = edge_arrays(K4_TAIL_EDGES, ids)
    g = GraphTables.from_arrays(src, dst)
    res = triangle_count(g)
    assert res.triangle_count == 4
    expect = {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}
    for name, t in expect.items():
        assert res.triangles[ids[name]] == t, name
    np.testing.assert_allclose(res.coefficients[ids["a"]], 1.0)
    np.testing.assert_allclose(res.coefficients[ids["d"]], 0.5)
    np.testing.assert_allclose(res.coefficients[ids["e"]], 0.0)
    np.testing.assert_allclose(res.average_coefficient, (1 + 1 + 1 + 0.5 + 0) / 5)


def test_triangle_stream_unique_triples():
    ids = names_to_ids(K4_TAIL_NODES)
    src, dst = edge_arrays(K4_TAIL_EDGES, ids)
    g = GraphTables.from_arrays(src, dst)
    rows = triangle_stream(g).to_pandas()
    assert len(rows) == 4
    triples = {tuple(r) for r in rows.values}
    assert len(triples) == 4
    for a, b, c in triples:
        assert a < b < c
    assert (ids["a"], ids["b"], ids["c"]) in triples


def test_triangles_direction_and_duplicates_ignored():
    # duplicate edges, reversed edges and self-loops must not change counts
    src = np.array([0, 1, 2, 2, 0, 1, 1], dtype=np.int64)
    dst = np.array([1, 2, 0, 0, 1, 0, 1], dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)
    res = triangle_count(g)
    assert res.triangle_count == 1
    np.testing.assert_array_equal(res.triangles, [1, 1, 1])


def test_triangles_random_vs_bruteforce():
    rng = np.random.default_rng(5)
    n, m = 60, 240
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    g = GraphTables.from_arrays(src, dst, extra_vids=np.arange(n))
    u = np.minimum(src, dst)
    v = np.maximum(src, dst)
    keep = u != v
    key = np.unique(u[keep] * n + v[keep])
    oracle = triangle_count_numpy_oracle(key // n, key % n, n)
    # both kernels must agree with brute force (cross-representation
    # agreement, SURVEY §5.2)
    for kernel in ("dense", "wedge"):
        res = triangle_count(g, kernel=kernel)
        np.testing.assert_array_equal(res.triangles, oracle)
        assert res.triangle_count == oracle.sum() // 3


def test_triangles_zipf_hub():
    # FIXTURES.md §3.6: heavy-hitter hub; degree orientation must stay exact
    rng = np.random.default_rng(42)
    n = 300
    src = rng.integers(0, n, 1500).astype(np.int64)
    dst = rng.integers(0, n, 1500).astype(np.int64)
    src[::5] = 7  # hub
    g = GraphTables.from_arrays(src, dst, extra_vids=np.arange(n))
    res = triangle_count(g, kernel="wedge")  # exercise the distributed path
    u = np.minimum(src, dst)
    v = np.maximum(src, dst)
    keep = u != v
    key = np.unique(u[keep] * n + v[keep])
    oracle = triangle_count_numpy_oracle(key // n, key % n, n)
    np.testing.assert_array_equal(res.triangles, oracle)


def test_triangle_kernels_agree_including_bucketed():
    # kernel="bucketed" (the auto path above the single-task CSR
    # ceiling) must match dense and wedge exactly
    import numpy as np

    from neo4j_graph_algorithms_ray.pipelines.triangles import triangle_count
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    rng = np.random.default_rng(7)
    src = rng.integers(0, 200, 1500).astype(np.int64)
    dst = rng.integers(0, 200, 1500).astype(np.int64)
    g = GraphTables.from_arrays(src, dst)
    a = triangle_count(g, kernel="dense")
    b = triangle_count(g, kernel="wedge")
    c = triangle_count(g, kernel="bucketed")
    assert a.triangle_count == b.triangle_count == c.triangle_count
    np.testing.assert_array_equal(a.triangles, b.triangles)
    np.testing.assert_array_equal(a.triangles, c.triangles)
