import numpy as np
import pytest

from neo4j_graph_algorithms_ray.pipelines.components import (
    scc,
    scc_numpy_oracle,
    wcc,
)
from neo4j_graph_algorithms_ray.state.graph import GraphTables

from .conftest import SCC_EDGES, SCC_NODES, edge_arrays, names_to_ids


def test_wcc_three_components():
    # FIXTURES.md §3.2: triangle a-b-c, chain d-e-f, isolated g
    ids = names_to_ids("a b c d e f g")
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("e", "f")]
    src, dst = edge_arrays(edges, ids)
    g = GraphTables.from_arrays(src, dst, extra_vids=np.array([ids["g"]]))
    res = wcc(g)
    assert res.set_count == 3
    comp = {name: res.components[np.searchsorted(g.vids, i)] for name, i in ids.items()}
    assert comp["a"] == comp["b"] == comp["c"] == ids["a"]
    assert comp["d"] == comp["e"] == comp["f"] == ids["d"]
    assert comp["g"] == ids["g"]


def test_wcc_threshold_splits_component():
    # FIXTURES.md §3.2: edge e→f weight 0.1 under threshold 0.5 splits comp 2
    ids = names_to_ids("d e f")
    src, dst = edge_arrays([("d", "e"), ("e", "f")], ids)
    w = np.array([0.9, 0.1])
    g = GraphTables.from_arrays(src, dst, w)
    res = wcc(g, threshold=0.5)
    assert res.set_count == 2
    assert res.components[ids["d"]] == res.components[ids["e"]] == ids["d"]
    assert res.components[ids["f"]] == ids["f"]


def test_wcc_threshold_range_engine_matches():
    """The >10^8-vertex range engine honors the reference unionFind
    ``threshold`` semantics (edges filtered shard-side at round time)."""
    rng = np.random.default_rng(5)
    n, m = 500, 3000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m)
    g = GraphTables.from_arrays(src, dst, weight=w, extra_vids=np.arange(n))
    for thr in (0.5, 0.9):
        a = wcc(g, threshold=thr, engine="dataflow")
        b = wcc(g, threshold=thr, engine="range")
        np.testing.assert_array_equal(a.components, b.components)
        assert a.set_count == b.set_count


@pytest.mark.parametrize("reduce_local", [True, False])
def test_wcc_random_vs_oracle(reduce_local):
    rng = np.random.default_rng(7)
    n, m = 500, 800
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = GraphTables.from_arrays(src, dst, extra_vids=np.arange(n))
    res = wcc(g, reduce_local=reduce_local)
    # oracle: undirected CC via repeated dense min-prop
    lab = np.arange(n, dtype=np.int64)
    while True:
        l2 = lab.copy()
        np.minimum.at(l2, src, lab[dst])
        np.minimum.at(l2, dst, lab[src])
        l2 = np.minimum(l2, l2[l2])
        if (l2 == lab).all():
            break
        lab = l2
    np.testing.assert_array_equal(res.components, lab)


@pytest.mark.parametrize("engine", ["tarjan", "dataflow", "actor"])
def test_scc_two_cycles_bridge(engine):
    # FIXTURES.md §3.5: two 3-cycles joined by one-way bridge c→d;
    # cross-engine agreement (house test pattern SURVEY §5.2)
    ids = names_to_ids(SCC_NODES)
    src, dst = edge_arrays(SCC_EDGES, ids)
    g = GraphTables.from_arrays(src, dst)
    res = scc(g, engine=engine)
    assert res.set_count == 2
    assert (
        res.components[ids["a"]]
        == res.components[ids["b"]]
        == res.components[ids["c"]]
        == ids["a"]
    )
    assert (
        res.components[ids["d"]]
        == res.components[ids["e"]]
        == res.components[ids["f"]]
        == ids["d"]
    )
    # same graph is ONE weak component (distinguishes WCC from SCC)
    assert wcc(g).set_count == 1


@pytest.mark.parametrize("engine", ["dataflow", "actor"])
def test_scc_random_vs_tarjan_oracle(engine):
    # distributed engines vs the sequential Tarjan kernel (which
    # engine="auto" now uses directly below 50k edges)
    rng = np.random.default_rng(11)
    n, m = 200, 420
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    g = GraphTables.from_arrays(src, dst, extra_vids=np.arange(n))
    res = scc(g, engine=engine)
    oracle = scc_numpy_oracle(src, dst, n)
    np.testing.assert_array_equal(res.components, oracle)


@pytest.mark.parametrize("engine", ["tarjan", "dataflow"])
def test_scc_dag_all_singletons(engine):
    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)
    res = scc(g, engine=engine)
    assert res.set_count == 4
    np.testing.assert_array_equal(res.components, np.arange(4))


def test_size_percentiles_discrete_order_stats():
    from neo4j_graph_algorithms_ray.pipelines.stats import size_percentiles

    # labels -> group sizes [1, 2, 3, 4]
    labels = np.array([0, 1, 1, 2, 2, 2, 3, 3, 3, 3])
    t = size_percentiles(labels).to_pandas().set_index("stat")["value"]
    assert t["set_count"] == 4
    assert t["p100"] == 4
    assert t["p50"] == 2  # rank ceil(0.5*4)=2 -> sorted sizes [1,2,3,4][1]
    assert t["p1"] == 1
    assert t["p75"] == 3


def test_cc_pairs_dataset_matches_union_find_oracle():
    # Dataset-native CC (labels live IN the dataset; only an O(1)
    # changed-count per round reaches the driver) vs a driver
    # union-find over the same random edge set with sparse int64 ids.
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.pipelines.components import cc_pairs_dataset

    rng = np.random.default_rng(11)
    ids = np.sort(rng.choice(10_000_000, 1500, replace=False).astype(np.int64))
    a = rng.integers(0, 1500, 4000)
    b = rng.integers(0, 1500, 4000)
    m = a != b
    da, db = ids[a[m]], ids[b[m]]
    pairs = rd.from_arrow(pa.table({"doc_a": da, "doc_b": db})).repartition(4)
    out = (
        cc_pairs_dataset(pairs, width=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(da, db):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    exp = pd.DataFrame(
        sorted((d, find(d)) for d in parent), columns=["doc_id", "group_id"]
    )
    np.testing.assert_array_equal(out["doc_id"].to_numpy(), exp["doc_id"].to_numpy())
    np.testing.assert_array_equal(
        out["group_id"].to_numpy(), exp["group_id"].to_numpy()
    )
