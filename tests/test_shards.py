"""Cross-representation agreement: stateful actor-pool engine
(state.shards) vs the map_batches dataflow path, on random graphs —
the analog of the reference's parameterized Heavy/Light/View test
matrix (SURVEY.md §5.2), where every representation must agree.
"""

import numpy as np
import pytest

from neo4j_graph_algorithms_ray.pipelines.components import (
    scc,
    scc_numpy_oracle,
    wcc,
)
from neo4j_graph_algorithms_ray.pipelines.labelprop import (
    LabelPropagationConfig,
    label_propagation,
)
from neo4j_graph_algorithms_ray.pipelines.pagerank import (
    PageRankConfig,
    pagerank,
    pagerank_numpy_oracle,
)
from neo4j_graph_algorithms_ray.state.graph import GraphTables


@pytest.fixture(scope="module")
def random_graph():
    rng = np.random.default_rng(7)
    n, m = 400, 4000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.5, 2.0, len(src))
    g = GraphTables.from_arrays(src, dst, weight=w, extra_vids=np.arange(n))
    dsrc = np.searchsorted(g.vids, src)
    ddst = np.searchsorted(g.vids, dst)
    return g, dsrc, ddst, w


def test_pagerank_engines_agree(random_graph):
    g, src, dst, w = random_graph
    act = pagerank(g, PageRankConfig(engine="actor")).ranks
    df = pagerank(g, PageRankConfig(engine="dataflow")).ranks
    np.testing.assert_allclose(act, df, atol=1e-12)
    oracle = pagerank_numpy_oracle(src, dst, g.n)
    np.testing.assert_allclose(act, oracle, atol=1e-9)


def test_pagerank_weighted_engines_agree(random_graph):
    g, src, dst, w = random_graph
    act = pagerank(g, PageRankConfig(engine="actor", weighted=True)).ranks
    oracle = pagerank_numpy_oracle(src, dst, g.n, weight=w)
    np.testing.assert_allclose(act, oracle, atol=1e-9)


def test_wcc_engines_agree(random_graph):
    g, *_ = random_graph
    act = wcc(g, engine="actor")
    df = wcc(g, engine="dataflow")
    np.testing.assert_array_equal(act.components, df.components)
    assert act.set_count == df.set_count
    # no-star variant agrees too
    act2 = wcc(g, engine="actor", reduce_local=False)
    np.testing.assert_array_equal(act.components, act2.components)


def test_scc_engines_agree(random_graph):
    g, src, dst, _ = random_graph
    act = scc(g, engine="actor")
    oracle = g.vids[scc_numpy_oracle(src, dst, g.n)]
    np.testing.assert_array_equal(act.components, oracle)


def test_lpa_engines_agree(random_graph):
    g, *_ = random_graph
    for directed in (False, True):
        for weighted in (False, True):
            cfg_a = LabelPropagationConfig(
                fixed_iterations=3, directed=directed, weighted=weighted, engine="actor"
            )
            cfg_d = LabelPropagationConfig(
                fixed_iterations=3, directed=directed, weighted=weighted, engine="dataflow"
            )
            la = label_propagation(g, cfg_a).labels
            ld = label_propagation(g, cfg_d).labels
            np.testing.assert_array_equal(la, ld)


def test_shard_count_independent_of_blocks(random_graph):
    """Row-span sharding: results identical at any shard count."""
    g, src, dst, _ = random_graph
    from neo4j_graph_algorithms_ray.state.shards import ShardedGraph

    base = pagerank_numpy_oracle(src, dst, g.n)
    for num_shards in (1, 3, 7):
        sg = ShardedGraph.from_graph(g, num_shards=num_shards)
        assert sg.m == g.m
        deg = sg.degree("out")
        invdeg = np.where(deg > 0, 1.0 / deg, 0.0)
        ranks = np.full(g.n, 0.15)
        for _ in range(200):
            new = 0.15 + 0.85 * sg.scatter_sum(ranks, mul=invdeg)
            if np.abs(new - ranks).sum() < 1e-6:
                ranks = new
                break
            ranks = new
        np.testing.assert_allclose(ranks, base, atol=1e-9)


def test_scatter_small_n_and_layout_paths_agree(random_graph):
    """The small-n chunked-bincount scatter and the destination-sorted
    reduceat layout must produce identical partials (SMALL_N is a pure
    performance cutover)."""
    g, src, dst, w = random_graph
    from neo4j_graph_algorithms_ray.state.shards import ShardedGraph, _EdgeShard

    sg = ShardedGraph.from_graph(g, num_shards=2)
    rng = np.random.default_rng(3)
    vec = rng.random(g.n)
    small = sg.scatter_sum(vec, weighted=True)
    try:
        _EdgeShard.SMALL_N = 0  # force the sorted-layout path
        sg2 = ShardedGraph.from_graph(g, num_shards=2)
        big = sg2.scatter_sum(vec, weighted=True)
    finally:
        _EdgeShard.SMALL_N = 1 << 20
    np.testing.assert_allclose(small, big, rtol=1e-12, atol=1e-12)


def test_from_dataset_authoritative_vids(random_graph):
    """vids= skips discovery but must give an identical projection, and
    must raise when an edge endpoint is missing from the supplied set."""
    import pyarrow as pa
    import ray.data as rd

    g, src, dst, w = random_graph
    vids = g.vids
    ds = rd.from_arrow(
        pa.table(
            {
                "src": vids[src],
                "dst": vids[dst],
                "weight": np.asarray(w, dtype=np.float64),
            }
        )
    )
    g2 = GraphTables.from_dataset(ds, weight="weight", vids=vids)
    assert g2.n == g.n and g2.m == g.m
    r1 = pagerank(g, PageRankConfig(fixed_iterations=5)).ranks
    r2 = pagerank(g2, PageRankConfig(fixed_iterations=5)).ranks
    # block boundaries may differ between the two projections; the
    # shard fold order then differs by a few ulp
    np.testing.assert_allclose(r1, r2, rtol=1e-12, atol=1e-14)

    incomplete = vids[vids != vids[int(src[0])]]
    with pytest.raises(Exception):
        GraphTables.from_dataset(ds, weight="weight", vids=incomplete).edges.count()


def _edge_dict(g):
    """(orig_src, orig_dst) -> w (or None when unweighted)."""
    t = g.edges.to_pandas()
    out = {}
    for _, r in t.iterrows():
        key = (int(g.vids[int(r["si"])]), int(g.vids[int(r["di"])]))
        out[key] = float(r["w"]) if "w" in t.columns else None
    return out


def test_duplicate_relationship_strategies_weighted():
    # reference DuplicateRelationshipsStrategy semantics (SURVEY.md §1.2):
    # SKIP pinned deterministic to MIN; SUM/MIN/MAX fold; COUNT = multiplicity
    src = np.array([0, 0, 0, 1, 1, 2], dtype=np.int64)
    dst = np.array([1, 1, 1, 2, 2, 0], dtype=np.int64)
    w = np.array([3.0, 1.0, 2.0, 5.0, 4.0, 7.0])
    expect = {
        "sum": {(0, 1): 6.0, (1, 2): 9.0, (2, 0): 7.0},
        "min": {(0, 1): 1.0, (1, 2): 4.0, (2, 0): 7.0},
        "skip": {(0, 1): 1.0, (1, 2): 4.0, (2, 0): 7.0},
        "max": {(0, 1): 3.0, (1, 2): 5.0, (2, 0): 7.0},
        "count": {(0, 1): 3.0, (1, 2): 2.0, (2, 0): 1.0},
    }
    for strat, want in expect.items():
        g = GraphTables.from_arrays(src, dst, weight=w, dedup=strat)
        assert g.m == 3 and g.weighted
        assert _edge_dict(g) == want, strat


def test_duplicate_relationship_strategies_unweighted():
    src = np.array([0, 0, 0, 1, 1, 2], dtype=np.int64)
    dst = np.array([1, 1, 1, 2, 2, 0], dtype=np.int64)
    for strat in ("sum", "min", "max", "skip"):
        g = GraphTables.from_arrays(src, dst, dedup=strat)
        assert g.m == 3 and not g.weighted
        assert set(_edge_dict(g)) == {(0, 1), (1, 2), (2, 0)}
    g = GraphTables.from_arrays(src, dst, dedup="count")
    assert g.m == 3 and g.weighted
    assert _edge_dict(g) == {(0, 1): 3.0, (1, 2): 2.0, (2, 0): 1.0}


def test_duplicate_strategy_vids_supplied_path():
    import pyarrow as pa
    import ray.data as rd

    vids = np.array([0, 1, 2, 9], dtype=np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": np.array([0, 0, 9], dtype=np.int64),
                "dst": np.array([1, 1, 2], dtype=np.int64),
                "weight": np.array([2.0, 8.0, 1.0]),
            }
        )
    )
    g = GraphTables.from_dataset(ds, weight="weight", vids=vids, dedup="max")
    assert g.n == 4 and g.m == 2
    assert _edge_dict(g) == {(0, 1): 8.0, (9, 2): 1.0}

    with pytest.raises(ValueError):
        GraphTables.from_arrays(np.array([0]), np.array([1]), dedup="bogus")


def test_index_dtype_narrowing_boundary():
    """The shard index streams narrow to uint16 only when the dense
    vertex universe fits; above 2^16 the int32 path must produce the
    same results. Every other fixture has n < 65536, so this is the
    only coverage of the int32 branch post-narrowing: a ring of 70_000
    vertices (dense ids up to 69_999) through PageRank vs the numpy
    oracle, and a small graph pinning the uint16 branch against it."""
    # int32 branch: n = 70_000 > 2^16
    n = 70_000
    src = np.arange(n, dtype=np.int64)
    dst = (src + 1) % n
    g = GraphTables.from_arrays(src, dst)
    assert g.n == n
    res = pagerank(g, PageRankConfig(fixed_iterations=3))
    oracle = pagerank_numpy_oracle(src, dst, n, iterations=3, tol=None)
    np.testing.assert_allclose(res.ranks, oracle, rtol=0, atol=1e-12)

    # uint16 branch: same topology at n = 600 must agree with ITS oracle
    n2 = 600
    s2 = np.arange(n2, dtype=np.int64)
    d2 = (s2 + 1) % n2
    g2 = GraphTables.from_arrays(s2, d2)
    r2 = pagerank(g2, PageRankConfig(fixed_iterations=3))
    o2 = pagerank_numpy_oracle(s2, d2, n2, iterations=3, tol=None)
    np.testing.assert_allclose(r2.ranks, o2, rtol=0, atol=1e-12)


def test_configure_ray_data_sets_shuffle_context():
    # the aggregator reservation cap MUST be applied at package import
    # (Datasets snapshot DataContext at creation — a later mutation
    # never reaches an existing plan), and a Dataset created after
    # import must carry it in its snapshot
    import ray.data as rd

    from neo4j_graph_algorithms_ray import configure_ray_data

    configure_ray_data()  # idempotent
    ctx = rd.DataContext.get_current()
    assert (
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
        == 1.0 / 64
    )
    ds = rd.range(4)
    assert (
        ds.context.hash_shuffle_operator_actor_num_cpus_per_partition_override
        == 1.0 / 64
    )
    # an explicit user setting is respected (we only fill Ray's None)
    old = ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
    try:
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.5
        configure_ray_data()
        assert (
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
            == 0.5
        )
    finally:
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = old
