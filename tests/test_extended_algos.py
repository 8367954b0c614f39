"""Louvain, link prediction, balanced triads, random walks, Yen's
k-shortest paths — reference-semantics fixtures + oracles.
"""

import numpy as np
import pandas as pd
import pytest

from neo4j_graph_algorithms_ray.pipelines.linkprediction import (
    link_prediction_numpy_oracle,
    link_prediction_scores,
)
from neo4j_graph_algorithms_ray.pipelines.louvain import louvain
from neo4j_graph_algorithms_ray.pipelines.pagerank import (
    article_rank,
    eigenvector_centrality,
)
from neo4j_graph_algorithms_ray.pipelines.triangles import balanced_triads
from neo4j_graph_algorithms_ray.pipelines.walks import (
    random_walks,
    yens_k_shortest_paths,
)
from neo4j_graph_algorithms_ray.state.graph import GraphTables


def two_cliques_bridge():
    """Two K4 cliques joined by one bridge edge — canonical community
    fixture (Louvain must find the cliques)."""
    e = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                e.append((base + i, base + j))
    e.append((0, 4))
    src = np.array([a for a, _ in e], dtype=np.int64)
    dst = np.array([b for _, b in e], dtype=np.int64)
    return src, dst


def test_louvain_two_cliques():
    src, dst = two_cliques_bridge()
    g = GraphTables.from_arrays(src, dst)
    res = louvain(g)
    assert res.community_count == 2
    comm = res.communities
    assert len(set(comm[:4])) == 1 and len(set(comm[4:])) == 1
    assert comm[0] != comm[4]
    # min-member canonical ids
    assert comm[0] == 0 and comm[4] == 4
    assert res.modularity > 0.3


def test_louvain_modularity_monotone():
    rng = np.random.default_rng(3)
    n = 60
    # planted partition: 3 groups, dense inside, sparse across
    src, dst = [], []
    for i in range(n):
        for j in range(i + 1, n):
            same = (i // 20) == (j // 20)
            p = 0.4 if same else 0.02
            if rng.random() < p:
                src.append(i)
                dst.append(j)
    g = GraphTables.from_arrays(
        np.array(src, dtype=np.int64), np.array(dst, dtype=np.int64),
        extra_vids=np.arange(n),
    )
    res = louvain(g)
    assert all(
        b >= a - 1e-12 for a, b in zip(res.modularities, res.modularities[1:])
    )
    assert res.modularity > 0.3
    assert res.community_count <= 6


def test_link_prediction_matches_oracle():
    rng = np.random.default_rng(5)
    n, m = 80, 400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = GraphTables.from_arrays(src, dst, extra_vids=np.arange(n))
    pairs = pd.DataFrame({"u": [0, 3, 10], "v": [1, 7, 20]})
    scored = link_prediction_scores(g, pairs).to_pandas().sort_values("u")
    from neo4j_graph_algorithms_ray.pipelines.triangles import (
        canonical_undirected,
    )

    cu, cv = canonical_undirected(g)
    for _, row in scored.iterrows():
        want = link_prediction_numpy_oracle(cu, cv, g.n, int(row["u"]), int(row["v"]))
        for key, val in want.items():
            assert row[key] == pytest.approx(val, abs=1e-9), key


def test_balanced_triads_triangle_signs():
    # K4 with one negative edge: triangles through that edge unbalanced
    # (two +, one −: product < 0), the all-positive one balanced
    src = np.array([0, 0, 0, 1, 1, 2])
    dst = np.array([1, 2, 3, 2, 3, 3])
    w = np.array([1.0, 1.0, 1.0, -2.0, 1.0, 1.0])  # edge (1,2) negative
    g = GraphTables.from_arrays(src, dst, weight=w)
    res = balanced_triads(g)
    # K4 has 4 triangles; (1,2) participates in 2 of them
    assert res.balanced_count == 2
    assert res.unbalanced_count == 2
    np.testing.assert_array_equal(res.balanced + res.unbalanced, [3, 3, 3, 3])


def test_random_walks_deterministic_and_valid():
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 0])  # 4-cycle
    g = GraphTables.from_arrays(src, dst)
    w1 = random_walks(g, np.array([0, 1]), steps=5, seed=7, directed=True).to_pandas()
    w2 = random_walks(g, np.array([0, 1]), steps=5, seed=7, directed=True).to_pandas()
    pd.testing.assert_frame_equal(
        w1.sort_values(["walk_id", "step"]).reset_index(drop=True),
        w2.sort_values(["walk_id", "step"]).reset_index(drop=True),
    )
    # directed cycle: every step moves to (v+1) % 4
    for _, grp in w1.groupby("walk_id"):
        vidseq = grp.sort_values("step")["vid"].to_numpy()
        assert ((vidseq[1:] - vidseq[:-1]) % 4 == 1).all()
        assert len(vidseq) == 6


def test_yens_k_shortest_paths_diamond():
    # diamond: 0→1→3 (cost 2), 0→2→3 (cost 3), 0→3 direct (cost 4)
    src = np.array([0, 1, 0, 2, 0])
    dst = np.array([1, 3, 2, 3, 3])
    w = np.array([1.0, 1.0, 1.0, 2.0, 4.0])
    g = GraphTables.from_arrays(src, dst, weight=w)
    paths = yens_k_shortest_paths(g, 0, 3, k=3)
    costs = paths.groupby("path_index")["cost"].first().tolist()
    assert costs == [2.0, 3.0, 4.0]
    p0 = paths[paths["path_index"] == 0].sort_values("step")["vid"].tolist()
    assert p0 == [0, 1, 3]


def test_article_rank_and_eigenvector_sane():
    rng = np.random.default_rng(9)
    n, m = 100, 600
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    g = GraphTables.from_arrays(src[keep], dst[keep], extra_vids=np.arange(n))
    ar = article_rank(g)
    assert ar.converged and (ar.ranks > 0).all()
    ev = eigenvector_centrality(g)
    assert ev.converged
    assert np.linalg.norm(ev.ranks) == pytest.approx(1.0, abs=1e-6)
    # eigenvector of A^T: Av ≈ λ v — verify via one more application
    sg = g.sharded()
    nxt = sg.scatter_sum(ev.ranks)
    lam = float(np.linalg.norm(nxt))
    np.testing.assert_allclose(nxt / lam, ev.ranks, atol=1e-4)


def test_infomap_two_cliques():
    from neo4j_graph_algorithms_ray.pipelines.infomap import infomap

    src, dst = two_cliques_bridge()
    g = GraphTables.from_arrays(src, dst)
    res = infomap(g)
    assert res.community_count == 2
    comm = res.communities
    assert len(set(comm[:4])) == 1 and len(set(comm[4:])) == 1
    assert comm[0] == 0 and comm[4] == 4  # canonical min-member ids


def test_infomap_planted_partition_and_determinism():
    from neo4j_graph_algorithms_ray.pipelines.infomap import infomap

    rng = np.random.default_rng(3)
    n = 60
    src, dst = [], []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < (0.4 if (i // 20) == (j // 20) else 0.02):
                src.append(i)
                dst.append(j)
    g = GraphTables.from_arrays(
        np.array(src, dtype=np.int64), np.array(dst, dtype=np.int64),
        extra_vids=np.arange(n),
    )
    r1 = infomap(g)
    r2 = infomap(g)
    np.testing.assert_array_equal(r1.communities, r2.communities)
    assert 3 <= r1.community_count <= 6
    sizes = sorted(np.bincount(np.unique(r1.communities, return_inverse=True)[1]))
    assert sizes[-3] >= 15  # the three planted groups dominate
    # codelength beats the singleton partition's
    from neo4j_graph_algorithms_ray.pipelines.infomap import _codelength
    from neo4j_graph_algorithms_ray.pipelines.pagerank import (
        PageRankConfig,
        pagerank,
    )

    pr = pagerank(g, PageRankConfig(tolerance=1e-9, max_iterations=500)).ranks
    p = pr / pr.sum()
    sg = g.sharded()
    wdeg = sg.degree("out") + sg.degree("in")
    A = np.where(wdeg > 0, p / wdeg, 0.0)
    tgt, _, f = sg.flow_votes(np.arange(g.n, dtype=np.int64), A)
    s = np.zeros(g.n)
    np.add.at(s, tgt, f)
    L_singleton = _codelength(s, p, p)
    assert r1.codelength < L_singleton


def _part_blocks_graph(n=200):
    """The __ray_entry__ louvain/infomap fixture shape: disjoint
    8-vertex blocks, edges between keys ≤ 3 apart within a block."""
    import ray.data as rd
    import pyarrow as pa

    keys = np.arange(n, dtype=np.int64)
    a_list, b_list = [], []
    for d in (1, 2, 3):
        a, b = keys[:-d], keys[d:]
        m = (a // 8) == (b // 8)
        a_list.append(a[m])
        b_list.append(b[m])
    t = pa.table(
        {"src": np.concatenate(a_list), "dst": np.concatenate(b_list)}
    )
    return GraphTables.from_dataset(rd.from_arrow(t))


def test_louvain_part_blocks_level1_is_final():
    """The unrolled-CTE driver oracle replays LEVEL-1 rounds only; it is
    sound because on the part_blocks fixture the coarse levels find no
    improvement — the multilevel answer IS the level-1 fixpoint (and
    that fixpoint is reached in ≤ 8 rounds, the oracle's unroll
    depth). Guards the oracle's two assumptions explicitly."""
    from neo4j_graph_algorithms_ray.pipelines.louvain import _gain_moves

    g = _part_blocks_graph(200)
    res = louvain(g)
    sg = g.sharded()
    k = sg.degree("out") + sg.degree("in")
    m2 = float(k.sum())
    comm = np.arange(g.n, dtype=np.int64)
    rounds = 0
    for _ in range(8):
        tot = np.zeros(g.n)
        np.add.at(tot, comm, k)
        tgt, cand, w_ic = sg.vote_triples(comm, weighted=False, directed=False)
        new = _gain_moves(tgt, cand, w_ic, comm, k, tot, m2)
        rounds += 1
        if (new == comm).all():
            break
        comm = new
    assert rounds <= 8 and (new == comm).all(), "fixpoint not reached in 8 rounds"
    cu, inv = np.unique(comm, return_inverse=True)
    mm = np.full(len(cu), np.iinfo(np.int64).max)
    np.minimum.at(mm, inv, g.vids)
    np.testing.assert_array_equal(res.communities, mm[inv])
    # the partition is strictly finer than components (non-trivial check)
    assert res.community_count == 2 * (200 // 8)


def test_infomap_witness_gate_rejects_corrupt_partition():
    """The infomap driver oracle recomputes the witness partition's
    codelength in SQL; a corrupted witness (wrong modules or wrong
    reported codelength) must yield ZERO oracle rows, not a pass."""
    import duckdb
    import pyarrow.parquet as pq
    import pyarrow as pa
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    entry.queries()["infomap_modules"](sf)  # writes the honest witness
    sql = entry.oracle_sql()["infomap_modules"]

    def run(con):
        for tbl in ("part",):
            con.sql(
                f"CREATE OR REPLACE VIEW {tbl} AS "
                f"SELECT * FROM read_parquet('{sf}/{tbl}.parquet')"
            )
        return con.sql(sql).df()

    good = run(duckdb.connect())
    assert len(good) == 200
    # corrupt the witness: shift every module label to its vid (singletons)
    path = entry._witness_path("infomap", sf)
    w = pq.read_table(path).to_pandas()
    w["module"] = w["vid"]
    pq.write_table(pa.Table.from_pandas(w, preserve_index=False), path)
    bad = run(duckdb.connect())
    assert len(bad) == 0, "gate must reject a partition that mismatches reported_l"
    # restore the honest witness for any later consumer
    entry.queries()["infomap_modules"](sf)


# ----------------------------------------------------------------------
# HITS + k-core (round-4 additions)
# ----------------------------------------------------------------------
def _random_simple_graph(seed, n=250, m=2500):
    """Random simple graph, one orientation per pair (a < b) — the
    no-reciprocal-pairs contract of the undirected shard kernels."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    a, b = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    uk = np.unique(a.astype(np.int64) * n + b)
    return uk // n, uk % n, n


def test_hits_matches_numpy_power_iteration():
    from neo4j_graph_algorithms_ray.pipelines.pagerank import hits

    src, dst, n = _random_simple_graph(7)
    g = GraphTables.from_arrays(src, dst)
    res = hits(g, fixed_iterations=12)
    vids = g.vids
    si = np.searchsorted(vids, src)
    di = np.searchsorted(vids, dst)
    nn = g.n
    hub = np.full(nn, 1.0 / np.sqrt(nn))
    auth = np.full(nn, 1.0 / np.sqrt(nn))
    for _ in range(12):
        na = np.bincount(di, weights=hub[si], minlength=nn)
        nrm = np.linalg.norm(na)
        na = na / nrm if nrm > 0 else na
        nh = np.bincount(si, weights=na[di], minlength=nn)
        nrm = np.linalg.norm(nh)
        nh = nh / nrm if nrm > 0 else nh
        auth, hub = na, nh
    assert np.allclose(res.auths, auth, atol=1e-12)
    assert np.allclose(res.hubs, hub, atol=1e-12)
    # convergence mode reaches a stable point
    res2 = hits(g, tolerance=1e-10)
    assert res2.converged and res2.delta < 1e-10


def test_hits_star_graph_hubs_vs_auths():
    from neo4j_graph_algorithms_ray.pipelines.pagerank import hits

    # 4 sources all pointing at vertex 9: sources are pure hubs,
    # 9 is the pure authority
    src = np.array([0, 1, 2, 3], dtype=np.int64)
    dst = np.array([9, 9, 9, 9], dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)
    res = hits(g, fixed_iterations=5)
    vids = g.vids
    auth_9 = res.auths[np.searchsorted(vids, 9)]
    assert auth_9 == pytest.approx(1.0)
    for s in (0, 1, 2, 3):
        assert res.hubs[np.searchsorted(vids, s)] == pytest.approx(0.5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_kcore_matches_peeling_oracle(seed):
    from neo4j_graph_algorithms_ray.pipelines.kcore import (
        kcore,
        kcore_peel_oracle,
    )

    src, dst, n = _random_simple_graph(seed, n=200, m=1600 * (seed + 1))
    g = GraphTables.from_arrays(src, dst)
    res = kcore(g)
    assert res.converged
    expect = kcore_peel_oracle(src, dst, n)
    vids = g.vids
    got = np.zeros(n, dtype=np.int64)
    got[vids] = res.coreness
    present = np.zeros(n, dtype=bool)
    present[vids] = True
    assert np.array_equal(got[present], expect[present])


def test_kcore_clique_plus_tail():
    from neo4j_graph_algorithms_ray.pipelines.kcore import kcore

    # K5 (coreness 4) with a path tail 5-6-7 (coreness 1)
    e = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    e += [(4, 5), (5, 6), (6, 7)]
    src = np.array([a for a, _ in e], dtype=np.int64)
    dst = np.array([b for _, b in e], dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)
    res = kcore(g, fixed_rounds=6)
    vids = g.vids
    core = {int(v): int(c) for v, c in zip(vids, res.coreness)}
    assert all(core[v] == 4 for v in range(5))
    assert core[5] == 1 and core[6] == 1 and core[7] == 1


def test_reverse_scatter_matches_forward_on_transpose():
    src, dst, n = _random_simple_graph(11)
    g = GraphTables.from_arrays(src, dst)
    gt = GraphTables.from_arrays(dst, src)  # explicit transpose
    rng = np.random.default_rng(5)
    vec = rng.random(g.n)
    rev = g.sharded().scatter_sum(vec, reverse=True)
    fwd_t = gt.sharded().scatter_sum(vec)
    assert np.allclose(rev, fwd_t, atol=1e-12)


def test_kcore_frontier_round_matches_full_round():
    src, dst, n = _random_simple_graph(21, n=300, m=4000)
    g = GraphTables.from_arrays(src, dst)
    sg = g.sharded()
    vals = (sg.degree("in") + sg.degree("out")).astype(np.int64)
    full = sg.hindex_round(vals)
    # frontier path with everything marked changed must equal the
    # unfiltered round
    assert np.array_equal(
        sg.hindex_round(vals, np.ones(g.n, dtype=bool)), full
    )
    # after one round, a frontier-filtered second round must equal the
    # unfiltered second round
    changed = full != vals
    assert np.array_equal(
        sg.hindex_round(full, changed), sg.hindex_round(full)
    )


def test_kcore_range_split_fold_matches_driver_fold():
    from neo4j_graph_algorithms_ray.pipelines.kcore import (
        kcore,
        kcore_peel_oracle,
    )

    src, dst, n = _random_simple_graph(33, n=800, m=9000)
    g = GraphTables.from_arrays(src, dst)
    sg = g.sharded(num_shards=4)
    r_driver = kcore(g)
    old_m = sg.m
    try:
        sg.m = 20_000_000  # cross the range-split threshold, same data
        r_dist = kcore(g)
    finally:
        sg.m = old_m
    assert np.array_equal(r_driver.coreness, r_dist.coreness)
    expect = kcore_peel_oracle(src, dst, n)
    got = np.zeros(n, dtype=np.int64)
    got[g.vids] = r_dist.coreness
    present = np.zeros(n, dtype=bool)
    present[g.vids] = True
    assert np.array_equal(got[present], expect[present])


# ----------------------------------------------------------------------
# graph-statistics operators (round-4): brute-force numpy oracles
# ----------------------------------------------------------------------
@pytest.mark.parametrize("seed", [0, 5])
def test_degree_assortativity_matches_bruteforce(seed):
    from neo4j_graph_algorithms_ray.pipelines.stats import degree_assortativity

    rng = np.random.default_rng(seed)
    n, m = 120, 900
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    key = np.unique(src[keep].astype(np.int64) * n + dst[keep])
    src, dst = key // n, key % n
    g = GraphTables.from_arrays(src, dst)
    vids = g.vids
    si = np.searchsorted(vids, src)
    di = np.searchsorted(vids, dst)
    dout = np.bincount(si, minlength=g.n).astype(float)
    din = np.bincount(di, minlength=g.n).astype(float)
    x, y = dout[si], din[di]
    expect = np.corrcoef(x, y)[0, 1]
    got = degree_assortativity(g)
    assert got == pytest.approx(expect, abs=1e-9)


def test_reciprocity_bruteforce_and_extremes():
    from neo4j_graph_algorithms_ray.pipelines.stats import reciprocity

    # fully reciprocal 2-cycle + one one-way edge: r = 2/3
    g = GraphTables.from_arrays(
        np.array([0, 1, 2]), np.array([1, 0, 3])
    )
    assert reciprocity(g) == pytest.approx(2.0 / 3.0)
    # no reciprocal pairs
    g2 = GraphTables.from_arrays(np.array([0, 1]), np.array([1, 2]))
    assert reciprocity(g2) == pytest.approx(0.0)


def test_avg_neighbor_degree_matches_bruteforce():
    from neo4j_graph_algorithms_ray.pipelines.stats import avg_neighbor_degree

    rng = np.random.default_rng(2)
    n, m = 60, 300
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    key = np.unique(src[keep].astype(np.int64) * n + dst[keep])
    src, dst = key // n, key % n
    g = GraphTables.from_arrays(src, dst)
    vids = g.vids
    si = np.searchsorted(vids, src)
    di = np.searchsorted(vids, dst)
    dout = np.bincount(si, minlength=g.n).astype(float)
    got = avg_neighbor_degree(g).to_pandas().set_index("out_deg")
    for k in got.index:
        vs = [
            dout[di[si == v]].mean()
            for v in range(g.n)
            if dout[v] == k
        ]
        assert got.loc[k, "avg_neighbor_out_deg"] == pytest.approx(
            np.mean(vs), abs=1e-5
        )


def test_kcore_range_split_fold_skewed_targets():
    # all edges concentrated in the LOWEST id range: most fold ranges
    # receive empty slices; results must still match the driver fold
    from neo4j_graph_algorithms_ray.pipelines.kcore import kcore

    rng = np.random.default_rng(44)
    # clique among ids 0..19 plus sparse tail up to 5000
    e = [(i, j) for i in range(20) for j in range(i + 1, 20)]
    tail = rng.integers(20, 5000, (200, 2))
    e += [(min(a, b), max(a, b)) for a, b in tail if a != b]
    src = np.array([a for a, _ in e], dtype=np.int64)
    dst = np.array([b for _, b in e], dtype=np.int64)
    key = np.unique(src * 5000 + dst)
    src, dst = key // 5000, key % 5000
    g = GraphTables.from_arrays(src, dst)
    sg = g.sharded(num_shards=4)
    r_driver = kcore(g)
    old_m = sg.m
    try:
        sg.m = 20_000_000
        r_dist = kcore(g)
    finally:
        sg.m = old_m
    assert np.array_equal(r_driver.coreness, r_dist.coreness)
    # the clique is a 19-core
    vids = g.vids
    assert all(
        r_dist.coreness[np.searchsorted(vids, v)] == 19 for v in range(20)
    )


def test_greedy_coloring_proper_and_matches_replay_oracle():
    """Distributed Jones-Plassmann vs the single-machine synchronous
    replay: identical colors (same priority permutation, same
    candidate rule, same min-excluded pick), and the coloring is
    proper on every edge."""
    from neo4j_graph_algorithms_ray.pipelines.coloring import (
        coloring_oracle,
        greedy_coloring,
    )

    rng = np.random.default_rng(17)
    n, m = 400, 1600
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a < b  # one orientation per pair (the kernel contract)
    key = np.unique(a[keep] * n + b[keep])
    src, dst = key // n, key % n
    # ensure every vid 0..n-1 appears (oracle assumes dense == original)
    src = np.concatenate([src, np.arange(n - 1, dtype=np.int64)])
    dst = np.concatenate([dst, np.full(n - 1, n - 1, dtype=np.int64)])
    keep2 = src != dst
    key = np.unique(src[keep2] * n + dst[keep2])
    src, dst = key // n, key % n
    g = GraphTables.from_arrays(src, dst)
    assert g.n == n and np.array_equal(g.vids, np.arange(n))
    res = greedy_coloring(g)
    assert res.converged
    # proper: no edge joins equal colors
    assert (res.colors[src] != res.colors[dst]).all()
    # bit-identical to the synchronous replay
    want = coloring_oracle(src, dst, n)
    np.testing.assert_array_equal(res.colors, want)
    # deterministic across runs
    res2 = greedy_coloring(g)
    np.testing.assert_array_equal(res.colors, res2.colors)
    # fixed rounds past the fixpoint are no-ops
    res3 = greedy_coloring(g, fixed_rounds=res.iterations + 5)
    np.testing.assert_array_equal(res.colors, res3.colors)


def test_greedy_coloring_block_fixture_round_bound():
    """On disjoint blocks of 8 (the part_blocks shape) convergence is
    bounded by the block size, so the 10-round unrolled SQL oracle is
    always ≥ the engine's round count."""
    from neo4j_graph_algorithms_ray.pipelines.coloring import greedy_coloring

    n = 800
    a = np.arange(n, dtype=np.int64)
    srcs, dsts = [], []
    for d in (1, 2, 3):
        b = a + d
        m = (b // 8 == a // 8) & (b < n)
        srcs.append(a[m])
        dsts.append(b[m])
    src, dst = np.concatenate(srcs), np.concatenate(dsts)
    g = GraphTables.from_arrays(src, dst)
    res = greedy_coloring(g)
    assert res.converged and res.iterations <= 8
    assert (res.colors[np.searchsorted(g.vids, src)]
            != res.colors[np.searchsorted(g.vids, dst)]).all()
    # degree <= 6 -> greedy colors <= 7
    assert res.n_colors <= 7


def test_conductance_matches_bruteforce():
    from neo4j_graph_algorithms_ray.pipelines.stats import conductance

    rng = np.random.default_rng(21)
    n, m = 120, 500
    a, b = rng.integers(0, n, m), rng.integers(0, n, m)
    keep = a < b
    key = np.unique(a[keep] * n + b[keep])
    src, dst = key // n, key % n
    g = GraphTables.from_arrays(src, dst)
    # arbitrary 3-way partition labels over dense vertices
    labels = (np.arange(g.n) % 3).astype(np.int64) * 100
    out = conductance(g, labels).to_pandas().set_index("community")
    # brute force per community
    dsrc = np.searchsorted(g.vids, src)
    ddst = np.searchsorted(g.vids, dst)
    deg = np.zeros(g.n)
    np.add.at(deg, dsrc, 1.0)
    np.add.at(deg, ddst, 1.0)
    m2 = deg.sum()
    for c in (0, 100, 200):
        inside = labels == c
        vol = deg[inside].sum()
        cut = ((inside[dsrc] != inside[ddst])).sum()
        want = cut / min(vol, m2 - vol) if min(vol, m2 - vol) > 0 else 0.0
        got = out.loc[c, "conductance"]
        assert abs(got - np.floor(want * 1e6 + 0.5) / 1e6) < 1e-12
    # single-community partition: denominator 0 -> 0.0
    one = conductance(g, np.zeros(g.n, dtype=np.int64)).to_pandas()
    assert len(one) == 1 and one["conductance"][0] == 0.0


def test_greedy_coloring_range_split_fold_matches_dense():
    """Force the range-split fold path on a small graph (the k-core
    pattern: inflate sg.m) — colors bit-identical to the dense driver
    fold."""
    from neo4j_graph_algorithms_ray.pipelines.coloring import greedy_coloring

    rng = np.random.default_rng(29)
    n, m = 300, 1400
    a, b = rng.integers(0, n, m), rng.integers(0, n, m)
    keep = a < b
    key = np.unique(a[keep] * n + b[keep])
    src, dst = key // n, key % n
    g = GraphTables.from_arrays(src, dst)
    sg = g.sharded(num_shards=4)
    dense = greedy_coloring(g)
    old_m = sg.m
    try:
        sg.m = 20_000_000
        ranged = greedy_coloring(g)
    finally:
        sg.m = old_m
    np.testing.assert_array_equal(dense.colors, ranged.colors)
    assert ranged.converged and ranged.iterations == dense.iterations


def test_ktruss_matches_synchronous_peel_oracle():
    from neo4j_graph_algorithms_ray.pipelines.truss import ktruss, ktruss_oracle

    rng = np.random.default_rng(33)
    n, m = 150, 1200
    a, b = rng.integers(0, n, m), rng.integers(0, n, m)
    keep = a != b
    g = GraphTables.from_arrays(a[keep], b[keep])
    assert np.array_equal(g.vids, np.arange(g.n))  # dense == original here
    for k in (3, 4, 5):
        res = ktruss(g, k=k)
        assert res.converged
        ou, ov = ktruss_oracle(a[keep], b[keep], g.n, k)
        np.testing.assert_array_equal(res.u, ou)
        np.testing.assert_array_equal(res.v, ov)
    # every 4-truss edge closes >= 2 triangles inside the truss
    res = ktruss(g, k=4)
    if len(res.u):
        adj = {}
        for x, y in zip(res.u, res.v):
            adj.setdefault(int(x), set()).add(int(y))
            adj.setdefault(int(y), set()).add(int(x))
        assert all(
            len(adj[int(x)] & adj[int(y)]) >= 2
            for x, y in zip(res.u, res.v)
        )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ktruss(g, k=2)


def test_ktruss_clique_and_triangle_free():
    from neo4j_graph_algorithms_ray.pipelines.truss import ktruss

    # K5 is a 5-truss: survives k=5 fully, dies at k=6
    uu, vv = np.triu_indices(5, 1)
    g = GraphTables.from_arrays(uu.astype(np.int64), vv.astype(np.int64))
    assert len(ktruss(g, k=5).u) == 10
    assert len(ktruss(g, k=6).u) == 0
    # a path (triangle-free) has no 3-truss
    p = GraphTables.from_arrays(np.arange(6, dtype=np.int64),
                                np.arange(1, 7, dtype=np.int64))
    r = ktruss(p, k=3)
    assert len(r.u) == 0 and r.converged


def test_ktruss_augmented_block_fixture_selective_and_bounded():
    """The registry fixture's shape: even blocks (extra +4 edges,
    min support 3) survive k=5 whole; odd blocks cascade away; the
    peel converges within 3 rounds (the 5-round SQL unroll's bound),
    including a truncated final block."""
    from neo4j_graph_algorithms_ray.pipelines.truss import ktruss

    n = 805  # truncated last block
    a = np.arange(n, dtype=np.int64)
    srcs, dsts = [], []
    for d in (1, 2, 3):
        b = a + d
        m = (b // 8 == a // 8) & (b < n)
        srcs.append(a[m]); dsts.append(b[m])
    b = a + 4
    m = (b // 8 == a // 8) & (b < n) & ((a // 8) % 2 == 0)
    srcs.append(a[m]); dsts.append(b[m])
    g = GraphTables.from_arrays(np.concatenate(srcs), np.concatenate(dsts))
    res = ktruss(g, k=5)
    assert res.converged and res.rounds <= 3
    surv_blocks = set((g.vids[res.u] // 8).tolist())
    assert all(blk % 2 == 0 for blk in surv_blocks)
    # every whole even block survives completely (22 edges each), and
    # the truncated even block 100 (vertices 800-804, a K5 under d<=4,
    # itself a 5-truss) survives with its 10 edges
    whole_even = [blk for blk in range(n // 8) if blk % 2 == 0]
    assert len(res.u) == 22 * len(whole_even) + 10
    assert 100 in surv_blocks
