import json
import os

import numpy as np

from neo4j_graph_algorithms_ray.pipelines.pagerank import PageRankConfig, pagerank
from neo4j_graph_algorithms_ray.state.checkpoint import (
    CheckpointConfig,
    latest_complete,
    load_iteration,
)
from neo4j_graph_algorithms_ray.state.graph import GraphTables

from .conftest import PAGERANK_WIKI_EDGES, PAGERANK_WIKI_NODES, edge_arrays, names_to_ids


def _graph():
    ids = names_to_ids(PAGERANK_WIKI_NODES)
    src, dst = edge_arrays(PAGERANK_WIKI_EDGES, ids)
    return GraphTables.from_arrays(src, dst)


def test_resume_midrun_bit_identical(tmp_path):
    g = _graph()
    # uninterrupted run
    full = pagerank(g, PageRankConfig(fixed_iterations=12))

    # interrupted run: stop ("kill") after 3 iterations, checkpointing on
    ck = CheckpointConfig(dir=str(tmp_path / "ck"), every=1)
    part = pagerank(g, PageRankConfig(fixed_iterations=3, checkpoint=ck))
    assert latest_complete(ck) == 3

    # resume to 12 — must be BIT-identical to the uninterrupted run
    resumed = pagerank(g, PageRankConfig(fixed_iterations=12, checkpoint=ck))
    assert resumed.iterations == 12
    assert np.array_equal(full.ranks, resumed.ranks)  # exact, not allclose

    # lineage: rows complete, checksums verify on load
    vids, vectors, lineage = load_iteration(ck, 12)
    assert lineage["rows"] == g.n
    assert sum(p["rows"] for p in lineage["partitions"]) == g.n
    np.testing.assert_array_equal(vectors["rank"], resumed.ranks)
    # metrics recorded per iteration
    with open(os.path.join(ck.dir, "iter=00012", "metrics.json")) as f:
        m = json.load(f)
    assert m["iteration"] == 12 and "delta" in m and "edges_per_sec" in m


def test_resume_ignores_incomplete_iteration(tmp_path):
    g = _graph()
    ck = CheckpointConfig(dir=str(tmp_path / "ck"), every=1)
    pagerank(g, PageRankConfig(fixed_iterations=2, checkpoint=ck))
    # simulate a crash mid-write: iteration dir without _SUCCESS
    broken = tmp_path / "ck" / "iter=00003"
    broken.mkdir()
    (broken / "state.parquet").write_bytes(b"garbage")
    assert latest_complete(ck) == 2
    resumed = pagerank(g, PageRankConfig(fixed_iterations=5, checkpoint=ck))
    full = pagerank(g, PageRankConfig(fixed_iterations=5))
    assert np.array_equal(full.ranks, resumed.ranks)


def test_checkpoint_corruption_detected(tmp_path):
    g = _graph()
    ck = CheckpointConfig(dir=str(tmp_path / "ck"), every=1)
    pagerank(g, PageRankConfig(fixed_iterations=1, checkpoint=ck))
    # flip lineage checksum → load must fail loudly
    lin_path = tmp_path / "ck" / "iter=00001" / "lineage.json"
    lineage = json.loads(lin_path.read_text())
    lineage["partitions"][0]["checksum"] ^= 0xFF
    lin_path.write_text(json.dumps(lineage))
    try:
        load_iteration(ck, 1)
        raise AssertionError("corruption not detected")
    except IOError as e:
        assert "checksum" in str(e)


def test_wcc_resume_identical(tmp_path):
    rng = np.random.default_rng(2)
    n, m = 300, 1200
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    g = GraphTables.from_arrays(src[keep], dst[keep], extra_vids=np.arange(n))
    from neo4j_graph_algorithms_ray.pipelines.components import wcc

    full = wcc(g, engine="actor")
    ck = CheckpointConfig(dir=str(tmp_path / "wcc_ck"), every=1)
    # "killed" after first checkpointed round: rebuild config resuming
    wcc(g, engine="actor", checkpoint=CheckpointConfig(dir=ck.dir, every=1))
    assert latest_complete(ck) is not None
    resumed = wcc(g, engine="actor", checkpoint=ck)
    np.testing.assert_array_equal(full.components, resumed.components)
    assert full.set_count == resumed.set_count


def test_lpa_resume_identical(tmp_path):
    from neo4j_graph_algorithms_ray.pipelines.labelprop import (
        LabelPropagationConfig,
        label_propagation,
    )

    rng = np.random.default_rng(4)
    n, m = 200, 900
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    g = GraphTables.from_arrays(src[keep], dst[keep], extra_vids=np.arange(n))
    full = label_propagation(g, LabelPropagationConfig(fixed_iterations=6, engine="actor"))
    ck = CheckpointConfig(dir=str(tmp_path / "lpa_ck"), every=1)
    label_propagation(
        g, LabelPropagationConfig(fixed_iterations=3, engine="actor", checkpoint=ck)
    )
    assert latest_complete(ck) == 3
    resumed = label_propagation(
        g, LabelPropagationConfig(fixed_iterations=6, engine="actor", checkpoint=ck)
    )
    np.testing.assert_array_equal(full.labels, resumed.labels)


def test_hits_resume_identical(tmp_path):
    from neo4j_graph_algorithms_ray.pipelines.pagerank import hits

    g = _graph()
    full = hits(g, fixed_iterations=10)
    ck = CheckpointConfig(dir=str(tmp_path / "hck"), every=1)
    hits(g, fixed_iterations=4, checkpoint=ck)
    ck_resume = CheckpointConfig(dir=str(tmp_path / "hck"), every=1, resume=True)
    resumed = hits(g, fixed_iterations=10, checkpoint=ck_resume)
    np.testing.assert_array_equal(full.hubs, resumed.hubs)
    np.testing.assert_array_equal(full.auths, resumed.auths)
    assert resumed.iterations == 10


def test_kcore_resume_identical(tmp_path):
    """Kill after 2 h-operator rounds, resume: coreness bit-identical
    to the uninterrupted run (the first resumed round runs without the
    frontier mask — the always-sound all-active superset)."""
    from neo4j_graph_algorithms_ray.pipelines.kcore import (
        kcore,
        kcore_peel_oracle,
    )

    rng = np.random.default_rng(13)
    n, m = 200, 900
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    key = np.unique(lo * n + hi)
    src, dst = key // n, key % n
    g = GraphTables.from_arrays(src, dst)

    full = kcore(g, fixed_rounds=8)
    ck = CheckpointConfig(dir=str(tmp_path / "kck"), every=1)
    kcore(g, fixed_rounds=2, checkpoint=ck)
    assert latest_complete(ck) == 2
    resumed = kcore(g, fixed_rounds=8, checkpoint=ck)
    np.testing.assert_array_equal(full.coreness, resumed.coreness)
    assert latest_complete(ck) == 8
    # and both equal the exact peel
    remap = -np.ones(n, dtype=np.int64)
    remap[g.vids] = np.arange(g.n)
    oracle = kcore_peel_oracle(remap[src], remap[dst], g.n)
    np.testing.assert_array_equal(full.coreness, oracle)
