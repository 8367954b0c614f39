import numpy as np

from neo4j_graph_algorithms_ray.pipelines.labelprop import (
    LabelPropagationConfig,
    label_propagation,
)
from neo4j_graph_algorithms_ray.state.graph import GraphTables

from .conftest import edge_arrays, names_to_ids


def _two_camps_graph():
    # FIXTURES.md §3.3: two 4-cliques joined by bridge d-e (undirected input:
    # each undirected edge listed once; LPA uses the BOTH view). Vertex ids
    # start at 10 so the seed labels 1 and 2 sit below the unseeded
    # own-vid labels, as the fixture specifies.
    ids = {c: i + 10 for i, c in enumerate("abcdefgh")}
    clique1 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    clique2 = [("e", "f"), ("e", "g"), ("e", "h"), ("f", "g"), ("f", "h"), ("g", "h")]
    bridge = [("d", "e")]
    src, dst = edge_arrays(clique1 + clique2 + bridge, ids)
    return ids, GraphTables.from_arrays(src, dst)


def test_lpa_two_camps_with_seeds():
    ids, g = _two_camps_graph()
    seeds = np.full(g.n, -1, dtype=np.int64)
    dense = {k: v - 10 for k, v in ids.items()}  # vids 10.. → dense 0..
    seeds[dense["a"]] = 1
    seeds[dense["e"]] = 2
    res = label_propagation(g, LabelPropagationConfig(max_iterations=50), seeds=seeds)
    assert res.converged
    camp1 = {res.labels[dense[x]] for x in "abcd"}
    camp2 = {res.labels[dense[x]] for x in "efgh"}
    assert camp1 == {1}
    assert camp2 == {2}


def test_lpa_deterministic_across_combine_modes():
    ids, g = _two_camps_graph()
    a = label_propagation(g, LabelPropagationConfig(fixed_iterations=2, combine="driver"))
    b = label_propagation(g, LabelPropagationConfig(fixed_iterations=2, combine="shuffle"))
    np.testing.assert_array_equal(a.labels, b.labels)


def test_lpa_weighted_vote_beats_count():
    # v2 has two votes for label(v0) (w=1 each) vs one heavy vote label(v3) w=5
    src = np.array([0, 1, 3], dtype=np.int64)
    dst = np.array([2, 2, 2], dtype=np.int64)
    w = np.array([1.0, 1.0, 5.0])
    g = GraphTables.from_arrays(src, dst, w)
    seeds = np.array([10, 10, -1, 30], dtype=np.int64)
    res = label_propagation(
        g,
        LabelPropagationConfig(fixed_iterations=1, weighted=True, directed=True),
        seeds=seeds,
    )
    assert res.labels[2] == 30
    unweighted = label_propagation(
        g, LabelPropagationConfig(fixed_iterations=1, directed=True), seeds=seeds
    )
    assert unweighted.labels[2] == 10


def test_lpa_tiebreak_min_label():
    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([2, 2], dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)
    seeds = np.array([50, 40, -1], dtype=np.int64)
    res = label_propagation(
        g, LabelPropagationConfig(fixed_iterations=1, directed=True), seeds=seeds
    )
    assert res.labels[2] == 40


def test_lpa_isolated_keeps_label():
    ids = names_to_ids("a b z")
    src, dst = edge_arrays([("a", "b")], ids)
    g = GraphTables.from_arrays(src, dst, extra_vids=np.array([ids["z"]]))
    res = label_propagation(g, LabelPropagationConfig(max_iterations=10))
    assert res.labels[ids["z"]] == ids["z"]
