import numpy as np
import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


def names_to_ids(names: str | list[str]) -> dict[str, int]:
    """'a b c' -> {'a': 0, 'b': 1, ...} stable vertex ids for fixtures."""
    if isinstance(names, str):
        names = names.split()
    return {s: i for i, s in enumerate(names)}


def edge_arrays(edges: list[tuple[str, str]], ids: dict[str, int]):
    src = np.array([ids[a] for a, _ in edges], dtype=np.int64)
    dst = np.array([ids[b] for _, b in edges], dtype=np.int64)
    return src, dst


# FIXTURES.md §3.1 pagerank_wiki (≈ reference PageRankTest fixture)
PAGERANK_WIKI_NODES = "a b c d e f g h i j k"
PAGERANK_WIKI_EDGES = [
    ("b", "c"),
    ("c", "b"),
    ("d", "a"),
    ("d", "b"),
    ("e", "b"),
    ("e", "d"),
    ("e", "f"),
    ("f", "b"),
    ("f", "e"),
    ("g", "b"),
    ("g", "e"),
    ("h", "b"),
    ("h", "e"),
    ("i", "b"),
    ("i", "e"),
    ("j", "e"),
    ("k", "e"),
]

# FIXTURES.md §3.4 triangles_k4_plus_tail (undirected edge list, canonical u<v)
K4_TAIL_NODES = "a b c d e"
K4_TAIL_EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("a", "d"),
    ("b", "c"),
    ("b", "d"),
    ("c", "d"),
    ("d", "e"),
]

# FIXTURES.md §3.5 scc_two_cycles_bridge
SCC_NODES = "a b c d e f"
SCC_EDGES = [
    ("a", "b"),
    ("b", "c"),
    ("c", "a"),
    ("d", "e"),
    ("e", "f"),
    ("f", "d"),
    ("c", "d"),
]
