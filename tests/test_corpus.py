import numpy as np
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.pagerank import PageRankConfig, pagerank
from neo4j_graph_algorithms_ray.sources.corpus import (
    CorpusSpec,
    corpus_table,
    derive_repo_links,
    generate_corpus,
    verify_sha_invariant,
)
from neo4j_graph_algorithms_ray.state.graph import GraphTables

SPEC = CorpusSpec(repos=30)


def test_corpus_deterministic(tmp_path):
    t1 = corpus_table(SPEC)
    t2 = corpus_table(SPEC)
    assert t1.equals(t2)
    assert t1.column_names == ["repo", "path", "commit", "lang", "content"]
    # generator writes the same rows via Ray
    generate_corpus(str(tmp_path / "c"), SPEC)
    t3 = rd.read_parquet(str(tmp_path / "c")).to_pandas()
    p1 = t1.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    p3 = t3.sort_values(["repo", "path"]).reset_index(drop=True)
    assert p1.equals(p3)


def test_derive_repo_links_and_sha_invariant():
    corpus = rd.from_arrow(corpus_table(SPEC))
    derived = derive_repo_links(corpus)
    assert derived.stats["repos"] > 0
    edges = derived.edges.to_pandas()
    assert len(edges) > 0
    # canonical pairs: src < dst, no duplicates
    assert (edges["src"] < edges["dst"]).all()
    assert not edges.duplicated(["src", "dst"]).any()
    assert (edges["weight"] >= 1).all()
    # sha invariant: every derived file row matches recomputed sha256
    inv = verify_sha_invariant(corpus, derived.files)
    assert inv["sha_ok"] == inv["rows"] == inv["corpus_rows"]


def test_derive_matches_pandas_oracle():
    corpus = corpus_table(SPEC)
    derived = derive_repo_links(rd.from_arrow(corpus))
    edges = derived.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)

    # pandas oracle: same link rule
    import hashlib
    import itertools

    import pandas as pd

    df = corpus.to_pandas()
    df["sha"] = df["content"].map(lambda c: hashlib.sha256(c.encode()).hexdigest())
    keys = []
    for _, r in df.iterrows():
        keys.append(("s:" + r.sha, r.repo))
        if r.path.startswith(("vendor/", "framework/")):
            keys.append(("p:" + r.path, r.repo))
    kdf = pd.DataFrame(keys, columns=["key", "repo"])
    repos = sorted(kdf["repo"].unique())
    vid = {r: i for i, r in enumerate(repos)}
    cnt: dict[tuple[int, int], int] = {}
    for _, grp in kdf.groupby("key"):
        rs = sorted(set(grp["repo"]))
        for a, b in itertools.combinations(rs, 2):
            cnt[(vid[a], vid[b])] = cnt.get((vid[a], vid[b]), 0) + 1
    oracle = (
        pd.DataFrame(
            [(a, b, float(w)) for (a, b), w in cnt.items()],
            columns=["src", "dst", "weight"],
        )
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(edges, oracle)


def test_stop_key_cap_drops_framework_clique():
    corpus = rd.from_arrow(corpus_table(SPEC))
    full = derive_repo_links(corpus)
    capped = derive_repo_links(corpus, max_group_size=5)
    assert capped.edges.count() < full.edges.count()


def test_corpus_graph_pagerank_end_to_end():
    corpus = rd.from_arrow(corpus_table(SPEC))
    derived = derive_repo_links(corpus)
    g = GraphTables.from_dataset(
        derived.edges, weight="weight", extra_vids=derived.vertices["vid"].to_numpy()
    )
    res = pagerank(g, PageRankConfig(max_iterations=50))
    assert res.converged
    assert np.isfinite(res.ranks).all()
