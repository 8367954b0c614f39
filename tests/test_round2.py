"""Round-2 additions: bucketed triangles, node2vec walks, set
similarity, LSH embedding near-dup, SCC trim, checkpoint lineage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.state.graph import GraphTables


def _random_graph(seed: int, n: int = 300, m: int = 2000) -> GraphTables:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    return GraphTables.from_arrays(src, dst, extra_vids=np.arange(n))


def test_bucketed_triangles_match_dense():
    from neo4j_graph_algorithms_ray.pipelines.triangles import (
        triangle_count,
        triangle_count_bucketed,
    )

    g = _random_graph(7)
    dense = triangle_count(g, kernel="dense")
    bucketed = triangle_count_bucketed(g)
    np.testing.assert_array_equal(dense.triangles, bucketed.triangles)
    assert dense.triangle_count == bucketed.triangle_count
    np.testing.assert_allclose(dense.coefficients, bucketed.coefficients)


def test_node2vec_walks_seeded_and_biased():
    from neo4j_graph_algorithms_ray.pipelines.walks import node2vec_walks

    # path graph 0-1-2-...-9: with q >> 1 (strong return/BFS bias) the
    # walk should revisit prev far more often than with q << 1
    n = 10
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    g = GraphTables.from_arrays(src, dst, extra_vids=np.arange(n))
    starts = np.array([4])

    def backtracks(p, q):
        t = (
            node2vec_walks(g, starts, steps=40, p=p, q=q, seed=11, directed=False)
            .to_pandas()
            .sort_values("step")
        )
        v = t["vid"].to_numpy()
        return int((v[2:] == v[:-2]).sum())

    # determinism
    a = node2vec_walks(g, starts, steps=10, p=0.5, q=2.0, seed=3).to_pandas()
    b = node2vec_walks(g, starts, steps=10, p=0.5, q=2.0, seed=3).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["walk_id", "step"]).reset_index(drop=True),
        b.sort_values(["walk_id", "step"]).reset_index(drop=True),
    )
    # all steps traverse real edges
    vv = a.sort_values("step")["vid"].to_numpy()
    assert (np.abs(np.diff(vv)) == 1).all()
    # low p (return-prone) backtracks more than high p
    assert backtracks(0.1, 1.0) > backtracks(10.0, 1.0)


def test_write_back_sinks_resumable(tmp_path):
    from neo4j_graph_algorithms_ray.state.sinks import (
        write_node_properties,
        write_relationships,
    )

    g = _random_graph(3, n=200, m=800)
    vec = np.arange(200, dtype=np.float64)
    d = str(tmp_path / "props")
    st = write_node_properties(g, {"score": vec}, d, partitions=4)
    assert st["rows"] == 200 and st["skipped"] == 0
    assert (tmp_path / "props" / "_SUCCESS").exists()
    back = pd.concat(
        [pd.read_parquet(str(tmp_path / "props" / f)) for f in sorted(
            p for p in __import__("os").listdir(d) if p.endswith(".parquet"))],
        ignore_index=True,
    ).sort_values("vid")
    np.testing.assert_array_equal(back["score"].to_numpy(), vec)
    # resume: drop one partition, re-run → only that one rewritten
    (tmp_path / "props" / "part-00002.parquet").unlink()
    st2 = write_node_properties(g, {"score": vec}, d, partitions=4)
    assert st2["skipped"] == 3 and st2["rows"] == 50

    rels = pd.DataFrame({"src": [1, 2], "dst": [2, 3], "similarity": [0.9, 0.8]})
    st3 = write_relationships(rels, str(tmp_path / "rels"))
    assert st3["rows"] == 2
    assert (tmp_path / "rels" / "_SUCCESS").exists()


def test_ivf_topk_recall_vs_exact():
    from neo4j_graph_algorithms_ray.pipelines.similarity import ann_topk, ivf_topk

    rng = np.random.default_rng(17)
    n, d = 400, 32
    # clustered embeddings (IVF's favorable regime): recall should be
    # high when neighbors share cells
    centers = rng.standard_normal((8, d)) * 3
    m = centers[rng.integers(0, 8, n)] + rng.standard_normal((n, d)) * 0.3
    emb = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(m.astype(np.float32))})
    )
    qs = [0, 1, 2, 3]
    exact = ann_topk(emb, qs, k=5)
    approx = ivf_topk(emb, qs, k=5, n_centroids=8, nprobe=2)
    hit = len(approx.merge(exact, on=["query_id", "vec_id"]))
    assert hit / len(exact) >= 0.9
    # determinism
    again = ivf_topk(emb, qs, k=5, n_centroids=8, nprobe=2)
    pd.testing.assert_frame_equal(approx, again)


def test_lpa_range_engine_matches_actor():
    from neo4j_graph_algorithms_ray.pipelines.labelprop import (
        LabelPropagationConfig,
        label_propagation,
    )

    g = _random_graph(13, n=400, m=3000)
    a = label_propagation(g, LabelPropagationConfig(engine="actor"))
    r = label_propagation(g, LabelPropagationConfig(engine="range"))
    np.testing.assert_array_equal(a.labels, r.labels)
    assert a.iterations == r.iterations and r.converged == a.converged
    # multi-range protocol exercised explicitly (R=4): vote triples
    # split shard -> owner, driver folds changed-counts only
    from neo4j_graph_algorithms_ray.state.shards import RangeEngine

    sg = g.sharded()
    eng = RangeEngine(sg, num_ranges=4)
    assert eng.num_ranges == 4
    labels = g.vids.copy()
    eng.set_vector(arr=labels)
    for _ in range(a.iterations):
        changed = eng.lpa_round()
        if changed == 0:
            break
    np.testing.assert_array_equal(a.labels, eng.collect())
    # weighted + directed variant, fixed iterations
    gw = GraphTables.from_arrays(
        np.array([0, 1, 2, 3, 0]), np.array([1, 2, 3, 0, 2]),
        weight=np.array([1.0, 2.0, 3.0, 1.0, 5.0]),
    )
    cfgs = dict(weighted=True, directed=True, fixed_iterations=3)
    aw = label_propagation(gw, LabelPropagationConfig(engine="actor", **cfgs))
    rw = label_propagation(gw, LabelPropagationConfig(engine="range", **cfgs))
    np.testing.assert_array_equal(aw.labels, rw.labels)


def test_set_similarity_single_task_and_shuffle_paths_agree(monkeypatch):
    from neo4j_graph_algorithms_ray.pipelines import setsimilarity as S

    rng = np.random.default_rng(11)
    e = rng.integers(0, 30, 400)
    i = rng.integers(0, 12, 400)
    items = rd.from_arrow(pa.table({"e": e, "i": i}))
    small = S.set_similarity_topk(items, metric="overlap", topk=3, cutoff=0.2).to_pandas()
    monkeypatch.setattr(S, "_SINGLE_TASK_MAX_ROWS", 0)
    big = S.set_similarity_topk(items, metric="overlap", topk=3, cutoff=0.2).to_pandas()
    key = ["entity_a", "rank"]
    pd.testing.assert_frame_equal(
        small.sort_values(key).reset_index(drop=True),
        big.sort_values(key).reset_index(drop=True),
        check_like=True,
    )


def test_set_similarity_distributed_engine_with_item_cap():
    # engine="distributed" forces the tagged-union size-attach path on
    # small data; the hot-item cap must drop the same pairs as the
    # single-task engine.
    from neo4j_graph_algorithms_ray.pipelines import setsimilarity as S

    rng = np.random.default_rng(23)
    e = rng.integers(0, 30, 400)
    i = rng.integers(0, 12, 400)
    items = rd.from_arrow(pa.table({"e": e, "i": i}))
    for metric in ("jaccard", "overlap"):
        single = S.set_similarity_topk(
            items, metric=metric, topk=3, cutoff=0.2,
            max_item_entities=20, engine="single",
        ).to_pandas()
        dist = S.set_similarity_topk(
            items, metric=metric, topk=3, cutoff=0.2,
            max_item_entities=20, engine="distributed",
        ).to_pandas()
        assert len(single) > 0
        key = ["entity_a", "rank"]
        pd.testing.assert_frame_equal(
            single.sort_values(key).reset_index(drop=True),
            dist.sort_values(key).reset_index(drop=True),
            check_like=True,
        )


def test_set_similarity_topk_matches_bruteforce():
    from neo4j_graph_algorithms_ray.pipelines.setsimilarity import (
        set_similarity_topk,
    )

    rng = np.random.default_rng(5)
    n_e, n_i, rows = 40, 15, 600
    e = rng.integers(0, n_e, rows)
    i = rng.integers(0, n_i, rows)
    items = rd.from_arrow(pa.table({"e": e, "i": i}))
    out = set_similarity_topk(items, metric="jaccard", topk=2, cutoff=0.3).to_pandas()

    sets = {}
    for a, b in zip(e, i):
        sets.setdefault(int(a), set()).add(int(b))
    expect_rows = []
    for a in sorted(sets):
        sims = []
        for b in sorted(sets):
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            sim = inter / uni if uni else 0.0
            if sim >= 0.3:
                sims.append((-sim, b))
        sims.sort()
        for rank, (negsim, b) in enumerate(sims[:2], start=1):
            expect_rows.append((a, b, rank, -negsim))
    expect = pd.DataFrame(
        expect_rows, columns=["entity_a", "entity_b", "rank", "similarity"]
    )
    got = out.sort_values(["entity_a", "rank"]).reset_index(drop=True)
    expect = expect.sort_values(["entity_a", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"entity_a": "int64", "entity_b": "int64", "rank": "int64"}),
        expect.astype({"entity_a": "int64", "entity_b": "int64", "rank": "int64"}),
    )


def test_lsh_cosine_neardup_recall():
    from neo4j_graph_algorithms_ray.pipelines.similarity import (
        cosine_neardup,
        lsh_cosine_neardup,
    )

    rng = np.random.default_rng(0)
    # 40 clusters of near-identical vectors + noise singletons
    dim, reps = 32, 4
    centers = rng.standard_normal((40, dim))
    vecs = []
    for c in centers:
        for _ in range(reps):
            vecs.append(c + 0.01 * rng.standard_normal(dim))
    vecs.extend(rng.standard_normal((80, dim)))
    m = np.array(vecs, dtype=np.float32)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(len(m), dtype=np.int64),
                "embedding": list(m),
            }
        )
    )
    exact = cosine_neardup(emb, threshold=0.9)
    approx = lsh_cosine_neardup(emb, threshold=0.9).to_pandas()
    exact_pairs = set(zip(exact["doc_a"], exact["doc_b"]))
    approx_pairs = set(zip(approx["doc_a"], approx["doc_b"]))
    assert exact_pairs, "fixture must contain near-dup pairs"
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.95
    # no false positives: every reported pair is exact-verified
    assert approx_pairs <= exact_pairs


def test_scc_trim_preserves_results():
    from neo4j_graph_algorithms_ray.pipelines.components import (
        scc,
        scc_numpy_oracle,
    )

    rng = np.random.default_rng(13)
    n, m = 120, 300  # sparse & DAG-ish: most vertices trim away
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = GraphTables.from_arrays(src, dst, extra_vids=np.arange(n))
    si = np.searchsorted(g.vids, src)
    di = np.searchsorted(g.vids, dst)
    expect = g.vids[scc_numpy_oracle(si, di, g.n)]
    got_trim = scc(g, trim=True, engine="dataflow")
    got_plain = scc(g, trim=False, engine="dataflow")
    np.testing.assert_array_equal(got_trim.components, expect)
    np.testing.assert_array_equal(got_plain.components, expect)


def test_checkpoint_rejects_foreign_lineage(tmp_path):
    from neo4j_graph_algorithms_ray.state.checkpoint import (
        CheckpointConfig,
        load_iteration,
        save_iteration,
    )

    cfg = CheckpointConfig(dir=str(tmp_path))
    vids = np.arange(10, dtype=np.int64)
    save_iteration(cfg, 1, vids, {"rank": np.ones(10)}, {}, input_token="t")
    # same graph resumes fine
    _, vectors, _ = load_iteration(cfg, 1, expect_vids=vids)
    assert np.allclose(vectors["rank"], 1.0)
    # a different vertex set is refused
    with pytest.raises(IOError):
        load_iteration(cfg, 1, expect_vids=np.arange(11, dtype=np.int64))
    with pytest.raises(IOError):
        load_iteration(cfg, 1, expect_vids=vids + 5)


def test_range_engine_matches_actor_engine():
    from neo4j_graph_algorithms_ray.pipelines.components import wcc
    from neo4j_graph_algorithms_ray.pipelines.pagerank import (
        PageRankConfig,
        pagerank,
    )
    from neo4j_graph_algorithms_ray.state.shards import RangeEngine

    rng = np.random.default_rng(1)
    n, m = 3000, 30000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.random(m) + 0.1
    g = GraphTables.from_arrays(src, dst, weight=w, extra_vids=np.arange(n))

    # engine="range" end to end (unweighted + weighted)
    for weighted in (False, True):
        ref = pagerank(
            g, PageRankConfig(fixed_iterations=8, engine="actor", weighted=weighted)
        ).ranks
        got = pagerank(
            g, PageRankConfig(fixed_iterations=8, engine="range", weighted=weighted)
        ).ranks
        np.testing.assert_array_equal(ref, got)  # bit-identical

    # multi-range protocol exercised explicitly (R=4): partials flow
    # shard -> owner, driver folds scalars only
    sg = g.sharded()
    eng = RangeEngine(sg, num_ranges=4)
    assert eng.num_ranges == 4
    alpha = 1.0 - 0.85
    deg = sg.degree("out")
    eng.set_multiplier(np.where(deg > 0, 1.0 / deg, 0.0))
    eng.set_vector(value=alpha)
    for _ in range(8):
        delta = eng.pagerank_round(alpha, 0.85, False)
    assert np.isscalar(delta)
    ref = pagerank(g, PageRankConfig(fixed_iterations=8, engine="actor")).ranks
    np.testing.assert_array_equal(ref, eng.collect())

    # WCC fixpoint identical (plain min rounds, no pointer jumping)
    np.testing.assert_array_equal(
        wcc(g, engine="actor").components, wcc(g, engine="range").components
    )


def test_catalog_utility_procedures():
    from neo4j_graph_algorithms_ray.state import catalog

    assert catalog.version()
    procs = catalog.list_procedures()
    names = {p["name"] for p in procs}
    assert "pagerank.pagerank" in names
    assert "components.wcc" in names
    only_pr = catalog.list_procedures("pagerank.")
    assert only_pr and all(p["name"].startswith("pagerank.") for p in only_pr)

    g = GraphTables.from_arrays(np.array([5]), np.array([9]))
    assert catalog.as_node(g, 0) == {"dense_id": 0, "vid": 5}
    assert catalog.as_node(g, 1) == {"dense_id": 1, "vid": 9}
    with pytest.raises(KeyError):
        catalog.as_node(g, 2)


def test_cli_job_entrypoint(tmp_path):
    # `ray job submit` surface: edge parquet -> pipeline -> partitioned
    # parquet sink + one JSON metrics line; second run skips the
    # finished partition (resumable output)
    import json

    import duckdb

    from neo4j_graph_algorithms_ray.__main__ import main

    edges = tmp_path / "edges.parquet"
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES (1,2),(2,3),(3,1),(3,4)) t(src,dst)) "
        f"TO '{edges}' (FORMAT PARQUET)"
    )
    out = tmp_path / "rank"
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["pagerank", "--edges", str(edges), "--out", str(out)])
    assert rc == 0
    m = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert m["vertices"] == 4 and m["edges"] == 4 and m["converged"]
    assert (out / "_SUCCESS").exists()

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["pagerank", "--edges", str(edges), "--out", str(out)])
    m2 = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert m2["sink_skipped"] == m["sink_partitions"]


def test_cli_hits_and_kcore(tmp_path):
    import contextlib
    import io
    import json

    import duckdb

    from neo4j_graph_algorithms_ray.__main__ import main

    edges = tmp_path / "edges.parquet"
    # K3 triangle + pendant: coreness 2/2/2/1; all vertices hub+auth > 0
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES (1,2),(2,3),(3,1),(3,4)) t(src,dst)) "
        f"TO '{edges}' (FORMAT PARQUET)"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["hits", "--edges", str(edges), "--out", str(tmp_path / "h")])
    assert rc == 0
    m = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert m["converged"] and m["vertices"] == 4

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["kcore", "--edges", str(edges), "--out", str(tmp_path / "k")])
    assert rc == 0
    m = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert m["converged"] and m["max_coreness"] == 2
    import pyarrow.parquet as pq

    t = (
        pq.read_table(str(tmp_path / "k"))
        .to_pandas()
        .set_index("vid")["coreness"]
    )
    assert t[1] == 2 and t[2] == 2 and t[3] == 2 and t[4] == 1
