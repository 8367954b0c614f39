import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.similarity import (
    ann_topk,
    cosine_neardup,
    lsh_topk,
)
from neo4j_graph_algorithms_ray.pipelines.windows import sessionize, tumbling_window
from neo4j_graph_algorithms_ray.stages.multimodal import (
    decode_features,
    frame_sample_stage,
)


def _embeddings(n=60, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    m[1] = m[0] + 0.01 * rng.standard_normal(dim)  # near-dup pair (0, 1)
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": [row.tolist() for row in m],
            }
        )
    ), m


def test_ann_topk_exact_vs_numpy():
    ds, m = _embeddings()
    top = ann_topk(ds, [0, 5], k=3)
    mm = m.astype(np.float64)
    mm = mm / np.linalg.norm(mm, axis=1, keepdims=True)
    sims = mm @ mm.T
    for q in (0, 5):
        s = sims[q].copy()
        s[q] = -np.inf
        expect = np.lexsort((np.arange(len(s)), -s))[:3]
        got = top[top["query_id"] == q]["vec_id"].to_numpy()
        np.testing.assert_array_equal(got, expect)
    assert top[(top.query_id == 0) & (top["rank"] == 1)]["vec_id"].iloc[0] == 1


def test_lsh_topk_recall():
    ds, _ = _embeddings(n=100)
    exact = ann_topk(ds, [0, 1, 2], k=5)
    approx = lsh_topk(ds, [0, 1, 2], k=5, planes=8, probes=3)
    # recall@5 ≥ 0.5 on this easy set
    e = set(map(tuple, exact[["query_id", "vec_id"]].values))
    a = set(map(tuple, approx[["query_id", "vec_id"]].values))
    assert len(e & a) / len(e) >= 0.5


def test_lsh_metric_pairs_recall_vs_exact():
    """Bucketed euclidean/pearson cutoff pair-streams: every emitted
    pair must be in the exact kernel's output with the identical
    rounded score, and recall on a planted near-pair set must clear
    0.9 (p-stable / hyperplane tables at the defaults)."""
    from neo4j_graph_algorithms_ray.pipelines.similarity import (
        lsh_metric_pairs,
        metric_pairs,
    )

    rng = np.random.default_rng(11)
    n, dim = 400, 16
    m = rng.standard_normal((n, dim)).astype(np.float32) * 5.0
    # plant 40 tight euclidean/pearson pairs
    for i in range(40):
        m[2 * i + 1] = m[2 * i] + 0.05 * rng.standard_normal(dim)
    ds = rd.from_arrow(
        pa.table(
            {"vec_id": np.arange(n, dtype=np.int64),
             "embedding": [r.tolist() for r in m]}
        )
    )
    for metric, cutoff in (("euclidean", 1.0), ("pearson", 0.995)):
        exact = (
            metric_pairs(ds, cutoff, metric=metric, engine="exact")
            .to_pandas().sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)
        )
        approx = (
            lsh_metric_pairs(ds, cutoff, metric=metric)
            .to_pandas().sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)
        )
        e = set(map(tuple, exact[["vec_id_a", "vec_id_b"]].values))
        a = set(map(tuple, approx[["vec_id_a", "vec_id_b"]].values))
        assert a <= e, f"{metric}: emitted a pair the exact kernel rejects"
        assert len(e) >= 40 and len(e & a) / len(e) >= 0.9, (metric, len(e), len(e & a))
        merged = exact.merge(approx, on=["vec_id_a", "vec_id_b"], suffixes=("_e", "_a"))
        assert np.allclose(merged["score_e"], merged["score_a"], atol=2e-4)


def test_metric_pairs_auto_routes_small_to_exact():
    ds, _ = _embeddings(n=50)
    from neo4j_graph_algorithms_ray.pipelines.similarity import metric_pairs

    a = metric_pairs(ds, 0.95, metric="cosine", engine="auto").to_pandas()
    b = metric_pairs(ds, 0.95, metric="cosine", engine="exact").to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True),
        b.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True),
    )


def test_cosine_neardup_finds_pair():
    ds, _ = _embeddings()
    pairs = cosine_neardup(ds, threshold=0.95)
    assert ((pairs["doc_a"] == 0) & (pairs["doc_b"] == 1)).any()
    assert (pairs["doc_a"] < pairs["doc_b"]).all()


def _events():
    ts = pd.date_range("2024-01-01", periods=100, freq="7min")
    return rd.from_arrow(
        pa.table(
            {
                "user_id": np.tile(np.arange(4, dtype=np.int64), 25),
                "ts": ts,
                "value": np.ones(100),
            }
        )
    )


def test_tumbling_window_counts():
    out = tumbling_window(_events(), window="1h").to_pandas()
    # pandas oracle
    df = _events().to_pandas()
    oracle = (
        df.groupby(["user_id", df["ts"].dt.floor("1h")])
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
        .rename(columns={"ts": "window_start"})
    )
    a = out.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    b = oracle.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["user_id", "window_start", "n_events", "sum_value"]],
        b[["user_id", "window_start", "n_events", "sum_value"]],
        check_dtype=False,
    )


def test_sessionize_gap_split():
    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 02:00", "2024-01-01 02:05"]
    )
    ev = rd.from_arrow(
        pa.table({"user_id": np.array([7, 7, 7, 7], dtype=np.int64), "ts": ts})
    )
    out = sessionize(ev, gap="30min").to_pandas()
    assert len(out) == 2
    assert out["n_events"].tolist() == [2, 2]


def test_multimodal_decode_stage():
    payloads = [bytes([i]) * (1024 * (i + 1)) for i in range(5)]
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": np.arange(5, dtype=np.int64),
                "kind": ["image"] * 5,
                "payload": payloads,
            }
        )
    )
    out = decode_features(media, target_size=8, concurrency=1).to_pandas()
    assert len(out) == 5
    assert all(len(f) == 6 for f in out["feature"])  # 3 means + 3 stds
    # deterministic across runs (hash-seeded fake decode)
    out2 = decode_features(media, target_size=8, concurrency=1).to_pandas()
    assert np.allclose(np.stack(out["feature"]), np.stack(out2["feature"]))
    frames = frame_sample_stage(media, every_n=2).to_pandas()
    assert (frames.groupby("media_id").size().values == [1, 1, 2, 2, 3]).all()


def test_audio_window_stage():
    from neo4j_graph_algorithms_ray.stages.multimodal import audio_window_features

    payloads = [bytes(range(256)) * 40, b"\x01" * 100]  # 10240 B, short 100 B
    media = rd.from_arrow(
        pa.table(
            {
                "media_id": np.array([0, 1], dtype=np.int64),
                "kind": ["audio"] * 2,
                "payload": payloads,
            }
        )
    )
    out = audio_window_features(media, window=4096, hop=2048, concurrency=1).to_pandas()
    # 10240 samples → 1 + (10240-4096)//2048 = 4 windows; short clip pads → 1
    counts = out.groupby("media_id").size()
    assert counts[0] == 4 and counts[1] == 1
    assert all(len(f) == 3 for f in out["feature"])
    out2 = audio_window_features(media, window=4096, hop=2048, concurrency=1).to_pandas()
    assert np.allclose(np.stack(out["feature"]), np.stack(out2["feature"]))


def test_metric_topk_euclidean_and_pearson_vs_numpy():
    from neo4j_graph_algorithms_ray.pipelines.similarity import metric_topk

    emb_ds, m = _embeddings()
    M = m.astype(np.float64)
    ids = np.arange(len(M), dtype=np.int64)
    q = 0
    # euclidean
    top = metric_topk(emb_ds, [q], k=5, metric="euclidean")
    d = np.linalg.norm(M - M[ids == q][0], axis=1)
    mask = ids != q
    order = np.lexsort((ids[mask], d[mask]))[:5]
    np.testing.assert_array_equal(top["vec_id"].to_numpy(), ids[mask][order])
    np.testing.assert_allclose(top["score"].to_numpy(), d[mask][order], atol=1e-9)
    # pearson
    topp = metric_topk(emb_ds, [q], k=5, metric="pearson")
    qv = M[ids == q][0]
    pear = np.array([np.corrcoef(qv, row)[0, 1] for row in M])
    orderp = np.lexsort((ids[mask], -pear[mask]))[:5]
    np.testing.assert_array_equal(topp["vec_id"].to_numpy(), ids[mask][orderp])
    np.testing.assert_allclose(topp["score"].to_numpy(), pear[mask][orderp], atol=1e-9)


def test_graph_catalog_lifecycle():
    from neo4j_graph_algorithms_ray.state import catalog
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    calls = []

    def build():
        calls.append(1)
        return GraphTables.from_arrays(np.array([0, 1]), np.array([1, 2]))

    g1 = catalog.load("toy", build)
    g2 = catalog.load("toy", build)  # cached — builder not re-invoked
    assert g1 is g2 and len(calls) == 1
    inf = catalog.info("toy")
    assert inf["nodes"] == 3 and inf["relationships"] == 2 and not inf["weighted"]
    assert any(e["name"] == "toy" for e in catalog.list_graphs())
    assert catalog.remove("toy") and catalog.get("toy") is None


def test_asof_join_backward_inclusive_and_blocking_independent():
    from neo4j_graph_algorithms_ray.pipelines.joins import asof_join

    ts = lambda s: np.datetime64(f"2024-01-01T00:00:{s:02d}", "us")
    left = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2, 3], dtype=np.int64),
            "ts": [ts(10), ts(4), ts(7), ts(1)],
            "event_id": np.array([100, 101, 102, 103], dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2, 2], dtype=np.int64),
            "ts": [ts(4), ts(9), ts(9), ts(5)],
            "w": np.array([1.0, 2.0, 3.0, 4.0]),
        }
    )
    out = (
        asof_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(4),
            on="ts",
            by="user_id",
            left_cols=["event_id"],
            right_cols=["w"],
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(out) == 4
    # user 1 @10 -> right @9 (w=2); user 1 @4 -> exact match @4 (w=1,
    # inclusive); user 2 @7 -> right @5 (w=4); user 3 -> unmatched null
    assert out["w"].tolist()[:3] == [2.0, 1.0, 4.0]
    assert np.isnan(out["w"].iloc[3])


def test_asof_join_tie_resolves_to_max_payload():
    from neo4j_graph_algorithms_ray.pipelines.joins import asof_join

    t0 = np.datetime64("2024-01-01T00:00:05", "us")
    left = pd.DataFrame(
        {"user_id": np.array([1], dtype=np.int64), "ts": [t0], "event_id": np.array([1], dtype=np.int64)}
    )
    right = pd.DataFrame(
        {
            "user_id": np.array([1, 1], dtype=np.int64),
            "ts": [t0, t0],  # duplicate (by, on): must pick max payload
            "w": np.array([7.0, 9.0]),
        }
    )
    out = asof_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        on="ts",
        by="user_id",
        left_cols=["event_id"],
        right_cols=["w"],
    ).to_pandas()
    assert out["w"].tolist() == [9.0]


def test_metric_pairs_cutoff_semantics():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.pipelines.similarity import metric_pairs

    vecs = [
        [1.0, 0.0, 0.0],
        [0.9, 0.1, 0.0],   # close to 0
        [0.0, 1.0, 0.0],   # far from both
        [1.0, 0.05, 0.0],  # close to 0 and 1
    ]
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(4, dtype=np.int64),
                "embedding": [np.asarray(v, np.float32) for v in vecs],
            }
        )
    )
    # euclidean: distance <= 0.2 keeps (0,1)? d(0,1)=sqrt(.01+.01)=.1414 yes;
    # d(0,3)=.05; d(1,3)=.1118; d with 2 all > 1
    out = (
        metric_pairs(emb, cutoff=0.2, metric="euclidean")
        .to_pandas()
        .sort_values(["vec_id_a", "vec_id_b"])
        .reset_index(drop=True)
    )
    assert list(zip(out.vec_id_a, out.vec_id_b)) == [(0, 1), (0, 3), (1, 3)]
    m = np.asarray(vecs)
    for _, r in out.iterrows():
        d = np.sqrt(((m[int(r.vec_id_a)] - m[int(r.vec_id_b)]) ** 2).sum())
        assert abs(r.score - round(d, 4)) < 1e-9
    # cosine cutoff high keeps only the tightest pair: cos(0,3)=0.9988
    outc = metric_pairs(emb, cutoff=0.998, metric="cosine").to_pandas()
    assert (0, 3) in set(zip(outc.vec_id_a, outc.vec_id_b))
    assert (0, 2) not in set(zip(outc.vec_id_a, outc.vec_id_b))


def test_funnel_strictly_ordered_first_touch():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.pipelines.windows import funnel

    def ts(s):
        return pd.Timestamp(f"2026-01-01 00:00:{s:02d}")

    rows = [
        # user 1 converts: view@1, click@3, purchase@5 (ttc = 4s)
        (1, "view", 1), (1, "click", 3), (1, "purchase", 5),
        # user 2: purchase BEFORE click -> stuck at step 2
        (2, "view", 1), (2, "purchase", 2), (2, "click", 4),
        # user 3: click only (never viewed) -> 0 steps
        (3, "click", 1),
        # user 4: view twice, click between them counts (after FIRST view)
        (4, "view", 1), (4, "click", 2), (4, "view", 3), (4, "purchase", 4),
    ]
    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": np.array([r[0] for r in rows], dtype=np.int64),
                "event_type": [r[1] for r in rows],
                "ts": pa.array([ts(r[2]) for r in rows], pa.timestamp("us")),
            }
        )
    )
    out = (
        funnel(ev, steps=["view", "click", "purchase"])
        .to_pandas()
        .sort_values("user_id")
        .set_index("user_id")
    )
    assert out["steps_completed"].to_dict() == {1: 3, 2: 2, 3: 0, 4: 3}
    assert out["converted"].to_dict() == {1: 1, 2: 0, 3: 0, 4: 1}
    assert out.loc[1, "time_to_convert_us"] == 4_000_000
    assert out.loc[4, "time_to_convert_us"] == 3_000_000
    assert out.loc[2, "time_to_convert_us"] == -1


def test_interval_join_containment_inclusive():
    from neo4j_graph_algorithms_ray.pipelines.joins import interval_join

    left = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
            "t": np.array([5, 10, 20, 7], dtype=np.int64),
            "eid": np.array([100, 101, 102, 103], dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2], dtype=np.int64),
            "s": np.array([0, 8, 50], dtype=np.int64),
            "e": np.array([10, 15, 60], dtype=np.int64),
            "w": np.array([1.0, 2.0, 3.0]),
        }
    )
    out = (
        interval_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            on="t", by="user_id", start="s", end="e",
            left_cols=["eid"], right_cols=["w"],
        )
        .to_pandas()
        .sort_values(["eid", "s"])
        .reset_index(drop=True)
    )
    # t=5 in [0,10]; t=10 in BOTH [0,10] (inclusive end) and [8,15];
    # t=20 in none; user 2's t=7 not in [50,60]
    assert list(zip(out.eid, out.w)) == [(100, 1.0), (101, 1.0), (101, 2.0)]


def test_kmeans_clusters_separates_planted_blobs():
    from neo4j_graph_algorithms_ray.pipelines.similarity import kmeans_clusters

    rng = np.random.default_rng(3)
    a = rng.standard_normal((30, 8)) * 0.05 + np.array([5.0] + [0] * 7)
    b = rng.standard_normal((30, 8)) * 0.05 - np.array([5.0] + [0] * 7)
    m = np.vstack([a, b]).astype(np.float32)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(60, dtype=np.int64),
                "embedding": [r.tolist() for r in m],
            }
        )
    )
    out = kmeans_clusters(emb, n_centroids=2, train_iters=4).to_pandas()
    ca = set(out[out.vec_id < 30]["cluster"])
    cb = set(out[out.vec_id >= 30]["cluster"])
    assert len(ca) == 1 and len(cb) == 1 and ca != cb


def test_kmeans_gate_and_distributed_engines_agree(monkeypatch):
    # pin the single-task gate: the same corpus through the local
    # Lloyd path (natural, under 64 MB) and the distributed per-round
    # fold (forced by hiding the size hint) must yield the same
    # codebook — the 1e-6 centroid grid absorbs summation order
    from neo4j_graph_algorithms_ray.pipelines import similarity as simmod

    rng = np.random.default_rng(9)
    m = rng.standard_normal((200, 6)).astype(np.float32)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(200, dtype=np.int64),
                "embedding": [r.tolist() for r in m],
            }
        )
    )
    gated = simmod.train_kmeans(emb, n_centroids=4, train_iters=3)
    monkeypatch.setattr(simmod, "_KMEANS_LOCAL_BYTES", 0)
    dist = simmod.train_kmeans(emb, n_centroids=4, train_iters=3)
    np.testing.assert_array_equal(gated, dist)


def test_lsh_exchange_helpers_unit():
    """Pure-numpy/Arrow units of the shared LSH join-back wire format:
    pair dedup, fixed-size-list payload round-trip, and the
    searchsorted gather (including its loud missing-key guard)."""
    from neo4j_graph_algorithms_ray.pipelines.similarity import (
        _float_lists,
        _gather_by_key,
        _pair_dedup,
        _split_union_block,
        _to_matrix,
    )

    a, b = _pair_dedup(
        np.array([3, 1, 3, 1, 2], dtype=np.int64),
        np.array([7, 5, 7, 5, 9], dtype=np.int64),
    )
    assert a.tolist() == [1, 2, 3] and b.tolist() == [5, 9, 7]
    a0, b0 = _pair_dedup(
        np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    )
    assert len(a0) == 0 and len(b0) == 0

    m = np.arange(12, dtype=np.float64).reshape(4, 3)
    lists = _float_lists(m, np.float32, 3)
    t = pa.table(
        {
            "key": np.array([10, 11, 12, 13], dtype=np.int64),
            "side": np.full(4, -1, np.int64),
            "vec": lists,
        }
    )
    back = _to_matrix(t, "vec")
    assert back.shape == (4, 3) and np.allclose(back, m)

    # unioned block: 4 vector rows + 2 candidate rows (side = doc id)
    cand = pa.table(
        {
            "key": np.array([12, 10], dtype=np.int64),
            "side": np.array([99, 98], dtype=np.int64),
            "vec": pa.nulls(2, pa.list_(pa.float32(), 3)),
        }
    )
    block = pa.concat_tables([cand, t])
    ct, ckeys, cside, vkeys, vm = _split_union_block(block, "side", "vec")
    assert ckeys.tolist() == [12, 10] and cside.tolist() == [99, 98]
    # the candidate sub-table comes from the same mask — row-aligned
    assert ct["key"].to_pylist() == [12, 10]
    gathered = _gather_by_key(vkeys, vm, ckeys)
    assert np.allclose(gathered, m[[2, 0]])
    import pytest

    with pytest.raises(ValueError, match="missing its vector row"):
        _gather_by_key(vkeys, vm, np.array([999], dtype=np.int64))


def test_auto_tables_holds_recall_as_planes_grow():
    """Table auto-sizing must keep threshold recall ~constant while the
    plane count scales with the corpus: recall = 1-(1-p^planes)^tables
    with p = 1 - arccos(threshold)/pi must stay >= 0.98 at every
    auto-sized (planes, tables) pair until the 64-table clamp."""
    from neo4j_graph_algorithms_ray.pipelines.similarity import _auto_tables

    thr = 0.95
    p = 1.0 - np.arccos(thr) / np.pi
    for planes in (6, 10, 16, 22):
        tables = _auto_tables(thr, planes)
        assert 4 <= tables <= 64
        recall = 1.0 - (1.0 - p**planes) ** tables
        if tables < 64:  # below the clamp the target must be met
            assert recall >= 0.98, (planes, tables, recall)
    # monotone: more planes -> at least as many tables
    ts = [_auto_tables(thr, k) for k in (6, 10, 16, 22)]
    assert ts == sorted(ts)


def test_lsh_neardup_recall_threshold_adjacent_pairs():
    """Planted pairs NEAR the threshold (sim 0.91-0.93 vs threshold
    0.9) — the regime where under-tabled LSH silently loses recall as
    auto-sized planes grow with n (planes ~ log2(n/3) is >= 10 here).
    Pairs at sim ~0.999 survive any plane count and prove nothing."""
    from neo4j_graph_algorithms_ray.pipelines.similarity import lsh_cosine_neardup

    rng = np.random.default_rng(42)
    dim = 32
    n_noise, n_pairs = 4000, 150
    noise = rng.standard_normal((n_noise, dim))
    va = rng.standard_normal((n_pairs, dim))
    va /= np.linalg.norm(va, axis=1, keepdims=True)
    # construct the partner at an exact target cosine via an
    # orthonormal complement direction
    target = rng.uniform(0.91, 0.93, n_pairs)
    w = rng.standard_normal((n_pairs, dim))
    w -= (w * va).sum(axis=1, keepdims=True) * va
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    vb = target[:, None] * va + np.sqrt(1 - target**2)[:, None] * w
    m = np.concatenate([noise, va, vb]).astype(np.float32)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(len(m), dtype=np.int64),
                "embedding": list(m),
            }
        )
    )
    got = lsh_cosine_neardup(emb, threshold=0.9).to_pandas()
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    planted = set(
        zip(
            range(n_noise, n_noise + n_pairs),
            range(n_noise + n_pairs, n_noise + 2 * n_pairs),
        )
    )
    recall = len(pairs & planted) / n_pairs
    assert recall >= 0.9, recall
    # verify stage keeps similarities exact: every reported planted
    # pair carries its constructed cosine
    by = {(a, b): s for a, b, s in zip(got["doc_a"], got["doc_b"], got["sim"])}
    for i, t in enumerate(target):
        key = (n_noise + i, n_noise + n_pairs + i)
        if key in by:
            assert abs(by[key] - t) < 1e-3


def test_semantic_dedup_leader_rule():
    from neo4j_graph_algorithms_ray.pipelines.similarity import semantic_dedup

    rng = np.random.default_rng(11)
    dim = 16
    base = rng.standard_normal((40, dim))
    rows = [v for v in base]
    # plant near-dups of vectors 0 and 1 (tiny perturbations land in
    # the same k-means cell)
    rows.append(base[0] + 1e-4 * rng.standard_normal(dim))  # id 40
    rows.append(base[0] + 1e-4 * rng.standard_normal(dim))  # id 41
    rows.append(base[1] + 1e-4 * rng.standard_normal(dim))  # id 42
    m = np.array(rows, dtype=np.float32)
    emb = rd.from_arrow(
        pa.table(
            {"vec_id": np.arange(len(m), dtype=np.int64), "embedding": list(m)}
        )
    )
    out = (
        semantic_dedup(emb, threshold=0.95, n_centroids=4, train_iters=3)
        .to_pandas()
        .set_index("vec_id")
    )
    assert len(out) == len(m)
    # leaders (lowest id of each near-dup set) survive, copies don't
    assert bool(out.loc[0, "kept"]) and bool(out.loc[1, "kept"])
    assert not bool(out.loc[40, "kept"])
    assert not bool(out.loc[41, "kept"])
    assert not bool(out.loc[42, "kept"])
    # near-orthogonal originals all survive
    assert out.loc[2:39, "kept"].all()
    # copies landed in their leader's cluster (sanity on the cell path)
    assert out.loc[40, "cluster"] == out.loc[0, "cluster"]


def test_semantic_dedup_max_cell_chain_matches_uncapped_for_local_witnesses():
    """A skewed cell above ``max_cell``: when every duplicate's nearest
    lower-id witness is within one tile back (adjacent ids — the
    planted-dup layout), the tile chain drops exactly what the
    uncapped scan drops. Also pins bounded work: the capped run never
    materializes a cell² sims matrix (cell=96 vs cap=16)."""
    from neo4j_graph_algorithms_ray.pipelines.similarity import semantic_dedup

    rng = np.random.default_rng(5)
    dim = 8
    # n_centroids=1 forces ONE cell; leaders are near-orthogonal
    # gaussians (pairwise cosine << threshold), each followed
    # immediately by its near-copy -> witness distance 1
    leaders = rng.standard_normal((48, dim))
    rows = []
    for v in leaders:
        rows.append(v)
        rows.append(v + 1e-6 * rng.standard_normal(dim))
    m = np.array(rows, dtype=np.float64)
    emb = rd.from_arrow(
        pa.table(
            {"vec_id": np.arange(len(m), dtype=np.int64), "embedding": list(m)}
        )
    )
    uncapped = (
        semantic_dedup(
            emb, threshold=0.95, n_centroids=1, train_iters=1,
            max_cell=1 << 20,
        )
        .to_pandas().sort_values("vec_id")["kept"].to_numpy()
    )
    capped = (
        semantic_dedup(
            emb, threshold=0.95, n_centroids=1, train_iters=1,
            max_cell=16,
        )
        .to_pandas().sort_values("vec_id")["kept"].to_numpy()
    )
    np.testing.assert_array_equal(uncapped, capped)
    # every odd id is a planted copy of the preceding even id
    assert not capped[1::2].any()


def test_semantic_dedup_auto_centroids_small_corpus_is_16():
    """n_centroids=None auto-sizes to max(16, n//1000) — 16 at fixture
    sizes, so the fixed SQL oracle is unchanged."""
    from neo4j_graph_algorithms_ray.pipelines.similarity import semantic_dedup

    rng = np.random.default_rng(3)
    m = rng.standard_normal((60, 8))
    emb = rd.from_arrow(
        pa.table(
            {"vec_id": np.arange(len(m), dtype=np.int64), "embedding": list(m)}
        )
    )
    out = semantic_dedup(emb, threshold=0.95).to_pandas()
    assert len(out) == 60
    assert out["cluster"].nunique() <= 16
    assert out["kept"].all()  # random gaussians: no near-dups
