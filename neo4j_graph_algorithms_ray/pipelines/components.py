"""Connected components — WCC (algo.unionFind) and SCC (algo.scc).

WCC reproduces the OUTPUT semantics of the reference's union-find
procedures (``algo/.../impl/GraphUnionFind.java``,
``algo/.../UnionFindProc.java``) under the canonical labeling pinned in
SURVEY.md §5.3: component id = MIN member vid — exactly the fixpoint the
reference's MSColoring variant (``algo/.../impl/MSColoring.java``)
computes. The reference's shared-memory disjoint-set
(``core/.../utils/dss/DisjointSetStruct.java``) has no distributed
analog, so the dataflow is hash-to-min label propagation:

    labels ← vid;  per round: labels[v] ← min(labels[u] : u ~ v)
    (+ driver-side pointer jumping labels ← labels[labels], valid
     because a label is always a same-component member, giving the
     O(log) convergence of the two-level union-find variants
     ``ParallelUnionFind*.java`` without shared memory)

with an optional per-block LOCAL union-find reduction first (the
analog of the reference's per-task DSS + merge): each edge block is
contracted to (vertex → block-local min member) star edges, shrinking
the iterated edge set from |E| to Σ|distinct vids per block|.

The ``threshold`` option mirrors ``algo.unionFind``'s weight-threshold
filtering (only union edges with weight > threshold).

SCC implements the coloring / forward-backward algorithm (the dataflow
relative of the reference's ``MultiStepSCC``,
``algo/.../impl/multistep/MultiStepSCC.java``; Tarjan variants are
inherently sequential): repeat { color = min forward-reachable active
vertex (label rounds + pointer jumping); roots r where color[r]=r;
backward-reach roots within same color → those vertices form SCC(color);
retire them } until no active vertices. Output scc id = min member vid
(equals "min mutually-reachable vid", the SQL-oracle definition).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import ray

from ..state.checkpoint import (
    CheckpointConfig,
    latest_complete,
    load_iteration,
    save_iteration,
)
from ..state.dense import block_cache_key, cache_get, cache_put, group_min, scatter_combine
from ..state.graph import GraphTables


# ----------------------------------------------------------------------
# local (block-level) connected components — vectorized min-prop
# ----------------------------------------------------------------------
def _local_cc(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Union-find over one block's edges, vectorized.

    Returns (uniq_vertices, min_member_of_local_component) — the
    per-task DSS of the reference's ParallelUnionFindQueue, as arrays.
    """
    uniq, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)], inv[len(a):]
    lab = np.arange(len(uniq), dtype=np.int64)
    while True:
        l2 = lab.copy()
        np.minimum.at(l2, ai, lab[bi])
        np.minimum.at(l2, bi, lab[ai])
        # pointer jumping to the current root
        while True:
            l3 = l2[l2]
            if (l3 == l2).all():
                break
            l2 = l3
        if (l2 == lab).all():
            break
        lab = l2
    return uniq, uniq[lab]


def _reduce_block(batch: pa.Table, *, token: str) -> pa.Table:
    si = batch["si"].to_numpy(zero_copy_only=False)
    di = batch["di"].to_numpy(zero_copy_only=False)
    key = block_cache_key(token, si, di)
    ent = cache_get(key)
    if ent is None:
        uniq, root = _local_cc(si, di)
        keep = uniq != root
        ent = (uniq[keep], root[keep])
        cache_put(key, ent)
    u, r = ent
    return pa.table({"si": u, "di": r})


@dataclass
class ComponentsResult:
    labels: np.ndarray  # dense: component id as DENSE index of min member
    components: np.ndarray  # original-vid component id per vertex
    set_count: int
    rounds: int
    metrics: dict = field(default_factory=dict)


def _min_label_rounds(edges, n: int, labels: np.ndarray, token: str, combine: str = "driver") -> tuple[np.ndarray, int]:
    """Iterate labels[dst] = min(labels[src]) over an edge Dataset until
    fixpoint; labels are dense indices of same-component members."""
    rounds = 0
    while True:
        lab_ref = ray.put(labels)

        def partial(batch: pa.Table, _ref=lab_ref, _tok=token) -> pa.Table:
            si = batch["si"].to_numpy(zero_copy_only=False)
            di = batch["di"].to_numpy(zero_copy_only=False)
            lab = ray.get(_ref)
            idx, mins = group_min(di, lab[si])
            return pa.table({"idx": idx, "val": mins})

        new = scatter_combine(
            edges, partial, n, op="min", combine=combine,
            init=labels.copy(), dtype=np.int64,
        )
        # pointer jumping (driver, O(n) per hop)
        while True:
            j = new[new]
            if (j == new).all():
                break
            new = j
        rounds += 1
        if (new == labels).all():
            return labels, rounds
        labels = new


def _jump(labels: np.ndarray) -> np.ndarray:
    """Pointer jumping to fixpoint (labels always point within-component)."""
    while True:
        j = labels[labels]
        if (j == labels).all():
            return labels
        labels = j


def _wcc_actor(
    graph: GraphTables,
    reduce_local: bool,
    checkpoint: Optional[CheckpointConfig] = None,
) -> tuple[np.ndarray, int]:
    """Min-label rounds against the stateful shard pool (state.shards):
    per-shard local-CC star contraction once, then per-round undirected
    min propagation + driver pointer jumping. Per-round checkpoint of
    the label vector (north rule) — min-propagation is monotone, so a
    resumed run reaches the identical fixpoint."""
    sg = graph.sharded()
    labels = np.arange(graph.n, dtype=np.int64)
    rounds = 0
    if checkpoint is not None and checkpoint.resume:
        k = latest_complete(checkpoint)
        if k is not None:
            _, vectors, _ = load_iteration(checkpoint, k, expect_vids=graph.vids)
            labels = vectors["label"]
            rounds = k
    while True:
        t0 = time.perf_counter()
        new = sg.min_round(labels, use_star=reduce_local)
        new = _jump(new)
        rounds += 1
        changed = int((new != labels).sum())
        if checkpoint is not None and rounds % checkpoint.every == 0:
            save_iteration(
                checkpoint,
                rounds,
                graph.vids,
                {"label": new},
                {
                    "iteration": rounds,
                    "changed": changed,
                    "seconds": time.perf_counter() - t0,
                },
                input_token=graph.token,
            )
        if changed == 0:
            return labels, rounds
        labels = new


def _wcc_range(
    graph: GraphTables, threshold: Optional[float] = None
) -> tuple[np.ndarray, int]:
    """Range-sharded WCC (the >10^8-vertex multi-node path): label
    slices live in range-owner actors; per round the min-candidate
    partials flow edge-shard → owner through the object store and the
    driver folds only the per-range changed COUNTS (O(R) ints). Plain
    monotone min propagation — pointer jumping needs random access to
    the whole label vector, so convergence takes O(diameter) rounds
    instead of O(log n); the fixpoint (min member id per component) is
    identical."""
    from ..state.shards import RangeEngine

    sg = graph.sharded()
    eng = RangeEngine(sg)
    eng.set_vector(arr=np.arange(graph.n, dtype=np.int64))
    thr = None if threshold is None else float(threshold)
    rounds = 0
    while True:
        changed = eng.min_round(thr=thr)
        rounds += 1
        if changed == 0:
            break
    labels = eng.collect().astype(np.int64)
    return labels, rounds


def wcc(
    graph: GraphTables,
    *,
    threshold: Optional[float] = None,
    reduce_local: bool = True,
    combine: str = "driver",
    engine: str = "auto",
    checkpoint: Optional[CheckpointConfig] = None,
) -> ComponentsResult:
    t0 = time.perf_counter()
    n = graph.n
    if engine == "range":
        if threshold is not None and not graph.weighted:
            raise ValueError("threshold requires a weighted graph")
        labels, rounds = _wcc_range(graph, threshold)
        vids = graph.vids
        return ComponentsResult(
            labels=labels,
            components=vids[labels] if n else np.empty(0, dtype=np.int64),
            set_count=int(len(np.unique(labels))) if n else 0,
            rounds=rounds,
            metrics={"seconds": time.perf_counter() - t0, "engine": "range"},
        )
    use_actor = threshold is None and (
        engine == "actor" or (engine == "auto" and graph.m >= 50_000)
    )
    if use_actor:
        labels, rounds = _wcc_actor(graph, reduce_local, checkpoint)
        vids = graph.vids
        return ComponentsResult(
            labels=labels,
            components=vids[labels] if n else np.empty(0, dtype=np.int64),
            set_count=int(len(np.unique(labels))) if n else 0,
            rounds=rounds,
            metrics={
                "seconds": time.perf_counter() - t0,
                "reduce_local": reduce_local,
                "engine": "actor",
            },
        )
    edges = graph.edges
    if threshold is not None:
        if not graph.weighted:
            raise ValueError("threshold requires a weighted graph")
        thr = float(threshold)
        edges = edges.map_batches(
            lambda t, _thr=thr: t.filter(
                pa.compute.greater(t["w"], pa.scalar(_thr))
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    token = graph.token + f"/wcc/{threshold}"
    if reduce_local:
        # per-block union-find contraction (star edges), computed once,
        # then iterate on the much smaller reduced set
        edges = edges.map_batches(
            _reduce_block,
            batch_format="pyarrow",
            batch_size=None,
            fn_kwargs={"token": token},
        ).materialize()
    else:
        edges = graph.edges_both() if threshold is None else edges.map_batches(
            lambda t: pa.table(
                {
                    "si": np.concatenate([t["si"].to_numpy(zero_copy_only=False), t["di"].to_numpy(zero_copy_only=False)]),
                    "di": np.concatenate([t["di"].to_numpy(zero_copy_only=False), t["si"].to_numpy(zero_copy_only=False)]),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    # star edges from _reduce_block are directed (v → local min); propagate
    # min in both directions by iterating over the undirected view
    if reduce_local:
        edges = edges.map_batches(
            lambda t: pa.table(
                {
                    "si": np.concatenate([t["si"].to_numpy(zero_copy_only=False), t["di"].to_numpy(zero_copy_only=False)]),
                    "di": np.concatenate([t["di"].to_numpy(zero_copy_only=False), t["si"].to_numpy(zero_copy_only=False)]),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    labels = np.arange(n, dtype=np.int64)
    labels, rounds = _min_label_rounds(edges, n, labels, token, combine=combine)
    vids = graph.vids
    comps = vids[labels] if n else np.empty(0, dtype=np.int64)
    return ComponentsResult(
        labels=labels,
        components=comps,
        set_count=int(len(np.unique(labels))) if n else 0,
        rounds=rounds,
        metrics={"seconds": time.perf_counter() - t0, "reduce_local": reduce_local},
    )


def wcc_table(graph: GraphTables, **kw) -> pa.Table:
    res = wcc(graph, **kw)
    return graph.to_table({"component": res.components})


# ----------------------------------------------------------------------
# Dataset-native CC — labels live IN the dataset rows
# ----------------------------------------------------------------------
def _cc_typed_empty(cols: dict) -> pa.Table:
    return pa.table({c: pa.array([], t) for c, t in cols.items()})


def cc_pairs_dataset(
    pairs: "object",
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    width: Optional[int] = None,
    out_vertex: str = "doc_id",
    out_comp: str = "group_id",
) -> "object":
    """Connected components over an edge-pair Dataset with NOTHING on
    the driver: the label vector is itself a Dataset — unlike
    :func:`wcc` (whose ``GraphTables``/``ComponentsResult`` hold the
    vid and label vectors as driver numpy), the only driver traffic
    here is an O(1) changed-count per round. This is the membership
    kernel behind ``dedup.NearDupResult.groups_ds`` on the scale path,
    where the dup-group table is corpus-sized.

    Dataflow (min-label = component id = min member vid, the SURVEY
    §5.3 canonical labeling): alternate

    - EDGE-MIN rounds (2 keyed exchanges): tagged union of the label
      table ``(vid, lab)`` with the undirected edge table keyed on the
      source endpoint; per block a searchsorted join emits one
      ``lab[src]`` candidate per edge plus the own-label passthrough;
      a second exchange keyed on the destination folds the per-vertex
      min.
    - POINTER-JUMP rounds (1 keyed exchange): the dataflow version of
      ``_jump`` — union label rows keyed on ``vid`` (lookup side) with
      label rows keyed on ``lab`` (request side); each request row
      comes back as ``(vid, lab[lab])``. Valid because a label is
      always a same-component member vid, so ``lab∘lab`` stays in
      component; halves pointer depth per round → O(log n) rounds
      overall instead of O(diameter).

    Terminates when an edge-min round changes nothing: at that point
    labels are constant per component (edges run both directions) and
    every label is a member vid, hence the min member. Returns a
    Dataset ``(out_vertex, out_comp)`` over the vertices that appear
    in ``pairs``.
    """
    import ray.data as rd  # noqa: F401 — documents the return type

    from ..state.partitioning import (
        keyed_repartition,
        shuffle_width,
        source_size_bytes,
    )

    if width is None:
        width = shuffle_width(source_size_bytes(pairs))
    _UNION = {"k": pa.int64(), "vid": pa.int64(), "lab": pa.int64(), "side": pa.int8()}
    _CAND = {"vid": pa.int64(), "cand": pa.int64(), "own": pa.int8()}
    _LAB = {"vid": pa.int64(), "lab": pa.int64(), "changed": pa.int8()}

    def _i64(t: pa.Table, c: str) -> np.ndarray:
        return t[c].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)

    def _both(t: pa.Table) -> pa.Table:
        a, b = _i64(t, src), _i64(t, dst)
        n2 = 2 * len(a)
        return pa.table(
            {
                "k": np.concatenate([a, b]),
                "vid": np.concatenate([b, a]),
                "lab": np.zeros(n2, np.int64),
                "side": np.ones(n2, np.int8),
            }
        )

    def _verts(t: pa.Table) -> pa.Table:
        return pa.table({"vid": np.unique(np.concatenate([_i64(t, src), _i64(t, dst)]))})

    def _uniq_init(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _cc_typed_empty(_LAB)
        u = np.unique(_i64(t, "vid"))
        return pa.table({"vid": u, "lab": u, "changed": np.ones(len(u), np.int8)})

    def _changed_count(L) -> int:
        # O(#blocks) driver rows — NOT Dataset.sum(), whose hash
        # aggregate spins num_partitions aggregator tasks per call
        parts = L.map_batches(
            lambda t: pa.table(
                {
                    "c": np.array(
                        [int(t["changed"].to_numpy(zero_copy_only=False).sum())],
                        np.int64,
                    )
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ).take_all()
        return sum(int(r["c"]) for r in parts)

    def _truncate(ds):
        # materialize + REBUILD from the block refs. materialize()
        # alone does not cut the logical plan of a union whose two
        # branches fork off the same upstream dataset — feeding such a
        # result back into the next round's fork doubles the retained
        # plan every round (measured: ~x2 wall per round from round 8,
        # 77 s/round by round 14 on a 5k-row toy; flat 1.3 s/round
        # with this rebuild). from_arrow_refs keeps the blocks where
        # they are — no driver traffic.
        from ..state.csr import _block_refs

        return rd.from_arrow_refs(_block_refs(ds.materialize()))

    edges = _truncate(pairs.map_batches(_both, batch_format="pyarrow"))
    labels = _truncate(
        keyed_repartition(
            pairs.map_batches(_verts, batch_format="pyarrow"), width, ["vid"]
        ).map_batches(_uniq_init, batch_format="pyarrow", batch_size=None)
    )

    def _lookup_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "k": t["vid"],
                "vid": t["vid"],
                "lab": t["lab"],
                "side": np.zeros(n, np.int8),
            }
        )

    def _edge_stage1(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _cc_typed_empty(_CAND)
        k, vid, lab = _i64(t, "k"), _i64(t, "vid"), _i64(t, "lab")
        m0 = t["side"].to_numpy(zero_copy_only=False) == 0
        k0, l0, v0 = k[m0], lab[m0], vid[m0]
        o = np.argsort(k0, kind="stable")
        k0s, l0s = k0[o], l0[o]
        km, vm = k[~m0], vid[~m0]
        if len(km):
            pos = np.searchsorted(k0s, km)
            if pos.max(initial=-1) >= len(k0s) or not np.array_equal(k0s[pos], km):
                raise ValueError("edge endpoint missing its label row")
            cand = l0s[pos]
        else:
            cand = np.empty(0, np.int64)
        return pa.table(
            {
                "vid": np.concatenate([v0, vm]),
                "cand": np.concatenate([l0, cand]),
                "own": np.concatenate(
                    [np.ones(len(v0), np.int8), np.zeros(len(vm), np.int8)]
                ),
            }
        )

    def _edge_stage2(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _cc_typed_empty(_LAB)
        vid, cand = _i64(t, "vid"), _i64(t, "cand")
        own = t["own"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cand, vid))
        v, c, ow = vid[order], cand[order], own[order]
        newg = np.empty(len(v), dtype=bool)
        newg[0] = True
        newg[1:] = v[1:] != v[:-1]
        starts = np.flatnonzero(newg)
        old = c[ow == 1]  # one own row per vid, in group order
        mins = c[starts]  # min candidate = first after the (vid, cand) sort
        return pa.table(
            {"vid": v[starts], "lab": mins, "changed": (mins != old).astype(np.int8)}
        )

    def _edge_round(L):
        cand = keyed_repartition(
            L.map_batches(_lookup_rows, batch_format="pyarrow").union(edges),
            width,
            ["k"],
        ).map_batches(_edge_stage1, batch_format="pyarrow", batch_size=None)
        L2 = _truncate(
            keyed_repartition(cand, width, ["vid"]).map_batches(
                _edge_stage2, batch_format="pyarrow", batch_size=None
            )
        )
        return L2, _changed_count(L2)

    def _req_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "k": t["lab"],
                "vid": t["vid"],
                "lab": t["lab"],
                "side": np.ones(n, np.int8),
            }
        )

    def _jump_block(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _cc_typed_empty(_LAB)
        k, vid, lab = _i64(t, "k"), _i64(t, "vid"), _i64(t, "lab")
        m0 = t["side"].to_numpy(zero_copy_only=False) == 0
        k0, l0 = k[m0], lab[m0]
        o = np.argsort(k0, kind="stable")
        k0s, l0s = k0[o], l0[o]
        km, vm, lm = k[~m0], vid[~m0], lab[~m0]
        if not len(km):
            return _cc_typed_empty(_LAB)
        pos = np.searchsorted(k0s, km)
        if pos.max(initial=-1) >= len(k0s) or not np.array_equal(k0s[pos], km):
            raise ValueError("label missing its vid row")
        new = l0s[pos]
        return pa.table({"vid": vm, "lab": new, "changed": (new != lm).astype(np.int8)})

    def _jump_round(L):
        L2 = _truncate(
            keyed_repartition(
                L.map_batches(_lookup_rows, batch_format="pyarrow").union(
                    L.map_batches(_req_rows, batch_format="pyarrow")
                ),
                width,
                ["k"],
            ).map_batches(_jump_block, batch_format="pyarrow", batch_size=None)
        )
        return L2, _changed_count(L2)

    while True:
        labels, changed = _edge_round(labels)
        if not changed:
            break
        while True:
            labels, jumped = _jump_round(labels)
            if not jumped:
                break
    return labels.map_batches(
        lambda t: pa.table({out_vertex: t["vid"], out_comp: t["lab"]}),
        batch_format="pyarrow",
    )


# ----------------------------------------------------------------------
# SCC — coloring / forward-backward peeling
# ----------------------------------------------------------------------
@dataclass
class SCCResult:
    components: np.ndarray  # original-vid scc id (min member) per vertex
    set_count: int
    outer_rounds: int
    metrics: dict = field(default_factory=dict)


def _scc_fwd_round(edges, n: int, color: np.ndarray, active: np.ndarray, combine: str) -> np.ndarray:
    c_ref = ray.put(color)
    a_ref = ray.put(active)

    def fwd_partial(batch: pa.Table, _c=c_ref, _a=a_ref) -> pa.Table:
        si = batch["si"].to_numpy(zero_copy_only=False)
        di = batch["di"].to_numpy(zero_copy_only=False)
        col = ray.get(_c)
        act = ray.get(_a)
        m = act[si] & act[di]
        if not m.any():
            return pa.table(
                {"idx": np.empty(0, np.int64), "val": np.empty(0, np.int64)}
            )
        idx, mins = group_min(di[m], col[si[m]])
        return pa.table({"idx": idx, "val": mins})

    return scatter_combine(
        edges, fwd_partial, n, op="min", combine=combine,
        init=color.copy(), dtype=np.int64,
    )


def _scc_bwd_round(edges, n: int, reached: np.ndarray, color: np.ndarray, combine: str) -> np.ndarray:
    r_ref = ray.put(reached)
    c_ref = ray.put(color)

    def bwd_partial(batch: pa.Table, _r=r_ref, _c=c_ref) -> pa.Table:
        si = batch["si"].to_numpy(zero_copy_only=False)
        di = batch["di"].to_numpy(zero_copy_only=False)
        rch = ray.get(_r)
        col = ray.get(_c)
        m = rch[di] & ~rch[si] & (col[si] == col[di]) & (col[si] < len(col))
        if not m.any():
            return pa.table(
                {"idx": np.empty(0, np.int64), "val": np.empty(0, np.int64)}
            )
        idx = np.unique(si[m])
        return pa.table({"idx": idx, "val": np.ones(len(idx), np.int64)})

    hits = scatter_combine(
        edges, bwd_partial, n, op="max", combine=combine,
        init=np.zeros(n, dtype=np.int64), dtype=np.int64,
    )
    return reached | (hits > 0)


def _scc_trim(
    edges, n: int, active: np.ndarray, sccid: np.ndarray, combine: str
) -> int:
    """MultiStep trim (reference
    ``algo/.../impl/multistep/MultiStepTrim.java``): iteratively peel
    active vertices with no active in-edge or no active out-edge — each
    is a singleton SCC; on peelable (web-ish / DAG-ish) graphs this
    removes most vertices in a few O(m) sweeps before the FW-BW
    coloring starts. Mutates ``active``/``sccid`` in place, returns the
    number of trim rounds run."""
    rounds = 0
    while True:
        a_ref = ray.put(active)

        def mark_partial(which: str, _a=a_ref):
            def partial(batch: pa.Table) -> pa.Table:
                si = batch["si"].to_numpy(zero_copy_only=False)
                di = batch["di"].to_numpy(zero_copy_only=False)
                act = ray.get(_a)
                m = act[si] & act[di] & (si != di)  # self-loops can't save
                if not m.any():
                    z = np.empty(0, np.int64)
                    return pa.table({"idx": z, "val": z})
                idx = np.unique((si if which == "si" else di)[m])
                return pa.table({"idx": idx, "val": np.ones(len(idx), np.int64)})

            return partial

        has_out = scatter_combine(
            edges, mark_partial("si"), n, op="max", combine=combine,
            init=np.zeros(n, np.int64), dtype=np.int64,
        ) > 0
        has_in = scatter_combine(
            edges, mark_partial("di"), n, op="max", combine=combine,
            init=np.zeros(n, np.int64), dtype=np.int64,
        ) > 0
        peel = active & ~(has_out & has_in)
        if not peel.any():
            break
        sccid[peel] = np.flatnonzero(peel)
        active &= ~peel
        rounds += 1
        if not active.any():
            break
    return rounds


def scc(
    graph: GraphTables,
    combine: str = "driver",
    engine: str = "auto",
    trim: bool = True,
) -> SCCResult:
    t0 = time.perf_counter()
    n = graph.n
    edges = graph.edges
    if engine == "tarjan" or (engine == "auto" and graph.m < 50_000):
        # the reference's own small-graph default (SCCIterativeTarjan,
        # ``algo/.../impl/SCCIterativeTarjan.java``; SURVEY §2.3 C4:
        # Tarjan survives as the in-process kernel for small
        # subgraphs): below the actor-engine gate a single pass over
        # the edge list beats O(diameter) distributed FW-BW rounds —
        # each round costs a full scheduling quantum regardless of
        # graph size. Identical pinned min-member labels; the
        # distributed engines take over at >= 50k edges (and tests
        # cross-check all three engines on the same fixtures).
        sis, dis = [], []
        for b in edges.iter_batches(batch_format="pyarrow", batch_size=None):
            sis.append(b["si"].to_numpy(zero_copy_only=False))
            dis.append(b["di"].to_numpy(zero_copy_only=False))
        si = np.concatenate(sis) if sis else np.empty(0, np.int64)
        di = np.concatenate(dis) if dis else np.empty(0, np.int64)
        dense = scc_numpy_oracle(si, di, n)
        vids = graph.vids
        return SCCResult(
            components=vids[dense] if n else np.empty(0, dtype=np.int64),
            set_count=int(len(np.unique(dense))) if n else 0,
            outer_rounds=0,
            metrics={
                "seconds": time.perf_counter() - t0,
                "engine": "tarjan",
            },
        )
    use_actor = engine == "actor" or (engine == "auto" and graph.m >= 50_000)
    sg = graph.sharded() if use_actor else None
    sccid = np.full(n, -1, dtype=np.int64)  # dense idx of scc min member
    active = np.ones(n, dtype=bool)
    trim_rounds = _scc_trim(edges, n, active, sccid, combine) if trim else 0
    outer = 0
    SENT = n  # sentinel color for inactive vertices
    while active.any():
        outer += 1
        # ---- forward min-label: color[v] = min active vertex reaching v
        color = np.where(active, np.arange(n, dtype=np.int64), SENT)
        while True:
            if use_actor:
                new = sg.fwd_min(color, active)
            else:
                new = _scc_fwd_round(edges, n, color, active, combine)
            # pointer jumping: color[v] (an active ancestor of v) can adopt
            # ITS minimal known ancestor, still an ancestor of v
            while True:
                j = np.where(new < SENT, new[np.minimum(new, n - 1)], SENT)
                j = np.minimum(new, j)
                if (j == new).all():
                    break
                new = j
            if (new == color).all():
                break
            color = new
        # ---- roots & backward reach within color
        idx_arr = np.arange(n, dtype=np.int64)
        reached = active & (color == idx_arr)
        while True:
            if use_actor:
                new_reached = sg.bwd_reach(reached, color)
            else:
                new_reached = _scc_bwd_round(edges, n, reached, color, combine)
            if (new_reached == reached).all():
                break
            reached = new_reached
        sccid[reached] = color[reached]
        active &= ~reached
    vids = graph.vids
    comps = vids[sccid] if n else np.empty(0, dtype=np.int64)
    return SCCResult(
        components=comps,
        set_count=int(len(np.unique(sccid))) if n else 0,
        outer_rounds=outer,
        metrics={"seconds": time.perf_counter() - t0},
    )


def scc_table(graph: GraphTables, **kw) -> pa.Table:
    res = scc(graph, **kw)
    return graph.to_table({"scc": res.components})


# ----------------------------------------------------------------------
# sequential oracle (tests): iterative Tarjan, the reference's
# SCCIterativeTarjan semantics (algo/.../impl/SCCIterativeTarjan.java)
# ----------------------------------------------------------------------
def scc_numpy_oracle(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Min-member SCC ids via iterative Tarjan (single machine)."""
    order = np.argsort(src, kind="stable")
    s, d = src[order], dst[order]
    indptr = np.searchsorted(s, np.arange(n + 1))
    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, indptr[root])]
        while work:
            v, ptr = work.pop()
            if index[v] == -1:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            advanced = False
            while ptr < indptr[v + 1]:
                w = d[ptr]
                ptr += 1
                if index[w] == -1:
                    work.append((v, ptr))
                    work.append((int(w), indptr[w]))
                    advanced = True
                    break
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    members.append(w)
                    if w == v:
                        break
                mid = min(members)
                for w in members:
                    comp[w] = mid
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
    return comp
