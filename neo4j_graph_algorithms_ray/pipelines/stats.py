"""Result-stats builders (reference: the ``WriteResult`` percentile
fields every procedure returns — e.g. ``UnionFindProc`` streams
``setCount`` plus p1/p5/.../p100 of community sizes,
``algo/.../results/AbstractCommunityResultBuilder.java`` [public
tree]). The percentile definition is the discrete order statistic
"smallest value whose rank ≥ ceil(q·n/100)" — exactly reproducible in
SQL as a cumulative-rank window, no interpolation ambiguity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_QS = (1, 5, 10, 25, 50, 75, 90, 95, 99, 100)


def degree_assortativity(graph) -> float:
    """Edge-wise degree correlation (Newman 2002): the Pearson
    correlation of (out_deg[src], in_deg[dst]) over the directed edge
    stream — the classic web-graph mixing statistic (hub-to-hub vs
    hub-to-leaf linking). Marginal moments come straight from the
    degree vectors (Σ_edges f(src) = Σ_v out_deg[v]·f(v) — no edge
    pass needed); only the CENTERED cross term Σ(x−x̄)(y−ȳ) streams
    over the edge Dataset, one scalar per block, so the driver combine
    is O(blocks) and the computation avoids the raw-moment
    cancellation (sxx/n − mean²) that a naive one-pass fold hits on
    near-uniform degree distributions. Matches SQL ``CORR(dx, dy)``
    (itself a numerically stable centered algorithm)."""
    import ray

    dout = graph.out_degree().astype(np.float64)
    din = graph.in_degree().astype(np.float64)
    m = float(dout.sum())  # = number of edges
    if m == 0:
        return float("nan")
    # edge-weighted marginal means/variances: src marginal weights each
    # vertex by its out-degree, dst marginal by its in-degree
    mx = float((dout * dout).sum()) / m
    my = float((din * din).sum()) / m
    vx = float((dout * (dout - mx) ** 2).sum()) / m
    vy = float((din * (din - my) ** 2).sum()) / m
    if vx <= 0 or vy <= 0:
        return float("nan")
    x_ref, y_ref = ray.put(dout - mx), ray.put(din - my)

    def partial(batch: pa.Table) -> pa.Table:
        si = batch["si"].to_numpy(zero_copy_only=False)
        di = batch["di"].to_numpy(zero_copy_only=False)
        cx = ray.get(x_ref)[si]
        cy = ray.get(y_ref)[di]
        return pa.table({"sxy": np.array([(cx * cy).sum()])})

    sxy = 0.0
    for b in (
        graph.edges.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        sxy += b["sxy"].to_numpy(zero_copy_only=False).sum()
    return float((sxy / m) / np.sqrt(vx * vy))


def reciprocity(graph) -> float:
    """Fraction of directed edges whose reverse edge also exists
    (Garlaschelli & Loffredo's r for simple digraphs) — the web-graph
    mutual-linking statistic. ONE keyed exchange on the canonical
    (min,max) pair key; each block ORs orientation bits per pair and
    folds to two scalars, so the driver combine is O(blocks). Edges
    are assumed distinct (the projected graphs guarantee it);
    self-loops count as reciprocal."""
    from ..state.partitioning import keyed_repartition, shuffle_width

    def pairs(batch: pa.Table) -> pa.Table:
        si = batch["si"].to_numpy(zero_copy_only=False).astype(np.int64)
        di = batch["di"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(si, di)
        hi = np.maximum(si, di)
        flag = np.where(si == di, 3, np.where(si < di, 1, 2)).astype(np.int64)
        return pa.table({"key": (lo << np.int64(32)) | hi, "flag": flag})

    def fold(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"recip": [0.0], "total": [0.0]})
        key = t["key"].to_numpy(zero_copy_only=False)
        flag = t["flag"].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, flag = key[order], flag[order]
        starts = np.flatnonzero(np.concatenate(([True], key[1:] != key[:-1])))
        both = np.bitwise_or.reduceat(flag, starts) == 3
        sizes = np.diff(np.append(starts, len(key)))
        return pa.table(
            {
                "recip": [float(sizes[both].sum())],
                "total": [float(len(key))],
            }
        )

    ex = keyed_repartition(
        graph.edges.map_batches(pairs, batch_format="pyarrow"),
        shuffle_width(16 * graph.m),
        ["key"],
    ).map_batches(fold, batch_format="pyarrow", batch_size=None)
    recip = total = 0.0
    for b in ex.iter_batches(batch_format="pyarrow", batch_size=None):
        recip += b["recip"].to_numpy(zero_copy_only=False).sum()
        total += b["total"].to_numpy(zero_copy_only=False).sum()
    return float(recip / total) if total else float("nan")


def avg_neighbor_degree(graph) -> pa.Table:
    """knn(k) (Pastor-Satorras et al.): for each out-degree class k,
    the mean over degree-k vertices of their mean out-neighbor
    out-degree — the degree-correlation curve behind the
    assortativity scalar. One REVERSE scatter on the shard pool
    (Σ_{u→v} deg[v] accumulated at u — the same transposed kernel
    HITS' hub update uses) + O(n) driver grouping; no edge table
    pass beyond the scatter."""
    deg = graph.sharded().degree("out")
    nbr_sum = graph.sharded().scatter_sum(deg, reverse=True)
    mask = deg > 0
    per_v = nbr_sum[mask] / deg[mask]
    k = deg[mask].astype(np.int64)
    uniq, inv = np.unique(k, return_inverse=True)
    sums = np.bincount(inv, weights=per_v, minlength=len(uniq))
    cnts = np.bincount(inv, minlength=len(uniq))
    return pa.table(
        {
            "out_deg": uniq,
            "avg_neighbor_out_deg": np.round(sums / cnts, 6),
        }
    )


def size_percentiles(labels: np.ndarray, qs=_QS) -> pa.Table:
    """(stat, value) rows for a per-vertex label assignment: set_count
    plus the q-th percentiles of the label-group sizes. ``labels`` is
    the dense per-vertex community/component vector (the same O(n)
    representation every community kernel already returns)."""
    sizes = np.unique(labels, return_counts=True)[1]
    order = np.sort(sizes)
    n = len(order)
    stats = ["set_count"]
    vals = [n]
    for q in qs:
        rank = max(1, int(np.ceil(q * n / 100.0)))
        stats.append(f"p{q}")
        vals.append(int(order[min(rank, n) - 1]))
    return pa.table(
        {"stat": stats, "value": np.asarray(vals, dtype=np.int64)}
    )


def conductance(graph, communities: np.ndarray) -> pa.Table:
    """Per-community conductance φ(C) = cut(C) / min(vol(C), 2m −
    vol(C)) of a given partition (GDS ``gds.conductance`` family —
    the standard community-quality probe next to modularity).
    ``communities``: one label per dense vertex (any int64 labels,
    e.g. Louvain's min-member vids). Undirected semantics over the
    stored orientation (same contract as k-core/coloring: at most one
    orientation per pair); vol = degree sum of members, cut = edges
    with exactly one endpoint inside.

    Dataflow: volumes come from the memoized degree vectors (O(n)
    driver work) and cuts from the shard pool's community-contracted
    edge exchange (``contract_edges`` — rows bounded by DISTINCT
    community pairs, not edges; the same pre-aggregated fold Louvain's
    coarsening uses), so nothing edge-sized reaches the driver.
    Communities whose min(vol, complement) is 0 report φ = 0 (the
    whole-graph community / empty cases). Rounded half-away to 6
    decimals (SQL parity grid)."""
    sg = graph.sharded()
    n = graph.n
    weighted = graph.weighted
    k = sg.degree("out", weighted=weighted) + sg.degree("in", weighted=weighted)
    m2 = float(k.sum())
    uniq, inv = np.unique(communities, return_inverse=True)
    vol = np.zeros(len(uniq))
    np.add.at(vol, inv, k)
    dense_map = inv.astype(np.int64)  # dense vertex -> dense community
    clo, chi, cw = sg.contract_edges(dense_map)
    cut = np.zeros(len(uniq))
    cross = clo != chi
    np.add.at(cut, clo[cross], cw[cross])
    np.add.at(cut, chi[cross], cw[cross])
    denom = np.minimum(vol, m2 - vol)
    phi = np.where(denom > 0, cut / np.where(denom > 0, denom, 1.0), 0.0)
    phi = np.floor(phi * 1e6 + 0.5) / 1e6
    return pa.table(
        {
            "community": uniq.astype(np.int64),
            "conductance": phi.astype(np.float64),
        }
    )
