"""Derived oracle-check graphs over the driver testdata (SURVEY.md §5.4).

The driver testdata has no source-code corpus, so the oracle-checkable
graphs derive deterministically from the TPC-H-ish tables, identically
expressible in Ray Data and in DuckDB SQL (see ``__ray_entry__``):

- BIPARTITE:  src = o_custkey*2, dst = l_suppkey*2+1 over
  orders ⋈ lineitem, DISTINCT pairs. (*2 / *2+1 disambiguates the
  overlapping custkey / suppkey id spaces.)
- CYCLIC:     bipartite ∪ (s_suppkey*2+1 → c_custkey*2 for suppliers
  and customers in the same nation) — adds back-edges so SCC/BFS have
  nontrivial structure.
- CO_SUPPLIER: undirected supplier–supplier edges (u < v) for suppliers
  sharing at least one customer in the bipartite graph (the projection
  that gives triangles a non-bipartite substrate).

Join strategy: orders/supplier/customer are the SMALL sides → broadcast
via ``ray.put`` (sorted-array binary search / per-nation dict), scanned
side streams through ``map_batches`` (SURVEY.md §2.8 joins/lookups).
Distinct/dedup uses per-block ``np.unique`` partials + driver fold
(bounded by distinct-edge cardinality; the shuffle path is
repartition-by-key + per-block dedup).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..state.graph import GraphTables
from ..state.partitioning import keyed_repartition, shuffle_width

_CACHE: dict = {}


def _read(sf_dir: str, table: str, columns: list[str]) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _distinct_pairs(ds: "rd.Dataset", src: str = "src", dst: str = "dst") -> pa.Table:
    """Stream per-block unique packed pairs, fold on driver, unpack."""
    SHIFT = np.int64(1) << np.int64(21)  # ids < 2^21 here; packed = src*2^21+dst

    def part(batch: pa.Table) -> pa.Table:
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) and max(int(s.max()), int(d.max())) >= int(SHIFT):
            raise OverflowError("packed pair key needs ids < 2^21")
        return pa.table({"key": np.unique(s * SHIFT + d)})

    chunks = [
        b["key"].to_numpy(zero_copy_only=False)
        for b in ds.map_batches(part, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    key = (
        np.unique(np.concatenate(chunks)) if chunks else np.empty(0, dtype=np.int64)
    )
    return pa.table({src: key // SHIFT, dst: key % SHIFT})


def bipartite_edges(sf_dir: str) -> pa.Table:
    """DISTINCT (o_custkey*2 → l_suppkey*2+1)."""
    k = ("bip", sf_dir)
    if k in _CACHE:
        return _CACHE[k]
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    okeys = orders["o_orderkey"].to_numpy(np.int64)
    ocust = orders["o_custkey"].to_numpy(np.int64)
    o = np.argsort(okeys)
    lookup_ref = ray.put((okeys[o], ocust[o]))

    def join(batch: pa.Table) -> pa.Table:
        ok, oc = ray.get(lookup_ref)
        lo = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ok, lo)
        return pa.table(
            {"src": oc[pos] * 2, "dst": ls * 2 + 1}
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    pairs = li.map_batches(join, batch_format="pyarrow", batch_size=None)
    t = _distinct_pairs(pairs)
    _CACHE[k] = t
    return t


def cyclic_edges(sf_dir: str) -> pa.Table:
    """bipartite ∪ supplier→customer same-nation back-edges (DISTINCT)."""
    k = ("cyc", sf_dir)
    if k in _CACHE:
        return _CACHE[k]
    bip = bipartite_edges(sf_dir)
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    by_nation = {
        int(nk): g["s_suppkey"].to_numpy(np.int64)
        for nk, g in supp.groupby("s_nationkey")
    }
    nref = ray.put(by_nation)

    def expand(batch: pa.Table) -> pa.Table:
        # group customers by nation once, then one tile/repeat cross
        # product per nation (~25 iterations) instead of a Python loop
        # over every customer row
        bn = ray.get(nref)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(nk, kind="stable")
        ck_s, nk_s = ck[order], nk[order]
        first = np.ones(len(nk_s), dtype=bool)
        first[1:] = nk_s[1:] != nk_s[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(nk_s)))
        srcs, dsts = [], []
        for st, sz in zip(starts, sizes):
            ss = bn.get(int(nk_s[st]))
            if ss is not None:
                srcs.append(np.tile(ss * 2 + 1, sz))
                dsts.append(np.repeat(ck_s[st : st + sz] * 2, len(ss)))
        if not srcs:
            z = np.empty(0, np.int64)
            return pa.table({"src": z, "dst": z})
        return pa.table({"src": np.concatenate(srcs), "dst": np.concatenate(dsts)})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    back = cust.map_batches(expand, batch_format="pyarrow", batch_size=None)
    both = rd.from_arrow(bip).union(back)
    t = _distinct_pairs(both)
    _CACHE[k] = t
    return t


def co_supplier_edges(sf_dir: str) -> pa.Table:
    """Undirected (u < v) supplier pairs sharing ≥1 customer."""
    k = ("cosupp", sf_dir)
    if k in _CACHE:
        return _CACHE[k]
    bip = rd.from_arrow(bipartite_edges(sf_dir))

    SHIFT = np.int64(1) << np.int64(21)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # one packed-key unique gives (customer, supplier) sorted &
        # deduped; the within-group (i<j) pair fan-out is the same
        # repeat/offset arithmetic the chunker/jaccard kernels use —
        # no per-customer Python loop, no pandas drop_duplicates
        empty = pd.DataFrame(
            {"u": pd.Series([], dtype="int64"), "v": pd.Series([], dtype="int64")}
        )
        s = df["src"].to_numpy(np.int64)
        d = df["dst"].to_numpy(np.int64)
        if not len(s):
            return empty
        if max(int(s.max()), int(d.max())) >= int(SHIFT):
            raise OverflowError("packed pair key needs ids < 2^21")
        key = np.unique(s * SHIFT + d)
        s2, d2 = key // SHIFT, key % SHIFT
        first = np.ones(len(s2), dtype=bool)
        first[1:] = s2[1:] != s2[:-1]
        gstart = np.flatnonzero(first)
        gsize = np.diff(np.append(gstart, len(s2)))
        li = np.arange(len(s2)) - np.repeat(gstart, gsize)
        cnt = np.repeat(gsize, gsize) - 1 - li  # partners after local idx
        total = int(cnt.sum())
        if total == 0:
            return empty
        row = np.repeat(np.arange(len(s2)), cnt)
        off = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt) + 1
        u, v = d2[row], d2[row + off]  # u < v: d2 ascending within group
        pk = np.unique(u * SHIFT + v)  # same pair via different customers
        return pd.DataFrame({"u": pk // SHIFT, "v": pk % SHIFT})

    # hash-partition by customer so each customer's supplier set is complete
    pair_ds = keyed_repartition(bip, shuffle_width(), ["src"]).map_batches(
        pairs, batch_format="pandas", batch_size=None
    )
    t = _distinct_pairs(pair_ds, "u", "v")
    _CACHE[k] = t
    return t


def weighted_bipartite_edges(sf_dir: str) -> pa.Table:
    """(o_custkey*2 → l_suppkey*2+1, weight = lineitem count per pair)."""
    k = ("wbip", sf_dir)
    if k in _CACHE:
        return _CACHE[k]
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    okeys = orders["o_orderkey"].to_numpy(np.int64)
    ocust = orders["o_custkey"].to_numpy(np.int64)
    o = np.argsort(okeys)
    lookup_ref = ray.put((okeys[o], ocust[o]))
    SHIFT = np.int64(1) << np.int64(21)

    def part(batch: pa.Table) -> pa.Table:
        ok, oc = ray.get(lookup_ref)
        lo = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ok, lo)
        key = (oc[pos] * 2) * SHIFT + (ls * 2 + 1)
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": uniq, "cnt": cnt.astype(np.int64)})

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    parts = li.map_batches(part, batch_format="pyarrow", batch_size=None)
    keys, cnts = [], []
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        keys.append(b["key"].to_numpy(zero_copy_only=False))
        cnts.append(b["cnt"].to_numpy(zero_copy_only=False))
    if keys:
        key = np.concatenate(keys)
        cnt = np.concatenate(cnts)
        uniq, inv = np.unique(key, return_inverse=True)
        w = np.bincount(inv, weights=cnt.astype(np.float64), minlength=len(uniq))
    else:
        uniq = np.empty(0, np.int64)
        w = np.empty(0, np.float64)
    t = pa.table({"src": uniq // SHIFT, "dst": uniq % SHIFT, "weight": w})
    _CACHE[k] = t
    return t


def multi_pairs_ds(sf_dir: str) -> "rd.Dataset":
    """NON-distinct (o_custkey*2 → l_suppkey*2+1, qty=l_quantity) pair
    stream — one row per lineitem, duplicates preserved. The substrate
    for the duplicate-relationship-strategy queries (the reference's
    ``DuplicateRelationshipsStrategy``, SURVEY.md §1.2): the projection
    resolves duplicates at import via ``GraphTables.from_dataset(...,
    dedup=...)``. Same broadcast orders-side join as
    ``bipartite_edges``; stays a lazy Dataset (the dedup fold is the
    consumer's keyed exchange)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    okeys = orders["o_orderkey"].to_numpy(np.int64)
    ocust = orders["o_custkey"].to_numpy(np.int64)
    o = np.argsort(okeys)
    lookup_ref = ray.put((okeys[o], ocust[o]))

    def join(batch: pa.Table) -> pa.Table:
        ok, oc = ray.get(lookup_ref)
        lo = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ok, lo)
        return pa.table(
            {
                "src": oc[pos] * 2,
                "dst": ls * 2 + 1,
                "qty": q.astype(np.float64),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_quantity"])
    return li.map_batches(join, batch_format="pyarrow", batch_size=None)


def signed_co_supplier_edges(sf_dir: str) -> pa.Table:
    """co_supplier edges with sign ((u+v) % 4 == 0 → +1, else −1) — the
    deterministic signed fixture for balanced triads (all co_supplier
    vids are odd, so plain parity would be degenerate)."""
    k = ("signed", sf_dir)
    if k in _CACHE:
        return _CACHE[k]
    base = co_supplier_edges(sf_dir)
    u = base["u"].to_numpy(zero_copy_only=False)
    v = base["v"].to_numpy(zero_copy_only=False)
    w = np.where((u + v) % 4 == 0, 1.0, -1.0)
    t = pa.table({"u": u, "v": v, "weight": w})
    _CACHE[k] = t
    return t


def part_blocks_edges(sf_dir: str) -> pa.Table:
    """Community-structured fixture over the part table: vertices =
    p_partkey, edges (a, b) with a < b, same 8-key block
    (a//8 == b//8) and b − a ≤ 3 — disjoint near-clique blocks whose
    Louvain/InfoMap partitions are NON-trivial (Louvain splits each
    block in two, InfoMap keeps whole blocks), unlike the complete
    co_supplier graph. Exactly mirrored by a SQL self-join on part."""
    k = ("pblocks", sf_dir)
    if k in _CACHE:
        return _CACHE[k]
    import pyarrow.parquet as pq

    parts = _read(sf_dir, "part", ["p_partkey"])
    # row count from the parquet footer — a Dataset.count() here costs
    # a full streaming execution (~0.5 s of fixed driver overhead) for
    # a number the file metadata already holds
    n = pq.read_metadata(os.path.join(sf_dir, "part.parquet")).num_rows

    def expand(batch: pa.Table) -> pa.Table:
        a = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        outs_s, outs_d = [], []
        for d in (1, 2, 3):
            b = a + d
            m = (b // 8 == a // 8) & (b < n)
            outs_s.append(a[m])
            outs_d.append(b[m])
        return pa.table(
            {"u": np.concatenate(outs_s), "v": np.concatenate(outs_d)}
        )

    # each (a, a+d) is emitted exactly once from the unique p_partkey
    # column, so the pairs are distinct BY CONSTRUCTION — the
    # _distinct_pairs exchange the other derives need would be a
    # second full streaming execution for a no-op; one driver-side
    # sort keeps the table in the same (u, v) order it produced
    chunks = list(
        parts.map_batches(expand, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    t = (
        pa.concat_tables(chunks)
        if chunks
        else pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u))
    t = pa.table({"u": u[order], "v": v[order]})
    _CACHE[k] = t
    return t


def graph_for(sf_dir: str, which: str) -> GraphTables:
    """Projected GraphTables per derived edge table (cached per sf_dir)."""
    k = ("graph", which, sf_dir)
    if k in _CACHE:
        return _CACHE[k]
    if which == "bipartite":
        t = bipartite_edges(sf_dir)
        g = GraphTables.from_dataset(rd.from_arrow(t))
    elif which == "cyclic":
        t = cyclic_edges(sf_dir)
        g = GraphTables.from_dataset(rd.from_arrow(t))
    elif which == "co_supplier":
        t = co_supplier_edges(sf_dir)
        g = GraphTables.from_dataset(rd.from_arrow(t), src="u", dst="v")
    elif which == "weighted_bipartite":
        t = weighted_bipartite_edges(sf_dir)
        g = GraphTables.from_dataset(rd.from_arrow(t), weight="weight")
    elif which == "signed_co_supplier":
        t = signed_co_supplier_edges(sf_dir)
        g = GraphTables.from_dataset(
            rd.from_arrow(t), src="u", dst="v", weight="weight"
        )
    elif which == "part_blocks":
        t = part_blocks_edges(sf_dir)
        g = GraphTables.from_dataset(rd.from_arrow(t), src="u", dst="v")
    else:  # pragma: no cover
        raise ValueError(which)
    _CACHE[k] = g
    return g


def clear_cache() -> None:
    _CACHE.clear()
