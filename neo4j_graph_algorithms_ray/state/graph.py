"""GraphTables — the projected graph as materialized Ray Datasets.

The analog of the reference's graph projection step (``GraphLoader`` →
``HeavyGraphFactory.build()`` in mknblch/neo4j-graph-algorithms:
``core/.../heavyweight/HeavyGraphFactory.java``): copy the subgraph out
of the source tables ONCE into an immutable, dense-id representation
tuned for repeated traversal, then run many algorithm rounds over it.

Here the representation is:

- ``vids``: sorted numpy int64 array of original vertex ids; the dense
  id of vertex ``v`` is ``np.searchsorted(vids, v)``. Because ``vids``
  is sorted, the original→dense mapping is monotone (preserves order —
  canonical "min member id" semantics survive densification). This is
  the reference's ``IdMapping`` (``api/IdMapping.java``) realized as a
  broadcast array + binary search instead of a hashmap.
- ``edges``: a materialized Dataset with dense columns ``si``/``di``
  (+ optional ``w``), RANGE-partitioned by ``si`` via one ``sort("si")``
  at build time. Sorted blocks are CSR in all but name: each Arrow block
  is a contiguous src range whose columns view zero-copy as numpy; the
  per-block factorized adjacency is cached process-globally
  (``state.dense``) so iterative kernels pay the build once, like the
  reference's ``AdjacencyMatrix`` built once per projection.

Partitioning contract used by every kernel: any blocking of the edge
table is CORRECT (pre-aggregation + combine is order/partition
insensitive); src-contiguous blocks are merely FASTER (gather locality,
smaller per-block distinct-dst sets). Skew: a power-law dst does not
concentrate work because the scatter side is partitioned by src and the
combiner pre-aggregates per block before anything moves (heavy-hitter
handling per SURVEY.md §4.2 — map-side combine is the salt).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .dense import group_sum, scatter_combine


def _densify_batch(
    batch: pa.Table,
    *,
    vids_ref,
    src: str,
    dst: str,
    weight: Optional[str],
    check: bool = False,
) -> pa.Table:
    vids = ray.get(vids_ref)
    s = batch[src].to_numpy(zero_copy_only=False)
    d = batch[dst].to_numpy(zero_copy_only=False)
    si = np.searchsorted(vids, s)
    di = np.searchsorted(vids, d)
    if check and len(s):
        # caller supplied the vertex set instead of discovering it —
        # an id outside it would silently map to a neighbor's slot
        if (
            si.max() >= len(vids)
            or di.max() >= len(vids)
            or not (np.array_equal(vids[si], s) and np.array_equal(vids[di], d))
        ):
            raise KeyError("edge endpoint not present in the supplied vids")
    cols = {
        "si": si.astype(np.int64),
        "di": di.astype(np.int64),
    }
    if weight is not None:
        cols["w"] = batch[weight].to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table(cols)


_DEDUP_STRATEGIES = ("skip", "sum", "min", "max", "count")


def _partial_combine_batch(batch: pa.Table, *, strategy: str) -> pa.Table:
    """Map-side duplicate-edge combine on (si, di) — lexsort + reduceat,
    no Python loop. Emits one row per distinct pair in the block with a
    partially-combined ``w`` (the global groupby finishes the fold)."""
    si = batch["si"].to_numpy(zero_copy_only=False)
    if not len(si):
        # empty block: emit the same schema the non-empty blocks will
        # (count adds a w column the input may lack)
        cols = {"si": si, "di": si}
        if strategy == "count" or "w" in batch.column_names:
            cols["w"] = np.empty(0, dtype=np.float64)
        return pa.table(cols)
    di = batch["di"].to_numpy(zero_copy_only=False)
    order = np.lexsort((di, si))
    si, di = si[order], di[order]
    new = np.empty(len(si), dtype=bool)
    new[0] = True
    np.logical_or(si[1:] != si[:-1], di[1:] != di[:-1], out=new[1:])
    starts = np.flatnonzero(new)
    cols = {"si": si[starts], "di": di[starts]}
    if strategy == "count":
        counts = np.diff(np.append(starts, len(si)))
        cols["w"] = counts.astype(np.float64)
    elif "w" in batch.column_names:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.float64)[order]
        if strategy == "sum":
            cols["w"] = np.add.reduceat(w, starts)
        elif strategy in ("min", "skip"):
            cols["w"] = np.minimum.reduceat(w, starts)
        else:  # max
            cols["w"] = np.maximum.reduceat(w, starts)
    return pa.table(cols)


def _dedup_dense_edges(dense: "rd.Dataset", *, strategy: str) -> "rd.Dataset":
    """Duplicate-relationship handling at import, the analog of the
    reference's ``DuplicateRelationshipsStrategy`` (NONE|SKIP|SUM|MIN|MAX,
    SURVEY.md §1.2). Datasets have no row order, so SKIP ("keep first
    encountered") is pinned deterministic: keep the MIN weight duplicate.
    ``count`` replaces the weight with the duplicate multiplicity
    (co-occurrence semantics). Unweighted graphs reduce every strategy
    except ``count`` to DISTINCT (si, di).

    Shape at scale: map-side combine shrinks each block to its distinct
    pairs BEFORE the one keyed exchange (hash repartition on ``si`` —
    co-locates every duplicate of a pair), then the SAME combine runs
    once more per block as the final fold (the partial is associative;
    ``count`` partials finish with ``sum``). No Ray groupby — its
    HashAggregate has multi-second fixed overhead (see
    ``sources/corpus.py``); this is the repo's standard
    repartition+fold exchange."""
    from .partitioning import keyed_repartition, shuffle_width, source_size_bytes

    partial = dense.map_batches(
        _partial_combine_batch,
        batch_format="pyarrow",
        batch_size=None,
        fn_kwargs={"strategy": strategy},
    )
    if strategy in ("sum", "count"):
        final = "sum"  # count partials are multiplicities; fold adds them
    elif strategy == "max":
        final = "max"
    else:  # min / skip (and the unweighted no-w distinct case)
        final = "min"
    return keyed_repartition(
        partial, shuffle_width(source_size_bytes(dense)), ["si"]
    ).map_batches(
        _partial_combine_batch,
        batch_format="pyarrow",
        batch_size=None,
        fn_kwargs={"strategy": final},
    )


def _both_directions(batch: pa.Table) -> pa.Table:
    si = batch["si"].to_numpy(zero_copy_only=False)
    di = batch["di"].to_numpy(zero_copy_only=False)
    cols = {
        "si": np.concatenate([si, di]),
        "di": np.concatenate([di, si]),
    }
    if "w" in batch.column_names:
        w = batch["w"].to_numpy(zero_copy_only=False)
        cols["w"] = np.concatenate([w, w])
    return pa.table(cols)


@dataclass
class GraphTables:
    """Immutable projected graph: dense-id edge Dataset + id mapping."""

    vids_ref: ray.ObjectRef
    n: int
    edges: "rd.Dataset"
    m: int
    token: str = field(default_factory=lambda: uuid.uuid4().hex)
    weighted: bool = False
    _sharded: object = field(default=None, repr=False, compare=False)

    def sharded(self, num_shards: Optional[int] = None):
        """Memoized stateful actor pool over the materialized edge blocks
        (state.shards) — built once, reused by every iterative kernel on
        this graph (the analog of the reference running many procedures
        against one loaded ``Graph`` projection)."""
        if self._sharded is None:
            from .shards import ShardedGraph

            self._sharded = ShardedGraph.from_graph(self, num_shards)
        return self._sharded

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    @staticmethod
    def from_dataset(
        ds: "rd.Dataset",
        src: str = "src",
        dst: str = "dst",
        weight: Optional[str] = None,
        *,
        sort: bool = True,
        extra_vids: Optional[np.ndarray] = None,
        vids: Optional[np.ndarray] = None,
        dedup: Optional[str] = None,
    ) -> "GraphTables":
        """Project an edge Dataset (original int64 ids) into dense form.

        ``dedup`` selects the duplicate-relationship strategy applied at
        import (None keeps duplicates; ``skip``/``sum``/``min``/``max``/
        ``count`` per the reference's ``DuplicateRelationshipsStrategy``
        — see ``_dedup_dense_edges`` for the deterministic SKIP pin).

        Distinct-vertex discovery streams per-block uniques to the
        driver (O(distinct) driver memory — same envelope as the dense
        vectors; the shuffle path would be ``ds.unique`` at larger
        scale). Passing ``vids`` (the AUTHORITATIVE vertex set, e.g.
        saved from a prior derivation) skips that discovery scan — one
        full pass over the source instead of two; densify then verifies
        membership and raises on an id outside the set.
        """
        cols = [src, dst] + ([weight] if weight else [])
        ds = ds.select_columns(cols)
        if dedup is not None and dedup not in _DEDUP_STRATEGIES:
            raise ValueError(
                f"dedup must be one of {_DEDUP_STRATEGIES}, got {dedup!r}"
            )
        if vids is not None:
            vids = np.unique(np.asarray(vids, dtype=np.int64))
            vids_ref = ray.put(vids)
            dense = ds.map_batches(
                _densify_batch,
                batch_format="pyarrow",
                batch_size=None,
                fn_kwargs={
                    "vids_ref": vids_ref,
                    "src": src,
                    "dst": dst,
                    "weight": weight,
                    "check": True,
                },
            )
            out_weighted = weight is not None or dedup == "count"
            if dedup is not None:
                dense = _dedup_dense_edges(dense, strategy=dedup)
            if sort and len(vids):
                dense = dense.sort("si")
            dense = dense.materialize()
            return GraphTables(
                vids_ref=vids_ref,
                n=int(len(vids)),
                edges=dense,
                m=int(dense.count()),
                weighted=out_weighted,
            )
        uniq_parts = ds.map_batches(
            lambda b: pa.table(
                {
                    "v": np.unique(
                        np.concatenate(
                            [
                                b[src].to_numpy(zero_copy_only=False),
                                b[dst].to_numpy(zero_copy_only=False),
                            ]
                        )
                    )
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        chunks = [
            batch["v"].to_numpy(zero_copy_only=False)
            for batch in uniq_parts.iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        if extra_vids is not None:
            chunks.append(np.asarray(extra_vids, dtype=np.int64))
        vids = (
            np.unique(np.concatenate(chunks)) if chunks else np.empty(0, dtype=np.int64)
        ).astype(np.int64)
        vids_ref = ray.put(vids)

        dense = ds.map_batches(
            _densify_batch,
            batch_format="pyarrow",
            batch_size=None,
            fn_kwargs={"vids_ref": vids_ref, "src": src, "dst": dst, "weight": weight},
        )
        out_weighted = weight is not None or dedup == "count"
        if dedup is not None:
            dense = _dedup_dense_edges(dense, strategy=dedup)
        if sort and len(vids):
            dense = dense.sort("si")
        dense = dense.materialize()
        return GraphTables(
            vids_ref=vids_ref,
            n=int(len(vids)),
            edges=dense,
            m=int(dense.count()),
            weighted=out_weighted,
        )

    @staticmethod
    def from_arrays(
        src: np.ndarray,
        dst: np.ndarray,
        weight: Optional[np.ndarray] = None,
        extra_vids: Optional[np.ndarray] = None,
        dedup: Optional[str] = None,
    ) -> "GraphTables":
        """Test/fixture constructor from numpy edge arrays."""
        cols = {"src": np.asarray(src, dtype=np.int64), "dst": np.asarray(dst, dtype=np.int64)}
        if weight is not None:
            cols["weight"] = np.asarray(weight, dtype=np.float64)
        ds = rd.from_arrow(pa.table(cols))
        return GraphTables.from_dataset(
            ds,
            weight="weight" if weight is not None else None,
            extra_vids=extra_vids,
            dedup=dedup,
        )

    # ------------------------------------------------------------------
    # accessors
    # ------------------------------------------------------------------
    @property
    def vids(self) -> np.ndarray:
        return ray.get(self.vids_ref)

    def edges_both(self) -> "rd.Dataset":
        """Undirected view: each block emits both directions (no shuffle).

        The analog of the reference loading ``Direction.BOTH``
        (``core/GraphLoader.java`` ``withDirection``): both directions
        are materialized per block on the fly rather than stored twice.
        """
        return self.edges.map_batches(
            _both_directions, batch_format="pyarrow", batch_size=None
        )

    # ------------------------------------------------------------------
    # degrees (reference: api/Degrees.java — here a dense vector)
    # ------------------------------------------------------------------
    def out_degree(self, weighted: bool = False) -> np.ndarray:
        tok = self.token + ("/wodeg" if weighted else "/odeg")

        def partial(batch: pa.Table, _tok=tok, _w=weighted) -> pa.Table:
            si = batch["si"].to_numpy(zero_copy_only=False)
            val = (
                batch["w"].to_numpy(zero_copy_only=False)
                if _w
                else np.ones(len(si), dtype=np.float64)
            )
            idx, sums = group_sum(si, val, token=_tok)
            return pa.table({"idx": idx, "val": sums})

        return scatter_combine(self.edges, partial, self.n, op="sum")

    def in_degree(self, weighted: bool = False) -> np.ndarray:
        tok = self.token + ("/wideg" if weighted else "/ideg")

        def partial(batch: pa.Table, _tok=tok, _w=weighted) -> pa.Table:
            di = batch["di"].to_numpy(zero_copy_only=False)
            val = (
                batch["w"].to_numpy(zero_copy_only=False)
                if _w
                else np.ones(len(di), dtype=np.float64)
            )
            idx, sums = group_sum(di, val, token=_tok)
            return pa.table({"idx": idx, "val": sums})

        return scatter_combine(self.edges, partial, self.n, op="sum")

    # ------------------------------------------------------------------
    # result mapping back to original ids
    # ------------------------------------------------------------------
    def to_table(self, named_vectors: dict[str, np.ndarray], vid_col: str = "vid") -> pa.Table:
        """Dense per-vertex vectors → pyarrow table keyed by original id."""
        cols: dict = {vid_col: self.vids}
        for name, vec in named_vectors.items():
            cols[name] = vec
        return pa.table(cols)

    def to_dataset(self, named_vectors: dict[str, np.ndarray], vid_col: str = "vid") -> "rd.Dataset":
        return rd.from_arrow(self.to_table(named_vectors, vid_col=vid_col))
