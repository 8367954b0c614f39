"""Categorical-set similarity procedures (reference:
``algo.similarity.jaccard`` / ``algo.similarity.overlap``,
``algo/.../similarity/JaccardProc.java`` / ``OverlapProc.java``
[later-branch §2.6]): each entity owns a SET of categorical items;
the procedure streams per-entity top-k similar entities above a
``similarityCutoff``.

Dataflow (no all-pairs): inverted index by item — a hash repartition on
``item`` makes each item's entity list block-complete; per block every
item emits its co-entity pairs pre-aggregated on a packed (a, b) key,
split into TWO entity-keyed half-rows; a hash repartition on ``entity``
folds the per-entity set sizes AND stamps each half-row with its
entity's global size (tagged union — nothing O(#entities) ever lands
on the driver); a repartition on the pair key reunites the halves,
folds the global intersection counts and scores; top-k per entity is a
final repartition on ``a`` + per-block head.
Skew note: a hot item with bucket size B emits O(B²) pairs — cap it
with ``max_item_entities`` (drops items shared by more than that many
entities, the standard stop-word cut for set similarity at scale).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..state.partitioning import keyed_repartition, shuffle_width

_PACK = np.uint64(1) << np.uint64(32)

# Below this many distinct (entity, item) rows the whole computation
# runs in ONE remote task over the deduped blocks: the distributed path
# pays three HashShuffle exchanges (~2 s fixed aggregator spin-up each)
# that dwarf the actual work on inputs whose inverted index fits one
# worker heap (same size-gated engine choice as dedup.py's
# _SINGLE_TASK_SCAN_MAX_DOCS).
_SINGLE_TASK_MAX_ROWS = 2_000_000


def _pair_counts_arrays(ii, ee, cap):
    """Packed co-entity pair keys + intersection counts from a complete
    (item, entity) table (item groups must be whole)."""
    order = np.lexsort((ee, ii))
    ii, ee = ii[order], ee[order]
    bounds = np.flatnonzero(np.diff(ii)) + 1
    bounds = np.concatenate(([0], bounds, [len(ii)]))
    out = []
    for gi in range(len(bounds) - 1):
        grp = ee[bounds[gi] : bounds[gi + 1]]
        if len(grp) < 2 or (cap is not None and len(grp) > cap):
            continue
        a, b = np.triu_indices(len(grp), 1)
        out.append(grp[a].astype(np.uint64) * _PACK + grp[b].astype(np.uint64))
    if not out:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    packed = np.concatenate(out)
    uniq, cnt = np.unique(packed, return_counts=True)
    return uniq, cnt.astype(np.int64)


def _score_pairs(pk, c, se, sv, metric, cutoff):
    """(a, b, similarity) frame from globally-summed pair counts and the
    sorted entity-size lookup (se, sv)."""
    c = c.astype(np.float64)
    a = (pk // _PACK).astype(np.int64)
    b = (pk % _PACK).astype(np.int64)
    sa = sv[np.searchsorted(se, a)].astype(np.float64)
    sb = sv[np.searchsorted(se, b)].astype(np.float64)
    if metric == "jaccard":
        sim = c / (sa + sb - c)
    else:
        sim = c / np.minimum(sa, sb)
    keep = sim >= cutoff
    return pd.DataFrame({"a": a[keep], "b": b[keep], "similarity": sim[keep]})


def _topk_frame(df: pd.DataFrame, topk: int) -> pd.DataFrame:
    """Both-direction per-entity top-k with the (sim desc, b asc) tie
    order; input is the complete one-direction pair table."""
    df = pd.DataFrame(
        {
            "a": np.concatenate([df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)]),
            "b": np.concatenate([df["b"].to_numpy(np.int64), df["a"].to_numpy(np.int64)]),
            "similarity": np.tile(df["similarity"].to_numpy(np.float64), 2),
        }
    )
    df = df.sort_values(
        ["a", "similarity", "b"], ascending=[True, False, True], kind="stable"
    )
    df["rank"] = df.groupby("a", sort=False).cumcount() + 1
    out = df[df["rank"] <= topk].reset_index(drop=True)
    return pd.DataFrame(
        {
            "entity_a": out["a"].to_numpy(np.int64),
            "entity_b": out["b"].to_numpy(np.int64),
            "rank": out["rank"].to_numpy(np.int64),
            "similarity": out["similarity"].to_numpy(np.float64),
        }
    )


@ray.remote
def _setsim_single_task(metric, topk, cutoff, cap, *blocks) -> pd.DataFrame:
    dfs = [
        (b if isinstance(b, pd.DataFrame) else b.to_pandas())
        for b in blocks
        if (len(b) if isinstance(b, pd.DataFrame) else b.num_rows)
    ]
    if not dfs:
        return pd.DataFrame(
            {
                "entity_a": pd.Series([], dtype="int64"),
                "entity_b": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
                "similarity": pd.Series([], dtype="float64"),
            }
        )
    df = pd.concat(dfs, ignore_index=True).drop_duplicates()
    sz = df.groupby("e", sort=True, as_index=False).size()
    se = sz["e"].to_numpy(np.int64)
    sv = sz["size"].to_numpy(np.int64)
    pk, c = _pair_counts_arrays(
        df["i"].to_numpy(np.int64), df["e"].to_numpy(np.int64), cap
    )
    pairs = _score_pairs(pk, c, se, sv, metric, cutoff)
    return _topk_frame(pairs, topk)


def set_similarity_topk(
    items: "rd.Dataset",
    *,
    metric: str = "jaccard",  # jaccard | overlap
    topk: int = 3,
    cutoff: float = 0.0,
    entity_col: str = "e",
    item_col: str = "i",
    max_item_entities: Optional[int] = None,
    engine: str = "auto",  # auto | single | distributed
) -> "rd.Dataset":
    """(entity_a, entity_b, rank, similarity): for each entity, the
    top-k most similar other entities by set jaccard/overlap, similarity
    ≥ cutoff; ties → entity_b asc. Entity ids must be < 2^32 (packed
    pair keys)."""
    if metric not in ("jaccard", "overlap"):
        raise ValueError(metric)
    if engine not in ("auto", "single", "distributed"):
        raise ValueError(engine)

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[entity_col, item_col]].drop_duplicates()
        return pd.DataFrame(
            {"e": out[entity_col].to_numpy(np.int64), "i": out[item_col].to_numpy(np.int64)}
        )

    deduped = items.map_batches(dedup, batch_format="pandas")
    if engine == "single" or (
        engine == "auto" and items.count() <= _SINGLE_TASK_MAX_ROWS
    ):
        from ..state.csr import _block_refs

        mat = deduped.materialize()
        out = ray.get(
            _setsim_single_task.remote(
                metric, topk, cutoff, max_item_entities, *_block_refs(mat)
            )
        )
        return rd.from_pandas(out)

    # distinct (e, i) — block-level dedup, completed by the item shuffle
    # (a duplicate surviving across blocks lands in the same item block
    # and dies in the per-block np.unique below)
    distinct = keyed_repartition(
        deduped, shuffle_width(), ["i"]
    ).materialize()  # read twice (sizes + pair fan-out) — shuffle once

    # tagged union through the entity exchange: role 0/1 rows are the
    # a-/b-halves of a per-block partial pair count; role 2 rows are
    # per-block partial set sizes (pk=0, c=partial size). One hash
    # repartition on `e` folds every entity's global size and stamps it
    # onto that entity's pair halves — the O(#entities) size table
    # never leaves the cluster.
    def pair_halves(df: pd.DataFrame, _cap=max_item_entities) -> pd.DataFrame:
        df = df.drop_duplicates()
        pk, c = _pair_counts_arrays(
            df["i"].to_numpy(np.int64), df["e"].to_numpy(np.int64), _cap
        )
        a = (pk // _PACK).astype(np.int64)
        b = (pk % _PACK).astype(np.int64)
        return pd.DataFrame(
            {
                "e": np.concatenate([a, b]),
                "pk": np.tile(pk, 2),
                "c": np.tile(c, 2),
                "role": np.repeat(np.array([0, 1], np.int8), len(pk)),
            }
        )

    def size_partials(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates().groupby("e", sort=False, as_index=False).size()
        return pd.DataFrame(
            {
                "e": out["e"].to_numpy(np.int64),
                "pk": np.zeros(len(out), np.uint64),
                "c": out["size"].to_numpy(np.int64),
                "role": np.full(len(out), 2, np.int8),
            }
        )

    tagged = distinct.map_batches(
        pair_halves, batch_format="pandas", batch_size=None
    ).union(
        distinct.map_batches(size_partials, batch_format="pandas", batch_size=None)
    )

    def attach_sizes(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "pk": pd.Series([], dtype="uint64"),
                    "c": pd.Series([], dtype="int64"),
                    "role": pd.Series([], dtype="int8"),
                    "s": pd.Series([], dtype="int64"),
                }
            )
        is_size = df["role"].to_numpy(np.int8) == 2
        sizes = (
            df[is_size].groupby("e", sort=True)["c"].sum()
        )  # global per-entity set size (block is e-complete)
        rows = df[~is_size]
        s = sizes.to_numpy(np.int64)[
            np.searchsorted(sizes.index.to_numpy(np.int64), rows["e"].to_numpy(np.int64))
        ]
        return pd.DataFrame(
            {
                "pk": rows["pk"].to_numpy(np.uint64),
                "c": rows["c"].to_numpy(np.int64),
                "role": rows["role"].to_numpy(np.int8),
                "s": s,
            }
        )

    halves = keyed_repartition(tagged, shuffle_width(), ["e"]).map_batches(
        attach_sizes, batch_format="pandas", batch_size=None
    )

    def score(df: pd.DataFrame, _metric=metric, _cut=cutoff) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "similarity": pd.Series([], dtype="float64"),
            }
        )
        if not len(df):
            return empty
        role = df["role"].to_numpy(np.int8)
        # role-0 halves carry every partial count for a pair exactly once
        r0 = df[role == 0].groupby("pk", sort=True).agg(c=("c", "sum"), s=("s", "first"))
        r1 = df[role == 1].groupby("pk", sort=True)["s"].first()
        if not len(r0):
            return empty
        pk = r0.index.to_numpy(np.uint64)
        c = r0["c"].to_numpy(np.float64)
        sa = r0["s"].to_numpy(np.float64)
        sb = r1.to_numpy(np.float64)  # same sorted pk index as r0
        a = (pk // _PACK).astype(np.int64)
        b = (pk % _PACK).astype(np.int64)
        if _metric == "jaccard":
            sim = c / (sa + sb - c)
        else:
            sim = c / np.minimum(sa, sb)
        keep = sim >= _cut
        return pd.DataFrame({"a": a[keep], "b": b[keep], "similarity": sim[keep]})

    pairs = keyed_repartition(halves, shuffle_width(), ["pk"]).map_batches(
        score, batch_format="pandas", batch_size=None
    )

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "a": np.concatenate([df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64)]),
                "b": np.concatenate([df["b"].to_numpy(np.int64), df["a"].to_numpy(np.int64)]),
                "similarity": np.tile(df["similarity"].to_numpy(np.float64), 2),
            }
        )

    def head_topk(df: pd.DataFrame, _k=topk) -> pd.DataFrame:
        df = df.sort_values(
            ["a", "similarity", "b"], ascending=[True, False, True], kind="stable"
        )
        df["rank"] = df.groupby("a", sort=False).cumcount() + 1
        out = df[df["rank"] <= _k].reset_index(drop=True)
        return pd.DataFrame(
            {
                "entity_a": out["a"].to_numpy(np.int64),
                "entity_b": out["b"].to_numpy(np.int64),
                "rank": out["rank"].to_numpy(np.int64),
                "similarity": out["similarity"].to_numpy(np.float64),
            }
        )

    return keyed_repartition(
        pairs.map_batches(both_dirs, batch_format="pandas"),
        shuffle_width(),
        ["a"],
    ).map_batches(head_topk, batch_format="pandas", batch_size=None)
