"""Deterministic sampling operators for training-data curation.

Stratified (per-group capped) sampling over an arbitrarily large
corpus: every stratum keeps its ``cap`` docs with the SMALLEST values
of a splittable multiplicative hash of the id — a deterministic,
order-independent, resume-stable choice (re-running on the same input
always picks the same docs; adding docs only displaces ones with
larger hashes). The selection is a monotone top-k per stratum, so it
distributes as partial top-k per block + final top-k per stratum:
the shuffle carries at most ``cap × blocks`` rows per stratum, never
the corpus.

All stages are zero-copy Arrow (round-5 pandas burn-down): the
stratum histograms fold ``count_all`` partials over a pruned
single-column scan, stratum→value maps apply via ``pc.index_in``
gathers, and the per-stratum top-k is a lexsort + rank mask — no
pandas frame is ever built.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# Knuth multiplicative hash; 2654435761 = 2^32 / phi. SQL-recomputable
# exactly: (doc_id * 2654435761) % 4294967296.
_HASH_MULT = np.uint64(2654435761)
_HASH_MOD = np.uint64(1) << np.uint64(32)


def _sample_hash(ids: np.ndarray) -> np.ndarray:
    return ((ids.astype(np.uint64) * _HASH_MULT) % _HASH_MOD).astype(np.int64)


def _stratum_hist(docs: "rd.Dataset", stratum_col: str) -> dict:
    """Map-side partial stratum histogram folded on the driver — one
    int per stratum. The scan is pruned to the single stratum column
    (the docs table's text never leaves the read)."""
    hist: dict = {}
    for t in (
        docs.select_columns([stratum_col])
        .map_batches(
            lambda t, _c=stratum_col: t.group_by(_c).aggregate(
                [([], "count_all")]
            ),
            batch_format="pyarrow",
        )
        .iter_batches(batch_format="pyarrow")
    ):
        for k, v in zip(t[stratum_col].to_pylist(), t["count_all"].to_pylist()):
            hist[k] = hist.get(k, 0) + int(v)
    return hist


def _stratum_gather(strat: "pa.ChunkedArray", mapping_ref) -> np.ndarray:
    """stratum → value, vectorized: one ``pc.index_in`` against the
    broadcast key array + one numpy gather."""
    import ray as _ray

    keys, vals = _ray.get(mapping_ref)
    idx = pc.index_in(strat, value_set=keys).to_numpy(zero_copy_only=False)
    return vals[idx.astype(np.int64)]


def rebalance_weights(
    docs: "rd.Dataset",
    alpha: float = 0.3,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> "rd.Dataset":
    """Temperature-based corpus rebalancing (the multilingual
    p_s^alpha upsampling rule of mC4/XLM-R): per doc, the relative
    sampling weight ``(n_s / N) ** (alpha - 1)`` of its stratum —
    low-resource strata get proportionally larger weights; ``alpha=1``
    is natural sampling. Weights are UNNORMALIZED (relative), so the
    value is a pure per-stratum expression with no cross-stratum float
    fold — deterministic to the last bit modulo libm pow. Rounded
    half-away to 6 decimals (DuckDB ROUND parity).

    Two phases: a map-side partial stratum histogram folds to the
    driver (one int per stratum), then one streamed ``map_batches``
    maps stratum → weight. No shuffle at all."""
    import ray

    hist = _stratum_hist(docs, stratum_col)
    total = float(sum(hist.values())) or 1.0
    keys = list(hist)
    w_ref = ray.put(
        (
            pa.array(keys),
            np.array(
                [
                    np.floor((hist[k] / total) ** (alpha - 1.0) * 1e6 + 0.5)
                    / 1e6
                    for k in keys
                ],
                dtype=np.float64,
            ),
        )
    )

    def apply(t: pa.Table, _w=w_ref) -> pa.Table:
        return pa.table(
            {
                "doc_id": t[id_col].cast(pa.int64()),
                stratum_col: t[stratum_col],
                "weight": _stratum_gather(t[stratum_col], _w),
            }
        )

    return docs.select_columns([id_col, stratum_col]).map_batches(
        apply, batch_format="pyarrow"
    )


def _head_per_stratum(
    strat_np: np.ndarray, hv: np.ndarray, ids: np.ndarray, cap: int
):
    """Indices (into the input arrays) of the ≤``cap`` rows per stratum
    with the smallest (hv, doc_id), ordered (stratum, hv, doc_id) —
    one lexsort + one rank-within-run mask, no per-group loop."""
    order = np.lexsort((ids, hv, strat_np))
    s = strat_np[order]
    first = np.ones(len(s), dtype=bool)
    if len(s):
        first[1:] = s[1:] != s[:-1]
    starts = np.flatnonzero(first)
    runs = np.diff(np.append(starts, len(s)))
    pos = np.arange(len(s), dtype=np.int64) - np.repeat(starts, runs)
    return order[pos < cap]


def stratified_sample(
    docs: "rd.Dataset",
    cap: int = 20,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> "rd.Dataset":
    """(doc_id, <stratum_col>): at most ``cap`` docs per stratum, the
    ones with the smallest (hash, doc_id) key. Equivalent SQL:
    ``ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY hv, doc_id) <=
    cap``. Two-phase: block-local top-cap (map_batches) then a keyed
    repartition co-locating each stratum for the final top-cap —
    the shuffle carries at most ``cap × blocks`` rows per stratum,
    never the corpus, and stratum skew is bounded by that same
    pre-aggregated ceiling."""
    from ..state.partitioning import (
        keyed_repartition,
        shuffle_width,
        source_size_bytes,
    )

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        strat = t[stratum_col].to_numpy(zero_copy_only=False)
        hv = _sample_hash(ids)
        keep = _head_per_stratum(strat, hv, ids, cap)
        return pa.table(
            {
                "doc_id": ids[keep],
                "stratum": pa.array(strat[keep]),
                "hv": hv[keep],
            }
        )

    def final(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        strat = t["stratum"].to_numpy(zero_copy_only=False)
        hv = t["hv"].to_numpy(zero_copy_only=False)
        keep = _head_per_stratum(strat, hv, ids, cap)
        return pa.table(
            {"doc_id": ids[keep], stratum_col: pa.array(strat[keep])}
        )

    # the shuffled partial table is cap-bounded per (stratum, block) —
    # never larger than the input — so an input-bytes width is an
    # upper bound and small corpora fold in one block
    return keyed_repartition(
        docs.select_columns([id_col, stratum_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        shuffle_width(source_size_bytes(docs)),
        ["stratum"],
    ).map_batches(final, batch_format="pyarrow", batch_size=None)


def weighted_sample(
    docs: "rd.Dataset",
    alpha: float = 0.3,
    scale: float = 0.5,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> "rd.Dataset":
    """The sampling decision that operationalizes
    :func:`rebalance_weights`: keep each doc with per-stratum
    probability ``min(scale · (n_s/N)^(alpha-1), 1)``, derandomized by
    the splittable doc_id hash — deterministic, order-independent,
    resume-stable (re-running keeps exactly the same docs). The
    comparison is INTEGER (``hash < floor(p·2^32)`` with p built from
    the 6-decimal-rounded weight), so the SQL mirror is exact with no
    float-boundary hazard. Same two-phase shape as
    :func:`rebalance_weights`: tiny stratum histogram fold +
    broadcast, one streamed filter pass, no shuffle."""
    import ray

    hist = _stratum_hist(docs, stratum_col)
    total = float(sum(hist.values())) or 1.0
    keys = list(hist)
    lims = []
    for k in keys:
        w = float(np.floor((hist[k] / total) ** (alpha - 1.0) * 1e6 + 0.5) / 1e6)
        lims.append(int(np.floor(min(w * scale, 1.0) * 4294967296.0)))
    t_ref = ray.put((pa.array(keys), np.array(lims, dtype=np.int64)))

    def keep(t: pa.Table, _t=t_ref) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hv = _sample_hash(ids)
        lim = _stratum_gather(t[stratum_col], _t)
        m = hv < lim
        return pa.table(
            {
                "doc_id": ids[m],
                stratum_col: t[stratum_col].combine_chunks().filter(
                    pa.array(m)
                ),
            }
        )

    return docs.select_columns([id_col, stratum_col]).map_batches(
        keep, batch_format="pyarrow"
    )
