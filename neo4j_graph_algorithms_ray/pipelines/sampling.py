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
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

# Knuth multiplicative hash; 2654435761 = 2^32 / phi. SQL-recomputable
# exactly: (doc_id * 2654435761) % 4294967296.
_HASH_MULT = np.uint64(2654435761)
_HASH_MOD = np.uint64(1) << np.uint64(32)


def _sample_hash(ids: np.ndarray) -> np.ndarray:
    return ((ids.astype(np.uint64) * _HASH_MULT) % _HASH_MOD).astype(np.int64)


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

    hist: dict = {}
    for b in docs.map_batches(
        lambda df: df.groupby(stratum_col, as_index=False).size(),
        batch_format="pandas",
    ).iter_batches(batch_format="pandas"):
        for k, v in zip(b[stratum_col], b["size"]):
            hist[k] = hist.get(k, 0) + int(v)
    total = float(sum(hist.values())) or 1.0
    weights = {
        k: float(np.floor((v / total) ** (alpha - 1.0) * 1e6 + 0.5) / 1e6)
        for k, v in hist.items()
    }
    w_ref = ray.put(weights)

    def apply(df: pd.DataFrame, _w=w_ref) -> pd.DataFrame:
        import ray as _ray

        w = _ray.get(_w)
        return pd.DataFrame(
            {
                "doc_id": df[id_col].to_numpy(np.int64),
                stratum_col: df[stratum_col],
                "weight": df[stratum_col].map(w).to_numpy(np.float64),
            }
        )

    return docs.map_batches(apply, batch_format="pandas")


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

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": df[id_col].to_numpy(np.int64),
                "stratum": df[stratum_col],
                "hv": _sample_hash(df[id_col].to_numpy(np.int64)),
            }
        )
        out = out.sort_values(["stratum", "hv", "doc_id"], kind="stable")
        return out.groupby("stratum", sort=False).head(cap).reset_index(drop=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["hv", "doc_id"], kind="stable")
        df = df.groupby("stratum", sort=False).head(cap)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64),
             stratum_col: df["stratum"]}
        ).reset_index(drop=True)

    # the shuffled partial table is cap-bounded per (stratum, block) —
    # never larger than the input — so an input-bytes width is an
    # upper bound and small corpora fold in one block
    return keyed_repartition(
        docs.map_batches(partial, batch_format="pandas"),
        shuffle_width(source_size_bytes(docs)),
        ["stratum"],
    ).map_batches(final, batch_format="pandas", batch_size=None)


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

    hist: dict = {}
    for b in docs.map_batches(
        lambda df: df.groupby(stratum_col, as_index=False).size(),
        batch_format="pandas",
    ).iter_batches(batch_format="pandas"):
        for k, v in zip(b[stratum_col], b["size"]):
            hist[k] = hist.get(k, 0) + int(v)
    total = float(sum(hist.values())) or 1.0
    thr = {}
    for k, v in hist.items():
        w = float(np.floor((v / total) ** (alpha - 1.0) * 1e6 + 0.5) / 1e6)
        p = min(w * scale, 1.0)
        thr[k] = int(np.floor(p * 4294967296.0))
    t_ref = ray.put(thr)

    def keep(df: pd.DataFrame, _t=t_ref) -> pd.DataFrame:
        import ray as _ray

        t = _ray.get(_t)
        hv = _sample_hash(df[id_col].to_numpy(np.int64))
        lim = df[stratum_col].map(t).to_numpy(np.int64)
        m = hv < lim
        return pd.DataFrame(
            {
                "doc_id": df[id_col].to_numpy(np.int64)[m],
                stratum_col: df[stratum_col].to_numpy()[m],
            }
        )

    return docs.map_batches(keep, batch_format="pandas")
