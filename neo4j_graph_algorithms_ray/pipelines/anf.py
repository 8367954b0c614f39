"""HyperANF (Boldi, Rosa & Vigna, WWW 2011): the approximate
neighborhood function N(t) = Σ_v |ball(v, t)| — how many (source,
target) pairs are within t hops — estimated with one small HyperLogLog
counter per vertex instead of an O(n²) all-pairs BFS. The per-round
update is a pure max-merge of neighbor registers, so a round costs one
edge sweep; effective-diameter / closeness-distribution probes that
would need MSBFS over every source become O(rounds · m).

Beyond-reference operator (the reference has no sketch kernels); the
register machinery is shared with :mod:`sketches` and, like every
sketch here, the whole computation — vertex-seed splitmix64 hash,
bucket/rank bit arithmetic, synchronous register max-propagation,
estimator branch — is EXACTLY SQL-recomputable for a fixed round
count (see ``__ray_entry__._anf_sql``).

Scale note: registers are O(64·n) bytes of dense uint8 state — 64 GB
at 10⁹ vertices — owned by ONE worker task here (the same single-task
gate the triangle/set-sim kernels use below their ceilings), with the
edge sweep chunked so gathers stay cache-sized. The multi-node path is
the documented range-sharded upgrade: registers live range-sharded on
the shard actors exactly like rank vectors (state/shards.py), and each
round exchanges boundary register maxes — same round protocol as LPA.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .sketches import _bit_length_u64, mix64
from ..state.graph import GraphTables

_ANF_P = 6  # 2^6 = 64 registers per vertex (HyperANF's own default)
_ANF_M = 1 << _ANF_P
_ANF_LOW = 64 - _ANF_P  # 58 low bits -> rank in 1..59
_ANF_ALPHA = 0.7213 / (1.0 + 1.079 / _ANF_M)
_ANF_C = _ANF_ALPHA * _ANF_M * _ANF_M
_EDGE_CHUNK = 1 << 19


def _init_registers(vids: np.ndarray) -> np.ndarray:
    """(n, 64) uint8: each vertex's counter holds only itself —
    one register set from the splitmix64 hash of (original vid + 1)."""
    x = mix64(vids.astype(np.uint64) + np.uint64(1))
    bucket = (x >> np.uint64(_ANF_LOW)).astype(np.int64)
    low = x & np.uint64((1 << _ANF_LOW) - 1)
    rank = np.where(
        low > 0, _ANF_LOW + 1 - _bit_length_u64(low), _ANF_LOW + 1
    ).astype(np.uint8)
    M = np.zeros((len(vids), _ANF_M), dtype=np.uint8)
    M[np.arange(len(vids)), bucket] = rank
    return M


def _estimate_sum(M: np.ndarray) -> float:
    """Σ_v HLL-estimate(registers_v), rounded half-away to 3. Each
    2^-rank term is an exact double and realistic rank spans stay
    under 53 bits, so the per-vertex register sum — and therefore the
    small-range branch condition — is bit-identical to the SQL SUM
    regardless of summation order."""
    ssum = np.ldexp(1.0, -M.astype(np.int64)).sum(axis=1)
    zeros = (M == 0).sum(axis=1)
    raw = _ANF_C / ssum
    small = (raw <= 2.5 * _ANF_M) & (zeros > 0)
    est = np.where(
        small,
        _ANF_M * np.log(_ANF_M / np.maximum(zeros, 1).astype(np.float64)),
        raw,
    )
    return float(np.floor(est.sum() * 1e3 + 0.5) / 1e3)


@ray.remote
def _anf_task(n: int, vids: np.ndarray, rounds: int, csr) -> pd.DataFrame:
    ip, nb = csr[0], csr[1]
    M = _init_registers(vids)
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(ip))
    out_t, out_n = [0], [_estimate_sum(M)]
    for t in range(1, rounds + 1):
        new = M.copy()
        for lo in range(0, len(src), _EDGE_CHUNK):
            s = src[lo : lo + _EDGE_CHUNK]
            d = nb[lo : lo + _EDGE_CHUNK]
            np.maximum.at(new, d, M[s])
        M = new
        out_t.append(t)
        out_n.append(_estimate_sum(M))
    return pd.DataFrame({"t": np.array(out_t, dtype=np.int64), "n_pairs": out_n})


def effective_diameter(
    graph: GraphTables,
    rounds: int = 8,
    alpha: float = 0.9,
    directed: bool = False,
) -> pa.Table:
    """HyperANF's headline statistic: the smallest t whose estimated
    neighborhood function reaches ``alpha`` of the final round's —
    one ``(eff_diameter, n_pairs_final)`` row (integer t, so no
    interpolation ambiguity against the SQL mirror)."""
    t = hyperanf(graph, rounds=rounds, directed=directed)
    n = t["n_pairs"].to_numpy()
    target = alpha * n[-1]
    d = int(np.argmax(n >= target))  # first index meeting the target
    return pa.table(
        {
            "eff_diameter": np.array([d], dtype=np.int64),
            "n_pairs_final": np.array([n[-1]], dtype=np.float64),
        }
    )


def hyperanf(
    graph: GraphTables, rounds: int = 4, directed: bool = False
) -> pa.Table:
    """(t, n_pairs) for t = 0..rounds: the estimated number of ordered
    vertex pairs within t hops (t=0 rows count each vertex itself).
    Synchronous rounds — round t reads only round t-1's registers —
    matching the unrolled SQL oracle exactly."""
    from ..state.csr import build_csr_ref

    csr_ref = build_csr_ref(graph, directed=directed, weighted=False)
    df = ray.get(_anf_task.remote(graph.n, graph.vids, rounds, csr_ref))
    return pa.table(
        {"t": df["t"].to_numpy(np.int64), "n_pairs": df["n_pairs"].to_numpy(np.float64)}
    )
