"""Scale demonstration for the DISTRIBUTED near-dup path (VERDICT r1
#3/#5): run ``minhash_lsh_neardup`` and ``simhash_neardup`` on a
synthetic corpus LARGER than ``_SINGLE_TASK_SCAN_MAX_DOCS`` so the
band-hash shuffle + per-block bucket scan + Dataset pair assembly
actually execute (not the small-input single-task gate), with planted
duplicate clusters whose recovery is asserted, and report wall time +
driver peak RSS.

The corpus is GENERATED DISTRIBUTED (one seeded block per task; no
document ever materializes on the driver).

Usage: python tools/neardup_scale_run.py [docs_thousands=150]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORDS = np.array(
    [
        f"w{i:04d}" for i in range(4000)
    ]
)


def main() -> None:
    import ray

    kd = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    n_docs = kd * 1000
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from neo4j_graph_algorithms_ray.pipelines import dedup as D

    per_block = 5_000
    blocks = n_docs // per_block
    # every 50th doc is a near-copy of the preceding doc (one word
    # swapped) → ~n_docs/50 planted pairs the pipeline must recover
    PLANT_EVERY = 50

    def gen(batch: pa.Table) -> pa.Table:
        ids_out, texts = [], []
        for bid in batch["id"].to_pylist():
            rng = np.random.default_rng(7000 + int(bid))
            base = int(bid) * per_block
            prev = None
            for j in range(per_block):
                did = base + j
                if did % PLANT_EVERY == 1 and prev is not None:
                    words = prev.copy()
                    words[rng.integers(len(words))] = "mutated"
                else:
                    words = _WORDS[rng.integers(0, len(_WORDS), 40)]
                prev = words
                ids_out.append(did)
                texts.append(" ".join(words))
        return pa.table({"doc_id": np.asarray(ids_out, np.int64),
                         "text": np.asarray(texts, dtype=object)})

    docs = (
        rd.from_arrow(pa.table({"id": np.arange(blocks, dtype=np.int64)}))
        .repartition(blocks)
        .map_batches(gen, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    assert docs.count() == n_docs > D._SINGLE_TASK_SCAN_MAX_DOCS

    t0 = time.perf_counter()
    mh = D.minhash_lsh_neardup(docs, threshold=0.5)
    t_mh = time.perf_counter() - t0
    t0 = time.perf_counter()
    sh = D.simhash_neardup(docs)
    t_sh = time.perf_counter() - t0

    # every did ≡ 1 (mod 50) is a near-copy of did-1 (j=0 always
    # precedes j=1 inside its generation block)
    planted = n_docs // PLANT_EVERY
    got = mh.pairs
    adjacent = (got["doc_b"] - got["doc_a"] == 1) & (got["doc_b"] % PLANT_EVERY == 1)
    recovered = int(adjacent.sum())
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    out = {
        "docs": n_docs,
        "minhash_seconds": round(t_mh, 2),
        "simhash_seconds": round(t_sh, 2),
        "minhash_pairs": int(len(mh.pairs)),
        "minhash_groups": int(len(mh.groups)),
        "simhash_groups": int(len(sh.groups)),
        "planted_adjacent_pairs": planted,
        "recovered_adjacent_pairs": recovered,
        "recall_planted": round(recovered / planted, 4),
        "driver_peak_rss_mb": rss_mb,
        "num_cpus": cpus,
        "path": "band-hash shuffle + per-block bucket scan (forced: "
        "docs > _SINGLE_TASK_SCAN_MAX_DOCS)",
    }
    print(json.dumps(out))
    assert out["recall_planted"] >= 0.95, out
    ray.shutdown()


if __name__ == "__main__":
    main()
