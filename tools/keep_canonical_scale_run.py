"""Scale demonstration for the DISTRIBUTED dedup_keep_canonical
engine (round-3 fix: canonical selection via three keyed exchanges —
chars join on doc_id, per-group argmax on group_id, survivor
anti-join — replacing the round-2 driver-side membership pandas).

Generates a ≥1M-document corpus DISTRIBUTED (one seeded block per
task, nothing materializes on the driver) with a ~55% near-duplicate
rate (planted groups of 3 sharing a base text with small suffix
perturbations, interleaved with unique singletons), runs the full
MinHash-LSH → WCC → canonical-selection composite, and asserts:

- every planted group keeps exactly ONE survivor (the longest text);
- singletons all survive with group_size 1;
- driver peak RSS stays flat (the selection state never lands on the
  driver — only the O(membership) group-id table the minhash stage
  already returns, as numpy/pandas int columns).

Usage: python tools/keep_canonical_scale_run.py [docs_thousands=1000]
       [base_words=60]

``base_words`` scales the per-doc text volume (base text = base_words
words x3 reps); the dup structure, selection semantics and the
RSS-flatness claim are independent of it — the 10M-doc run uses a
slimmer text so the sha/minhash byte volume fits the sandbox's
degraded-CPU wall-clock, while membership/exchange row counts (what
the driver-RSS claim is about) still scale with the full doc count.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 65k-token synthetic vocabulary: a tiny vocab (a few dozen words) makes
# char-shingle sets nearly identical across ALL docs, collapsing minhash
# signatures globally and producing corpus-sized LSH buckets — a generator
# artifact, not an engine property. Real corpora have heavy-tailed but
# LARGE vocabularies; model that.
_WORDS = np.array([f"w{i:04x}" for i in range(65536)], dtype=object)

GROUP = 3  # planted near-dup group size


def gen_block(block_id: int, docs_per_block: int, base_words: int = 60) -> pd.DataFrame:
    """Docs [block*dpb, (block+1)*dpb): ids with (id//GROUP) % 2 == 0
    form near-dup groups of GROUP (same base text + ' pad'*k suffix so
    lengths differ and the canonical pick is the k=GROUP-1 member);
    odd base ids are unique singletons. Block-local generation only —
    group members stay within one block's id range by construction
    (GROUP divides docs_per_block)."""
    rng = np.random.default_rng(7_000 + block_id)
    lo = block_id * docs_per_block
    ids = np.arange(lo, lo + docs_per_block, dtype=np.int64)
    texts: list[str] = []
    base_text = None
    for d in ids:
        base_id = d // GROUP
        k = d % GROUP
        if base_id % 2 == 0:  # near-dup group
            if k == 0 or base_text is None:
                base_text = " ".join(rng.choice(_WORDS, size=base_words)) * 3
            texts.append(base_text + " pad" * int(k))
        else:  # singleton: unique text
            half = max(base_words * 2 // 3, 8)
            texts.append(
                " ".join(rng.choice(_WORDS, size=half))
                + f" unique-{d} "
                + " ".join(rng.choice(_WORDS, size=half))
            )
    return pd.DataFrame({"doc_id": ids, "text": texts})


def main() -> None:
    import ray
    import ray.data as rd

    docs_k = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    base_words = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    n_docs = docs_k * 1000
    dpb = 6000  # GROUP divides this
    n_blocks = (n_docs + dpb - 1) // dpb
    n_docs = n_blocks * dpb

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    rd.DataContext.get_current().enable_progress_bars = False

    from neo4j_graph_algorithms_ray.pipelines.dedup import dedup_keep_canonical

    docs = rd.range(n_blocks).map_batches(
        lambda df: pd.concat(
            [gen_block(int(b), dpb, base_words) for b in df["id"]],
            ignore_index=True
        ),
        batch_format="pandas",
        batch_size=4,
    ).materialize()

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    t0 = time.perf_counter()
    out = dedup_keep_canonical(docs)  # auto -> distributed above 100k docs
    # stream-verify: count survivors per class, never collect the table
    n_surv = 0
    n_canon = 0  # survivors with group_size == GROUP (planted groups)
    n_single = 0
    bad = 0
    for b in out.iter_batches(batch_format="pandas"):
        ids = b["doc_id"].to_numpy(np.int64)
        gs = b["group_size"].to_numpy(np.int64)
        n_surv += len(ids)
        grp = (ids // GROUP) % 2 == 0
        n_canon += int(((gs == GROUP) & grp).sum())
        n_single += int(((gs == 1) & ~grp).sum())
        # planted groups: canonical must be the longest member (k=GROUP-1)
        bad += int((grp & (ids % GROUP != GROUP - 1)).sum())
        bad += int((grp & (gs != GROUP)).sum())
        bad += int((~grp & (gs != 1)).sum())
    wall = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024

    n_groups = n_docs // GROUP // 2  # even base ids
    n_singletons = n_docs - n_groups * GROUP
    expect_surv = n_groups + n_singletons
    result = {
        "metric": "dedup_keep_canonical_distributed_scale",
        "docs": n_docs,
        "base_words": base_words,
        "dup_membership": n_groups * GROUP,
        "survivors": n_surv,
        "survivors_expected": expect_surv,
        "planted_groups_kept_one_longest": n_canon,
        "singletons_kept": n_single,
        "violations": bad,
        "wall_sec": round(wall, 3),
        "driver_rss_mb_before": rss0,
        "driver_rss_mb_peak": rss1,
        "num_cpus": cpus,
        "ok": bad == 0 and n_surv == expect_surv and n_canon == n_groups,
    }
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
