"""Source-code corpus: deterministic synthetic generator + repo-link
edge derivation (BASELINE.json input_hint / north star).

Input schema (FIXTURES.md §1): ``repo:string, path:string,
commit:string, lang:string, content:string`` Parquet. Two repos are
linked iff they share a LINK KEY — identical content bytes (sha256) or
a shared vendored path — and the edge weight is the number of shared
keys. This replaces the reference's Neo4j store scan
(``core/GraphLoader.java`` + ``HeavyGraphFactory`` relationship import)
as the projection step: corpus → map_batches (sha256, key extraction,
DROP content immediately — never shuffle the wide column) →
groupby(key) co-occurrence → groupby(src,dst) weights → dense vids.

Per-row invariant (north rule): every derived ``files`` row carries
``sha = sha256(content)`` hex, verifiable against the input corpus
row-by-row (``verify_sha_invariant``); checkpoint lineage records the
verified counts.

Skew handling: a key shared by k repos emits O(k²) pairs. Keys above
``max_group_size`` (the "framework file shared by 30% of repos"
heavy-hitter) are STOP KEYS — at trillion-file scale a near-universal
key is a clique materialization bug, not signal. The cap is explicit,
logged in the derivation stats, and OFF (None) by default so the tests
exercise the exact semantics.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..state.partitioning import keyed_repartition, shuffle_width, source_size_bytes

_LANG_BY_EXT = {
    "c": "c",
    "py": "py",
    "java": "java",
    "go": "go",
    "rs": "rs",
    "js": "js",
}
_EXTS = list(_LANG_BY_EXT)


def _sha_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


@dataclass(frozen=True)
class CorpusSpec:
    """Deterministic corpus shape (seed 42, FIXTURES.md §1)."""

    repos: int = 30
    files_per_repo: int = 20
    vendor_pool: int = 50  # shared vendored-path pool size
    vendor_files_per_repo: int = 4  # Zipf-chosen pool subset per repo
    dup_content_pool: int = 20  # shared-content (identical bytes) pool
    dup_files_per_repo: int = 2
    framework_share: float = 0.3  # fraction of repos with THE framework file
    seed: int = 42


def _gen_repo_rows(i: int, spec: CorpusSpec) -> pd.DataFrame:
    """All files of repo i — seeded per repo, independent of partitioning."""
    rng = np.random.default_rng(spec.seed * 1_000_003 + i)
    repo = f"repo{i:06d}"
    rows = []

    def add(path: str, content: str):
        rows.append(
            (
                repo,
                path,
                _sha_hex(f"{repo}/{path}@1")[:40],
                _LANG_BY_EXT.get(path.rsplit(".", 1)[-1], "c"),
                content,
            )
        )

    # unique files
    n_unique = max(
        0, spec.files_per_repo - spec.vendor_files_per_repo - spec.dup_files_per_repo
    )
    for f in range(n_unique):
        ext = _EXTS[int(rng.integers(len(_EXTS)))]
        path = f"src/mod{f:03d}.{ext}"
        add(path, f"// {repo}:{path}\n" + "x" * int(rng.integers(20, 120)))
    # vendored paths: Zipf-ish subset of the shared pool (path-links)
    pool = (rng.zipf(1.2, size=spec.vendor_files_per_repo) - 1) % spec.vendor_pool
    for k in np.unique(pool):
        path = f"vendor/lib{k:03d}/util.c"
        add(path, f"// vendored {k} in {repo}\n")
    # duplicated content across repos (content-hash links)
    dups = rng.integers(0, spec.dup_content_pool, size=spec.dup_files_per_repo)
    for j, k in enumerate(np.unique(dups)):
        path = f"third_party/shared{j}.py"
        add(path, f"# shared blob {k}\n" + "y" * (20 + int(k)))
    # heavy hitter: one framework file in ~framework_share of repos
    if rng.random() < spec.framework_share:
        add("framework/core.js", "// the framework v1\n" + "z" * 64)
    return pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )


def generate_corpus(out_dir: str, spec: CorpusSpec = CorpusSpec()) -> str:
    """Write the corpus Parquet with Ray Data (one task per repo range)."""
    ds = rd.range(spec.repos)

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [_gen_repo_rows(int(i), spec) for i in batch["id"]], ignore_index=True
        )

    ds.map_batches(gen, batch_format="pandas", batch_size=256).write_parquet(out_dir)
    return out_dir


def corpus_table(spec: CorpusSpec = CorpusSpec()) -> pa.Table:
    """Small in-memory corpus for tests."""
    return pa.Table.from_pandas(
        pd.concat([_gen_repo_rows(i, spec) for i in range(spec.repos)], ignore_index=True),
        preserve_index=False,
    )


# ----------------------------------------------------------------------
# derivation: corpus → files(sha) + link keys → repo-repo edges
# ----------------------------------------------------------------------
def _extract_keys(batch: pa.Table) -> pa.Table:
    """sha + link keys per file; drops ``content`` (the wide column never
    leaves this stage)."""
    repo = batch["repo"].to_pylist()
    path = batch["path"].to_pylist()
    content = batch["content"].to_pylist()
    sha = [hashlib.sha256(c.encode("utf-8")).hexdigest() for c in content]
    # path-links only for the shared vendored namespace
    pkey = [
        ("p:" + p) if (p.startswith("vendor/") or p.startswith("framework/")) else None
        for p in path
    ]
    return pa.table(
        {
            "repo": pa.array(repo, pa.string()),
            "path": pa.array(path, pa.string()),
            "sha": pa.array(sha, pa.string()),
            "pathkey": pa.array(pkey, pa.string()),
        }
    )


def _link_rows(batch: pa.Table) -> pa.Table:
    """(key, repo) link rows: one per sha key + one per vendored path."""
    import pyarrow.compute as pc

    repo = batch["repo"]
    skey = pc.binary_join_element_wise(pa.scalar("s:"), batch["sha"], "")
    has_p = pc.is_valid(batch["pathkey"])
    return pa.table(
        {
            "key": pa.concat_arrays(
                [skey.combine_chunks(), batch["pathkey"].filter(has_p).combine_chunks()]
            ),
            "repo": pa.concat_arrays(
                [repo.combine_chunks(), repo.filter(has_p).combine_chunks()]
            ),
        }
    )


@dataclass
class DerivedGraph:
    vertices: pa.Table  # vid:int64, repo:string
    edges: "rd.Dataset"  # src:int64, dst:int64, weight:float64
    files: "rd.Dataset"  # repo, path, sha (invariant table)
    stats: dict


def derive_repo_links(
    corpus: "rd.Dataset",
    *,
    max_group_size: Optional[int] = None,
    min_weight: float = 1.0,
) -> DerivedGraph:
    keyed = corpus.map_batches(
        _extract_keys, batch_format="pyarrow", batch_size=8192
    ).materialize()
    files = keyed.select_columns(["repo", "path", "sha"])
    links = keyed.map_batches(_link_rows, batch_format="pyarrow", batch_size=None)

    # distinct repo set → dense vids (driver-side sort; O(#repos))
    repo_parts = links.map_batches(
        lambda t: pa.table({"repo": pa.array(sorted(set(t["repo"].to_pylist())))}),
        batch_format="pyarrow",
        batch_size=None,
    )
    repo_chunks = [
        b["repo"].to_pylist()
        for b in repo_parts.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    repos = sorted({r for c in repo_chunks for r in c})
    vertices = pa.table(
        {"vid": np.arange(len(repos), dtype=np.int64), "repo": pa.array(repos)}
    )
    # broadcast the SORTED repo array once; per-batch lookup is a numpy
    # searchsorted (vid == sorted rank), not a per-row Python dict probe
    # — same pattern as state.graph._densify_batch
    repo_sorted = np.array(repos, dtype=object)
    vid_ref = ray.put(repo_sorted)

    # ------------------------------------------------------------------
    # co-occurrence pairs: hash-partition links by key so every key
    # group is complete within one block, then VECTORIZED per-block
    # pair expansion + map-side (src,dst) pre-aggregation. Ray's
    # groupby().aggregate() costs ~1 ms per distinct group (measured:
    # 124k pair rows → 152 s), so high-cardinality aggregation uses the
    # partial+fold pattern instead, like state.dense.
    # ------------------------------------------------------------------
    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        rs = ray.get(vid_ref)
        vids = np.searchsorted(rs, df["repo"].to_numpy(object)).astype(np.int64)
        keys, key_codes = np.unique(df["key"].to_numpy(), return_inverse=True)
        # distinct (key, repo) pairs, grouped by key — all vectorized;
        # the loop below touches only the qualifying (2 ≤ k ≤ cap)
        # groups, never the singleton long tail
        kv = np.unique(np.stack([key_codes, vids], axis=1), axis=0)
        kc, vv = kv[:, 0], kv[:, 1]
        bounds = np.searchsorted(kc, np.arange(len(keys) + 1))
        sizes = np.diff(bounds)
        good = sizes >= 2
        if max_group_size is not None:
            good &= sizes <= max_group_size
        out_s, out_d = [], []
        for gi in np.flatnonzero(good):
            grp = vv[bounds[gi] : bounds[gi + 1]]
            i, j = np.triu_indices(len(grp), 1)
            out_s.append(grp[i])
            out_d.append(grp[j])
        if not out_s:
            return pd.DataFrame(
                {"pk": pd.Series([], dtype="uint64"),
                 "weight": pd.Series([], dtype="float64")}
            )
        # pack (src,dst) into one uint64 and count via np.unique —
        # several times faster than a pandas groupby on two int columns;
        # the PACKED key also makes the downstream hash exchange a
        # single-int-column shuffle (measured ~4x cheaper than hashing
        # two columns at 134M rows)
        all_s = np.concatenate(out_s)
        all_d = np.concatenate(out_d)
        if len(all_d) and max(int(all_s.max()), int(all_d.max())) >= (1 << 32):
            raise OverflowError(
                "fold_edges: vertex ids exceed 2^32 — the packed uint64 "
                "edge key would collide; switch to a two-column int64 key"
            )
        packed = (all_s.astype(np.uint64) << np.uint64(32)) | all_d.astype(
            np.uint64
        )
        uniq, counts = np.unique(packed, return_counts=True)
        return pd.DataFrame({"pk": uniq, "weight": counts.astype(np.float64)})

    parted = keyed_repartition(links, shuffle_width(), ["key"])  # needs HASH_SHUFFLE (pkg init)
    partials = parted.map_batches(block_pairs, batch_format="pandas", batch_size=None)

    # final fold: hash-partition partials by (src,dst) so each edge lands
    # in exactly one block, fold per block (distributed — the edge table
    # never gathers on the driver), stay materialized for projection
    def fold_edges(df: pd.DataFrame) -> pd.DataFrame:
        packed = df["pk"].to_numpy(np.uint64)
        uniq, inverse = np.unique(packed, return_inverse=True)
        w = np.bincount(inverse, weights=df["weight"].to_numpy(), minlength=len(uniq))
        if min_weight > 0:
            keep = w >= min_weight
            uniq, w = uniq[keep], w[keep]
        return pd.DataFrame(
            {
                "src": (uniq >> np.uint64(32)).astype(np.int64),
                "dst": (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64),
                "weight": w,
            }
        )

    edges = (
        keyed_repartition(partials, shuffle_width(), ["pk"])
        .map_batches(fold_edges, batch_format="pandas", batch_size=None)
        .materialize()
    )
    return DerivedGraph(
        vertices=vertices,
        edges=edges,
        files=files,
        stats={
            "repos": len(repos),
            "edges": edges.count(),
            "max_group_size": max_group_size,
        },
    )


def verify_sha_invariant(corpus: "rd.Dataset", files: "rd.Dataset") -> dict:
    """Recompute sha256 over the input corpus and compare against the
    derived files table row-by-row (north-rule per-row invariant) —
    DISTRIBUTED: both sides map to (key=(repo,path) hash, sha) rows,
    union + hash-repartition on the key so each file's two rows land in
    one block, per-block match-count fold; the driver only sums scalar
    per-block counters (never materializes either table)."""

    def recompute(batch: pa.Table) -> pa.Table:
        sha = [
            hashlib.sha256(c.encode("utf-8")).hexdigest()
            for c in batch["content"].to_pylist()
        ]
        return pa.table(
            {
                "repo": batch["repo"],
                "path": batch["path"],
                "sha": pa.array(sha),
                "side": pa.array(np.zeros(len(sha), dtype=np.int8)),
            }
        )

    def tag_files(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": batch["repo"],
                "path": batch["path"],
                "sha": batch["sha"],
                "side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            }
        )

    lhs = corpus.map_batches(recompute, batch_format="pyarrow")
    rhs = files.map_batches(tag_files, batch_format="pyarrow")

    def count_matches(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["repo", "path"], sort=False)
        sides = g["side"].nunique()
        shas = g["sha"].nunique()
        n_files = int((df["side"] == 1).sum())
        n_corpus = int((df["side"] == 0).sum())
        ok = int(((sides == 2) & (shas == 1)).sum())
        return pd.DataFrame(
            {"rows": [n_files], "sha_ok": [ok], "corpus_rows": [n_corpus]}
        )

    folded = (
        keyed_repartition(
            lhs.union(rhs),
            shuffle_width(source_size_bytes(files)),
            ["repo", "path"],
        )
        .map_batches(count_matches, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    return {
        "rows": int(folded["rows"].sum()),
        "sha_ok": int(folded["sha_ok"].sum()),
        "corpus_rows": int(folded["corpus_rows"].sum()),
    }
