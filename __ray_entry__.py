"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (derived bipartite graph at
sf0.001 → PageRank to 1e-6 convergence). ``queries()`` exposes one
callable per implemented operator from SURVEY.md §2 (+ the
training-data operators); ``oracle_sql()`` gives the DuckDB-equivalent
SQL for every SQL-expressible one — identical column names, types and
rounding. Ray is initialised by the driver BEFORE this module is
imported; nothing here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd
import pyarrow as pa

_RESULT_CACHE: dict = {}


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _events(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"))


# ----------------------------------------------------------------------
# graph queries
# ----------------------------------------------------------------------
def _graph(sf_dir: str, which: str):
    from neo4j_graph_algorithms_ray.sources import tpch

    return tpch.graph_for(sf_dir, which)


def _q_degree_out(sf_dir: str) -> pa.Table:
    g = _graph(sf_dir, "bipartite")
    deg = g.out_degree().astype(np.int64)
    keep = deg > 0
    return pa.table({"vid": g.vids[keep], "out_deg": deg[keep]})


def _q_degree_in(sf_dir: str) -> pa.Table:
    g = _graph(sf_dir, "bipartite")
    deg = g.in_degree().astype(np.int64)
    keep = deg > 0
    return pa.table({"vid": g.vids[keep], "in_deg": deg[keep]})


def _q_edge_count(sf_dir: str) -> pa.Table:
    g = _graph(sf_dir, "bipartite")
    return pa.table({"num_edges": np.array([g.m], dtype=np.int64)})


def _pagerank5(sf_dir: str):
    key = ("pr5", sf_dir)
    if key not in _RESULT_CACHE:
        from neo4j_graph_algorithms_ray.pipelines.pagerank import (
            PageRankConfig,
            pagerank,
        )

        g = _graph(sf_dir, "bipartite")
        res = pagerank(g, PageRankConfig(fixed_iterations=5))
        _RESULT_CACHE[key] = (g, np.round(res.ranks, 6))
    return _RESULT_CACHE[key]


def _q_pagerank_k5(sf_dir: str) -> pa.Table:
    g, ranks = _pagerank5(sf_dir)
    return pa.table({"vid": g.vids, "rank": ranks})


def _q_top_pagerank_10(sf_dir: str) -> pa.Table:
    g, ranks = _pagerank5(sf_dir)
    order = np.lexsort((g.vids, -ranks))[:10]
    return pa.table({"vid": g.vids[order], "rank": ranks[order]})


def _q_wcc(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.components import wcc

    g = _graph(sf_dir, "bipartite")
    res = wcc(g)
    return pa.table({"vid": g.vids, "component": res.components})


def _q_wcc_stats(sf_dir: str) -> pa.Table:
    """Reference UnionFindProc WriteResult surface: setCount + discrete
    percentiles of component sizes (AbstractCommunityResultBuilder)."""
    from neo4j_graph_algorithms_ray.pipelines.components import wcc
    from neo4j_graph_algorithms_ray.pipelines.stats import size_percentiles

    g = _graph(sf_dir, "bipartite")
    return size_percentiles(wcc(g).components)


def _q_wcc_setcount(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.components import wcc

    g = _graph(sf_dir, "bipartite")
    return pa.table({"set_count": np.array([wcc(g).set_count], dtype=np.int64)})


def _q_lpa_k3(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.labelprop import (
        LabelPropagationConfig,
        label_propagation,
    )

    g = _graph(sf_dir, "bipartite")
    res = label_propagation(
        g, LabelPropagationConfig(fixed_iterations=3, directed=False)
    )
    return pa.table({"vid": g.vids, "label": res.labels})


def _q_lpa_seeded(sf_dir: str) -> pa.Table:
    """LPA with partitionProperty seeds (reference
    ``algo.labelPropagation`` seeded mode): customer vertices seed from
    their nation key + 1000 (disjoint from the vid label space),
    suppliers start unseeded (own vid)."""
    import ray.data as rd

    from neo4j_graph_algorithms_ray.pipelines.labelprop import (
        LabelPropagationConfig,
        label_propagation,
    )

    g = _graph(sf_dir, "bipartite")
    cust = (
        rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_nationkey"],
        )
        .to_pandas()
    )
    seed_map = dict(
        zip((cust["c_custkey"] * 2).astype(int), (cust["c_nationkey"] + 1000).astype(int))
    )
    seeds = np.array([seed_map.get(int(v), -1) for v in g.vids], dtype=np.int64)
    res = label_propagation(
        g, LabelPropagationConfig(fixed_iterations=3, directed=False), seeds=seeds
    )
    return pa.table({"vid": g.vids, "label": res.labels})


def _q_scc(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.components import scc

    g = _graph(sf_dir, "cyclic")
    res = scc(g)
    return pa.table({"vid": g.vids, "scc": res.components})


def _q_bfs_depth(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.paths import bfs_depths

    g = _graph(sf_dir, "cyclic")
    depth = bfs_depths(g, int(g.vids[0]))
    keep = depth >= 0
    return pa.table({"vid": g.vids[keep], "depth": depth[keep]})


def _tri(sf_dir: str):
    key = ("tri", sf_dir)
    if key not in _RESULT_CACHE:
        from neo4j_graph_algorithms_ray.pipelines.triangles import triangle_count

        g = _graph(sf_dir, "co_supplier")
        _RESULT_CACHE[key] = (g, triangle_count(g))
    return _RESULT_CACHE[key]


def _q_triangle_count(sf_dir: str) -> pa.Table:
    _, res = _tri(sf_dir)
    return pa.table({"triangle_count": np.array([res.triangle_count], dtype=np.int64)})


def _q_triangles_per_vertex(sf_dir: str) -> pa.Table:
    g, res = _tri(sf_dir)
    keep = res.triangles > 0
    return pa.table({"vid": g.vids[keep], "triangles": res.triangles[keep]})


def _q_avg_clustering(sf_dir: str) -> pa.Table:
    _, res = _tri(sf_dir)
    return pa.table(
        {"avg_coefficient": np.array([round(res.average_coefficient, 6)])}
    )


# ----------------------------------------------------------------------
# training-data pipeline queries
# ----------------------------------------------------------------------
def _q_dedup_exact(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.dedup import dedup_exact

    return dedup_exact(_docs(sf_dir)).to_pandas()


def _q_chunk_documents(sf_dir: str) -> Any:
    """Fixed-token-window chunking with overlap (context-window prep;
    chunk text re-joined with single spaces — semantics pinned in
    pipelines/text_analysis.chunk_documents, recomputed by the SQL
    oracle's zipped-UNNEST + windowed STRING_AGG)."""
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import chunk_documents

    return chunk_documents(_docs(sf_dir), chunk_tokens=24, overlap=6)


def _q_token_stats(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import token_stats

    return token_stats(_docs(sf_dir))


def _q_lang_counts(sf_dir: str) -> pd.DataFrame:
    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lang", sort=False, as_index=False).size()
        out.columns = ["lang", "n_docs"]
        return out

    parts = _docs(sf_dir).map_batches(part, batch_format="pandas").to_pandas()
    out = parts.groupby("lang", sort=True, as_index=False)["n_docs"].sum()
    return out.astype({"n_docs": "int64"})


def _q_ann_topk(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.similarity import ann_topk

    top = ann_topk(_emb(sf_dir), [0, 1, 2, 3], k=5)
    top["sim"] = top["sim"].round(4)
    return top[["query_id", "vec_id", "rank", "sim"]]


def _q_events_tumbling(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.windows import tumbling_window

    t = tumbling_window(_events(sf_dir), window="1d").to_pandas()
    t["sum_value"] = t["sum_value"].round(6)
    return t


def _q_minhash_groups(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.dedup import minhash_lsh_neardup

    return minhash_lsh_neardup(_docs(sf_dir)).groups


def _q_dedup_against(sf_dir: str) -> Any:
    """Incremental dedup: the doc_id%5==0 slice plays the already-
    ingested prior corpus. The synthetic docs are all textually
    distinct, so deterministic overlap is injected on BOTH sides (the
    pii_scrub pattern): every doc_id%3==0 prior doc and every
    doc_id%7==0 new doc is replaced by the same sentinel text — those
    new docs are exactly what the anti-join must drop."""
    from neo4j_graph_algorithms_ray.pipelines.dedup import dedup_against

    docs = _docs(sf_dir)
    sentinel = "shared sentinel document already ingested last crawl"

    def split(keep_prior: bool, mod: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            m = (df["doc_id"] % 5 == 0) == keep_prior
            out = df[m].reset_index(drop=True)
            out.loc[out["doc_id"] % mod == 0, "text"] = sentinel
            return out

        return f

    prior = docs.map_batches(split(True, 3), batch_format="pandas")
    new = docs.map_batches(split(False, 7), batch_format="pandas")
    return dedup_against(new, prior)


def _q_bloom_dedup(sf_dir: str) -> Any:
    """Bloom-filter incremental dedup over the same injected-overlap
    fixture as ``dedup_against_prior`` (pipelines/dedup.py
    bloom_dedup_against — O(bits/8) broadcast instead of the exact
    sha anti-join's exchange; deterministic splitmix64 bit positions,
    so the SQL oracle replays the filter bit-for-bit and parity holds
    even if a false positive ever fires)."""
    from neo4j_graph_algorithms_ray.pipelines.dedup import bloom_dedup_against

    docs = _docs(sf_dir)
    sentinel = "shared sentinel document already ingested last crawl"

    def split(keep_prior: bool, mod: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            m = (df["doc_id"] % 5 == 0) == keep_prior
            out = df[m].reset_index(drop=True)
            out.loc[out["doc_id"] % mod == 0, "text"] = sentinel
            return out

        return f

    prior = docs.map_batches(split(True, 3), batch_format="pandas")
    new = docs.map_batches(split(False, 7), batch_format="pandas")
    return bloom_dedup_against(new, prior, bits=1 << 20, hashes=4)


def _bloom_sql(bits: int = 1 << 20, hashes: int = 4) -> str:
    """Exact SQL replay of pipelines/dedup.py bloom_dedup_against on
    the dedup_against_prior fixture: position_i = splitmix64(h +
    i·GOLD mod 2^64) mod bits with h = first 16 hex chars of
    sha256(text); a new doc survives iff at least one of its
    ``hashes`` positions is set by NO prior doc."""
    gold = 0x9E3779B97F4A7C15
    ctes = [
        """pri AS MATERIALIZED (
  SELECT DISTINCT ('0x' || substr(sha256(CASE WHEN doc_id % 3 = 0
    THEN 'shared sentinel document already ingested last crawl'
    ELSE text END), 1, 16))::UBIGINT AS h
  FROM documents WHERE doc_id % 5 = 0)""",
        """nw AS MATERIALIZED (
  SELECT doc_id, sha256(CASE WHEN doc_id % 7 = 0
    THEN 'shared sentinel document already ingested last crawl'
    ELSE text END) AS sha
  FROM documents WHERE doc_id % 5 <> 0)""",
        "nwh AS MATERIALIZED (SELECT doc_id,"
        " ('0x' || substr(sha, 1, 16))::UBIGINT AS h FROM nw)",
    ]
    ppos, npos = [], []
    for i in range(hashes):
        c = (i * gold) % (1 << 64)
        ctes.append(
            f"pb{i} AS (SELECT 0 AS wd,"
            f" ((h::HUGEINT + {c}::HUGEINT)"
            f" % 18446744073709551616::HUGEINT)::UBIGINT AS x FROM pri)"
        )
        ctes += _mix_chain_ctes(f"pm{i}_", f"pb{i}", carry="wd")
        ctes.append(
            f"ppos{i} AS (SELECT (x % {bits})::BIGINT AS pos FROM pm{i}_h)"
        )
        ppos.append(f"SELECT pos FROM ppos{i}")
        ctes.append(
            f"nb{i} AS (SELECT doc_id AS wd,"
            f" ((h::HUGEINT + {c}::HUGEINT)"
            f" % 18446744073709551616::HUGEINT)::UBIGINT AS x FROM nwh)"
        )
        ctes += _mix_chain_ctes(f"nm{i}_", f"nb{i}", carry="wd")
        ctes.append(
            f"npos{i} AS (SELECT wd AS doc_id, (x % {bits})::BIGINT AS pos"
            f" FROM nm{i}_h)"
        )
        npos.append(f"SELECT doc_id, pos FROM npos{i}")
    ctes.append(
        "prior_pos AS MATERIALIZED (" + " UNION ".join(ppos) + ")"
    )
    ctes.append("new_pos AS (" + " UNION ALL ".join(npos) + ")")
    ctes.append(
        """kept AS (
  SELECT DISTINCT np.doc_id FROM new_pos np
  WHERE NOT EXISTS (SELECT 1 FROM prior_pos p WHERE p.pos = np.pos))"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT n.doc_id, n.sha FROM nw n JOIN kept k USING (doc_id)"
        + " ORDER BY n.doc_id"
    )


def _q_dedup_keep_canonical(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.dedup import dedup_keep_canonical

    return dedup_keep_canonical(_docs(sf_dir))


def _q_simhash_groups(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.dedup import simhash_neardup

    return simhash_neardup(_docs(sf_dir)).groups


def _q_embedding_neardup(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.similarity import cosine_neardup

    # testdata embeddings are near-orthogonal random vectors (max
    # pairwise cosine ≈0.51 at sf0.01) — 0.35 exercises the operator
    # with a non-empty result; production near-dup uses 0.8+
    p = cosine_neardup(_emb(sf_dir), threshold=0.35)
    p["sim"] = p["sim"].round(4)
    return p


def _q_lsh_topk(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.similarity import lsh_topk

    t = lsh_topk(_emb(sf_dir), [0, 1, 2, 3], k=5)
    t["sim"] = t["sim"].round(4)
    return t


_SQLPROJ_EDGES = (
    "SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem"
)


def _q_sql_projection_degree(sf_dir: str) -> pa.Table:
    """Cypher-projection analog: an arbitrary edge SQL becomes a
    GraphTables (sources/sqlproj.py), then a normal pipeline runs on
    it — here out-degree over a part→supplier projection."""
    from neo4j_graph_algorithms_ray.sources.sqlproj import graph_from_sql

    g = graph_from_sql(sf_dir, _SQLPROJ_EDGES)
    return pa.table(
        {"vid": g.vids, "out_deg": g.out_degree().astype(np.int64)}
    )


def _q_ivf_topk(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.similarity import ivf_topk

    t = ivf_topk(_emb(sf_dir), [0, 1, 2, 3], k=5)
    t["sim"] = t["sim"].round(4)
    return t


def _q_fingerprints(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import fingerprints

    return fingerprints(_docs(sf_dir))


def _q_lang_id(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import language_id

    return language_id(_docs(sf_dir))


def _q_repetition_stats(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import repetition_stats

    return repetition_stats(_docs(sf_dir))


def _q_top_ngrams(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import top_ngrams

    return top_ngrams(_docs(sf_dir), k=20)


def _q_stratified_sample(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.sampling import stratified_sample

    return stratified_sample(_docs(sf_dir), cap=20)


def _q_weighted_sample(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.sampling import weighted_sample

    return weighted_sample(_docs(sf_dir), alpha=0.3, scale=0.5)


def _q_rebalance_weights(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.sampling import rebalance_weights

    return rebalance_weights(_docs(sf_dir), alpha=0.3)


def _q_events_asof(sf_dir: str) -> Any:
    """As-of attribution: each purchase event joined to the latest
    prior-or-equal signup event of the same user (backward inclusive —
    DuckDB ``ASOF JOIN`` semantics). Emits matched rows only, with the
    signup→purchase lag in microseconds."""
    from neo4j_graph_algorithms_ray.pipelines.joins import asof_join

    ev = _events(sf_dir)

    def pick(etype: str, payload):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["event_type"] == etype]
            out = pd.DataFrame(
                {"user_id": df["user_id"].to_numpy(np.int64), "ts": df["ts"].to_numpy()}
            )
            for name, col in payload.items():
                if col == "__ts_us":
                    out[name] = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
                else:
                    out[name] = df[col].to_numpy()
            return out

        return f

    left = ev.map_batches(
        pick("purchase", {"event_id": "event_id", "value": "value"}),
        batch_format="pandas",
    )
    right = ev.map_batches(
        pick("signup", {"signup_value": "value", "r_ts_us": "__ts_us"}),
        batch_format="pandas",
    )
    joined = asof_join(
        left,
        right,
        on="ts",
        by="user_id",
        left_cols=["event_id", "value"],
        right_cols=["signup_value", "r_ts_us"],
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["signup_value"].notna()]
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "value": df["value"].to_numpy(np.float64),
                "signup_value": df["signup_value"].to_numpy(np.float64),
                "lag_us": df["ts"].to_numpy("datetime64[us]").astype(np.int64)
                - df["r_ts_us"].to_numpy(np.int64),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def _q_events_interval(sf_dir: str) -> Any:
    """Range join: each purchase matched to every 7-day window opened
    by a signup of the same user (interval containment, inclusive)."""
    from neo4j_graph_algorithms_ray.pipelines.joins import interval_join

    ev = _events(sf_dir)
    week_us = 7 * 24 * 3600 * 1_000_000

    def purchases(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == "purchase"]
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].to_numpy("datetime64[us]").astype(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
                "value": df["value"].to_numpy(np.float64),
            }
        )

    def signups(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == "signup"]
        t = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "w_start": t,
                "w_end": t + week_us,
                "signup_value": df["value"].to_numpy(np.float64),
            }
        )

    return interval_join(
        ev.map_batches(purchases, batch_format="pandas"),
        ev.map_batches(signups, batch_format="pandas"),
        on="ts_us",
        by="user_id",
        start="w_start",
        end="w_end",
        left_cols=["event_id", "value"],
        right_cols=["signup_value"],
    )


def _q_pack_sequences(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.packing import pack_sequences

    return pack_sequences(_docs(sf_dir), budget=256)


def _q_decontaminate(sf_dir: str) -> Any:
    """GPT-3-style 8-gram decontamination with a deterministic in-corpus
    benchmark split (doc_id % 97): no external eval data exists in the
    sandbox, so the 'benchmark' is the 1/97 slice and the corpus is the
    rest — the overlap machinery is what's under test."""
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import decontaminate

    docs = _docs(sf_dir)

    def split(keep_bench: bool):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            m = (df["doc_id"] % 97 == 0) == keep_bench
            return df[m].reset_index(drop=True)

        return f

    bench = docs.map_batches(split(True), batch_format="pandas")
    corpus = docs.map_batches(split(False), batch_format="pandas")
    return decontaminate(corpus, bench, n=8)


def _q_pii_scrub(sf_dir: str) -> Any:
    """The synthetic corpus contains no PII, so both sides append the
    SAME deterministic PII suffix (email/url/ip/phone derived from
    doc_id) before scrubbing — the masking pass then genuinely fires on
    every row and the oracle compares scrubbed text + per-type counts."""
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import pii_scrub

    def inject(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype("int64")
        s = i.astype(str)
        return pd.DataFrame(
            {
                "doc_id": i.to_numpy(np.int64),
                "text": df["text"]
                + " u"
                + s
                + "@ex.com http://h/"
                + s
                + " 10.0.0."
                + (i % 256).astype(str)
                + " 555-000-"
                + (i % 10000).astype(str).str.zfill(4),
            }
        )

    return pii_scrub(_docs(sf_dir).map_batches(inject, batch_format="pandas"))


def _q_line_dedup(sf_dir: str) -> Any:
    """C4-style global line dedup over the corpus re-wrapped into
    8-word lines (the synthetic docs are single-line; wrapping gives
    the dedup real cross-doc duplicate units from the planted
    duplicate docs)."""
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import (
        line_dedup,
        wrap_lines,
    )

    return line_dedup(wrap_lines(_docs(sf_dir), words_per_line=8))


def _q_tfidf(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir), k=5)


def _q_token_percentiles(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import (
        token_length_percentiles,
    )

    return token_length_percentiles(_docs(sf_dir))


def _q_source_profile(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import source_profile

    return source_profile(_docs(sf_dir))


def _q_unigram_logloss(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import unigram_logloss

    return unigram_logloss(_docs(sf_dir))


def _q_quality(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import quality_scores

    q = quality_scores(_docs(sf_dir)).to_pandas()
    for c in ("mean_token_len", "alpha_ratio", "stopword_ratio", "quality"):
        # half-away-from-zero (DuckDB ROUND semantics) — these ratios can
        # land exactly on x.xxxxxx5 (e.g. 105/128), where numpy's
        # half-even rounding diverges from the oracle
        q[c] = np.floor(q[c].to_numpy() * 1e6 + 0.5) / 1e6
    return q


def _q_closeness(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.paths import closeness_table

    g = _graph(sf_dir, "cyclic")
    # predicate-based source sample (vid < 64) — deterministic AND
    # SQL-expressible (a DuckDB 1.0 quirk drops rows when a recursive
    # anchor reads a LIMIT/window CTE, so "64 smallest" is out)
    sources = np.flatnonzero(g.vids < 64)
    t = closeness_table(g, variant="harmonic", sources=sources).to_pandas()
    t["centrality"] = t["centrality"].round(6)
    return t


def _q_clean_corpus(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import clean_corpus

    return clean_corpus(_docs(sf_dir), quality_threshold=0.5)


def _q_closeness_standard(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.paths import closeness_table

    g = _graph(sf_dir, "cyclic")
    sources = np.flatnonzero(g.vids < 64)
    t = closeness_table(g, variant="standard", sources=sources).to_pandas()
    t["centrality"] = t["centrality"].round(6)
    return t


def _q_closeness_dangalchev(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.paths import closeness_table

    g = _graph(sf_dir, "cyclic")
    sources = np.flatnonzero(g.vids < 64)
    t = closeness_table(g, variant="dangalchev", sources=sources).to_pandas()
    t["centrality"] = t["centrality"].round(6)
    return t


def _q_allpairs_depth(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.paths import msbfs_depth_table

    g = _graph(sf_dir, "cyclic")
    sources = np.flatnonzero(g.vids < 64)
    return msbfs_depth_table(g, sources, directed=False)


def _q_sssp_dijkstra(sf_dir: str) -> pa.Table:
    """Weighted SSSP surface (P1/P3) exposed directly — same graph and
    source as delta_stepping_sssp so both engines are driver-checked
    against the same recursive-CTE oracle."""
    from neo4j_graph_algorithms_ray.pipelines.paths import sssp

    g = _graph(sf_dir, "weighted_bipartite")
    src = int(np.sort(g.vids)[0])
    res = sssp(g, src, directed=False)
    # cap mirrors the oracle's bounded recursive walk (<= 30) so the
    # comparison stays exact at every SF, same as weighted_allpairs
    keep = np.isfinite(res.distances) & (res.distances <= 30.0)
    return pa.table(
        {"vid": g.vids[keep], "distance": np.round(res.distances[keep], 6)}
    )


def _q_weighted_allpairs(sf_dir: str) -> Any:
    """Weighted all-pairs (reference algo.allShortestPaths.stream) from
    a deterministic vid<8 source subset, cost-capped at 30 so the
    recursive-SQL oracle's bounded walk is exact (any prefix of an
    optimal path costs <= the cap; weights are integer counts so
    ROUND(...,6) is lossless on both sides)."""
    from neo4j_graph_algorithms_ray.pipelines.paths import weighted_allpairs_table

    g = _graph(sf_dir, "weighted_bipartite")
    sources = np.flatnonzero(g.vids < 8)
    ds = weighted_allpairs_table(g, sources=sources, directed=False, max_distance=30.0)

    def r6(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("distance"),
            "distance",
            pa.array(np.round(t["distance"].to_numpy(zero_copy_only=False), 6)),
        )

    return ds.map_batches(r6, batch_format="pyarrow")


def _q_triangle_stream(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.triangles import triangle_stream

    g = _graph(sf_dir, "co_supplier")
    return triangle_stream(g)


def _q_betweenness(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.paths import betweenness_table

    g = _graph(sf_dir, "cyclic")
    # source-subset Brandes (RA-Brandes shape) with the same
    # deterministic vid<64 predicate sample as the closeness query —
    # SQL-recomputable, unlike a seeded-RNG sample
    sources = np.flatnonzero(g.vids < 64)
    t = betweenness_table(g, directed=True, sources=sources).to_pandas()
    t["centrality"] = t["centrality"].round(4)
    return t


def _q_pagerank_weighted_k5(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.pagerank import (
        PageRankConfig,
        pagerank,
    )

    g = _graph(sf_dir, "weighted_bipartite")
    res = pagerank(g, PageRankConfig(fixed_iterations=5, weighted=True))
    return pa.table({"vid": g.vids, "rank": np.round(res.ranks, 6)})


def _q_wcc_threshold(sf_dir: str) -> pa.Table:
    """WCC over edges with weight > 2 (reference unionFind threshold)."""
    from neo4j_graph_algorithms_ray.pipelines.components import wcc

    g = _graph(sf_dir, "weighted_bipartite")
    res = wcc(g, threshold=2.0)
    return pa.table({"vid": g.vids, "component": res.components})


def _q_article_rank_k5(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.pagerank import (
        PageRankConfig,
        article_rank,
    )

    g = _graph(sf_dir, "bipartite")
    res = article_rank(g, PageRankConfig(fixed_iterations=5))
    return pa.table({"vid": g.vids, "rank": np.round(res.ranks, 6)})


def _q_eigenvector_top10(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.pagerank import eigenvector_centrality

    # CYCLIC graph: on the directed bipartite graph the A^T power
    # iteration collapses to the zero vector in two rounds (customers
    # have no in-edges), which is degenerate for this operator
    g = _graph(sf_dir, "cyclic")
    # pinned round count so the unrolled-CTE oracle reproduces it exactly
    res = eigenvector_centrality(g, fixed_iterations=10)
    r = np.round(res.ranks, 6)
    order = np.lexsort((g.vids, -r))[:10]
    return pa.table({"vid": g.vids[order], "score": r[order]})


def _q_hits_k10(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.pagerank import hits

    g = _graph(sf_dir, "bipartite")
    # pinned round count so the unrolled-CTE oracle reproduces it exactly
    res = hits(g, fixed_iterations=10)
    return pa.table(
        {
            "vid": g.vids,
            "hub": np.round(res.hubs, 6),
            "auth": np.round(res.auths, 6),
        }
    )


def _q_kcore(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.kcore import kcore

    g = _graph(sf_dir, "bipartite")
    # fixed 8 h-operator rounds: convergence is 2-4 on these graphs
    # and extra rounds are no-ops at the fixpoint, so the unrolled SQL
    # reproduces the exact coreness round-for-round
    res = kcore(g, fixed_rounds=8)
    return pa.table({"vid": g.vids, "coreness": res.coreness})


def _q_modularity(sf_dir: str) -> pa.Table:
    """Newman modularity Q of the Louvain partition on part_blocks —
    the canonical community-quality scalar (the engine computes it
    shard-side per level, pipelines/louvain.py q_of). One row, rounded
    half-away to 6 decimals; the SQL oracle recomputes Q from the
    unrolled-round communities with the identical per-community terms
    (integer-valued s_in/tot, one division each), so only the
    summation order differs — ~1e-14 against a 1e-6 rounding grid."""
    from neo4j_graph_algorithms_ray.pipelines.louvain import louvain

    g = _graph(sf_dir, "part_blocks")
    res = louvain(g)
    q = float(np.floor(res.modularity * 1e6 + 0.5) / 1e6)
    return pa.table({"modularity": np.array([q], dtype=np.float64)})


def _q_ktruss(sf_dir: str) -> pa.Table:
    """5-truss of an AUGMENTED block fixture (pipelines/truss.py):
    part_blocks' d ≤ 3 edges plus (a, a+4) edges in EVEN blocks only.
    Even blocks then support every edge with ≥ 3 triangles and
    survive whole; odd blocks (max support 2) cascade away over two
    peel rounds — a selective result that exercises deletion,
    recomputation AND the fixpoint. The synchronous peel is replayed
    round-for-round by the unrolled SQL; the block motif repeats at
    every SF, so convergence is structure-bounded (≤ 3 rounds,
    pinned in tests/test_extended_algos.py)."""
    import pyarrow.parquet as pq

    from neo4j_graph_algorithms_ray.pipelines.truss import ktruss
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    n = pq.read_metadata(os.path.join(sf_dir, "part.parquet")).num_rows
    keys = (
        pq.read_table(
            os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"]
        )["p_partkey"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    srcs, dsts = [], []
    for d in (1, 2, 3):
        b = keys + d
        m = (b // 8 == keys // 8) & (b < n)
        srcs.append(keys[m])
        dsts.append(b[m])
    b = keys + 4
    m = (b // 8 == keys // 8) & (b < n) & ((keys // 8) % 2 == 0)
    srcs.append(keys[m])
    dsts.append(b[m])
    g = GraphTables.from_arrays(np.concatenate(srcs), np.concatenate(dsts))
    res = ktruss(g, k=5)
    return pa.table({"u": g.vids[res.u], "v": g.vids[res.v]})


def _ktruss_sql(k: int = 5, rounds: int = 5) -> str:
    """Exact SQL replay of pipelines/truss.py ktruss over the
    augmented block fixture of ``_q_ktruss``: per round, per-edge
    support via the canonical u<v triangle self-join, then delete
    every edge below k−2 at once. Rounds past the fixpoint are
    no-ops."""
    ctes = [
        """ke0 AS MATERIALIZED (
  SELECT a.p_partkey AS u, b.p_partkey AS v
  FROM part a JOIN part b
    ON b.p_partkey > a.p_partkey
   AND a.p_partkey // 8 = b.p_partkey // 8
   AND (b.p_partkey - a.p_partkey <= 3
        OR (b.p_partkey - a.p_partkey = 4
            AND (a.p_partkey // 8) % 2 = 0)))""",
    ]
    for r in range(rounds):
        ctes.append(
            f"""kt{r} AS MATERIALIZED (
  SELECT a.u AS x, a.v AS y, b.v AS z
  FROM ke{r} a
  JOIN ke{r} b ON b.u = a.u AND b.v > a.v
  JOIN ke{r} c ON c.u = a.v AND c.v = b.v)"""
        )
        ctes.append(
            f"""ks{r} AS MATERIALIZED (
  SELECT u, v, COUNT(*) AS sup FROM (
    SELECT x AS u, y AS v FROM kt{r}
    UNION ALL SELECT x, z FROM kt{r}
    UNION ALL SELECT y, z FROM kt{r})
  GROUP BY u, v)"""
        )
        ctes.append(
            f"""ke{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM ke{r} e
  JOIN ks{r} s ON s.u = e.u AND s.v = e.v AND s.sup >= {k - 2})"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT u, v FROM ke{rounds} ORDER BY u, v"
    )


def _q_conductance(sf_dir: str) -> pa.Table:
    """Per-community conductance of the Louvain partition on
    part_blocks (pipelines/stats.py conductance — cuts from the
    community-contracted shard exchange, volumes from the degree
    vectors). All inputs are integer-valued doubles with one division,
    so the SQL recomputation is exact on the shared 1e-6 grid."""
    from neo4j_graph_algorithms_ray.pipelines.louvain import louvain
    from neo4j_graph_algorithms_ray.pipelines.stats import conductance

    g = _graph(sf_dir, "part_blocks")
    res = louvain(g)
    return conductance(g, res.communities)


def _q_greedy_coloring(sf_dir: str) -> pa.Table:
    """Jones-Plassmann greedy coloring over the part_blocks fixture
    (disjoint near-clique 8-blocks — degree ≤ 6, so convergence is
    bounded by the block size and greedy colors ≤ 7). Deterministic:
    the priority is the dense rank of (splitmix64(vid), vid), so the
    unrolled SQL oracle replays the synchronous rounds exactly
    (pipelines/coloring.py; bound pinned in
    tests/test_extended_algos.py)."""
    from neo4j_graph_algorithms_ray.pipelines.coloring import greedy_coloring

    g = _graph(sf_dir, "part_blocks")
    res = greedy_coloring(g)
    return pa.table({"vid": g.vids, "color": res.colors})


def _coloring_sql(rounds: int = 10) -> str:
    """Exact SQL recomputation of pipelines/coloring.py
    greedy_coloring over pb_und: priority = dense rank of
    (splitmix64(vid), vid) via the shared mix-chain macro; per round,
    uncolored vertices whose priority exceeds every uncolored
    neighbor's take the min color absent from their colored
    neighborhood. Rounds past the fixpoint are no-ops; 10 ≥ the
    block-size-bounded convergence (≤ 8) at every SF."""
    ctes = [
        _E_PBLK.strip(),
        "px AS MATERIALIZED (SELECT vid AS wd, vid::UBIGINT AS x FROM pb_vertices)",
    ]
    ctes += _mix_chain_ctes("pm", "px", carry="wd")
    ctes.append(
        "prio AS MATERIALIZED (SELECT wd AS vid,"
        " (rank() OVER (ORDER BY x, wd) - 1)::BIGINT AS p FROM pmh)"
    )
    ctes.append(
        "c0 AS MATERIALIZED (SELECT vid, (-1)::BIGINT AS color FROM pb_vertices)"
    )
    for r in range(rounds):
        ctes.append(
            f"""mx{r} AS MATERIALIZED (
  SELECT e.a AS vid, MAX(p.p) AS mp
  FROM pb_und e
  JOIN c{r} cu ON cu.vid = e.b AND cu.color < 0
  JOIN prio p ON p.vid = e.b
  GROUP BY e.a)"""
        )
        ctes.append(
            f"""cand{r} AS MATERIALIZED (
  SELECT c.vid FROM c{r} c
  JOIN prio p ON p.vid = c.vid
  LEFT JOIN mx{r} m ON m.vid = c.vid
  WHERE c.color < 0 AND p.p > COALESCE(m.mp, -1))"""
        )
        ctes.append(
            f"""pick{r} AS MATERIALIZED (
  SELECT cd.vid,
         (SELECT MIN(t.k) FROM range(0, 64) t(k)
          WHERE t.k NOT IN (
            SELECT cc.color FROM pb_und e JOIN c{r} cc ON cc.vid = e.b
            WHERE e.a = cd.vid AND cc.color >= 0))::BIGINT AS color
  FROM cand{r} cd)"""
        )
        ctes.append(
            f"""c{r + 1} AS MATERIALIZED (
  SELECT c.vid, COALESCE(pk.color, c.color) AS color
  FROM c{r} c LEFT JOIN pick{r} pk ON pk.vid = c.vid)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT vid, color FROM c{rounds} ORDER BY vid"
    )


def _q_degree_assortativity(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.stats import degree_assortativity

    g = _graph(sf_dir, "cyclic")  # bipartite out/in degrees are disjoint
    r = degree_assortativity(g)
    return pa.table({"assortativity": np.array([round(r, 6)], dtype=np.float64)})


def _q_reciprocity(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.stats import reciprocity

    g = _graph(sf_dir, "cyclic")  # bipartite has zero reciprocal pairs
    r = reciprocity(g)
    return pa.table({"reciprocity": np.array([round(r, 6)], dtype=np.float64)})


def _q_avg_neighbor_degree(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.stats import avg_neighbor_degree

    return avg_neighbor_degree(_graph(sf_dir, "cyclic"))


def _q_degree_histogram(sf_dir: str) -> pa.Table:
    g = _graph(sf_dir, "bipartite")
    deg = g.out_degree().astype(np.int64)
    deg = deg[deg > 0]
    uniq, cnt = np.unique(deg, return_counts=True)
    return pa.table({"out_deg": uniq, "cnt": cnt.astype(np.int64)})


def _q_louvain(sf_dir: str) -> pa.Table:
    """Louvain over the part_blocks fixture (disjoint near-clique
    8-blocks — the complete co_supplier graph degenerates to ONE
    community with Q=0, useless as a community-detection check; here
    Louvain splits every block into two 4-vertex communities, a
    partition STRICTLY finer than the connected components, so the
    oracle cannot be satisfied by a components shortcut). The SQL
    oracle replays the engine's synchronous gain-move rounds
    (deterministic pins: strict-improvement moves, ties -> min
    community — SURVEY §5.3) as unrolled CTEs; on this fixture the
    level-1 fixpoint IS the final multilevel answer at every tested
    SF (coarse levels find no improvement), asserted in
    tests/test_extended_algos.py."""
    from neo4j_graph_algorithms_ray.pipelines.louvain import louvain

    g = _graph(sf_dir, "part_blocks")
    res = louvain(g)
    return pa.table({"vid": g.vids, "community": res.communities})


_WITNESS_DIR = "/tmp/graft_witness"


def _witness_path(name: str, sf_dir: str) -> str:
    import hashlib as _hashlib

    key = _hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    os.makedirs(_WITNESS_DIR, exist_ok=True)
    return os.path.join(_WITNESS_DIR, f"{name}_{key}.parquet")


def _q_infomap(sf_dir: str) -> pa.Table:
    """InfoMap over the part_blocks fixture. The map equation is not
    SQL-unrollable (PageRank-to-1e-9 seed, log2 gains, prefix-retry
    application), so the oracle is a WITNESS check: the query writes
    (vid, module, p, reported_l) to a deterministic /tmp parquet and
    the SQL recomputes the partition's codelength from the edge views
    + witness p, requiring |L_recomputed − reported| < 1e-6 AND
    L ≤ the all-singletons codelength AND Σp = 1 — if any invariant
    fails the oracle emits 0 rows and the driver flags the mismatch.
    The witness is a pure function of (code, sf_dir), so file
    ordering/staleness cannot fake a pass."""
    import pyarrow.parquet as _pq

    from neo4j_graph_algorithms_ray.pipelines.infomap import infomap

    g = _graph(sf_dir, "part_blocks")
    res = infomap(g)
    p = res.metrics["p"]
    _pq.write_table(
        pa.table(
            {
                "vid": g.vids,
                "module": res.communities,
                "p": p,
                "reported_l": np.full(g.n, res.codelength, dtype=np.float64),
                # the static oracle SQL globs every witness file and
                # selects rows by vertex count (one graph per SF), so
                # it never needs the sf_dir-keyed filename
                "nv": np.full(g.n, g.n, dtype=np.int64),
            }
        ),
        _witness_path("infomap", sf_dir),
    )
    return pa.table({"vid": g.vids, "module": res.communities})


def _q_mst_total_weight(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.mst import boruvka_forest

    g = _graph(sf_dir, "weighted_bipartite")
    res = boruvka_forest(g)
    return pa.table(
        {
            "total_weight": np.array([round(res.total_weight, 6)]),
            "forest_edges": np.array([res.edges.num_rows], dtype=np.int64),
        }
    )


def _lp_pairs(g) -> pd.DataFrame:
    vids = np.sort(g.vids)[:20]
    return pd.DataFrame({"u": vids[0::2][:10], "v": vids[1::2][:10]})


def _q_link_prediction(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.linkprediction import (
        link_prediction_scores,
    )

    g = _graph(sf_dir, "co_supplier")
    out = link_prediction_scores(g, _lp_pairs(g)).to_pandas()
    for c in ("adamic_adar", "resource_allocation", "jaccard", "overlap"):
        out[c] = out[c].round(6)
    return out.sort_values("u").reset_index(drop=True)


def _q_balanced_triads(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.triangles import balanced_triads
    from neo4j_graph_algorithms_ray.sources import tpch

    g = tpch.graph_for(sf_dir, "signed_co_supplier")
    res = balanced_triads(g)
    keep = (res.balanced + res.unbalanced) > 0
    return pa.table(
        {
            "vid": g.vids[keep],
            "balanced": res.balanced[keep],
            "unbalanced": res.unbalanced[keep],
        }
    )


def _q_skipgram_pairs(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.walks import random_walks, skipgram_pairs

    g = _graph(sf_dir, "cyclic")
    starts = np.sort(g.vids)[:8]
    return skipgram_pairs(
        random_walks(g, starts, steps=6, seed=42, directed=True), window=2
    )


def _q_random_walks(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.walks import random_walks

    g = _graph(sf_dir, "cyclic")
    starts = np.sort(g.vids)[:8]
    return (
        random_walks(g, starts, steps=6, seed=42, directed=True)
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )


def _q_yens_paths(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.walks import yens_k_shortest_paths

    g = _graph(sf_dir, "weighted_bipartite")
    vids = np.sort(g.vids)
    t = yens_k_shortest_paths(g, int(vids[0]), int(vids[-1]), k=3, directed=False)
    t["cost"] = t["cost"].round(6)
    return t


def _q_astar_cost(sf_dir: str) -> pa.Table:
    """A* single-pair cost (reference [later-branch]
    ``algo.shortestPath.astar``) between the same endpoint pair as
    yens_k_shortest, h=0 (no coordinate data on the corpus graph) so
    the optimal cost is oracle-checkable by the bounded recursive walk;
    tests exercise a real consistent heuristic (pruning asserted)."""
    from neo4j_graph_algorithms_ray.pipelines.walks import astar_path

    g = _graph(sf_dir, "weighted_bipartite")
    vids = np.sort(g.vids)
    s, t = int(vids[0]), int(vids[-1])
    res = astar_path(g, s, t, heuristic=None, directed=False)
    if res["found"] and res["total_cost"] <= 30.0:
        return pa.table(
            {
                "source": pa.array([s], pa.int64()),
                "target": pa.array([t], pa.int64()),
                "total_cost": pa.array([round(res["total_cost"], 6)], pa.float64()),
            }
        )
    return pa.table(
        {
            "source": pa.array([], pa.int64()),
            "target": pa.array([], pa.int64()),
            "total_cost": pa.array([], pa.float64()),
        }
    )


def _q_personalized_pagerank(sf_dir: str) -> pa.Table:
    """Personalized PageRank (reference [later-branch] sourceNodes
    parameter of algo.pageRank) — teleport restricted to the 4 smallest
    vids, 5 fixed rounds, unrolled-SQL oracle like pagerank_k5."""
    from neo4j_graph_algorithms_ray.pipelines.pagerank import (
        PageRankConfig,
        personalized_pagerank,
    )

    g = _graph(sf_dir, "bipartite")
    sources = np.sort(g.vids)[:4]
    res = personalized_pagerank(g, sources, PageRankConfig(fixed_iterations=5))
    return pa.table({"vid": g.vids, "rank": np.round(res.ranks, 6)})


def _q_doc_sha256(sf_dir: str) -> Any:
    """Per-row content sha256 — the north-rule invariant surfaced as an
    oracle-checked query (DuckDB recomputes sha256 independently)."""
    import hashlib

    def sha(batch: pa.Table) -> pa.Table:
        h = [
            hashlib.sha256(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table({"doc_id": batch["doc_id"], "sha": pa.array(h)})

    return _docs(sf_dir).map_batches(sha, batch_format="pyarrow")


def _q_euclidean_topk(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.similarity import metric_topk

    t = metric_topk(_emb(sf_dir), [0, 1, 2, 3], k=5, metric="euclidean")
    t["score"] = t["score"].round(4)
    return t[["query_id", "vec_id", "rank", "score"]]


def _q_euclidean_pairs(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.similarity import metric_pairs

    return metric_pairs(_emb(sf_dir), cutoff=1.2, metric="euclidean")


def _q_pearson_pairs(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.similarity import metric_pairs

    return metric_pairs(_emb(sf_dir), cutoff=0.3, metric="pearson")


def _q_pearson_topk(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.similarity import metric_topk

    t = metric_topk(_emb(sf_dir), [0, 1, 2, 3], k=5, metric="pearson")
    t["score"] = t["score"].round(4)
    return t[["query_id", "vec_id", "rank", "score"]]


def _q_dot_topk(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.similarity import metric_topk

    t = metric_topk(_emb(sf_dir), [0, 1, 2, 3], k=5, metric="dot")
    t["score"] = t["score"].round(4)
    return t[["query_id", "vec_id", "rank", "score"]]


def _q_delta_stepping(sf_dir: str) -> pa.Table:
    from neo4j_graph_algorithms_ray.pipelines.paths import delta_stepping

    g = _graph(sf_dir, "weighted_bipartite")
    src = int(np.sort(g.vids)[0])
    res = delta_stepping(g, src, delta=2.0, directed=False)
    # cap mirrors the oracle's bounded walk (<= 30); see _q_sssp_dijkstra
    keep = np.isfinite(res.distances) & (res.distances <= 30.0)
    return pa.table(
        {"vid": g.vids[keep], "distance": np.round(res.distances[keep], 6)}
    )


def _q_events_hopping(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.windows import hopping_window

    t = hopping_window(_events(sf_dir), size="1d", hop="6h").to_pandas()
    t["sum_value"] = t["sum_value"].round(6)
    return t


def _q_funnel(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.windows import funnel

    return funnel(_events(sf_dir), steps=["view", "click", "purchase"])


def _q_sessionize(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.windows import sessionize

    s = sessionize(_events(sf_dir), gap="30min").to_pandas()
    return (
        s.groupby("user_id", as_index=False)
        .agg(n_sessions=("n_events", "size"), n_events=("n_events", "sum"))
        .astype({"user_id": "int64", "n_sessions": "int64", "n_events": "int64"})
    )


def _items_ds(sf_dir: str):
    """(e=o_custkey, i=l_suppkey) categorical item sets for the
    set-similarity procedures — small-side broadcast join as in tpch."""
    import ray
    import ray.data as rd

    orders = (
        rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
        ).to_pandas()
    )
    okeys = orders["o_orderkey"].to_numpy(np.int64)
    ocust = orders["o_custkey"].to_numpy(np.int64)
    order = np.argsort(okeys)
    ref = ray.put((okeys[order], ocust[order]))

    def join(batch: pa.Table) -> pa.Table:
        ok, oc = ray.get(ref)
        lo = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ok, lo)
        return pa.table({"e": oc[pos], "i": ls})

    return rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_suppkey"]
    ).map_batches(join, batch_format="pyarrow")


def _set_sim_frame(sf_dir: str, metric: str, cutoff: float) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.setsimilarity import set_similarity_topk

    t = set_similarity_topk(
        _items_ds(sf_dir), metric=metric, topk=3, cutoff=cutoff
    ).to_pandas()
    if "similarity" not in t.columns:  # all rows cut → schema-less empty
        return pd.DataFrame(
            {
                "entity_a": pd.Series([], dtype="int64"),
                "entity_b": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
                "similarity": pd.Series([], dtype="float64"),
            }
        )
    t["similarity"] = t["similarity"].round(6)
    return t


def _q_jaccard_sets(sf_dir: str) -> pd.DataFrame:
    return _set_sim_frame(sf_dir, "jaccard", 0.4)


def _q_overlap_sets(sf_dir: str) -> pd.DataFrame:
    return _set_sim_frame(sf_dir, "overlap", 0.8)


def _q_node2vec_walks(sf_dir: str) -> pd.DataFrame:
    from neo4j_graph_algorithms_ray.pipelines.walks import node2vec_walks

    g = _graph(sf_dir, "cyclic")
    starts = np.sort(g.vids)[:8]
    return (
        node2vec_walks(g, starts, steps=6, p=0.5, q=2.0, seed=42, directed=True)
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )


def entry() -> Any:
    """Flagship: sf0.001 derived bipartite graph → PageRank to 1e-6."""
    import ray.data as rd

    from neo4j_graph_algorithms_ray.pipelines.pagerank import (
        PageRankConfig,
        pagerank_table,
    )

    g = _graph("/root/testdata/sf0.001", "bipartite")
    table = pagerank_table(g, PageRankConfig(tolerance=1e-6, max_iterations=100))
    return rd.from_arrow(table)



def _q_dup_rel(sf_dir: str, strategy: str) -> pa.Table:
    """Duplicate-relationship strategies at import (reference
    DuplicateRelationshipsStrategy NONE|SKIP|SUM|MIN|MAX, SURVEY.md
    §1.2; SKIP pinned deterministic = MIN, COUNT = multiplicity).
    Projects the NON-distinct orders⋈lineitem pair stream with the
    strategy applied by the loader's keyed partial+fold exchange."""
    from neo4j_graph_algorithms_ray.sources import tpch
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    key = ("dup_rel", strategy, sf_dir)
    if key not in _RESULT_CACHE:
        _RESULT_CACHE[key] = GraphTables.from_dataset(
            tpch.multi_pairs_ds(sf_dir),
            src="src",
            dst="dst",
            weight="qty",
            dedup=strategy,
        )
    g = _RESULT_CACHE[key]
    df = g.edges.to_pandas()
    si = df["si"].to_numpy(np.int64)
    di = df["di"].to_numpy(np.int64)
    return pa.table(
        {
            "src": g.vids[si],
            "dst": g.vids[di],
            "w": df["w"].to_numpy(np.float64),
        }
    )



def _sampled_ngram_cand(docs) -> pd.DataFrame:
    """Deterministic candidate-pair sample shared by the n-gram
    queries: every 25th doc with ≥5 chars (shorter docs have ZERO
    5-gram shingles in the SQL recompute but one zero-padded shingle
    in the vectorized kernel — excluding them keeps the pair sets
    identical on both sides), all a<b pairs."""
    ids_df = docs.map_batches(
        lambda df: df.loc[
            (df["doc_id"] % 25 == 0) & (df["text"].str.len() >= 5), ["doc_id"]
        ],
        batch_format="pandas",
        batch_size=None,
    ).to_pandas()
    ids = np.sort(ids_df["doc_id"].to_numpy(np.int64))
    ia, ib = np.triu_indices(len(ids), 1)
    return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})


def _q_ngram_jaccard(sf_dir: str) -> pa.Table:
    """Exact n-gram (k=5 char-shingle) Jaccard over a deterministic
    candidate-pair sample (every 25th doc, all a<b pairs) — the exact
    verification stage of the near-dup family (SURVEY §2.6 / dedup).
    Pair scoring is distributed: pairs are homed by hash repartition,
    shingle sets ship only to their home block."""
    from neo4j_graph_algorithms_ray.pipelines.dedup import ngram_jaccard_pairs

    docs = _docs(sf_dir)
    cand = _sampled_ngram_cand(docs)
    out = ngram_jaccard_pairs(docs, cand, k=5)
    return pa.table(
        {
            "doc_a": out["doc_a"].to_numpy(np.int64),
            "doc_b": out["doc_b"].to_numpy(np.int64),
            "jaccard": np.round(out["jaccard"].to_numpy(np.float64), 6),
        }
    )


def _q_ngram_containment(sf_dir: str) -> pa.Table:
    """Asymmetric n-gram containment |A∩B|/|A| over the same candidate
    sample as ngram_jaccard — the doc-in-doc detection metric (a short
    doc embedded in a long one scores ~1.0 where Jaccard stays low)."""
    from neo4j_graph_algorithms_ray.pipelines.dedup import ngram_jaccard_pairs

    docs = _docs(sf_dir)
    cand = _sampled_ngram_cand(docs)
    out = ngram_jaccard_pairs(docs, cand, k=5, metric="containment")
    return pa.table(
        {
            "doc_a": out["doc_a"].to_numpy(np.int64),
            "doc_b": out["doc_b"].to_numpy(np.int64),
            "containment": np.round(out["containment"].to_numpy(np.float64), 6),
        }
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # graph operators (SURVEY §2.2–2.5)
        "degree_out": _q_degree_out,
        "degree_in": _q_degree_in,
        "edge_count_dedup": _q_edge_count,
        "dup_rel_sum": lambda sf: _q_dup_rel(sf, "sum"),
        "dup_rel_max": lambda sf: _q_dup_rel(sf, "max"),
        "dup_rel_skip": lambda sf: _q_dup_rel(sf, "skip"),
        "dup_rel_count": lambda sf: _q_dup_rel(sf, "count"),
        "ngram_jaccard": _q_ngram_jaccard,
        "ngram_containment": _q_ngram_containment,
        "pagerank_k5": _q_pagerank_k5,
        "top_pagerank_10": _q_top_pagerank_10,
        "wcc": _q_wcc,
        "wcc_setcount": _q_wcc_setcount,
        "wcc_component_stats": _q_wcc_stats,
        "lpa_k3": _q_lpa_k3,
        "lpa_seeded_k3": _q_lpa_seeded,
        "scc": _q_scc,
        "bfs_depth": _q_bfs_depth,
        "triangle_count": _q_triangle_count,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "avg_clustering_coefficient": _q_avg_clustering,
        "closeness_harmonic_sampled": _q_closeness,
        "closeness_sampled": _q_closeness_standard,
        "closeness_dangalchev_sampled": _q_closeness_dangalchev,
        "allpairs_depth_sampled": _q_allpairs_depth,
        "sssp_dijkstra": _q_sssp_dijkstra,
        "weighted_allpairs_sampled": _q_weighted_allpairs,
        "triangle_stream": _q_triangle_stream,
        "betweenness_sampled": _q_betweenness,
        "pagerank_weighted_k5": _q_pagerank_weighted_k5,
        "wcc_threshold": _q_wcc_threshold,
        "article_rank_k5": _q_article_rank_k5,
        "eigenvector_top10": _q_eigenvector_top10,
        "hits_k10": _q_hits_k10,
        "kcore": _q_kcore,
        "greedy_coloring": _q_greedy_coloring,
        "modularity": _q_modularity,
        "conductance_louvain": _q_conductance,
        "ktruss_5": _q_ktruss,
        "degree_histogram": _q_degree_histogram,
        "degree_assortativity": _q_degree_assortativity,
        "reciprocity": _q_reciprocity,
        "avg_neighbor_degree": _q_avg_neighbor_degree,
        "louvain_communities": _q_louvain,
        "infomap_modules": _q_infomap,
        "mst_total_weight": _q_mst_total_weight,
        "link_prediction": _q_link_prediction,
        "balanced_triads": _q_balanced_triads,
        "random_walks": _q_random_walks,
        "skipgram_pairs": _q_skipgram_pairs,
        "yens_k_shortest": _q_yens_paths,
        "astar_cost": _q_astar_cost,
        "personalized_pagerank_k5": _q_personalized_pagerank,
        "delta_stepping_sssp": _q_delta_stepping,
        # training-data operators
        "dedup_exact": _q_dedup_exact,
        "doc_sha256": _q_doc_sha256,
        "euclidean_topk": _q_euclidean_topk,
        "pearson_topk": _q_pearson_topk,
        "dot_topk": _q_dot_topk,
        "euclidean_pairs": _q_euclidean_pairs,
        "pearson_pairs": _q_pearson_pairs,
        "token_stats": _q_token_stats,
        "chunk_documents": _q_chunk_documents,
        "lang_counts": _q_lang_counts,
        "ann_topk": _q_ann_topk,
        "lsh_topk": _q_lsh_topk,
        "ivf_topk": _q_ivf_topk,
        "sql_projection_degree": _q_sql_projection_degree,
        "events_tumbling_daily": _q_events_tumbling,
        "events_hopping_1d_6h": _q_events_hopping,
        "sessionize": _q_sessionize,
        "funnel_view_click_purchase": _q_funnel,
        "minhash_lsh_groups": _q_minhash_groups,
        "dedup_keep_canonical": _q_dedup_keep_canonical,
        "dedup_against_prior": _q_dedup_against,
        "bloom_dedup_prior": _q_bloom_dedup,
        "simhash_groups": _q_simhash_groups,
        "embedding_neardup": _q_embedding_neardup,
        "doc_fingerprints": _q_fingerprints,
        "lang_id_guess": _q_lang_id,
        "quality_scores": _q_quality,
        "clean_corpus": _q_clean_corpus,
        "jaccard_sets_topk": _q_jaccard_sets,
        "overlap_sets_topk": _q_overlap_sets,
        "node2vec_walks": _q_node2vec_walks,
        "repetition_stats": _q_repetition_stats,
        "top_ngrams": _q_top_ngrams,
        "stratified_sample": _q_stratified_sample,
        "decontaminate_8gram": _q_decontaminate,
        "pii_scrub": _q_pii_scrub,
        "line_dedup": _q_line_dedup,
        "hll_distinct_words": _q_hll_distinct_words,
        "hyperanf_npairs": _q_hyperanf,
        "cms_top_words": _q_cms_top_words,
        "effective_diameter": _q_eff_diameter,
        "kmeans_clusters": _q_kmeans_clusters,
        "semantic_dedup": _q_semantic_dedup,
        "tfidf_top5": _q_tfidf,
        "unigram_logloss": _q_unigram_logloss,
        "token_length_percentiles": _q_token_percentiles,
        "source_profile": _q_source_profile,
        "pack_sequences": _q_pack_sequences,
        "events_asof_attribution": _q_events_asof,
        "events_interval_join": _q_events_interval,
        "rebalance_weights": _q_rebalance_weights,
        "weighted_sample": _q_weighted_sample,
    }


# ----------------------------------------------------------------------
# DuckDB oracles — column names/types/rounding match the Ray results
# ----------------------------------------------------------------------
_E_BIP = """
edges AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
vertices AS (SELECT src AS vid FROM edges UNION SELECT dst FROM edges)
"""

_E_WBIP = """
edges AS (
  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
         COUNT(*)::DOUBLE AS weight
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
vertices AS (SELECT src AS vid FROM edges UNION SELECT dst FROM edges)
"""

_E_CYC = """
edges AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  UNION
  SELECT s_suppkey * 2 + 1, c_custkey * 2
  FROM supplier, customer WHERE s_nationkey = c_nationkey
),
vertices AS (SELECT src AS vid FROM edges UNION SELECT dst FROM edges)
"""

_E_PBLK = """
pb_edges AS MATERIALIZED (
  SELECT a.p_partkey AS u, b.p_partkey AS v
  FROM part a JOIN part b
    ON b.p_partkey > a.p_partkey
   AND b.p_partkey - a.p_partkey <= 3
   AND a.p_partkey // 8 = b.p_partkey // 8
),
pb_und AS MATERIALIZED (SELECT u AS a, v AS b FROM pb_edges UNION ALL SELECT v, u FROM pb_edges),
pb_vertices AS MATERIALIZED (SELECT DISTINCT a AS vid FROM pb_und)
"""


def _louvain_cte(rounds: int) -> str:
    """Unrolled synchronous Louvain local-moving rounds over pb_und —
    the exact dataflow of pipelines/louvain.py level 1 (votes -> gains
    with own-community degree exclusion -> best move per vertex, ties
    min community, move iff gain > stay + 1e-12). All quantities are
    integer-valued doubles with ONE division by m2, so numpy and SQL
    produce bit-identical gains and the comparisons cannot drift. Extra
    rounds past the fixpoint are no-ops, so ``rounds`` only needs to be
    >= the observed convergence (4 on part_blocks at every SF)."""
    parts = [
        "deg AS MATERIALIZED (SELECT a AS vid, COUNT(*)::DOUBLE AS k FROM pb_und GROUP BY a)",
        "m2 AS MATERIALIZED (SELECT SUM(k) AS s FROM deg)",
        "c0 AS MATERIALIZED (SELECT vid, vid AS c FROM pb_vertices)",
    ]
    for r in range(rounds):
        prev, nxt = f"c{r}", f"c{r + 1}"
        parts.append(
            f"tot{r} AS MATERIALIZED (SELECT c, SUM(k) AS t FROM {prev} JOIN deg USING (vid) GROUP BY c)"
        )
        parts.append(
            f"""v{r} AS MATERIALIZED (
  SELECT e.a AS i, cc.c AS cand, COUNT(*)::DOUBLE AS w_ic
  FROM pb_und e JOIN {prev} cc ON cc.vid = e.b GROUP BY 1, 2)"""
        )
        parts.append(
            f"""g{r} AS MATERIALIZED (
  SELECT v.i, v.cand,
         v.w_ic - (t.t - CASE WHEN v.cand = my.c THEN d.k ELSE 0.0 END)
                  * d.k / (SELECT s FROM m2) AS gain
  FROM v{r} v
  JOIN deg d ON d.vid = v.i
  JOIN {prev} my ON my.vid = v.i
  JOIN tot{r} t ON t.c = v.cand)"""
        )
        parts.append(
            f"""b{r} AS MATERIALIZED (
  SELECT i, cand, gain FROM (
    SELECT i, cand, gain,
           ROW_NUMBER() OVER (PARTITION BY i ORDER BY gain DESC, cand ASC) AS rn
    FROM g{r}) WHERE rn = 1)"""
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT g.i, g.gain FROM g{r} g "
            f"JOIN {prev} my ON my.vid = g.i AND g.cand = my.c)"
        )
        parts.append(
            f"""{nxt} AS MATERIALIZED (
  SELECT cp.vid,
         CASE WHEN b.gain > COALESCE(s.gain, 0.0) + 1e-12
              THEN b.cand ELSE cp.c END AS c
  FROM {prev} cp
  LEFT JOIN b{r} b ON b.i = cp.vid
  LEFT JOIN s{r} s ON s.i = cp.vid)"""
        )
    parts.append(f"fin AS MATERIALIZED (SELECT vid, c FROM c{rounds})")
    parts.append("lab AS (SELECT c, MIN(vid) AS community FROM fin GROUP BY c)")
    return ",\n".join(parts)


_UND_COSUPP = """
und AS (
  SELECT DISTINCT a.dst AS u, b.dst AS v
  FROM edges a JOIN edges b ON a.src = b.src AND a.dst < b.dst
),
nb AS (SELECT u AS a, v AS b FROM und UNION ALL SELECT v, u FROM und)
"""


def _pagerank_cte(k: int) -> str:
    parts = [
        "deg AS (SELECT src AS vid, COUNT(*) AS od FROM edges GROUP BY src)",
        "r0 AS (SELECT vid, 0.15::DOUBLE AS rank FROM vertices)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""r{i} AS (
  SELECT v.vid, 0.15::DOUBLE + 0.85::DOUBLE * COALESCE(s.c, 0::DOUBLE) AS rank
  FROM vertices v LEFT JOIN (
    SELECT e.dst AS vid, SUM(r.rank / d.od) AS c
    FROM r{i-1} r JOIN deg d ON d.vid = r.vid JOIN edges e ON e.src = r.vid
    GROUP BY e.dst
  ) s ON s.vid = v.vid
)"""
        )
    return ",\n".join(parts)


def _hits_cte(k: int) -> str:
    """Unrolled HITS rounds — the exact dataflow of pagerank.hits:
    auth from previous hubs (forward edges), L2-normalize, hub from the
    CURRENT auths (transposed edges), L2-normalize. Normalization
    divides by the norm of the full dense vector (vertices without
    in/out edges contribute 0), matching the numpy kernel. The edge /
    vertex views are MATERIALIZED once up front — the unrolled rounds
    reference them ~4k times, and un-materialized every reference
    re-opens the parquet scan (DuckDB exhausted file descriptors)."""
    parts = [
        "eh AS MATERIALIZED (SELECT src, dst FROM edges)",
        "vh AS MATERIALIZED (SELECT vid FROM vertices)",
        "nv AS (SELECT COUNT(*)::DOUBLE AS n FROM vh)",
        "h0 AS (SELECT vid, 1.0 / SQRT((SELECT n FROM nv)) AS val FROM vh)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""araw{i} AS MATERIALIZED (
  SELECT e.dst AS vid, SUM(h.val) AS s
  FROM h{i-1} h JOIN eh e ON e.src = h.vid GROUP BY e.dst)"""
        )
        parts.append(
            f"an{i} AS (SELECT SQRT(SUM(s * s)) AS nrm FROM araw{i})"
        )
        parts.append(
            f"""a{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(ar.s, 0.0) / (SELECT nrm FROM an{i}) AS val
  FROM vh v LEFT JOIN araw{i} ar ON ar.vid = v.vid)"""
        )
        parts.append(
            f"""hraw{i} AS MATERIALIZED (
  SELECT e.src AS vid, SUM(a.val) AS s
  FROM a{i} a JOIN eh e ON e.dst = a.vid GROUP BY e.src)"""
        )
        parts.append(
            f"hn{i} AS (SELECT SQRT(SUM(s * s)) AS nrm FROM hraw{i})"
        )
        parts.append(
            f"""h{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(hr.s, 0.0) / (SELECT nrm FROM hn{i}) AS val
  FROM vh v LEFT JOIN hraw{i} hr ON hr.vid = v.vid)"""
        )
    return ",\n".join(parts)


def _kcore_cte(rounds: int) -> str:
    """Unrolled h-operator rounds (Lü et al. 2016) — the exact
    dataflow of pipelines/kcore.py: start from undirected degree, each
    round every vertex takes the h-index of its neighbors' values
    (descending sort, h = max(min(value, rank))). Rounds past the
    fixpoint are no-ops, so ``rounds`` only needs to be >= observed
    convergence (4 on the bipartite graph at every SF)."""
    parts = [
        "und AS MATERIALIZED (SELECT src AS u, dst AS v FROM edges "
        "UNION ALL SELECT dst, src FROM edges)",
        "k0 AS (SELECT u AS vid, COUNT(*)::BIGINT AS val FROM und GROUP BY u)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""k{i} AS (
  SELECT v AS vid, MAX(LEAST(val, rn)) AS val FROM (
    SELECT e.v AS v, p.val AS val,
           ROW_NUMBER() OVER (PARTITION BY e.v ORDER BY p.val DESC) AS rn
    FROM und e JOIN k{i-1} p ON p.vid = e.u
  ) GROUP BY v)"""
        )
    return ",\n".join(parts)


def _ppr_cte(k: int, n_sources: int = 4) -> str:
    """Unrolled personalized-PageRank rounds: identical to
    _pagerank_cte except the 0.15 teleport is gated on membership in
    the n_sources smallest vids (the query's source set)."""
    tele = (
        "(CASE WHEN v.vid IN (SELECT vid FROM srcs) "
        "THEN 0.15::DOUBLE ELSE 0.0::DOUBLE END)"
    )
    parts = [
        "deg AS (SELECT src AS vid, COUNT(*) AS od FROM edges GROUP BY src)",
        f"srcs AS (SELECT vid FROM vertices ORDER BY vid LIMIT {n_sources})",
        f"p0 AS (SELECT vid, CASE WHEN vid IN (SELECT vid FROM srcs) "
        f"THEN 0.15::DOUBLE ELSE 0.0::DOUBLE END AS rank FROM vertices)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""p{i} AS (
  SELECT v.vid, {tele} + 0.85::DOUBLE * COALESCE(s.c, 0::DOUBLE) AS rank
  FROM vertices v LEFT JOIN (
    SELECT e.dst AS vid, SUM(r.rank / d.od) AS c
    FROM p{i-1} r JOIN deg d ON d.vid = r.vid JOIN edges e ON e.src = r.vid
    GROUP BY e.dst
  ) s ON s.vid = v.vid
)"""
        )
    return ",\n".join(parts)


def _wpagerank_cte(k: int) -> str:
    """Weighted PageRank: contrib = rank · w(u,v) / weightedOutDeg(u)."""
    parts = [
        "wdeg AS (SELECT src AS vid, SUM(weight) AS wd FROM edges GROUP BY src)",
        "wr0 AS (SELECT vid, 0.15::DOUBLE AS rank FROM vertices)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""wr{i} AS (
  SELECT v.vid, 0.15::DOUBLE + 0.85::DOUBLE * COALESCE(s.c, 0::DOUBLE) AS rank
  FROM vertices v LEFT JOIN (
    SELECT e.dst AS vid, SUM(r.rank * e.weight / d.wd) AS c
    FROM wr{i-1} r JOIN wdeg d ON d.vid = r.vid JOIN edges e ON e.src = r.vid
    GROUP BY e.dst
  ) s ON s.vid = v.vid
)"""
        )
    return ",\n".join(parts)


def _article_rank_cte(k: int) -> str:
    """ArticleRank recurrence: divisor outDeg + avgOutDeg."""
    parts = ["ar0 AS (SELECT vid, 0.15::DOUBLE AS rank FROM vertices)"]
    for i in range(1, k + 1):
        parts.append(
            f"""ar{i} AS (
  SELECT v.vid, 0.15::DOUBLE + 0.85::DOUBLE * COALESCE(s.c, 0::DOUBLE) AS rank
  FROM vertices v LEFT JOIN (
    SELECT e.dst AS vid, SUM(r.rank / (d.od + (SELECT a FROM avgd))) AS c
    FROM ar{i-1} r JOIN deg d ON d.vid = r.vid JOIN edges e ON e.src = r.vid
    GROUP BY e.dst
  ) s ON s.vid = v.vid
)"""
        )
    return ",\n".join(parts)


def _lpa_cte(k: int, l0: str = "SELECT vid, vid AS label FROM vertices") -> str:
    parts = [
        "und AS (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges)",
        f"l0 AS ({l0})",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""v{i} AS (
  SELECT u.b AS vid, l.label, COUNT(*) AS w
  FROM l{i-1} l JOIN und u ON u.a = l.vid GROUP BY u.b, l.label
),
b{i} AS (
  SELECT vid, label,
         ROW_NUMBER() OVER (PARTITION BY vid ORDER BY w DESC, label ASC) AS rn
  FROM v{i}
),
l{i} AS (
  SELECT v.vid, COALESCE(b.label, l.label) AS label
  FROM vertices v JOIN l{i-1} l ON l.vid = v.vid
  LEFT JOIN (SELECT vid, label FROM b{i} WHERE rn = 1) b ON b.vid = v.vid
)"""
        )
    return ",\n".join(parts)


def _eigen_cte(k: int) -> str:
    """Unrolled L2-normalized power iteration on A^T (eigenvector
    centrality, fixed k rounds from the uniform unit vector)."""
    # every e{i} is referenced EXACTLY once (by e{i+1}) and the L2 norm
    # comes from a whole-frame window aggregate — a separate norm CTE
    # would be a second reference, which either doubles the inlined plan
    # per iteration (2^k blowup) or trips DuckDB 1.0's materialized-CTE
    # execution bug (downstream levels read empty results)
    parts = [
        "e0 AS (SELECT vid, "
        "1.0 / sqrt((SELECT COUNT(*) FROM vertices)) AS r FROM vertices)"
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""e{i} AS (
  SELECT vid, r / sqrt(SUM(r * r) OVER ()) AS r FROM (
    SELECT v.vid, COALESCE(s.c, 0.0::DOUBLE) AS r
    FROM vertices v LEFT JOIN (
      SELECT e.dst AS vid, SUM(p.r) AS c
      FROM e{i-1} p JOIN edges e ON e.src = p.vid GROUP BY e.dst
    ) s ON s.vid = v.vid
  )
)"""
        )
    return ",\n".join(parts)


def _lang_score_sql(lang: str) -> str:
    from neo4j_graph_algorithms_ray.stages.text import _STOPWORDS

    return (
        "("
        + " + ".join(
            f"list_contains(words, '{w}')::INT" for w in sorted(_STOPWORDS[lang])
        )
        + ")"
    )


def _closeness_sql(levels: int = 8, variant: str = "harmonic") -> str:
    """Closeness variants from the vid<64 source sample over the
    undirected cyclic graph — UNROLLED level-synchronous BFS (one
    materialized frontier CTE per depth + anti-join against the seen
    set). A recursive-CTE closure over (s, v, d) re-enumerates every
    non-minimal depth and runs minutes; the unrolled form is seconds.
    ``levels`` must exceed the sampled eccentricity (measured 4 at
    sf0.01; 8 gives margin). ``variant`` mirrors
    pipelines/paths.py closeness_table: harmonic Σ(1/d)/(n-1),
    standard (n-1)/Σd, dangalchev Σ2^-d."""
    parts = [
        f"""und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges
),
vx AS MATERIALIZED (SELECT DISTINCT vid FROM vertices),
f0 AS MATERIALIZED (SELECT vid AS s, vid AS v FROM vx WHERE vid < 64),
seen0 AS MATERIALIZED (SELECT s, v FROM f0)"""
    ]
    for k in range(1, levels + 1):
        parts.append(
            f"""f{k} AS MATERIALIZED (
  SELECT DISTINCT f.s, u.b AS v
  FROM f{k-1} f JOIN und u ON u.a = f.v
  WHERE NOT EXISTS (SELECT 1 FROM seen{k-1} x WHERE x.s = f.s AND x.v = u.b)
),
seen{k} AS MATERIALIZED (
  SELECT s, v FROM seen{k-1} UNION ALL SELECT s, v FROM f{k}
)"""
        )
    md = "\nUNION ALL ".join(
        f"SELECT s, v, {k} AS d FROM f{k}" for k in range(1, levels + 1)
    )
    if variant == "harmonic":
        far = "SUM(1.0 / d)"
        cent = "ROUND(COALESCE(f.f, 0.0) / ((SELECT COUNT(*) FROM vx) - 1), 6)"
    elif variant == "standard":
        far = "SUM(d::DOUBLE)"
        cent = (
            "ROUND(CASE WHEN COALESCE(f.f, 0.0) > 0 THEN "
            "((SELECT COUNT(*) FROM vx) - 1) / f.f ELSE 0.0 END, 6)"
        )
    elif variant == "dangalchev":
        far = "SUM(1.0 / POWER(2.0, d))"
        cent = "ROUND(COALESCE(f.f, 0.0), 6)"
    else:  # pragma: no cover
        raise ValueError(variant)
    return f"""WITH {_E_CYC},
{",".join(parts)},
md AS ({md}),
far AS (SELECT v, {far} AS f FROM md GROUP BY v)
SELECT vt.vid, {cent} AS centrality
FROM vx vt LEFT JOIN far f ON f.v = vt.vid"""


def _clean_corpus_sql(threshold: float = 0.5) -> str:
    """Composite cleaning pipeline oracle: chains the (individually
    proven) lang_id_guess and quality_scores CTEs, filters on
    lang-consistency + rounded quality ≥ threshold, exact-dedups the
    survivors by full text with keeper = min doc_id."""
    return rf"""WITH w AS (
  SELECT doc_id,
    regexp_extract_all(lower(substr(text, 1, 2000)),
                       '[\p{{L}}\p{{N}}_'']+') AS words
  FROM documents
),
s AS (
  SELECT doc_id,
    {_lang_score_sql('en')} AS en, {_lang_score_sql('de')} AS de,
    {_lang_score_sql('fr')} AS fr, {_lang_score_sql('es')} AS es
  FROM w
),
lg AS (
  SELECT doc_id, CASE
    WHEN en >= 2 AND en >= de AND en >= fr AND en >= es THEN 'en'
    WHEN de >= 2 AND de > en AND de >= fr AND de >= es THEN 'de'
    WHEN fr >= 2 AND fr > en AND fr > de AND fr >= es THEN 'fr'
    WHEN es >= 2 AND es > en AND es > de AND es > fr THEN 'es'
    ELSE 'other' END AS lang_guess
  FROM s
),
b AS (
  SELECT doc_id,
    length(regexp_extract_all(text, '\S+')) AS n_tokens,
    length(regexp_replace(text, '\s+', '', 'g')) AS total_len,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
    length(text) AS n_chars,
    len(list_filter(regexp_extract_all(text, '\S+'),
        x -> list_contains({_en_stop_list()}, lower(x)))) AS sw
  FROM documents
),
q AS (
  SELECT doc_id, n_tokens,
    ROUND(0.4 * LEAST(n_tokens / 100.0, 1.0)
          + 0.4 * (CASE WHEN n_chars > 0
                        THEN alpha::DOUBLE / n_chars ELSE 0.0 END)
          + 0.2 * (CASE WHEN n_tokens > 0 AND sw > 0
                        THEN 1 ELSE 0 END), 6) AS quality
  FROM b
),
keep AS (
  SELECT d.doc_id, d.text, lg.lang_guess, q.quality, q.n_tokens
  FROM documents d
  JOIN lg USING (doc_id) JOIN q USING (doc_id)
  WHERE d.lang IN ('en', 'de', 'fr', 'es') AND q.quality >= {threshold}
),
ded AS (
  SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
  FROM keep GROUP BY text
)
SELECT k.doc_id, k.lang_guess, k.quality, k.n_tokens,
       ded.dup_count::BIGINT AS dup_count
FROM ded JOIN keep k USING (doc_id)"""


def _allpairs_depth_sql(levels: int = 8) -> str:
    """Per-(source, vid) minimal BFS depths for the vid<64 sample —
    the md CTE of the unrolled level-BFS, emitted directly."""
    base = _closeness_sql(levels=levels)
    head = base.split("far AS")[0].rstrip().rstrip(",")
    return head + "\nSELECT s AS source, v AS vid, d AS depth FROM md"


_WALK_STEPS = 6


def _walk_hash_expr(step: int) -> str:
    """SQL twin of pipelines/walks.py _hash_u64(42, walk_id, step)."""
    return (
        f"(('0x' || substr(sha256(concat('42:', w.walk_id, ':{step}')), 1, 16))"
        "::UBIGINT)::HUGEINT"
    )


def _random_walks_sql() -> str:
    """Step-unrolled recomputation of pipelines/walks.py random_walks
    (8 smallest vids, 6 steps, seed 42, directed cyclic graph): the
    per-step choice is rank 1 + (hash * deg) >> 64 over the vid-ordered
    adjacency — identical integer arithmetic to the kernel's
    nbrs[lo + ((h * deg) >> 64)] (CSR neighbor order == vid order)."""
    parts = [
        """adj AS MATERIALIZED (
  SELECT src AS a, dst AS b,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn,
         COUNT(*) OVER (PARTITION BY src) AS deg
  FROM edges
),
starts AS MATERIALIZED (
  SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS walk_id
  FROM (SELECT DISTINCT vid FROM vertices ORDER BY vid LIMIT 8)
),
w0 AS (SELECT walk_id, 0 AS step, vid AS cur FROM starts)"""
    ]
    for k in range(1, _WALK_STEPS + 1):
        parts.append(
            f"""w{k} AS (
  SELECT w.walk_id, {k} AS step, a.b AS cur
  FROM w{k-1} w JOIN adj a ON a.a = w.cur
  WHERE a.rn = 1 + ({_walk_hash_expr(k)} * a.deg) // 18446744073709551616
)"""
        )
    un = "\nUNION ALL ".join(f"SELECT * FROM w{k}" for k in range(_WALK_STEPS + 1))
    return (
        f"WITH {_E_CYC}, {','.join(parts)}\n"
        f"SELECT walk_id, step, cur AS vid FROM ({un})"
    )


def _node2vec_sql(w_prev: int = 8, w_adj: int = 4, w_far: int = 2) -> str:
    """Step-unrolled node2vec walk recomputation (p=0.5, q=2 → integer
    transition weights 8/4/2 after the ×2·max(p,q) scaling in
    pipelines/walks.py node2vec_walks): per step, window-cumsum the
    weights in vid order and take the first candidate whose cumulative
    weight exceeds (hash * total) >> 64 — the same exact integer pick
    as _pick_weighted."""
    parts = [
        """adj AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges),
starts AS MATERIALIZED (
  SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS walk_id
  FROM (SELECT DISTINCT vid FROM vertices ORDER BY vid LIMIT 8)
),
w0 AS (SELECT walk_id, 0 AS step, vid AS cur, NULL::BIGINT AS prev FROM starts)"""
    ]
    for k in range(1, _WALK_STEPS + 1):
        parts.append(
            f"""c{k} AS (
  SELECT w.walk_id, w.cur, a.b,
         CASE WHEN a.b = w.prev THEN {w_prev}
              WHEN EXISTS (SELECT 1 FROM adj p WHERE p.a = w.prev AND p.b = a.b) THEN {w_adj}
              ELSE {w_far} END AS wt,
         {_walk_hash_expr(k)} AS h
  FROM w{k-1} w JOIN adj a ON a.a = w.cur
),
s{k} AS (
  SELECT walk_id, cur, b, h,
         SUM(wt) OVER (PARTITION BY walk_id ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         wt, SUM(wt) OVER (PARTITION BY walk_id) AS tot
  FROM c{k}
),
w{k} AS (
  SELECT walk_id, {k} AS step, b AS cur, cur AS prev
  FROM s{k}
  WHERE cum > (h * tot) // 18446744073709551616
    AND cum - wt <= (h * tot) // 18446744073709551616
)"""
        )
    un = "\nUNION ALL ".join(
        f"SELECT walk_id, step, cur FROM w{k}" for k in range(_WALK_STEPS + 1)
    )
    return (
        f"WITH {_E_CYC}, {','.join(parts)}\n"
        f"SELECT walk_id, step, cur AS vid FROM ({un})"
    )


def _yens_sql() -> str:
    """k=3 loopless shortest paths min(vid)→max(vid) on the undirected
    weighted bipartite graph, ranked by the pinned (cost, lexicographic
    path) order of pipelines/walks.py yens_k_shortest_paths. Explicit
    1–4-hop simple-path joins instead of a recursive walk (supplier
    hubs make unbounded enumeration explode); 4 hops suffices at sf0.01
    because edge weights are lineitem counts ≥ 1 and the 3rd-best path
    costs 2.0 < any 5-hop path's ≥ 5 lower bound."""
    return f"""WITH {_E_WBIP},
und AS MATERIALIZED (
  SELECT src AS a, dst AS b, MIN(weight) AS w FROM (
    SELECT src, dst, weight FROM edges
    UNION ALL SELECT dst, src, weight FROM edges
  ) GROUP BY 1, 2
),
st AS MATERIALIZED (SELECT MIN(vid) AS s, MAX(vid) AS t FROM vertices),
p1 AS (
  SELECT [st.s, st.t] AS path, u.w AS cost
  FROM und u, st WHERE u.a = st.s AND u.b = st.t
),
p2 AS (
  SELECT [st.s, u1.b, st.t] AS path, u1.w + u2.w AS cost
  FROM st, und u1, und u2
  WHERE u1.a = st.s AND u2.a = u1.b AND u2.b = st.t
    AND u1.b <> st.s AND u1.b <> st.t
),
p3 AS (
  SELECT [st.s, u1.b, u2.b, st.t] AS path, u1.w + u2.w + u3.w AS cost
  FROM st, und u1, und u2, und u3
  WHERE u1.a = st.s AND u2.a = u1.b AND u3.a = u2.b AND u3.b = st.t
    AND u1.b NOT IN (st.s, st.t) AND u2.b NOT IN (st.s, st.t, u1.b)
),
p4 AS (
  SELECT [st.s, u1.b, u2.b, u3.b, st.t] AS path,
         u1.w + u2.w + u3.w + u4.w AS cost
  FROM st, und u1, und u2, und u3, und u4
  WHERE u1.a = st.s AND u2.a = u1.b AND u3.a = u2.b AND u4.a = u3.b
    AND u4.b = st.t
    AND u1.b NOT IN (st.s, st.t) AND u2.b NOT IN (st.s, st.t, u1.b)
    AND u3.b NOT IN (st.s, st.t, u1.b, u2.b)
),
allp AS (
  SELECT * FROM p1 UNION ALL SELECT * FROM p2
  UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
),
ranked AS (
  SELECT path, cost, ROW_NUMBER() OVER (ORDER BY cost, path) AS r FROM allp
)
SELECT r - 1 AS path_index, g.i - 1 AS step, path[g.i] AS vid, ROUND(cost, 6) AS cost
FROM ranked, unnest(generate_series(1, len(path))) AS g(i)
WHERE r <= 3"""


def _betweenness_sql(levels: int = 8) -> str:
    """Brandes betweenness from the vid<64 source set over the directed
    cyclic graph — unrolled level-synchronous forward pass carrying
    per-(source, vertex) shortest-path counts (sigma sums along the BFS
    DAG), then the unrolled backward dependency accumulation
    delta(v) = sum_w sigma_v/sigma_w * (1 + delta(w)) over DAG
    successors (pipelines/paths.py _brandes_source, whole-level SQL
    instead of whole-level numpy). ``levels`` must exceed the directed
    eccentricity from the sources (measured 4 at sf0.01; 8 = margin)."""
    parts = [
        """vx AS MATERIALIZED (SELECT DISTINCT vid FROM vertices),
f0 AS MATERIALIZED (SELECT vid AS s, vid AS v, 1.0 AS sigma FROM vx WHERE vid < 64),
seen0 AS MATERIALIZED (SELECT s, v FROM f0)"""
    ]
    for k in range(1, levels + 1):
        parts.append(
            f"""f{k} AS MATERIALIZED (
  SELECT f.s, e.dst AS v, SUM(f.sigma) AS sigma
  FROM f{k-1} f JOIN edges e ON e.src = f.v
  WHERE NOT EXISTS (SELECT 1 FROM seen{k-1} x WHERE x.s = f.s AND x.v = e.dst)
  GROUP BY f.s, e.dst
),
seen{k} AS MATERIALIZED (
  SELECT s, v FROM seen{k-1} UNION ALL SELECT s, v FROM f{k}
)"""
        )
    parts.append(
        f"dd{levels} AS MATERIALIZED (SELECT s, v, sigma, 0.0 AS delta FROM f{levels})"
    )
    for k in range(levels - 1, 0, -1):
        parts.append(
            f"""n{k+1} AS MATERIALIZED (
  SELECT w.s, e.src AS pu, w.sigma, w.delta
  FROM dd{k+1} w JOIN edges e ON e.dst = w.v
),
dd{k} AS MATERIALIZED (
  SELECT f.s, f.v, f.sigma,
         COALESCE(SUM(f.sigma / n.sigma * (1.0 + n.delta)), 0.0) AS delta
  FROM f{k} f LEFT JOIN n{k+1} n ON n.s = f.s AND n.pu = f.v
  GROUP BY f.s, f.v, f.sigma
)"""
        )
    alldd = "\nUNION ALL ".join(
        f"SELECT s, v, delta FROM dd{k}" for k in range(1, levels + 1)
    )
    return f"""WITH {_E_CYC},
{",".join(parts)},
alld AS ({alldd}),
bc AS (SELECT v, SUM(delta) AS c FROM alld GROUP BY v)
SELECT vt.vid, ROUND(COALESCE(b.c, 0.0), 4) AS centrality
FROM vx vt LEFT JOIN bc b ON b.v = vt.vid"""


def _mst_sql(levels: int = 8) -> str:
    """MST total weight via per-level contraction (SQL-expressible
    because ALL minimum spanning forests share the same weight multiset:
    #MST-edges with weight ≤ w_k equals n − C(w_k), where C(w) counts
    components of the weight-≤-w subgraph — so total weight needs only
    the component count per distinct weight level, each computed by a
    min-label closure over the graph CONTRACTED by the previous level
    (level 1 pays the only full-graph closure). ``levels`` must cover
    the number of distinct weights (6 at sf0.01; 8 gives margin —
    extra levels see an empty edge filter and contribute 0)."""
    parts = [
        """edges AS MATERIALIZED (
  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
         COUNT(*)::DOUBLE AS weight
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1, 2)""",
        """lv AS MATERIALIZED (
  SELECT weight, ROW_NUMBER() OVER (ORDER BY weight) AS k
  FROM (SELECT DISTINCT weight FROM edges))""",
        # explicit outer DISTINCT: DuckDB 1.0 drops a UNION's implicit
        # dedup when the CTE lives in a WITH RECURSIVE clause
        """vx AS MATERIALIZED (
  SELECT DISTINCT vid FROM (
    SELECT src AS vid FROM edges UNION ALL SELECT dst FROM edges))""",
        """e1 AS (
  SELECT src, dst FROM edges
  WHERE weight <= (SELECT weight FROM lv WHERE k = 1))""",
        "u1 AS (SELECT src AS a, dst AS b FROM e1 UNION SELECT dst, src FROM e1)",
        """l1 AS (
  SELECT vid, vid AS label FROM vx
  UNION
  SELECT u.b, l.label FROM l1 l JOIN u1 u ON u.a = l.vid)""",
        "c1 AS MATERIALIZED (SELECT vid, MIN(label) AS c FROM l1 GROUP BY vid)",
    ]
    for k in range(2, levels + 1):
        parts.append(f"""e{k} AS (
  SELECT DISTINCT ca.c AS src, cb.c AS dst
  FROM edges e JOIN c{k-1} ca ON ca.vid = e.src JOIN c{k-1} cb ON cb.vid = e.dst
  WHERE e.weight <= (SELECT weight FROM lv WHERE k = {k}) AND ca.c <> cb.c)""")
        parts.append(
            f"u{k} AS (SELECT src AS a, dst AS b FROM e{k} UNION SELECT dst, src FROM e{k})"
        )
        parts.append(f"""l{k} AS (
  SELECT c AS vid, c AS label FROM (SELECT DISTINCT c FROM c{k-1})
  UNION
  SELECT u.b, l.label FROM l{k} l JOIN u{k} u ON u.a = l.vid)""")
        parts.append(f"""c{k} AS MATERIALIZED (
  SELECT p.vid, MIN(l.label) AS c
  FROM c{k-1} p JOIN l{k} l ON l.vid = p.c GROUP BY p.vid)""")
    counts = ",\n".join(
        f"n{k} AS MATERIALIZED (SELECT COUNT(DISTINCT c) AS nc FROM c{k})"
        for k in range(1, levels + 1)
    )
    terms = []
    for k in range(1, levels + 1):
        prev = "(SELECT COUNT(*) FROM vx)" if k == 1 else f"(SELECT nc FROM n{k-1})"
        terms.append(
            f"COALESCE((SELECT weight FROM lv WHERE k = {k}), 0)"
            f" * ({prev} - (SELECT nc FROM n{k}))"
        )
    total = " + ".join(terms)
    return (
        "WITH RECURSIVE\n" + ",\n".join(parts) + ",\n" + counts +
        f"""\nSELECT ROUND({total}, 6) AS total_weight,
((SELECT COUNT(*) FROM vx) - (SELECT nc FROM n{levels}))::BIGINT AS forest_edges"""
    )


def _set_sim_sql(metric_expr: str, cutoff: float) -> str:
    return f"""WITH items AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS e, l_suppkey AS i
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
sz AS (SELECT e, COUNT(*) AS s FROM items GROUP BY e),
inter AS (
  SELECT a.e AS ea, b.e AS eb, COUNT(*)::DOUBLE AS c
  FROM items a JOIN items b ON a.i = b.i AND a.e < b.e
  GROUP BY 1, 2
),
sim AS (
  SELECT ea, eb, {metric_expr} AS similarity
  FROM inter JOIN sz sa ON sa.e = ea JOIN sz sb ON sb.e = eb
),
bothdir AS (SELECT ea AS a, eb AS b, similarity FROM sim
            UNION ALL SELECT eb, ea, similarity FROM sim),
ranked AS (
  SELECT a, b, similarity,
         ROW_NUMBER() OVER (PARTITION BY a
                            ORDER BY similarity DESC, b) AS rank
  FROM bothdir WHERE similarity >= {cutoff}
)
SELECT a AS entity_a, b AS entity_b, rank, ROUND(similarity, 6) AS similarity
FROM ranked WHERE rank <= 3"""


def _en_stop_list() -> str:
    from neo4j_graph_algorithms_ray.stages.text import _STOPWORDS

    return "[" + ",".join(f"'{w}'" for w in sorted(_STOPWORDS["en"])) + "]"


def _lsh_topk_sql() -> str:
    """SQL recomputation of pipelines/similarity.py lsh_topk (12 planes,
    2 probes, k=5, queries 0-3): the seeded hyperplane matrix is
    embedded as DOUBLE[] literals; sign(dot(e, H_j)) is normalization-
    invariant so buckets come straight off the raw embeddings, probing
    is bit_count(xor) <= probes, and candidates rank by exact cosine
    with the same (sim DESC, vec_id) tie-break."""
    rng = np.random.default_rng(42)
    H = rng.standard_normal((64, 12))
    bucket_expr = " + ".join(
        "(CASE WHEN list_dot_product(embedding::DOUBLE[], ["
        + ",".join(repr(float(x)) for x in H[:, j])
        + f"]::DOUBLE[]) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(12)
    )
    return f"""WITH b AS (
  SELECT vec_id, embedding, ({bucket_expr})::UBIGINT AS bucket FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS qe, bucket AS qb FROM b WHERE vec_id IN (0,1,2,3)
), cand AS (
  SELECT q.query_id, v.vec_id,
         list_cosine_similarity(v.embedding::DOUBLE[], q.qe::DOUBLE[]) AS sim
  FROM q JOIN b v ON v.vec_id <> q.query_id
  WHERE bit_count(xor(v.bucket, q.qb)) <= 2
), ranked AS (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM cand
)
SELECT query_id, vec_id, rank, ROUND(sim, 4) AS sim FROM ranked WHERE rank <= 5"""


def _lloyd_parts(K: int, T: int, DIM: int) -> list[str]:
    """The shared Lloyd-sweep CTE chain (``e``, ``c0``..``c{T}``,
    ``afin`` = final per-vector cell assignment) used by both the
    ivf_topk and kmeans_clusters oracles."""
    parts = _lloyd_sweep_ctes(K, T, DIM)
    parts.append(
        f"""afin AS MATERIALIZED (
  SELECT vec_id, v, cl FROM (
    SELECT e.vec_id, e.v, c.cl,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.v, c.c), c.cl) AS rn
    FROM e, c{T} c
  ) WHERE rn = 1
)"""
    )
    return parts


def _kmeans_sql(K: int = 16, T: int = 4, DIM: int = 64) -> str:
    """Unrolled recomputation of pipelines/similarity.py
    kmeans_clusters: the same Lloyd sweeps, final assignment only."""
    return (
        f"WITH {','.join(_lloyd_parts(K, T, DIM))}\n"
        "SELECT vec_id, cl AS cluster FROM afin"
    )


def _ivf_topk_sql(K: int = 16, T: int = 4, NP: int = 2, DIM: int = 64) -> str:
    """Unrolled recomputation of pipelines/similarity.py ivf_topk: the
    same ``T`` Lloyd sweeps (init = embeddings of the K smallest
    vec_ids, euclidean argmin with min-centroid tie-break, per-cell
    means rounded to the 1e-6 grid that keeps numpy and SQL summation
    orders bit-aligned), then exact cosine ranking within each query's
    NP probed cells."""
    parts = _lloyd_parts(K, T, DIM)
    return f"""WITH {','.join(parts)},
probed AS (
  SELECT query_id, cl FROM (
    SELECT q.vec_id AS query_id, c.cl,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id
                         ORDER BY list_distance(q.v, c.c), c.cl) AS rn
    FROM e q, c{T} c WHERE q.vec_id IN (0, 1, 2, 3)
  ) WHERE rn <= {NP}
),
cand AS (
  SELECT p.query_id, a.vec_id, list_cosine_similarity(a.v, q.v) AS sim
  FROM probed p
  JOIN afin a ON a.cl = p.cl
  JOIN e q ON q.vec_id = p.query_id
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM cand
)
SELECT query_id, vec_id, rank, ROUND(sim, 4) AS sim FROM ranked WHERE rank <= 5"""


def _lloyd_sweep_ctes(K: int, T: int, DIM: int) -> list[str]:
    parts = [
        f"""e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c0 AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cl,
         list_transform(v, x -> ROUND(x, 6)) AS c
  FROM e ORDER BY vec_id LIMIT {K}
)"""
    ]
    for it in range(1, T + 1):
        parts.append(
            f"""a{it} AS MATERIALIZED (
  SELECT vec_id, v, cl FROM (
    SELECT e.vec_id, e.v, c.cl,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                         ORDER BY list_distance(e.v, c.c), c.cl) AS rn
    FROM e, c{it-1} c
  ) WHERE rn = 1
),
m{it} AS MATERIALIZED (
  SELECT a.cl, g.i AS pos, ROUND(AVG(a.v[g.i]), 6) AS val
  FROM a{it} a, unnest(generate_series(1, {DIM})) g(i)
  GROUP BY a.cl, g.i
),
c{it} AS MATERIALIZED (
  SELECT cl, list(val ORDER BY pos) AS c FROM m{it} GROUP BY cl
  UNION ALL
  SELECT p.cl, p.c FROM c{it-1} p
  WHERE p.cl NOT IN (SELECT DISTINCT cl FROM a{it})
)"""
        )
    return parts


def _q_kmeans_clusters(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.similarity import kmeans_clusters

    return kmeans_clusters(_emb(sf_dir), n_centroids=16, train_iters=4)


def _q_semantic_dedup(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.similarity import semantic_dedup

    # 0.35: the synthetic embeddings are near-orthogonal (max pairwise
    # cosine ≈0.51 at sf0.01), same rationale as embedding_neardup
    return semantic_dedup(_emb(sf_dir), threshold=0.35)


def _q_hll_distinct_words(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.sketches import hll_distinct_words

    return hll_distinct_words(_docs(sf_dir))


def _q_eff_diameter(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.anf import effective_diameter

    return effective_diameter(
        _graph(sf_dir, "bipartite"), rounds=6, alpha=0.9, directed=False
    )


def _q_cms_top_words(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.sketches import cms_top_words

    return cms_top_words(_docs(sf_dir), k=20)


def _mix_chain_ctes(prefix: str, src: str, carry: str = "wd") -> list[str]:
    """CTE list applying the splitmix64 finalizer to column ``x`` of
    ``src``, carrying ``carry`` through; final table is ``{prefix}h``.
    Multiplications are split into 32-bit halves (INT128 ceiling)."""

    def mulmod(c: int) -> str:
        return (
            f"((((x >> 32)::HUGEINT * {c}::HUGEINT % 4294967296::HUGEINT)"
            f" * 4294967296::HUGEINT + (x & 4294967295)::HUGEINT * {c}::HUGEINT)"
            f" % 18446744073709551616::HUGEINT)::UBIGINT"
        )

    return [
        f"{prefix}a AS (SELECT {carry}, xor(x, x >> 30) AS x FROM {src})",
        f"{prefix}b AS (SELECT {carry}, {mulmod(13787848793156543929)} AS x FROM {prefix}a)",
        f"{prefix}c AS (SELECT {carry}, xor(x, x >> 27) AS x FROM {prefix}b)",
        f"{prefix}d AS (SELECT {carry}, {mulmod(10723151780598845931)} AS x FROM {prefix}c)",
        f"{prefix}h AS (SELECT {carry}, xor(x, x >> 31) AS x FROM {prefix}d)",
    ]


def _cms_sql(k: int = 20) -> str:
    """Exact SQL recomputation of pipelines/sketches.py cms_top_words:
    word hashes (polynomial + splitmix64, as in ``_hll_sql``), per-row
    counter columns mix64(hash xor seed) % 2048, counters as exact
    integer sums, estimate = MIN over the 4 rows — no floats at all."""
    from neo4j_graph_algorithms_ray.pipelines.sketches import _CMS_SEEDS, _CMS_W, _POWS

    pw_rows = ",".join(f"({j + 1},{int(_POWS[j])})" for j in range(len(_POWS)))
    ctes = [
        """w AS (SELECT string_split(text, ' ') AS l FROM documents)""",
        """pos AS (SELECT l[i] AS wd
  FROM (SELECT l, unnest(generate_series(1, len(l))) AS i FROM w)
  WHERE length(l[i]) > 0)""",
        "tf AS (SELECT wd, COUNT(*)::BIGINT AS cnt FROM pos GROUP BY wd)",
        "chars AS (SELECT wd, unnest(generate_series(1, LEAST(length(wd), 32))) AS j FROM tf)",
        f"pw(j, c) AS (VALUES {pw_rows})",
        """p0 AS (SELECT wd,
  ((SUM(ascii(substr(wd, j, 1))::HUGEINT * c::HUGEINT))
   % 18446744073709551616::HUGEINT)::UBIGINT AS x
  FROM chars JOIN pw USING (j) GROUP BY wd)""",
    ]
    ctes += _mix_chain_ctes("wh", "p0")  # whh = final word hash
    col_tables = []
    for r, seed in enumerate(_CMS_SEEDS):
        ctes.append(
            f"s{r}0 AS (SELECT wd, xor(x, {seed}::UBIGINT) AS x FROM whh)"
        )
        ctes += _mix_chain_ctes(f"s{r}", f"s{r}0")
        ctes.append(
            f"col{r} AS (SELECT wd, (x % {_CMS_W})::BIGINT AS col FROM s{r}h)"
        )
        ctes.append(
            f"ctr{r} AS (SELECT c.col, SUM(t.cnt)::BIGINT AS v"
            f" FROM col{r} c JOIN tf t USING (wd) GROUP BY c.col)"
        )
        col_tables.append(r)
    mins = ", ".join(f"v{r}.v" for r in col_tables)
    joins = " ".join(
        f"JOIN col{r} c{r} ON c{r}.wd = t.wd"
        f" JOIN ctr{r} v{r} ON v{r}.col = c{r}.col"
        for r in col_tables
    )
    ctes.append(
        f"est AS (SELECT t.wd AS word, LEAST({mins})::BIGINT AS est_count"
        f" FROM tf t {joins})"
    )
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\nSELECT word, est_count FROM est"
        f" ORDER BY est_count DESC, word LIMIT {k}"
    )


def _hll_sql() -> str:
    """Exact SQL recomputation of pipelines/sketches.py
    hll_distinct_words: same polynomial word hash (coefficient table
    embedded; ascii() == utf-8 byte on this ASCII corpus, HUGEINT mod
    2^64 == uint64 wraparound), same bucket/rank bit arithmetic
    (length(bin(x)) == integer bit_length, no float log2), and the
    register sum kept as exact HUGEINT so the single double divide and
    the LN small-range branch are the only float ops — both identical
    to the numpy side."""
    from neo4j_graph_algorithms_ray.pipelines.sketches import _HLL_C, _POWS

    pw_rows = ",".join(f"({j + 1},{int(_POWS[j])})" for j in range(len(_POWS)))
    c_lit = repr(_HLL_C)
    return f"""WITH w AS (
  SELECT string_split(text, ' ') AS l FROM documents
), word AS (
  SELECT DISTINCT l[i] AS wd
  FROM (SELECT l, unnest(generate_series(1, len(l))) AS i FROM w)
  WHERE length(l[i]) > 0
), chars AS (
  SELECT wd, unnest(generate_series(1, LEAST(length(wd), 32))) AS j FROM word
), pw(j, c) AS (VALUES {pw_rows}
), h0 AS (
  SELECT wd,
    ((SUM(ascii(substr(wd, j, 1))::HUGEINT * c::HUGEINT))
     % 18446744073709551616::HUGEINT)::UBIGINT AS x
  FROM chars JOIN pw USING (j) GROUP BY wd
), x1 AS (
  SELECT xor(x, x >> 30) AS x FROM h0
), m1 AS (
  -- (x*C) mod 2^64 split into 32-bit halves: a 64x64 product would
  -- overflow signed INT128
  SELECT ((((x >> 32)::HUGEINT * 13787848793156543929::HUGEINT
            % 4294967296::HUGEINT) * 4294967296::HUGEINT
           + (x & 4294967295)::HUGEINT * 13787848793156543929::HUGEINT)
          % 18446744073709551616::HUGEINT)::UBIGINT AS x FROM x1
), x2 AS (
  SELECT xor(x, x >> 27) AS x FROM m1
), m2 AS (
  SELECT ((((x >> 32)::HUGEINT * 10723151780598845931::HUGEINT
            % 4294967296::HUGEINT) * 4294967296::HUGEINT
           + (x & 4294967295)::HUGEINT * 10723151780598845931::HUGEINT)
          % 18446744073709551616::HUGEINT)::UBIGINT AS x FROM x2
), h AS (
  SELECT xor(x, x >> 31) AS x FROM m2
), r AS (
  SELECT (x >> 54)::BIGINT AS bucket,
    CASE WHEN (x & ((1::UBIGINT << 54) - 1)) = 0 THEN 55
         ELSE 55 - length(bin(x & ((1::UBIGINT << 54) - 1))) END AS rank
  FROM h
), reg AS (
  SELECT bucket, MAX(rank)::BIGINT AS r FROM r GROUP BY bucket
), agg AS (
  SELECT SUM(1::HUGEINT << (55 - r))
         + (1024 - COUNT(*))::HUGEINT * (1::HUGEINT << 55) AS ssum,
         COUNT(*)::BIGINT AS used
  FROM reg
), est AS (
  SELECT used,
    CASE WHEN ({c_lit} / ssum::DOUBLE) <= 2560.0 AND used < 1024
         THEN 1024 * LN(1024.0 / (1024 - used))
         ELSE {c_lit} / ssum::DOUBLE END AS e
  FROM agg
)
SELECT 'hll_estimate' AS stat, ROUND(e, 3) AS value FROM est
UNION ALL SELECT 'hll_buckets_used', used::DOUBLE FROM est"""


def _q_hyperanf(sf_dir: str) -> Any:
    from neo4j_graph_algorithms_ray.pipelines.anf import hyperanf

    return hyperanf(_graph(sf_dir, "bipartite"), rounds=4, directed=False)


def _anf_sql(rounds: int = 4) -> str:
    """Exact SQL recomputation of pipelines/anf.py hyperanf for a fixed
    round count: splitmix64 vertex seed (32-bit-split mulmod), sparse
    (vid, reg, val) registers max-merged through ``rounds`` unrolled
    synchronous CTE rounds, and the identical HLL estimator (the
    per-vertex register sum is a sum of exact powers of two well inside
    double precision, so the small-range branch is deterministic)."""
    from neo4j_graph_algorithms_ray.pipelines.anf import _ANF_C

    def mulmod(c: int) -> str:
        return (
            f"((((x >> 32)::HUGEINT * {c}::HUGEINT % 4294967296::HUGEINT)"
            f" * 4294967296::HUGEINT + (x & 4294967295)::HUGEINT * {c}::HUGEINT)"
            f" % 18446744073709551616::HUGEINT)::UBIGINT"
        )

    c_lit = repr(_ANF_C)
    parts = [
        "und AS (SELECT src AS a, dst AS b FROM edges"
        " UNION SELECT dst, src FROM edges)",
        "v0 AS (SELECT vid, (vid + 1)::UBIGINT AS x FROM vertices)",
        "v1 AS (SELECT vid, xor(x, x >> 30) AS x FROM v0)",
        f"v2 AS (SELECT vid, {mulmod(13787848793156543929)} AS x FROM v1)",
        "v3 AS (SELECT vid, xor(x, x >> 27) AS x FROM v2)",
        f"v4 AS (SELECT vid, {mulmod(10723151780598845931)} AS x FROM v3)",
        "v5 AS (SELECT vid, xor(x, x >> 31) AS x FROM v4)",
        """r0 AS (SELECT vid, (x >> 58)::BIGINT AS reg,
  CASE WHEN (x & ((1::UBIGINT << 58) - 1)) = 0 THEN 59
       ELSE 59 - length(bin(x & ((1::UBIGINT << 58) - 1))) END AS val
  FROM v5)""",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""r{k} AS (SELECT vid, reg, MAX(val) AS val FROM (
  SELECT u.b AS vid, p.reg, p.val FROM r{k - 1} p JOIN und u ON u.a = p.vid
  UNION ALL SELECT vid, reg, val FROM r{k - 1}
) GROUP BY vid, reg)"""
        )
    selects = []
    for k in range(rounds + 1):
        selects.append(
            f"""SELECT {k}::BIGINT AS t, ROUND(SUM(est), 3) AS n_pairs FROM (
  SELECT CASE WHEN ({c_lit} / ssum) <= 160.0 AND zeros > 0
              THEN 64 * LN(64.0 / zeros) ELSE {c_lit} / ssum END AS est
  FROM (SELECT vid, SUM(POWER(2.0, -val)) + (64 - COUNT(*)) AS ssum,
               (64 - COUNT(*))::BIGINT AS zeros
        FROM r{k} GROUP BY vid))"""
        )
    body = ",\n".join(parts)
    return f"WITH {_E_BIP},\n{body}\n" + "\nUNION ALL ".join(selects)


def _minhash_groups_sql() -> str:
    """Full SQL recomputation of pipelines/dedup.py minhash_lsh_neardup
    (default 64 perms / 16 bands / threshold 0.5): the 5-char polynomial
    rolling shingle hash (stages/minhash.py char_shingles_u64 — ascii()
    equals the utf-8 byte on this ASCII corpus and mod-2^64 wraparound
    is done in HUGEINT), the seeded universal-hash permutation table
    embedded as literals, banding by signature-chunk equality (the
    Python side buckets on a splitmix fold of the same chunk — equal
    iff, modulo a ~2^-64 collision), signature-Jaccard ≥ 0.5
    verification, and recursive min-label connected components matching
    the union-find group assembly."""
    from neo4j_graph_algorithms_ray.stages.minhash import _rng_params

    a, b = _rng_params(64)
    perm_rows = ",".join(f"({i},{int(a[i])},{int(b[i])})" for i in range(64))
    B, M = 1099511628211, 1 << 64
    sh_expr = " + ".join(
        f"ascii(substr(text, i + {j}, 1))::HUGEINT * {pow(B, 4 - j, M)}::HUGEINT"
        for j in range(5)
    )
    return rf"""WITH RECURSIVE pos AS (
  SELECT doc_id, text, unnest(generate_series(1, length(text) - 4)) AS i
  FROM documents
), shingle AS (
  SELECT DISTINCT doc_id, (({sh_expr}) % 18446744073709551616::HUGEINT)::UBIGINT AS x
  FROM pos
), perm(p, pa, pb) AS (VALUES {perm_rows}
), sig AS (
  SELECT doc_id, p,
         min(((pa::HUGEINT * x::HUGEINT + pb::HUGEINT) % 18446744073709551616::HUGEINT)::UBIGINT) AS mh
  FROM shingle CROSS JOIN perm GROUP BY doc_id, p
), chunk AS (
  SELECT doc_id, p // 4 AS band_id, list(mh ORDER BY p) AS c
  FROM sig GROUP BY doc_id, p // 4
), cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM chunk x JOIN chunk y
    ON x.band_id = y.band_id AND x.c = y.c AND x.doc_id < y.doc_id
), pairs AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c JOIN sig s1 ON s1.doc_id = c.doc_a
              JOIN sig s2 ON s2.doc_id = c.doc_b AND s2.p = s1.p
  GROUP BY c.doc_a, c.doc_b
  HAVING sum(CASE WHEN s1.mh = s2.mh THEN 1 ELSE 0 END) / 64.0 >= 0.5
), sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b AS src, doc_a AS dst FROM pairs
), cc AS (
  SELECT src AS doc_id, src AS label FROM sym
  UNION
  SELECT e.dst AS doc_id, c2.label FROM cc c2 JOIN sym e ON e.src = c2.doc_id
)
SELECT doc_id, min(label)::BIGINT AS group_id FROM cc GROUP BY doc_id"""


_PAIRS_DUP = """
pairs AS (
  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst, l_quantity AS qty
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "degree_out": f"WITH {_E_BIP} SELECT src AS vid, COUNT(*) AS out_deg FROM edges GROUP BY src",
        "degree_in": f"WITH {_E_BIP} SELECT dst AS vid, COUNT(*) AS in_deg FROM edges GROUP BY dst",
        "edge_count_dedup": f"WITH {_E_BIP} SELECT COUNT(*) AS num_edges FROM edges",
        "dup_rel_sum": f"WITH {_PAIRS_DUP} SELECT src, dst, SUM(qty) AS w FROM pairs GROUP BY src, dst",
        "dup_rel_max": f"WITH {_PAIRS_DUP} SELECT src, dst, MAX(qty) AS w FROM pairs GROUP BY src, dst",
        "dup_rel_skip": f"WITH {_PAIRS_DUP} SELECT src, dst, MIN(qty) AS w FROM pairs GROUP BY src, dst",
        "dup_rel_count": f"WITH {_PAIRS_DUP} SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w FROM pairs GROUP BY src, dst",
        "ngram_jaccard": """
WITH ids AS (SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0 AND length(text) >= 5),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ids a JOIN ids b ON a.doc_id < b.doc_id
),
sh AS (
  SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), 5) AS s
  FROM (
    SELECT doc_id, text, unnest(range(1, length(text) - 3)) AS i FROM ids
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
  GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
  ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE)
        / (na.n + nb.n - COALESCE(i.i, 0)), 6) AS jaccard
FROM cand c
JOIN sizes na ON na.doc_id = c.doc_a
JOIN sizes nb ON nb.doc_id = c.doc_b
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b""",
        "ngram_containment": """
WITH ids AS (SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0 AND length(text) >= 5),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ids a JOIN ids b ON a.doc_id < b.doc_id
),
sh AS (
  SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), 5) AS s
  FROM (
    SELECT doc_id, text, unnest(range(1, length(text) - 3)) AS i FROM ids
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
  GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
  ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE) / na.n, 6) AS containment
FROM cand c
JOIN sizes na ON na.doc_id = c.doc_a
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b""",
        "pagerank_k5": f"WITH {_E_BIP}, {_pagerank_cte(5)} SELECT vid, ROUND(rank, 6) AS rank FROM r5",
        "hits_k10": f"WITH {_E_BIP}, {_hits_cte(10)} "
        "SELECT h.vid, ROUND(h.val, 6) AS hub, ROUND(a.val, 6) AS auth "
        "FROM h10 h JOIN a10 a ON a.vid = h.vid",
        "kcore": f"WITH {_E_BIP}, {_kcore_cte(8)} SELECT vid, val AS coreness FROM k8",
        "greedy_coloring": _coloring_sql(10),
        "ktruss_5": _ktruss_sql(5, 5),
        "modularity": f"""WITH {_E_PBLK}, {_louvain_cte(8)},
tot AS (SELECT f.c, SUM(d.k) AS t FROM fin f JOIN deg d ON d.vid = f.vid GROUP BY f.c),
intra AS (
  SELECT fa.c, COUNT(*)::DOUBLE AS s_in
  FROM pb_edges e
  JOIN fin fa ON fa.vid = e.u
  JOIN fin fb ON fb.vid = e.v AND fb.c = fa.c
  GROUP BY fa.c),
q AS (
  SELECT SUM(COALESCE(i.s_in, 0.0) / ((SELECT s FROM m2) / 2.0)
           - (t.t / (SELECT s FROM m2)) * (t.t / (SELECT s FROM m2))) AS q
  FROM tot t LEFT JOIN intra i ON i.c = t.c)
SELECT FLOOR(q * 1000000 + 0.5) / 1000000 AS modularity FROM q""",
        "conductance_louvain": f"""WITH {_E_PBLK}, {_louvain_cte(8)},
cm AS (SELECT f.vid, l.community FROM fin f JOIN lab l USING (c)),
vol AS (
  SELECT community, SUM(d.k) AS vol
  FROM cm JOIN deg d USING (vid) GROUP BY community),
cutp AS (
  SELECT ca.community AS community, COUNT(*)::DOUBLE AS w
  FROM pb_edges e
  JOIN cm ca ON ca.vid = e.u
  JOIN cm cb ON cb.vid = e.v
  WHERE ca.community <> cb.community
  GROUP BY ca.community
  UNION ALL
  SELECT cb.community, COUNT(*)::DOUBLE
  FROM pb_edges e
  JOIN cm ca ON ca.vid = e.u
  JOIN cm cb ON cb.vid = e.v
  WHERE ca.community <> cb.community
  GROUP BY cb.community),
cut AS (SELECT community, SUM(w) AS cut FROM cutp GROUP BY community)
SELECT v.community,
       FLOOR(CASE WHEN LEAST(v.vol, (SELECT s FROM m2) - v.vol) > 0
                  THEN COALESCE(c.cut, 0.0)
                       / LEAST(v.vol, (SELECT s FROM m2) - v.vol)
                  ELSE 0.0 END * 1000000 + 0.5) / 1000000 AS conductance
FROM vol v LEFT JOIN cut c USING (community)
ORDER BY community""",
        "degree_histogram": f"WITH {_E_BIP} "
        "SELECT out_deg, COUNT(*)::BIGINT AS cnt FROM "
        "(SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src) GROUP BY out_deg",
        "avg_neighbor_degree": f"""WITH {_E_CYC},
dout AS (SELECT src AS vid, COUNT(*) AS d FROM edges GROUP BY src),
per AS (
  SELECT e.src, AVG(COALESCE(d2.d, 0)::DOUBLE) AS a
  FROM edges e LEFT JOIN dout d2 ON d2.vid = e.dst GROUP BY e.src
)
SELECT d.d AS out_deg, ROUND(AVG(p.a), 6) AS avg_neighbor_out_deg
FROM per p JOIN dout d ON d.vid = p.src GROUP BY d.d""",
        "reciprocity": f"""WITH {_E_CYC}
SELECT ROUND(
  (SELECT COUNT(*) FROM edges a JOIN edges b
     ON b.src = a.dst AND b.dst = a.src)::DOUBLE
  / (SELECT COUNT(*) FROM edges), 6) AS reciprocity""",
        "degree_assortativity": f"""WITH {_E_CYC},
deg_out AS (SELECT src AS vid, COUNT(*) AS d FROM edges GROUP BY src),
deg_in AS (SELECT dst AS vid, COUNT(*) AS d FROM edges GROUP BY dst)
SELECT ROUND(CORR(o.d, i.d), 6) AS assortativity
FROM edges e JOIN deg_out o ON o.vid = e.src JOIN deg_in i ON i.vid = e.dst""",
        "personalized_pagerank_k5": f"WITH {_E_BIP}, {_ppr_cte(5)} "
        "SELECT vid, ROUND(rank, 6) AS rank FROM p5",
        "top_pagerank_10": f"WITH {_E_BIP}, {_pagerank_cte(5)} "
        "SELECT vid, ROUND(rank, 6) AS rank FROM r5 "
        "ORDER BY ROUND(rank, 6) DESC, vid LIMIT 10",
        "wcc": f"""WITH RECURSIVE {_E_BIP},
und AS (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges),
lbl AS (
  SELECT vid, vid AS label FROM vertices
  UNION
  SELECT u.b AS vid, l.label FROM lbl l JOIN und u ON u.a = l.vid
)
SELECT vid, MIN(label) AS component FROM lbl GROUP BY vid""",
        "wcc_setcount": f"""WITH RECURSIVE {_E_BIP},
und AS (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges),
lbl AS (
  SELECT vid, vid AS label FROM vertices
  UNION
  SELECT u.b AS vid, l.label FROM lbl l JOIN und u ON u.a = l.vid
),
comp AS (SELECT vid, MIN(label) AS component FROM lbl GROUP BY vid)
SELECT COUNT(DISTINCT component) AS set_count FROM comp""",
        "wcc_component_stats": f"""WITH RECURSIVE {_E_BIP},
und AS (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges),
lbl AS (
  SELECT vid, vid AS label FROM vertices
  UNION
  SELECT u.b AS vid, l.label FROM lbl l JOIN und u ON u.a = l.vid
),
comp AS (SELECT vid, MIN(label) AS component FROM lbl GROUP BY vid),
sizes AS (SELECT component, COUNT(*)::BIGINT AS s FROM comp GROUP BY component),
nc AS (SELECT COUNT(*)::BIGINT AS c FROM sizes),
ranked AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn FROM sizes)
SELECT 'p' || q::VARCHAR AS stat, MIN(s)::BIGINT AS value
FROM ranked, (VALUES (1),(5),(10),(25),(50),(75),(90),(95),(99),(100)) t(q), nc
WHERE rn >= GREATEST(CEIL(q * nc.c / 100.0), 1)
GROUP BY q
UNION ALL SELECT 'set_count', c FROM nc""",
        "lpa_k3": f"WITH {_E_BIP}, {_lpa_cte(3)} SELECT vid, label FROM l3",
        "lpa_seeded_k3": f"""WITH {_E_BIP}, {_lpa_cte(3, l0='''
  SELECT v.vid, COALESCE(c.c_nationkey + 1000, v.vid) AS label
  FROM vertices v LEFT JOIN customer c ON c.c_custkey * 2 = v.vid''')}
SELECT vid, label FROM l3""",
        "louvain_communities": f"""WITH {_E_PBLK}, {_louvain_cte(8)}
SELECT f.vid, l.community FROM fin f JOIN lab l USING (c) ORDER BY vid""",
        "infomap_modules": f"""WITH {_E_PBLK},
w AS (
  SELECT DISTINCT vid, module, p, reported_l
  FROM read_parquet('{_WITNESS_DIR}/infomap_*.parquet')
  WHERE nv = (SELECT COUNT(*) FROM pb_vertices)
),
deg AS (SELECT a AS vid, COUNT(*)::DOUBLE AS wd FROM pb_und GROUP BY a),
av AS (SELECT w.vid, w.p / d.wd AS a_v FROM w JOIN deg d ON d.vid = w.vid),
fl AS (
  SELECT e.a AS i, e.b AS j, (ai.a_v + aj.a_v) * 0.5 AS f
  FROM pb_und e JOIN av ai ON ai.vid = e.a JOIN av aj ON aj.vid = e.b
),
sv AS (SELECT i AS vid, SUM(f) AS s FROM fl GROUP BY i),
downv AS (
  SELECT fl.i AS vid, SUM(fl.f) AS d_own
  FROM fl JOIN w wi ON wi.vid = fl.i JOIN w wj ON wj.vid = fl.j
  WHERE wi.module = wj.module GROUP BY fl.i
),
per_v AS (
  SELECT w.vid, w.module, w.p, sv.s, COALESCE(downv.d_own, 0.0) AS d_own
  FROM w JOIN sv ON sv.vid = w.vid LEFT JOIN downv ON downv.vid = w.vid
),
qc AS (SELECT module, SUM(s - d_own) AS q, SUM(p) AS sump FROM per_v GROUP BY module),
lm AS (SELECT
    (SELECT CASE WHEN SUM(q) > 0 THEN SUM(q) * log2(SUM(q)) ELSE 0.0 END FROM qc)
  - 2 * (SELECT SUM(CASE WHEN q > 0 THEN q * log2(q) ELSE 0.0 END) FROM qc)
  - (SELECT SUM(CASE WHEN p > 0 THEN p * log2(p) ELSE 0.0 END) FROM w)
  + (SELECT SUM(CASE WHEN q + sump > 0 THEN (q + sump) * log2(q + sump) ELSE 0.0 END) FROM qc)
  AS l),
l0 AS (SELECT
    (SELECT CASE WHEN SUM(s) > 0 THEN SUM(s) * log2(SUM(s)) ELSE 0.0 END FROM sv)
  - 2 * (SELECT SUM(CASE WHEN s > 0 THEN s * log2(s) ELSE 0.0 END) FROM sv)
  - (SELECT SUM(CASE WHEN p > 0 THEN p * log2(p) ELSE 0.0 END) FROM w)
  + (SELECT SUM(CASE WHEN s + p > 0 THEN (s + p) * log2(s + p) ELSE 0.0 END) FROM per_v)
  AS l),
ok AS (SELECT
      abs((SELECT l FROM lm) - (SELECT ANY_VALUE(reported_l) FROM w)) < 1e-6
  AND (SELECT l FROM lm) <= (SELECT l FROM l0) + 1e-9
  AND abs((SELECT SUM(p) FROM w) - 1.0) < 1e-9 AS good)
SELECT vid, module FROM w WHERE (SELECT good FROM ok) ORDER BY vid""",
        "scc": f"""WITH RECURSIVE {_E_CYC},
reach AS (
  SELECT vid AS s, vid AS v FROM vertices
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON e.src = r.v
)
SELECT a.s AS vid, MIN(a.v) AS scc
FROM reach a JOIN reach b ON a.s = b.v AND a.v = b.s
GROUP BY a.s""",
        "bfs_depth": f"""WITH RECURSIVE {_E_CYC},
srcv AS (SELECT MIN(vid) AS s FROM vertices),
r AS (
  SELECT s AS v, 0::BIGINT AS d FROM srcv
  UNION
  SELECT e.dst, r.d + 1 FROM r JOIN edges e ON e.src = r.v WHERE r.d < 30
)
SELECT v AS vid, MIN(d) AS depth FROM r GROUP BY v""",
        "triangle_count": f"""WITH {_E_BIP}, {_UND_COSUPP}
SELECT COUNT(*) AS triangle_count
FROM und e1
JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v""",
        "triangles_per_vertex": f"""WITH {_E_BIP}, {_UND_COSUPP}
SELECT n1.a AS vid, COUNT(*) AS triangles
FROM nb n1
JOIN nb n2 ON n2.a = n1.a AND n1.b < n2.b
JOIN und e ON e.u = n1.b AND e.v = n2.b
GROUP BY n1.a""",
        "avg_clustering_coefficient": f"""WITH {_E_BIP}, {_UND_COSUPP},
deg AS (SELECT a AS vid, COUNT(*) AS d FROM nb GROUP BY a),
tri AS (
  SELECT n1.a AS vid, COUNT(*) AS t
  FROM nb n1
  JOIN nb n2 ON n2.a = n1.a AND n1.b < n2.b
  JOIN und e ON e.u = n1.b AND e.v = n2.b
  GROUP BY n1.a
)
SELECT ROUND(AVG(CASE WHEN d.d > 1
  THEN 2.0 * COALESCE(t.t, 0) / (d.d * (d.d - 1)) ELSE 0 END), 6) AS avg_coefficient
FROM deg d LEFT JOIN tri t ON t.vid = d.vid""",
        "pagerank_weighted_k5": f"WITH {_E_WBIP}, {_wpagerank_cte(5)} "
        "SELECT vid, ROUND(rank, 6) AS rank FROM wr5",
        "wcc_threshold": f"""WITH RECURSIVE {_E_WBIP},
fe AS (SELECT src, dst FROM edges WHERE weight > 2.0),
und AS (SELECT src AS a, dst AS b FROM fe UNION SELECT dst, src FROM fe),
lbl AS (
  SELECT vid, vid AS label FROM vertices
  UNION
  SELECT u.b AS vid, l.label FROM lbl l JOIN und u ON u.a = l.vid
)
SELECT vid, MIN(label) AS component FROM lbl GROUP BY vid""",
        "article_rank_k5": f"""WITH {_E_BIP},
deg AS (SELECT src AS vid, COUNT(*) AS od FROM edges GROUP BY src),
avgd AS (
  SELECT SUM(od)::DOUBLE / (SELECT COUNT(*) FROM vertices) AS a FROM deg
),
{_article_rank_cte(5)}
SELECT vid, ROUND(rank, 6) AS rank FROM ar5""",
        "link_prediction": f"""WITH {_E_BIP}, {_UND_COSUPP},
vs AS (
  SELECT a AS vid, ROW_NUMBER() OVER (ORDER BY a) - 1 AS rn
  FROM (SELECT DISTINCT a FROM nb) ORDER BY a LIMIT 20
),
pr AS (
  SELECT e.vid AS u, o.vid AS v FROM vs e JOIN vs o ON o.rn = e.rn + 1
  WHERE e.rn % 2 = 0
),
deg AS (SELECT a AS vid, COUNT(*) AS d FROM nb GROUP BY a),
cn AS (
  SELECT p.u, p.v, n2.b AS w
  FROM pr p JOIN nb n1 ON n1.a = p.u JOIN nb n2 ON n2.a = p.v AND n2.b = n1.b
),
agg AS (
  SELECT u, v, COUNT(*) AS common_neighbors,
    ROUND(SUM(CASE WHEN dw.d > 1 THEN 1.0/ln(dw.d) ELSE 0 END), 6) AS adamic_adar,
    ROUND(SUM(1.0/dw.d), 6) AS resource_allocation
  FROM cn JOIN deg dw ON dw.vid = cn.w GROUP BY u, v
)
SELECT p.u AS u, p.v AS v,
  COALESCE(a.common_neighbors, 0) AS common_neighbors,
  COALESCE(a.adamic_adar, 0.0) AS adamic_adar,
  COALESCE(a.resource_allocation, 0.0) AS resource_allocation,
  du.d * dv.d AS preferential_attachment,
  du.d + dv.d - COALESCE(a.common_neighbors, 0) AS total_neighbors,
  ROUND(COALESCE(a.common_neighbors, 0)::DOUBLE
    / NULLIF(du.d + dv.d - COALESCE(a.common_neighbors, 0), 0), 6) AS jaccard,
  ROUND(COALESCE(a.common_neighbors, 0)::DOUBLE
    / NULLIF(LEAST(du.d, dv.d), 0), 6) AS overlap
FROM pr p
JOIN deg du ON du.vid = p.u JOIN deg dv ON dv.vid = p.v
LEFT JOIN agg a ON a.u = p.u AND a.v = p.v
ORDER BY u""",
        "balanced_triads": f"""WITH {_E_BIP}, {_UND_COSUPP},
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v
),
signed AS (
  SELECT a, b, c,
    (CASE WHEN (a+b) % 4 = 0 THEN 1 ELSE -1 END)
    * (CASE WHEN (b+c) % 4 = 0 THEN 1 ELSE -1 END)
    * (CASE WHEN (a+c) % 4 = 0 THEN 1 ELSE -1 END) AS p
  FROM tri
),
member AS (
  SELECT a AS vid, p FROM signed
  UNION ALL SELECT b, p FROM signed
  UNION ALL SELECT c, p FROM signed
)
SELECT vid,
  SUM(CASE WHEN p > 0 THEN 1 ELSE 0 END)::BIGINT AS balanced,
  SUM(CASE WHEN p < 0 THEN 1 ELSE 0 END)::BIGINT AS unbalanced
FROM member GROUP BY vid""",
        "dedup_exact": "SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count FROM documents GROUP BY text",
        "token_stats": r"""SELECT doc_id,
  length(regexp_extract_all(text, '\S+')) AS n_tokens,
  length(text) - length(replace(text, chr(10), '')) + 1 AS n_lines
FROM documents""",
        "lang_counts": "SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang",
        # chunk_tokens=24, overlap=6 -> stride 18; chunk j covers token
        # positions [j*18, j*18+24); chunks emitted until one reaches
        # the doc end; whitespace-run tokenization, single-space rejoin
        "chunk_documents": r"""WITH toks AS (
  SELECT doc_id,
         UNNEST(regexp_extract_all(text, '\S+')) AS tok,
         UNNEST(range(length(regexp_extract_all(text, '\S+')))) AS pos
  FROM documents
), n AS (
  SELECT doc_id, COUNT(*)::BIGINT AS nt FROM toks GROUP BY doc_id
), js AS (
  SELECT doc_id,
         UNNEST(range(1 + CAST(CEIL(GREATEST(nt - 24, 0) / 18.0) AS BIGINT))) AS j
  FROM n
)
SELECT t.doc_id, js.j AS chunk_id,
       STRING_AGG(t.tok, ' ' ORDER BY t.pos) AS text,
       COUNT(*)::BIGINT AS n_tokens
FROM js JOIN toks t ON t.doc_id = js.doc_id
   AND t.pos >= js.j * 18 AND t.pos < js.j * 18 + 24
GROUP BY t.doc_id, js.j""",
        "repetition_stats": """WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), pos AS (
  SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM w
), wc AS (
  SELECT doc_id, l[i] AS wd, COUNT(*) AS c FROM pos GROUP BY doc_id, wd
), per AS (
  SELECT doc_id, SUM(c)::BIGINT AS n_words, COUNT(*)::BIGINT AS n_distinct,
         MAX(c)::BIGINT AS maxc
  FROM wc GROUP BY doc_id
), bgc AS (
  SELECT doc_id, MAX(c)::BIGINT AS maxbg FROM (
    SELECT doc_id, l[i] || ' ' || l[i + 1] AS bg, COUNT(*) AS c
    FROM pos WHERE i < len(l) GROUP BY doc_id, bg
  ) GROUP BY doc_id
)
SELECT p.doc_id, p.n_words,
  ROUND((p.n_words - p.n_distinct) / GREATEST(p.n_words, 1)::DOUBLE, 6) AS dup_word_frac,
  ROUND(p.maxc / GREATEST(p.n_words, 1)::DOUBLE, 6) AS top_word_frac,
  ROUND(COALESCE(b.maxbg, 0) / GREATEST(p.n_words - 1, 1)::DOUBLE, 6) AS top_bigram_frac
FROM per p LEFT JOIN bgc b USING (doc_id)""",
        "top_ngrams": """WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), pos AS (
  SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i FROM w
), big AS (
  SELECT l[i] || ' ' || l[i + 1] AS ngram FROM pos
)
SELECT ngram, COUNT(*)::BIGINT AS cnt FROM big
GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 20""",
        "stratified_sample": """WITH h AS (
  SELECT doc_id, lang, (doc_id * 2654435761) % 4294967296 AS hv FROM documents
), r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
  FROM h
)
SELECT doc_id, lang FROM r WHERE rn <= 20""",
        "weighted_sample": """WITH c AS (
  SELECT lang, COUNT(*)::DOUBLE AS n_s FROM documents GROUP BY lang
), tot AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
thr AS (
  SELECT lang,
    FLOOR(LEAST(ROUND(POWER(c.n_s / tot.n, -0.7), 6) * 0.5, 1.0)
          * 4294967296.0)::BIGINT AS lim
  FROM c CROSS JOIN tot
)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr USING (lang)
WHERE (d.doc_id * 2654435761) % 4294967296 < thr.lim""",
        "rebalance_weights": """WITH c AS (
  SELECT lang, COUNT(*)::DOUBLE AS n_s FROM documents GROUP BY lang
), tot AS (SELECT COUNT(*)::DOUBLE AS n FROM documents)
SELECT d.doc_id, d.lang, ROUND(POWER(c.n_s / tot.n, -0.7), 6) AS weight
FROM documents d JOIN c USING (lang) CROSS JOIN tot""",
        "events_asof_attribution": """WITH l AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, ts, MAX(value) AS signup_value
  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id, l.value, r.signup_value,
  (epoch_us(l.ts) - epoch_us(r.ts))::BIGINT AS lag_us
FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""",
        "events_interval_join": """WITH l AS (
  SELECT user_id, epoch_us(ts)::BIGINT AS ts_us, event_id, value
  FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, epoch_us(ts)::BIGINT AS w_start,
         (epoch_us(ts) + 604800000000)::BIGINT AS w_end,
         value AS signup_value
  FROM events WHERE event_type = 'signup'
)
SELECT l.user_id, l.ts_us, l.event_id, l.value,
       r.w_start, r.w_end, r.signup_value
FROM l JOIN r ON l.user_id = r.user_id
             AND l.ts_us BETWEEN r.w_start AND r.w_end""",
        "pack_sequences": r"""WITH t AS (
  SELECT doc_id, length(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (
      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0)::BIGINT AS tok_offset
  FROM t
)
SELECT doc_id, n_tokens, tok_offset,
  (tok_offset // 256)::BIGINT AS bin_id,
  (tok_offset % 256)::BIGINT AS bin_pos
FROM o""",
        "decontaminate_8gram": """WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), pos AS (
  SELECT doc_id, array_to_string(l[i : i + 7], ' ') AS ngram
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 7)) AS i FROM w)
), bench AS (
  SELECT DISTINCT ngram FROM pos WHERE doc_id % 97 = 0
), hits AS (
  SELECT p.doc_id, COUNT(b.ngram)::BIGINT AS n_contaminated
  FROM pos p LEFT JOIN bench b USING (ngram)
  WHERE p.doc_id % 97 <> 0 GROUP BY p.doc_id
)
SELECT d.doc_id,
  GREATEST(len(string_split(d.text, ' ')) - 7, 0)::BIGINT AS n_ngrams,
  COALESCE(h.n_contaminated, 0)::BIGINT AS n_contaminated,
  (COALESCE(h.n_contaminated, 0) > 0)::BIGINT AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 97 <> 0""",
        "pii_scrub": """WITH t0 AS (
  SELECT doc_id,
    text || ' u' || doc_id || '@ex.com http://h/' || doc_id ||
    ' 10.0.0.' || (doc_id % 256) ||
    ' 555-000-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS text
  FROM documents
), s1 AS (
  SELECT doc_id,
    len(regexp_extract_all(text, 'https?://[^ ]+'))::BIGINT AS n_url,
    regexp_replace(text, 'https?://[^ ]+', '[URL]', 'g') AS text FROM t0
), s2 AS (
  SELECT doc_id, n_url,
    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_email,
    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS text FROM s1
), s3 AS (
  SELECT doc_id, n_url, n_email,
    len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::BIGINT AS n_ipv4,
    regexp_replace(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g') AS text FROM s2
)
SELECT doc_id, n_url, n_email, n_ipv4,
  len(regexp_extract_all(text, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b'))::BIGINT AS n_phone,
  regexp_replace(text, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '[PHONE]', 'g') AS text
FROM s3""",
        "funnel_view_click_purchase": """WITH base AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
), s1 AS (
  SELECT user_id, MIN(epoch_us(ts))::BIGINT AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts))::BIGINT AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts))::BIGINT AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
  GROUP BY e.user_id
)
SELECT b.user_id,
  (CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS steps_completed,
  (t3 IS NOT NULL)::BIGINT AS converted,
  COALESCE(t3 - t1, -1)::BIGINT AS time_to_convert_us
FROM base b
LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)""",
        "line_dedup": """WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), ln AS (
  SELECT doc_id, ((i - 1) // 8)::BIGINT AS line_no,
         array_to_string(l[i : i + 7], ' ') AS line
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l), 8)) AS i FROM w)
), rk AS (
  SELECT doc_id, line_no, line,
         ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
  FROM ln
)
SELECT doc_id,
  COALESCE(string_agg(line, chr(10) ORDER BY line_no) FILTER (WHERE rn = 1), '') AS text,
  (COUNT(*) FILTER (WHERE rn = 1))::BIGINT AS n_kept,
  (COUNT(*) FILTER (WHERE rn > 1))::BIGINT AS n_dropped
FROM rk GROUP BY doc_id""",
        "tfidf_top5": """WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), pos AS (
  SELECT doc_id, l[i] AS word
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM w)
), tf AS (
  SELECT doc_id, word, COUNT(*)::BIGINT AS tf FROM pos GROUP BY doc_id, word
), dfr AS (
  SELECT word, COUNT(*)::BIGINT AS df FROM tf GROUP BY word
), n AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
s AS (
  SELECT t.doc_id, t.word, t.tf,
         ROUND(t.tf * LN((n.n + 1) / (d.df + 1)), 6) AS score
  FROM tf t JOIN dfr d USING (word) CROSS JOIN n
), r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score DESC, word) AS rn FROM s
)
SELECT doc_id, word, tf, score FROM r WHERE rn <= 5""",
        "unigram_logloss": """WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), pos AS (
  SELECT doc_id, l[i] AS word
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM w)
), tf AS (
  SELECT doc_id, word, COUNT(*)::BIGINT AS tf FROM pos GROUP BY doc_id, word
), cnt AS (
  SELECT word, SUM(tf)::BIGINT AS cnt FROM tf GROUP BY word
), tot AS (SELECT SUM(cnt)::DOUBLE AS total FROM cnt)
SELECT t.doc_id, SUM(t.tf)::BIGINT AS n_words,
  ROUND(SUM(t.tf * -LN(c.cnt / tot.total))
        / GREATEST(SUM(t.tf), 1), 6) AS logloss
FROM tf t JOIN cnt c USING (word) CROSS JOIN tot
GROUP BY t.doc_id""",
        "token_length_percentiles": r"""WITH t AS (
  SELECT length(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens FROM documents
), nc AS (SELECT COUNT(*)::BIGINT AS c FROM t),
ranked AS (SELECT n_tokens AS s, ROW_NUMBER() OVER (ORDER BY n_tokens) AS rn FROM t)
SELECT 'p' || q::VARCHAR AS stat, MIN(s)::BIGINT AS value
FROM ranked, (VALUES (1),(5),(10),(25),(50),(75),(90),(95),(99),(100)) t(q), nc
WHERE rn >= GREATEST(CEIL(q * nc.c / 100.0), 1)
GROUP BY q
UNION ALL SELECT 'n_docs', c FROM nc""",
        "source_profile": r"""WITH t AS (
  SELECT source, lang,
         length(regexp_extract_all(text, '\S+'))::BIGINT AS tok,
         length(text)::BIGINT AS chars
  FROM documents
)
SELECT source, COUNT(*)::BIGINT AS n_docs,
  COUNT(DISTINCT lang)::BIGINT AS n_langs,
  SUM(tok)::BIGINT AS total_tokens,
  ROUND(SUM(tok) / COUNT(*)::DOUBLE, 6) AS mean_tokens,
  ROUND(SUM(chars) / COUNT(*)::DOUBLE, 6) AS mean_chars
FROM t GROUP BY source""",
        "doc_sha256": "SELECT doc_id, sha256(text) AS sha FROM documents",
        "dedup_against_prior": """WITH pri AS (
  SELECT DISTINCT sha256(CASE WHEN doc_id % 3 = 0
    THEN 'shared sentinel document already ingested last crawl'
    ELSE text END) AS sha
  FROM documents WHERE doc_id % 5 = 0
), nw AS (
  SELECT doc_id, sha256(CASE WHEN doc_id % 7 = 0
    THEN 'shared sentinel document already ingested last crawl'
    ELSE text END) AS sha
  FROM documents WHERE doc_id % 5 <> 0
)
SELECT n.doc_id, n.sha FROM nw n
WHERE NOT EXISTS (SELECT 1 FROM pri p WHERE p.sha = n.sha)""",
        "bloom_dedup_prior": _bloom_sql(1 << 20, 4),
        "euclidean_topk": """WITH q AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (0, 1, 2, 3)
),
d AS (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         sqrt(list_distance(q.embedding::DOUBLE[], e.embedding::DOUBLE[])^2) AS score
  FROM q, embeddings e WHERE e.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score, vec_id) AS rank
  FROM d
)
SELECT query_id, vec_id, rank, ROUND(score, 4) AS score FROM ranked WHERE rank <= 5""",
        "dot_topk": """WITH q AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (0, 1, 2, 3)
),
d AS (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS score
  FROM q, embeddings e WHERE e.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
  FROM d
)
SELECT query_id, vec_id, rank, ROUND(score, 4) AS score FROM ranked WHERE rank <= 5""",
        "ann_topk": """WITH q AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (0, 1, 2, 3)
),
sims AS (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS sim
  FROM q, embeddings e WHERE e.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM sims
)
SELECT query_id, vec_id, rank, ROUND(sim, 4) AS sim FROM ranked WHERE rank <= 5""",
        "events_tumbling_daily": """SELECT user_id,
  date_trunc('day', ts) AS window_start,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY user_id, date_trunc('day', ts)""",
        "events_hopping_1d_6h": """SELECT user_id,
  make_timestamp((CAST(floor(epoch(ts)/21600) AS BIGINT)*21600
                  - i.generate_series*21600) * 1000000) AS window_start,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 6) AS sum_value
FROM events CROSS JOIN generate_series(0, 3) i
GROUP BY 1, 2""",
        "sessionize": """WITH d AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, SUM(brk)::BIGINT AS n_sessions, COUNT(*)::BIGINT AS n_events
FROM d GROUP BY user_id""",
        "delta_stepping_sssp": f"""WITH RECURSIVE {_E_WBIP},
und AS (SELECT src AS a, dst AS b, weight FROM edges
        UNION ALL SELECT dst, src, weight FROM edges),
walk AS (
  SELECT (SELECT MIN(vid) FROM vertices) AS v, 0.0::DOUBLE AS d
  UNION
  SELECT u.b, walk.d + u.weight FROM walk JOIN und u ON u.a = walk.v
  WHERE walk.d + u.weight <= 30
)
SELECT v AS vid, ROUND(MIN(d), 6) AS distance FROM walk GROUP BY v""",
        "closeness_harmonic_sampled": _closeness_sql(levels=8),
        "closeness_sampled": _closeness_sql(levels=8, variant="standard"),
        "closeness_dangalchev_sampled": _closeness_sql(levels=8, variant="dangalchev"),
        "allpairs_depth_sampled": _allpairs_depth_sql(levels=8),
        "sssp_dijkstra": f"""WITH RECURSIVE {_E_WBIP},
und AS (SELECT src AS a, dst AS b, weight FROM edges
        UNION ALL SELECT dst, src, weight FROM edges),
walk AS (
  SELECT (SELECT MIN(vid) FROM vertices) AS v, 0.0::DOUBLE AS d
  UNION
  SELECT u.b, walk.d + u.weight FROM walk JOIN und u ON u.a = walk.v
  WHERE walk.d + u.weight <= 30
)
SELECT v AS vid, ROUND(MIN(d), 6) AS distance FROM walk GROUP BY v""",
        "weighted_allpairs_sampled": f"""WITH RECURSIVE {_E_WBIP},
und AS (SELECT src AS a, dst AS b, weight FROM edges
        UNION ALL SELECT dst, src, weight FROM edges),
walk AS (
  SELECT v.vid AS s, v.vid AS t, 0.0::DOUBLE AS d FROM vertices v WHERE v.vid < 8
  UNION
  SELECT walk.s, u.b, walk.d + u.weight FROM walk JOIN und u ON u.a = walk.t
  WHERE walk.d + u.weight <= 30
)
SELECT s AS source, t AS target, ROUND(MIN(d), 6) AS distance
FROM walk WHERE t <> s GROUP BY s, t""",
        "triangle_stream": f"""WITH {_E_BIP}, {_UND_COSUPP}
SELECT e1.u AS node_a, e1.v AS node_b, e2.v AS node_c
FROM und e1
JOIN und e2 ON e2.u = e1.v
JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v""",
        "betweenness_sampled": _betweenness_sql(levels=8),
        "yens_k_shortest": _yens_sql(),
        "astar_cost": f"""WITH RECURSIVE {_E_WBIP},
und AS (SELECT src AS a, dst AS b, weight FROM edges
        UNION ALL SELECT dst, src, weight FROM edges),
walk AS (
  SELECT (SELECT MIN(vid) FROM vertices) AS v, 0.0::DOUBLE AS d
  UNION
  SELECT u.b, walk.d + u.weight FROM walk JOIN und u ON u.a = walk.v
  WHERE walk.d + u.weight <= 30
)
SELECT (SELECT MIN(vid) FROM vertices) AS source, v AS target,
       ROUND(MIN(d), 6) AS total_cost
FROM walk WHERE v = (SELECT MAX(vid) FROM vertices) GROUP BY v""",
        "random_walks": _random_walks_sql(),
        "skipgram_pairs": f"""WITH wk AS (
  SELECT * FROM ({_random_walks_sql()}) t
)
SELECT a.vid AS center, b.vid AS context, COUNT(*)::BIGINT AS cnt
FROM wk a JOIN wk b
  ON b.walk_id = a.walk_id AND ABS(b.step - a.step) BETWEEN 1 AND 2
GROUP BY center, context""",
        "node2vec_walks": _node2vec_sql(),
        # plain CTEs on purpose: DuckDB 1.0 returns EMPTY results on the
        # second consumption of a MATERIALIZED CTE built over parquet
        # views, and the single-reference chain in _eigen_cte keeps the
        # inlined plan linear (≈10 re-scans, no 2^k blowup)
        "eigenvector_top10": f"""WITH {_E_CYC}, {_eigen_cte(10)}
SELECT vid, ROUND(r, 6) AS score FROM e10
ORDER BY ROUND(r, 6) DESC, vid LIMIT 10""",
        "euclidean_pairs": """SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
  ROUND(sqrt(list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[])^2), 4) AS score
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND ROUND(sqrt(list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[])^2), 4) <= 1.2""",
        "pearson_pairs": """WITH cent AS (
  SELECT vec_id,
    list_transform(embedding::DOUBLE[],
                   x -> x - list_aggregate(embedding::DOUBLE[], 'avg')) AS c
  FROM embeddings
)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
  ROUND(list_cosine_similarity(a.c, b.c), 4) AS score
FROM cent a, cent b
WHERE a.vec_id < b.vec_id
  AND ROUND(list_cosine_similarity(a.c, b.c), 4) >= 0.3""",
        "pearson_topk": """WITH cent AS (
  SELECT vec_id,
    list_transform(embedding::DOUBLE[],
                   x -> x - list_aggregate(embedding::DOUBLE[], 'avg')) AS c
  FROM embeddings
),
q AS (SELECT vec_id, c FROM cent WHERE vec_id IN (0, 1, 2, 3)),
d AS (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         list_cosine_similarity(q.c, e.c) AS score
  FROM q, cent e WHERE e.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, vec_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) AS rank
  FROM d
)
SELECT query_id, vec_id, rank, ROUND(score, 4) AS score
FROM ranked WHERE rank <= 5""",
        "embedding_neardup": """WITH n AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       ROUND(list_cosine_similarity(a.e, b.e), 4) AS sim
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.35""",
        "lsh_topk": _lsh_topk_sql(),
        "ivf_topk": _ivf_topk_sql(),
        "sql_projection_degree": f"""WITH edges AS ({_SQLPROJ_EDGES}),
vertices AS (SELECT src AS vid FROM edges UNION SELECT dst FROM edges)
SELECT v.vid, COUNT(e.src)::BIGINT AS out_deg
FROM vertices v LEFT JOIN edges e ON e.src = v.vid GROUP BY v.vid""",
        "minhash_lsh_groups": _minhash_groups_sql(),
        "hll_distinct_words": _hll_sql(),
        "hyperanf_npairs": _anf_sql(4),
        "cms_top_words": _cms_sql(20),
        "kmeans_clusters": _kmeans_sql(16, 4),
        "semantic_dedup": (
            "WITH " + ",".join(_lloyd_parts(16, 4, 64)) + """,
v AS (SELECT a.vec_id, a.cl, e.embedding::DOUBLE[] AS emb
      FROM afin a JOIN embeddings e ON e.vec_id = a.vec_id)
SELECT v.vec_id, v.cl AS cluster,
  NOT EXISTS (
    SELECT 1 FROM v u
    WHERE u.cl = v.cl AND u.vec_id < v.vec_id
      AND list_cosine_similarity(u.emb, v.emb) >= 0.35
  ) AS kept
FROM v"""
        ),
        "effective_diameter": f"""WITH anf AS (
  SELECT * FROM ({_anf_sql(6)}) t
), fin AS (SELECT n_pairs AS nf FROM anf WHERE t = 6)
SELECT
  (SELECT MIN(anf.t) FROM anf, fin
   WHERE anf.n_pairs >= 0.9 * fin.nf)::BIGINT AS eff_diameter,
  (SELECT nf FROM fin) AS n_pairs_final""",
        "dedup_keep_canonical": f"""WITH mg AS (
  SELECT * FROM ({_minhash_groups_sql()}) t
), memb AS (
  SELECT g.doc_id, g.group_id, length(d.text)::BIGINT AS n_chars
  FROM mg g JOIN documents d USING (doc_id)
), canon AS (
  SELECT group_id, doc_id AS canonical FROM (
    SELECT group_id, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY group_id ORDER BY n_chars DESC, doc_id) AS rn
    FROM memb) WHERE rn = 1
), gsz AS (
  SELECT group_id, COUNT(*)::BIGINT AS group_size FROM memb GROUP BY group_id
)
SELECT d.doc_id, COALESCE(gs.group_size, 1)::BIGINT AS group_size
FROM documents d
LEFT JOIN memb m ON m.doc_id = d.doc_id
LEFT JOIN canon c ON c.group_id = m.group_id
LEFT JOIN gsz gs ON gs.group_id = m.group_id
WHERE m.doc_id IS NULL OR d.doc_id = c.canonical""",
        # full sketch→band→pair→component recomputation of
        # pipelines/dedup.py simhash_neardup: per-token hash is the
        # big-endian sha256 prefix (stages/minhash.py simhash64 uses the
        # identical bytes), bit-votes → 64-bit sign aggregate (>>1 into
        # int64 range), 4×16-bit bands bucket candidates, true Hamming
        # ≤3 verifies, and a recursive min-label CTE reproduces the
        # union-find group assembly (group_id = min component member)
        "simhash_groups": r"""WITH RECURSIVE tok AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(text, '\S+'))) AS w
  FROM documents
), th AS (
  SELECT doc_id, ('0x' || substr(sha256(w), 1, 16))::UBIGINT AS h FROM tok
), votes AS (
  SELECT doc_id, i,
         sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i)
  GROUP BY doc_id, i
), sh AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 AND i > 0 THEN (1::BIGINT << (i - 1)) ELSE 0 END)::BIGINT AS simhash
  FROM votes GROUP BY doc_id
), bands AS (
  SELECT doc_id, simhash, band_id,
         (simhash >> (band_id * 16)) & 65535 AS band_hash
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band_id)
), pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_hash = y.band_hash
   AND x.doc_id < y.doc_id
  WHERE bit_count(xor(x.simhash::UBIGINT, y.simhash::UBIGINT)) <= 3
), sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b AS src, doc_a AS dst FROM pairs
), cc AS (
  SELECT src AS doc_id, src AS label FROM sym
  UNION
  SELECT e.dst AS doc_id, c.label FROM cc c JOIN sym e ON e.src = c.doc_id
)
SELECT doc_id, min(label)::BIGINT AS group_id FROM cc GROUP BY doc_id""",
        # same strided sha256-prefix window min as stages/text.py
        # fingerprint64 (byte offsets == char offsets on this ASCII
        # corpus, so SQL substr sees the same windows)
        "doc_fingerprints": """WITH d AS (
  SELECT doc_id, text, length(text) AS L FROM documents
), short AS (
  SELECT doc_id,
         (('0x' || substr(sha256(text), 1, 16))::UBIGINT >> 1)::BIGINT AS fingerprint
  FROM d WHERE L < 8
), idx AS (
  SELECT doc_id, text,
         unnest(generate_series(1, L - 7, greatest(1, (L - 8) // 256))) AS i
  FROM d WHERE L >= 8
), win AS (
  SELECT doc_id,
         min(('0x' || substr(sha256(substr(text, i, 8)), 1, 16))::UBIGINT) AS mh
  FROM idx GROUP BY doc_id
)
SELECT doc_id, fingerprint FROM short
UNION ALL
SELECT doc_id, (mh >> 1)::BIGINT AS fingerprint FROM win""",
        "lang_id_guess": rf"""WITH w AS (
  SELECT doc_id,
    regexp_extract_all(lower(substr(text, 1, 2000)),
                       '[\p{{L}}\p{{N}}_'']+') AS words
  FROM documents
),
s AS (
  SELECT doc_id,
    {_lang_score_sql('en')} AS en, {_lang_score_sql('de')} AS de,
    {_lang_score_sql('fr')} AS fr, {_lang_score_sql('es')} AS es
  FROM w
)
SELECT doc_id, CASE
  WHEN en >= 2 AND en >= de AND en >= fr AND en >= es THEN 'en'
  WHEN de >= 2 AND de > en AND de >= fr AND de >= es THEN 'de'
  WHEN fr >= 2 AND fr > en AND fr > de AND fr >= es THEN 'fr'
  WHEN es >= 2 AND es > en AND es > de AND es > fr THEN 'es'
  ELSE 'other' END AS lang_guess
FROM s""",
        "quality_scores": rf"""WITH b AS (
  SELECT doc_id,
    length(regexp_extract_all(text, '\S+')) AS n_tokens,
    length(regexp_replace(text, '\s+', '', 'g')) AS total_len,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
    length(text) AS n_chars,
    len(list_filter(regexp_extract_all(text, '\S+'),
        x -> list_contains({_en_stop_list()}, lower(x)))) AS sw
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
    CASE WHEN n_tokens > 0 THEN total_len::DOUBLE / n_tokens
         ELSE 0.0 END AS mean_token_len,
    CASE WHEN n_chars > 0 THEN alpha::DOUBLE / n_chars
         ELSE 0.0 END AS alpha_ratio,
    CASE WHEN n_tokens > 0 THEN sw::DOUBLE / n_tokens
         ELSE 0.0 END AS stopword_ratio
  FROM b
)
SELECT doc_id, n_tokens,
  ROUND(mean_token_len, 6) AS mean_token_len,
  ROUND(alpha_ratio, 6) AS alpha_ratio,
  ROUND(stopword_ratio, 6) AS stopword_ratio,
  ROUND(0.4 * LEAST(n_tokens / 100.0, 1.0) + 0.4 * alpha_ratio
        + 0.2 * (stopword_ratio > 0)::INT, 6) AS quality
FROM c""",
        "clean_corpus": _clean_corpus_sql(threshold=0.5),
        "jaccard_sets_topk": _set_sim_sql("c / (sa.s + sb.s - c)", 0.4),
        "overlap_sets_topk": _set_sim_sql("c / LEAST(sa.s, sb.s)", 0.8),
        "mst_total_weight": _mst_sql(),
    }
