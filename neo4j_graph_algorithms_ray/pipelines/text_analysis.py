"""Text-analysis pipelines over a documents table: token counting,
quality scoring, language ID, fingerprinting (training-data operators)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..stages.text import (
    fingerprint64,
    lang_id,
    line_count,
    quality_stats,
    token_count,
)


def token_stats(docs: "rd.Dataset", id_col="doc_id", text_col="text") -> "rd.Dataset":
    """(doc_id, n_tokens, n_lines)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df[id_col].to_numpy(np.int64),
                "n_tokens": token_count(df[text_col]),
                "n_lines": line_count(df[text_col]),
            }
        )

    return docs.map_batches(f, batch_format="pandas")


def quality_scores(docs: "rd.Dataset", id_col="doc_id", text_col="text") -> "rd.Dataset":
    """(doc_id, n_tokens, mean_token_len, alpha_ratio, stopword_ratio,
    quality) — quality is a simple monotone blend of the signals."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_stats(df[text_col])
        q.insert(0, "doc_id", df[id_col].to_numpy(np.int64))
        length_ok = np.clip(q["n_tokens"] / 100.0, 0, 1)
        q["quality"] = (
            0.4 * length_ok + 0.4 * q["alpha_ratio"] + 0.2 * (q["stopword_ratio"] > 0)
        )
        return q

    return docs.map_batches(f, batch_format="pandas")


def language_id(docs: "rd.Dataset", id_col="doc_id", text_col="text") -> "rd.Dataset":
    """(doc_id, lang_guess) — stopword-vote heuristic."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df[id_col].to_numpy(np.int64),
                "lang_guess": lang_id(df[text_col]),
            }
        )

    return docs.map_batches(f, batch_format="pandas")


def fingerprints(docs: "rd.Dataset", id_col="doc_id", text_col="text") -> "rd.Dataset":
    """(doc_id, fingerprint) — rolling n-gram min-hash document print."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df[id_col].to_numpy(np.int64),
                "fingerprint": fingerprint64(df[text_col]),
            }
        )

    return docs.map_batches(f, batch_format="pandas")


def clean_corpus(
    docs: "rd.Dataset",
    quality_threshold: float = 0.5,
    langs: tuple = ("en", "de", "fr", "es"),
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> "rd.Dataset":
    """Composite training-data cleaning pipeline — the chained form of
    the individual operators, as one streamed pass:

      1. language filter: declared ``lang_col`` must be in ``langs``
         (the stopword-vote ``lang_id`` guess is carried along as a
         feature column — on natural text it backs a consistency
         filter, but the cut is on the declared label),
      2. quality filter: composite quality score ≥ ``quality_threshold``
         (score rounded half-away to 6 decimals BEFORE comparing, so
         the cut is bit-identical to a SQL recomputation),
      3. exact dedup: sha256 content buckets, keeper = min doc id.

    Filters 1–2 are batch-local (per-doc features, no data movement);
    only survivors enter the single sha-bucketed dedup exchange, so the
    shuffle carries the cleaned subset, not the raw corpus. Returns
    ``(doc_id, lang_guess, quality, n_tokens, dup_count)`` for keeper
    docs. dup_count counts the keeper's exact-duplicate group WITHIN
    the filtered set.
    """
    from ..stages.text import sha256_hex
    from ..state.partitioning import shuffle_width, source_size_bytes

    thr = float(quality_threshold)

    def feature_filter(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_stats(df[text_col])
        length_ok = np.clip(q["n_tokens"] / 100.0, 0, 1)
        quality = (
            0.4 * length_ok + 0.4 * q["alpha_ratio"] + 0.2 * (q["stopword_ratio"] > 0)
        ).to_numpy(np.float64)
        # DuckDB ROUND half-away semantics (see quality_scores oracle)
        quality = np.floor(quality * 1e6 + 0.5) / 1e6
        guess = lang_id(df[text_col]).to_numpy()
        keep = df[lang_col].isin(langs).to_numpy() & (quality >= thr)
        out = pd.DataFrame(
            {
                "doc_id": df[id_col].to_numpy(np.int64),
                "sha": sha256_hex(df[text_col]),
                "lang_guess": guess,
                "quality": quality,
                "n_tokens": q["n_tokens"].to_numpy(np.int64),
            }
        )
        return out[keep].reset_index(drop=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sha", "doc_id"], kind="stable")
        first = ~df["sha"].duplicated()
        sizes = df.groupby("sha", sort=False)["doc_id"].transform("size")
        out = df[first].copy()
        out["dup_count"] = sizes[first].to_numpy(np.int64)
        return out.drop(columns=["sha"]).reset_index(drop=True)

    return (
        docs.map_batches(feature_filter, batch_format="pandas")
        .repartition(shuffle_width(source_size_bytes(docs)), keys=["sha"])
        .map_batches(fold, batch_format="pandas", batch_size=None)
    )
