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
