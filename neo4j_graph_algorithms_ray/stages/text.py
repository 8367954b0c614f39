"""Vectorized text primitives for the training-data pipelines.

All functions are batch-level (pandas Series / numpy in, numpy out) so
``map_batches`` stages stay vectorized; per-row Python is confined to
C-speed pandas str ops and hashlib calls.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"[\w']+", re.UNICODE)

# tiny stopword lists for the n-gram/stopword language-ID heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "de": {"der", "die", "das", "und", "ist", "von", "nicht", "mit", "ein", "zu"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "de", "que", "y", "en", "un", "una", "es"},
}


def sha256_hex(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: hashlib.sha256(t.encode("utf-8")).hexdigest())


def token_count(texts: pd.Series) -> np.ndarray:
    return texts.str.count(r"\S+").to_numpy(np.int64)


def line_count(texts: pd.Series) -> np.ndarray:
    return (texts.str.count("\n") + 1).to_numpy(np.int64)


def quality_stats(texts: pd.Series) -> pd.DataFrame:
    """Heuristic quality signals: token count, mean token length,
    alpha ratio, stopword(en) ratio."""
    toks = texts.str.findall(_TOKEN_RE)
    n_tok = toks.str.len().to_numpy(np.int64)
    total_len = texts.str.replace(r"\s+", "", regex=True).str.len().to_numpy(np.int64)
    mean_tok = np.where(n_tok > 0, total_len / np.maximum(n_tok, 1), 0.0)
    alpha = texts.str.count(r"[A-Za-z]").to_numpy(np.int64)
    n_chars = texts.str.len().to_numpy(np.int64)
    alpha_ratio = np.where(n_chars > 0, alpha / np.maximum(n_chars, 1), 0.0)
    sw = _STOPWORDS["en"]
    sw_ratio = toks.map(
        lambda ws: sum(1 for w in ws if w.lower() in sw) / len(ws) if ws else 0.0
    ).to_numpy(np.float64)
    return pd.DataFrame(
        {
            "n_tokens": n_tok,
            "mean_token_len": mean_tok,
            "alpha_ratio": alpha_ratio,
            "stopword_ratio": sw_ratio,
        }
    )


def lang_id(texts: pd.Series) -> pd.Series:
    """Stopword-vote language guess (en/de/fr/es, else 'other')."""

    def guess(t: str) -> str:
        words = set(w.lower() for w in _WORD_RE.findall(t[:2000]))
        best, score = "other", 0
        for lang, sw in _STOPWORDS.items():
            s = len(words & sw)
            if s > score:
                best, score = lang, s
        return best if score >= 2 else "other"

    return texts.map(guess)


def fingerprint64(texts: pd.Series, ngram: int = 8) -> np.ndarray:
    """Deterministic document fingerprint: min over strided n-gram
    window hashes (a 1-perm minhash — stable under small shifts).

    The window hash is the big-endian first-8-bytes of sha256, chosen
    deliberately so an external SQL engine can recompute it
    (DuckDB: ``('0x' || substr(sha256(win), 1, 16))::UBIGINT``); the
    stride samples ≤ ~257 windows per document. Windows are byte
    offsets into the utf-8 encoding, which coincides with character
    offsets (and hence SQL ``substr``) for ASCII corpora.
    """

    def fp(t: str) -> int:
        b = t.encode("utf-8")
        if len(b) < ngram:
            h = hashlib.sha256(b).digest()
            return int.from_bytes(h[:8], "big") >> 1
        best = None
        for i in range(0, len(b) - ngram + 1, max(1, (len(b) - ngram) // 256 or 1)):
            h = int.from_bytes(hashlib.sha256(b[i : i + ngram]).digest()[:8], "big")
            if best is None or h < best:
                best = h
        return best >> 1

    return texts.map(fp).to_numpy(np.int64)
