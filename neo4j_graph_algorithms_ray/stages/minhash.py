"""MinHash / SimHash sketch primitives (vectorized numpy).

Shingling: character k-shingles hashed to uint64 via a fixed polynomial
rolling hash (deterministic across processes — no PYTHONHASHSEED
dependence). MinHash: k permutations approximated by k universal-hash
transforms ``(a*x + b) mod p`` over the shingle hashes. LSH: the
signature splits into bands; equal (band_id, band_hash) buckets are
near-dup candidates. SimHash: 64-bit sign-aggregate of token hashes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_P = np.uint64((1 << 61) - 1)  # Mersenne prime modulus


def _rng_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _P, size=num_perm, dtype=np.uint64)
    return a, b


def char_shingles_u64(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of the k-char shingles (deterministic, vectorized)."""
    b = text.encode("utf-8")
    if len(b) < k:
        b = b + b"\x00" * (k - len(b))
    arr = np.frombuffer(b, dtype=np.uint8)
    n = len(arr) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    base = np.uint64(1099511628211)
    for i in range(k):  # k is small (5): k vectorized passes
        acc = acc * base + arr[i : i + n].astype(np.uint64)
    return np.unique(acc)


def minhash_signature(shingles: np.ndarray, num_perm: int = 64, seed: int = 42) -> np.ndarray:
    a, b = _rng_params(num_perm, seed)
    if len(shingles) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (num_perm, n) universal hashes; modulo 2^61-1 via uint64 mul overflow-safe:
    # work in python-object-free uint64 with masking (approximation of mod p
    # is fine for min-comparisons as long as it is the SAME everywhere)
    x = shingles[None, :]
    h = (a[:, None] * x + b[:, None])  # wraps mod 2^64 — deterministic
    return h.min(axis=1)


def lsh_bands(sig: np.ndarray, bands: int = 8) -> np.ndarray:
    """Band hashes (uint64[bands]) of a signature."""
    rows = len(sig) // bands
    out = np.empty(bands, dtype=np.uint64)
    for i in range(bands):
        chunk = sig[i * rows : (i + 1) * rows]
        out[i] = int.from_bytes(
            hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "little"
        )
    return out


def signature_jaccard(s1: np.ndarray, s2: np.ndarray) -> float:
    return float((s1 == s2).mean())


def simhash64(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash over word tokens (blake2-hashed, sign-aggregated)."""

    def sh(t: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in set(t.split()):
            h = int.from_bytes(
                hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "little"
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        v = np.uint64(0)
        for i in np.flatnonzero(acc > 0):
            v |= np.uint64(1) << np.uint64(i)
        return int(v >> np.uint64(1))  # keep in int64 range for Arrow

    return texts.map(sh).to_numpy(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a ^ b).astype(np.uint64)
    cnt = np.zeros(len(x), dtype=np.int64)
    while x.any():
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt
