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


def minhash_signatures_batch(
    texts, num_perm: int = 64, k: int = 5, seed: int = 42
) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash matrix for a whole batch in one
    vectorized pass — bit-identical to stacking
    ``minhash_signature(char_shingles_u64(t, k), num_perm)`` per doc
    (property-tested), without the per-document Python loop that
    dominated the sketch stage: all docs' k-shingle rolling hashes are
    computed with k gathers against the batch's concatenated utf-8
    bytes, and each permutation's per-doc min is one segmented
    ``minimum.reduceat``. Duplicate shingles are NOT deduplicated —
    the min over a multiset equals the min over its set, so
    ``np.unique`` is pure overhead here.

    ``texts`` may be a pyarrow string array/chunked array (utf-8 bytes
    read straight off the Arrow buffers — no Python string round-trip)
    or any iterable of Python strings."""
    acc, seg, _counts, n = _batch_window_hashes(texts, k)
    a, b = _rng_params(num_perm, seed)
    if n == 0:
        return np.empty((0, num_perm), dtype=np.uint64)
    out = np.empty((num_perm, n), dtype=np.uint64)
    for j in range(num_perm):
        out[j] = np.minimum.reduceat(a[j] * acc + b[j], seg)
    return out.T.copy()


def _batch_window_hashes(texts, k: int):
    """All docs' k-shingle rolling hashes in one pass: k gathers
    against the batch's concatenated utf-8 bytes. Returns
    ``(acc, seg, counts, n)`` — the doc-major window-hash stream, the
    per-doc segment starts into it, windows per doc, and doc count.
    Shared by :func:`minhash_signatures_batch` (per-permutation
    segmented min) and :func:`char_shingle_sets_batch` (per-doc
    sorted-unique sets); bit-identical per doc to
    ``char_shingles_u64`` before its ``np.unique``."""
    import pyarrow as pa

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(texts, pa.Array):
        arr8, offs = _arrow_utf8_view(texts)
    else:
        bs = [t.encode("utf-8") for t in texts]
        offs = np.zeros(len(bs) + 1, dtype=np.int64)
        np.cumsum([len(b) for b in bs], out=offs[1:])
        arr8 = (
            np.frombuffer(b"".join(bs), dtype=np.uint8)
            if offs[-1]
            else np.zeros(0, dtype=np.uint8)
        )
    n = len(offs) - 1
    if n == 0:
        return (
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            0,
        )
    lens = np.diff(offs)
    counts = np.maximum(lens - k + 1, 1)  # short docs pad to ONE window
    seg = np.zeros(n, dtype=np.int64)  # acc segment starts per doc
    np.cumsum(counts[:-1], out=seg[1:])
    total = int(seg[-1] + counts[-1])
    acc = np.zeros(total, dtype=np.uint64)
    base = np.uint64(1099511628211)

    long_mask = lens >= k
    if long_mask.any():
        lc = counts[long_mask]
        # window positions in the source buffer, doc-major
        src = np.repeat(offs[:-1][long_mask], lc) + _ranges(lc)
        dst = np.repeat(seg[long_mask], lc) + _ranges(lc)
        av = np.zeros(len(src), dtype=np.uint64)
        for i in range(k):
            av = av * base + arr8[src + i].astype(np.uint64)
        acc[dst] = av
    if not long_mask.all():
        # short docs: gather their bytes into an (m, k) zero-padded
        # matrix (the \x00 padding of char_shingles_u64) and fold
        sl = lens[~long_mask]
        so = offs[:-1][~long_mask]
        pos = so[:, None] + np.arange(k)[None, :]
        valid = np.arange(k)[None, :] < sl[:, None]
        mat = np.zeros((len(sl), k), dtype=np.uint64)
        mat[valid] = arr8[pos[valid]]
        av = np.zeros(len(sl), dtype=np.uint64)
        for i in range(k):
            av = av * base + mat[:, i]
        acc[seg[~long_mask]] = av
    return acc, seg, counts, n


def char_shingle_sets_batch(texts, k: int = 5):
    """Per-doc SORTED-UNIQUE shingle sets for a whole batch — the
    batched form of ``char_shingles_u64`` (bit-identical per doc,
    property-tested): one rolling-hash pass over the concatenated
    utf-8 buffer, one (doc, value) lexsort, one adjacent-equal dedup.
    Returns ``(values, offsets)`` — the concatenated uint64 sets and
    int64 offsets (doc i's set is ``values[offsets[i]:offsets[i+1]]``)
    — ready to view as Arrow large_binary buffers with no per-doc
    Python."""
    acc, _seg, counts, n = _batch_window_hashes(texts, k)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    doc = np.repeat(np.arange(n, dtype=np.int64), counts)
    order = np.lexsort((acc, doc))
    acc, doc = acc[order], doc[order]
    keep = np.ones(len(acc), dtype=bool)
    keep[1:] = (acc[1:] != acc[:-1]) | (doc[1:] != doc[:-1])
    acc, doc = acc[keep], doc[keep]
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(doc, minlength=n), out=offsets[1:])
    return acc, offsets


def _ranges(counts: np.ndarray) -> np.ndarray:
    """concatenate([arange(c) for c in counts]) without the Python loop."""
    ends = np.cumsum(counts)
    return np.arange(ends[-1], dtype=np.int64) - np.repeat(ends - counts, counts)


def _arrow_utf8_view(arr) -> tuple[np.ndarray, np.ndarray]:
    """(uint8 values view, int64 offsets) of an Arrow string array —
    the utf-8 bytes ARE the Arrow buffer, so no per-row encode."""
    import pyarrow as pa

    if pa.types.is_large_string(arr.type):
        off_dt = np.int64
    elif pa.types.is_string(arr.type):
        off_dt = np.int32
    else:  # dictionary / other: fall back through Python strings
        return _arrow_utf8_view(arr.cast(pa.large_string()))
    buffers = arr.buffers()
    offs = np.frombuffer(buffers[1], dtype=off_dt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    vals = (
        np.frombuffer(buffers[2], dtype=np.uint8)
        if buffers[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return vals, offs


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


_MIX = np.uint64(0xFF51AFD7ED558CCD)  # splitmix64 finalizer multiplier


def lsh_band_matrix(sigs: np.ndarray, bands: int) -> np.ndarray:
    """Vectorized band hashes for a (n_docs, num_perm) signature matrix:
    per band, a splitmix-style fold of its signature rows — one numpy
    pass over the whole batch instead of n·bands blake2 calls."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    chunks = sigs[:, : bands * rows].reshape(n, bands, rows)
    h = np.full((n, bands), np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
    for r in range(rows):
        v = chunks[:, :, r]
        h = (h ^ v) * _MIX
        h ^= h >> np.uint64(33)
    return h


def signature_jaccard(s1: np.ndarray, s2: np.ndarray) -> float:
    return float((s1 == s2).mean())


# process-local token-hash memo: identical words recur massively across
# batches of the same corpus (natural-language vocabulary is tiny next
# to token count), so each map_batches worker hashes a word ONCE and
# reuses the uint64 across every batch it processes. Bounded so a
# pathological vocabulary can't grow the worker heap unboundedly.
_TOKEN_HASH_CACHE: dict = {}
_TOKEN_HASH_CACHE_MAX = 4_000_000


def _sha8_be(words: np.ndarray) -> np.ndarray:
    """uint64 = big-endian first 8 bytes of sha256(word), memoized.
    The ONLY per-item Python loop in the simhash path — and it runs
    over the batch's UNIQUE words, not every (doc, word) occurrence."""
    out = np.empty(len(words), dtype=np.uint64)
    cache = _TOKEN_HASH_CACHE
    grow = len(cache) < _TOKEN_HASH_CACHE_MAX
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            h = int.from_bytes(hashlib.sha256(w.encode("utf-8")).digest()[:8], "big")
            if grow:
                cache[w] = h
        out[i] = h
    return out


def simhash64(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash over word tokens (sign-aggregated), vectorized.

    Token hash = big-endian first 8 bytes of sha256 — deliberately
    SQL-recomputable as ``('0x'||substr(sha256(w),1,16))::UBIGINT`` so
    the simhash_groups driver oracle can recompute the sketch in
    DuckDB (same pattern as text_analysis.fingerprints).

    Shape: explode to distinct (doc, word) pairs (C-speed pandas),
    sha-hash only the batch-unique words (memoized), then one
    (pairs × 64) sign matrix folded per doc with a segmented
    ``reduceat`` — no per-document Python, identical output to the
    per-row definition ``sign-aggregate over set(t.split())``."""
    n = len(texts)
    if not n:
        return np.empty(0, dtype=np.int64)
    words = texts.str.split()
    counts = words.str.len().to_numpy(np.int64)
    out = np.zeros(n, dtype=np.int64)
    if not counts.sum():
        return out
    flat = np.concatenate([np.asarray(w, dtype=object) for w in words])
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    # distinct (doc, word) pairs — the set() in the scalar definition.
    # One object-dtype pass (factorize) then an integer unique on the
    # packed (doc, code) key: ~10x cheaper than an object-row
    # drop_duplicates over every token occurrence.
    codes, uniq_words = pd.factorize(flat, sort=False)
    packed_key = (doc_idx.astype(np.uint64) << np.uint64(32)) | codes.astype(
        np.uint64
    )
    up = np.unique(packed_key)
    d = (up >> np.uint64(32)).astype(np.int64)
    inv = (up & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h_pair = _sha8_be(np.asarray(uniq_words, dtype=object))[inv]
    # sign-vote fold per (doc, bit) WITHOUT a (pairs × 64) matrix:
    # acc_j(d) = 2·|{words with bit j}| − |words| > 0 ⇔ bit j set.
    # 64 C-speed bincounts beat an axis-0 reduceat by ~50x here.
    total = np.bincount(d, minlength=n).astype(np.float64)
    packed = np.zeros(n, dtype=np.uint64)
    for j in range(64):
        bitj = ((h_pair >> np.uint64(j)) & np.uint64(1)).astype(np.float64)
        cnt = np.bincount(d, weights=bitj, minlength=n)
        packed |= (2.0 * cnt > total).astype(np.uint64) << np.uint64(j)
    packed[total == 0] = 0  # wordless docs: old definition yields 0
    return (packed >> np.uint64(1)).astype(np.int64)


# byte-wise popcount lookup (numpy<2 has no np.bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized per-element popcount of a uint64 array."""
    x = np.ascontiguousarray(x.astype(np.uint64, copy=False))
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return popcount64(a.astype(np.uint64) ^ b.astype(np.uint64))
