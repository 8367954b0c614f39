"""Text-analysis pipelines over a documents table: token counting,
quality scoring, language ID, fingerprinting (training-data operators)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
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


def chunk_documents(
    docs: "rd.Dataset",
    chunk_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """(doc_id, chunk_id, text, n_tokens): split each document into
    whitespace-token chunks of ``chunk_tokens`` with ``overlap`` tokens
    of left context repeated between consecutive chunks — the
    context-window prep step upstream of sequence packing. Chunk j
    covers token positions [j*stride, j*stride + chunk_tokens), stride
    = chunk_tokens - overlap; chunks are emitted until one reaches the
    end of the document (the final chunk may be short; no redundant
    fully-contained trailing chunk; empty docs produce no rows).
    Chunk text re-joins tokens with a single space — the pinned,
    SQL-reproducible semantics (original inter-token whitespace is not
    preserved; the oracle recomputes every chunk with the same rule).

    Embarrassingly parallel: one ``map_batches``, no shuffle; each
    token is replicated to at most ceil(chunk_tokens/stride) chunks
    via one vectorized repeat/filter — no per-chunk Python slicing."""
    if not (0 <= overlap < chunk_tokens):
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    def f(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": np.empty(0, np.int64),
                "chunk_id": np.empty(0, np.int64),
                "text": pd.Series([], dtype=object),
                "n_tokens": np.empty(0, np.int64),
            }
        )
        if not len(df):
            return empty
        toks = df[text_col].str.split()
        nt = toks.map(len).to_numpy(np.int64)
        total = int(nt.sum())
        if total == 0:
            return empty
        doc_ids = df[id_col].to_numpy(np.int64)
        # chunks per doc: emit until a chunk reaches the end
        nch = np.where(
            nt > 0,
            1 + (np.maximum(nt - chunk_tokens, 0) + stride - 1) // stride,
            0,
        )
        flat = toks.explode()
        flat = flat[flat.notna()]  # explode of an empty token list -> NaN row
        tok_vals = flat.to_numpy()
        ridx = np.repeat(np.arange(len(df)), nt)  # doc row per token
        starts = np.cumsum(nt) - nt
        pos = np.arange(total) - np.repeat(starts, nt)  # token pos in doc
        # chunk-id range [j_lo, j_hi] each token lands in
        j_hi = np.minimum(pos // stride, nch[ridx] - 1)
        j_lo = np.maximum((pos - chunk_tokens) // stride + 1, 0)
        reps = j_hi - j_lo + 1
        out_n = int(reps.sum())
        tok_row = np.repeat(np.arange(total), reps)
        k = np.arange(out_n) - np.repeat(np.cumsum(reps) - reps, reps)
        out_j = np.repeat(j_lo, reps) + k
        out_r = ridx[tok_row]
        order = np.lexsort((pos[tok_row], out_j, out_r))
        g = pd.DataFrame(
            {
                "r": out_r[order],
                "j": out_j[order],
                "tok": tok_vals[tok_row[order]],
            }
        )
        gb = g.groupby(["r", "j"], sort=False)
        res = gb["tok"].agg(" ".join).reset_index()
        res["n"] = gb["tok"].size().to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": doc_ids[res["r"].to_numpy(np.int64)],
                "chunk_id": res["j"].to_numpy(np.int64),
                "text": res["tok"],
                "n_tokens": res["n"].to_numpy(np.int64),
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


def repetition_stats(
    docs: "rd.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "rd.Dataset":
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1 repetition filters): per doc —

      n_words          words (single-space split, mirrors SQL
                       ``string_split(text, ' ')`` exactly),
      dup_word_frac    fraction of word occurrences that are repeats
                       (1 − distinct/total),
      top_word_frac    most-frequent word count / total words,
      top_bigram_frac  most-frequent word-bigram count / (total − 1).

    Fractions rounded half-away to 6 decimals (DuckDB ROUND parity).
    Entirely batch-local: one exploded (doc, word) frame per batch
    folded by C-level pandas groupbys — no shuffle, no per-row Python.
    """

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        if not len(ids):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_words": pd.Series([], dtype="int64"),
                    "dup_word_frac": pd.Series([], dtype="float64"),
                    "top_word_frac": pd.Series([], dtype="float64"),
                    "top_bigram_frac": pd.Series([], dtype="float64"),
                }
            )
        words = df[text_col].str.split(" ")
        counts = words.str.len().to_numpy(np.int64)
        drep = np.repeat(np.arange(len(ids)), counts)
        allw = np.concatenate([np.asarray(w, dtype=object) for w in words])
        wc = (
            pd.DataFrame({"d": drep, "w": allw})
            .groupby(["d", "w"], sort=False)
            .size()
        )
        g = wc.groupby(level=0, sort=False)
        distinct = np.zeros(len(ids), dtype=np.int64)
        maxc = np.zeros(len(ids), dtype=np.int64)
        distinct[g.size().index] = g.size().to_numpy()
        maxc[g.max().index] = g.max().to_numpy()
        # consecutive bigrams: shift-by-one pairs within the same doc
        same = drep[:-1] == drep[1:]
        maxbg = np.zeros(len(ids), dtype=np.int64)
        if same.any():
            bg = (
                pd.Series(allw[:-1][same]).str.cat(
                    pd.Series(allw[1:][same]), sep=" "
                )
            )
            bc = (
                pd.DataFrame({"d": drep[:-1][same], "b": bg.to_numpy()})
                .groupby(["d", "b"], sort=False)
                .size()
            )
            bm = bc.groupby(level=0, sort=False).max()
            maxbg[bm.index] = bm.to_numpy()
        nw = np.maximum(counts, 1)

        def r6(x: np.ndarray) -> np.ndarray:
            return np.floor(x * 1e6 + 0.5) / 1e6

        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_words": counts,
                "dup_word_frac": r6((counts - distinct) / nw),
                "top_word_frac": r6(maxc / nw),
                "top_bigram_frac": r6(maxbg / np.maximum(counts - 1, 1)),
            }
        )

    return docs.map_batches(f, batch_format="pandas")


def top_ngrams(
    docs: "rd.Dataset",
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Corpus-wide top-k word bigrams (vocabulary/phrase-frequency
    builder). Per-batch PARTIAL counts (pandas groupby — the shuffle
    carries one row per distinct bigram per batch, not one per
    occurrence) → ``groupby(ngram).sum`` → sort (count desc, ngram
    asc) → limit k. The final sorted table is k rows; everything wide
    stays pre-aggregated."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"ngram": pd.Series([], dtype="object"),
             "cnt": pd.Series([], dtype="int64")}
        )
        if not len(df):
            return empty
        words = df[text_col].str.split(" ")
        counts = words.str.len().to_numpy(np.int64)
        drep = np.repeat(np.arange(len(df)), counts)
        allw = np.concatenate([np.asarray(w, dtype=object) for w in words])
        same = drep[:-1] == drep[1:]
        if not same.any():
            return empty
        bg = pd.Series(allw[:-1][same]).str.cat(
            pd.Series(allw[1:][same]), sep=" "
        )
        out = bg.value_counts(sort=False).reset_index()
        out.columns = ["ngram", "cnt"]
        return out.astype({"cnt": "int64"})

    from ..state.partitioning import (
        keyed_repartition,
        shuffle_width,
        source_size_bytes,
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("ngram", as_index=False)["cnt"].sum().astype({"cnt": "int64"})

    # final sum via the house repartition+fold exchange — Ray's
    # groupby().sum() HashAggregate carries multi-second fixed overhead
    agg = keyed_repartition(
        docs.map_batches(partial, batch_format="pandas"),
        shuffle_width(source_size_bytes(docs)),
        ["ngram"],
    ).map_batches(fold, batch_format="pandas", batch_size=None)
    return agg.sort(["cnt", "ngram"], descending=[True, False]).limit(k)


def _ngram_hashes(df: pd.DataFrame, text_col: str, n: int):
    """Per-batch word n-gram extraction: returns (doc_index_per_ngram,
    uint64 hash per n-gram, n_words per doc). Single-space split to
    mirror SQL ``string_split(text, ' ')``; the hash is pandas'
    fixed-key siphash (process-independent, vectorized)."""
    words = df[text_col].str.split(" ")
    counts = words.str.len().to_numpy(np.int64)
    if not counts.sum():
        return np.empty(0, np.int64), np.empty(0, np.uint64), counts
    drep = np.repeat(np.arange(len(df)), counts)
    allw = np.concatenate([np.asarray(w, dtype=object) for w in words])
    m = len(allw) - (n - 1)
    if m <= 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64), counts
    # a window is a real n-gram only if it stays inside one doc
    ok = drep[: m] == drep[n - 1 :]
    s = pd.Series(allw[:m][ok])
    for k in range(1, n):
        s = s.str.cat(pd.Series(allw[k : m + k][ok]), sep=" ")
    return drep[:m][ok], pd.util.hash_array(s.to_numpy()), counts


def decontaminate(
    docs: "rd.Dataset",
    benchmark: "rd.Dataset",
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Benchmark decontamination (the GPT-3 appendix-C / Gopher n-gram
    overlap filter): flag training docs sharing any word ``n``-gram
    with an evaluation ``benchmark`` corpus. Emits one row per corpus
    doc: ``(doc_id, n_ngrams, n_contaminated, contaminated)`` where
    ``n_contaminated`` counts n-gram POSITIONS that hit the benchmark
    set and ``contaminated`` is the 0/1 cut (any hit).

    Dataflow: the benchmark side is small by definition (eval sets are
    thousands of docs, not terabytes), so its distinct n-gram hashes
    are folded per batch, uniqued, and broadcast once via ``ray.put``;
    the corpus side streams through one ``map_batches`` doing a
    ``searchsorted`` membership probe — no shuffle touches the corpus.
    64-bit hash collisions are the usual negligible caveat.
    """
    bench_sorted = np.unique(
        np.concatenate(
            [
                b["h"].to_numpy(np.uint64)
                for b in benchmark.map_batches(
                    lambda df: pd.DataFrame(
                        {"h": np.unique(_ngram_hashes(df, text_col, n)[1])}
                    ),
                    batch_format="pandas",
                ).iter_batches(batch_format="pandas")
            ]
            or [np.empty(0, np.uint64)]
        )
    )
    bench_ref = ray.put(bench_sorted)

    def probe(df: pd.DataFrame, _b=bench_ref) -> pd.DataFrame:
        bench = ray.get(_b)
        drep, h, counts = _ngram_hashes(df, text_col, n)
        member = np.zeros(len(h), dtype=bool)
        if len(h) and len(bench):
            pos = np.searchsorted(bench, h)
            inb = pos < len(bench)
            member[inb] = bench[pos[inb]] == h[inb]
        hits = np.bincount(drep, weights=member, minlength=len(df)).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df[id_col].to_numpy(np.int64),
                "n_ngrams": np.maximum(counts - (n - 1), 0),
                "n_contaminated": hits,
                "contaminated": (hits > 0).astype(np.int64),
            }
        )

    return docs.map_batches(probe, batch_format="pandas")


# masks applied in this fixed order (URL first so its userinfo@host
# form is not half-eaten by the email pass); RE2-compatible so the
# DuckDB regexp_replace oracle runs the identical patterns
PII_PATTERNS = (
    ("url", r"https?://[^ ]+", "[URL]"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
)


def pii_scrub(
    docs: "rd.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "rd.Dataset":
    """PII masking pass for training-data curation: replaces URLs,
    emails, IPv4 addresses and phone numbers with typed mask tokens and
    counts each category. Emits ``(doc_id, text, n_url, n_email,
    n_ipv4, n_phone)``. Pure batch-local vectorized ``str.replace`` /
    ``str.count`` — streams, no shuffle. Patterns are anchored to the
    RE2 subset so the SQL oracle (`regexp_replace(..., 'g')`) is
    bit-identical."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"doc_id": df[id_col].to_numpy(np.int64)})
        text = df[text_col]
        for name, pat, repl in PII_PATTERNS:
            out[f"n_{name}"] = text.str.count(pat).to_numpy(np.int64)
            text = text.str.replace(pat, repl, regex=True)
        out.insert(1, "text", text.to_numpy())
        return out

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
    from ..state.partitioning import (
        keyed_repartition,
        shuffle_width,
        source_size_bytes,
    )

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

    return keyed_repartition(
        docs.map_batches(feature_filter, batch_format="pandas"),
        shuffle_width(source_size_bytes(docs)),
        ["sha"],
    ).map_batches(fold, batch_format="pandas", batch_size=None)


def wrap_lines(
    docs: "rd.Dataset",
    words_per_line: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Deterministic re-chunking: re-wrap each doc's single-space word
    stream into fixed-width lines of ``words_per_line`` words joined by
    ``\\n`` — the unit-builder in front of line/span-level dedup (and
    the SQL-mirrorable stand-in for sentence splitting, which needs a
    language model the container doesn't have). Pure batch-local; the
    per-doc chunk join is irreducibly string assembly (cost = output
    bytes, same as any tokenizer)."""
    w = int(words_per_line)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        texts = [
            "\n".join(
                " ".join(ws[i : i + w]) for i in range(0, len(ws), w)
            )
            for ws in df[text_col].str.split(" ")
        ]
        return pd.DataFrame(
            {"doc_id": df[id_col].to_numpy(np.int64), "text": texts}
        )

    return docs.map_batches(f, batch_format="pandas")


def line_dedup(
    docs: "rd.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "rd.Dataset":
    """C4-style corpus-GLOBAL duplicate-line removal (Raffel et al.
    2020 §2.2 discard-all-but-one): every line that occurs anywhere
    else in the corpus keeps only its first occurrence, ordered by
    ``(doc_id, line_no)``; docs are re-assembled from their surviving
    lines. Emits ``(doc_id, text, n_kept, n_dropped)`` — text is ''
    when every line of a doc was seen earlier.

    Dataflow — the canonical two-exchange plan, nothing driver-side:

      1. explode to ``(doc_id, line_no, line, h)`` rows (h = siphash of
         the line, the shuffle key — fixed 8 bytes instead of re-hashing
         arbitrary-length strings at every exchange boundary);
      2. hash repartition on ``h``: all occurrences of a line co-locate;
         the block fold marks the (doc_id, line_no)-min occurrence of
         each exact line (group by the full string, so hash collisions
         cannot merge distinct lines) with a keep flag;
      3. hash repartition on ``doc_id``: each doc's flagged lines
         co-locate; the fold re-joins kept lines in line_no order.

    Both exchanges carry the line table once — inherent to a global
    dedup (some shuffle must see every pair of equal lines).
    """
    from ..state.partitioning import (
        keyed_repartition,
        shuffle_width,
        source_size_bytes,
    )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        lines = df[text_col].str.split("\n")
        counts = lines.str.len().to_numpy(np.int64)
        total = int(counts.sum())
        drep = np.repeat(df[id_col].to_numpy(np.int64), counts)
        alll = (
            np.concatenate([np.asarray(x, dtype=object) for x in lines])
            if total
            else np.empty(0, object)
        )
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        line_no = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        return pd.DataFrame(
            {
                "doc_id": drep,
                "line_no": line_no,
                "line": alll,
                "h": pd.util.hash_array(alll).astype(np.int64)
                if total
                else np.empty(0, np.int64),
            }
        )

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        # sort by the int64 hash, not the string (equal lines share h,
        # so within the frame order the first occurrence of each
        # distinct line — duplicated() is order-respecting — is its
        # (doc_id, line_no)-min); dropped lines ship an EMPTY string
        # through the doc exchange (reassembly joins kept lines only,
        # drops only need the flag), so exchange 2 carries string
        # bytes ∝ surviving text, not corpus text
        df = df.sort_values(["h", "doc_id", "line_no"], kind="stable")
        keep = (~df["line"].duplicated()).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "line_no": df["line_no"].to_numpy(np.int64),
                "line": np.where(keep, df["line"].to_numpy(), ""),
                "keep": keep,
            }
        )

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "text": pd.Series([], dtype="object"),
                    "n_kept": pd.Series([], dtype="int64"),
                    "n_dropped": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values(["doc_id", "line_no"], kind="stable")
        g = df.groupby("doc_id", sort=True)
        kept = df[df["keep"]].groupby("doc_id", sort=True)["line"].agg("\n".join)
        n_kept = g["keep"].sum().astype(np.int64)
        n_tot = g.size().astype(np.int64)
        ids = n_tot.index.to_numpy(np.int64)
        text = kept.reindex(n_tot.index, fill_value="").to_numpy()
        return pd.DataFrame(
            {
                "doc_id": ids,
                "text": text,
                "n_kept": n_kept.to_numpy(),
                "n_dropped": (n_tot - n_kept).to_numpy(),
            }
        )

    width = shuffle_width(source_size_bytes(docs))
    marked = keyed_repartition(
        docs.map_batches(explode, batch_format="pandas"), width, ["h"]
    ).map_batches(mark, batch_format="pandas", batch_size=None)
    return keyed_repartition(marked, width, ["doc_id"]).map_batches(
        reassemble, batch_format="pandas", batch_size=None
    )


def _tf_explode(id_col: str, text_col: str):
    """Batch fn: docs → exploded ``(doc_id, word, tf)`` Arrow table,
    one row per (doc, word) — shared by the TF-IDF and unigram-LM
    pipelines (each doc lives in exactly one input row, so the pair
    key is globally unique without any exchange)."""
    import pyarrow as pa

    def tf_explode(df: pd.DataFrame) -> pa.Table:
        words = df[text_col].str.split(" ")
        counts = words.str.len().to_numpy(np.int64)
        if not counts.sum():
            return pa.table(
                {
                    "doc_id": np.empty(0, np.int64),
                    "word": pa.array([], pa.string()),
                    "tf": np.empty(0, np.int64),
                }
            )
        drep = np.repeat(df[id_col].to_numpy(np.int64), counts)
        allw = np.concatenate([np.asarray(x, dtype=object) for x in words])
        out = (
            pd.DataFrame({"doc_id": drep, "word": allw})
            .groupby(["doc_id", "word"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        return pa.table(
            {
                "doc_id": out["doc_id"].to_numpy(np.int64),
                "word": pa.array(out["word"], pa.string()),
                "tf": out["tf"].to_numpy(np.int64),
            }
        )

    return tf_explode


def tfidf_top_terms(
    docs: "rd.Dataset",
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Per-doc top-k TF-IDF keywords: ``(doc_id, word, tf, score)``
    with ``score = round(tf * ln((N+1)/(df+1)), 6)``, ties broken
    (score desc, word asc) — the classic smoothed-idf keyword
    extractor, the relevance-scoring step of data-selection recipes
    (DSIR-style importance weighting runs on exactly these features).

    Dataflow (single-tokenize): the exploded ``(doc_id, word, tf)``
    table — one row per (doc, word), so DF is a plain row count per
    word — is tokenized ONCE and hash-repartitioned on ``word``. Each
    word is then BLOCK-COMPLETE, so df is a block-local group size and
    the separate DF aggregate + tagged-union join of the old plan (and
    its second tokenize pass) don't exist. Scores are computed in the
    word blocks and pruned to the per-(block, doc) top-k before the
    doc exchange — the global per-doc top-k under the (score desc,
    word asc) total order is contained in the union of per-block
    top-ks — so the second exchange carries ≤ k·width rows per doc,
    not the doc's full vocabulary. N comes from parquet metadata
    (count of a read-rooted plan), not an extra scan. Width is sized
    from the input bytes (the exploded table is the same order of
    magnitude as the text; post-shuffle work is linear).
    """
    from ..state.partitioning import (
        keyed_repartition,
        shuffle_width,
        source_size_bytes,
    )

    width = shuffle_width(source_size_bytes(docs))
    n_docs = docs.count()

    tf = docs.map_batches(_tf_explode(id_col, text_col), batch_format="pandas")

    def score_block(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "word": pd.Series([], dtype=object),
                    "tf": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        dfreq = (
            df.groupby("word", sort=False)["doc_id"]
            .transform("size")
            .to_numpy(np.float64)
        )
        score = np.floor(
            df["tf"].to_numpy(np.float64)
            * np.log((n_docs + 1.0) / (dfreq + 1.0))
            * 1e6
            + 0.5
        ) / 1e6
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "word": df["word"].to_numpy(),
                "tf": df["tf"].to_numpy(np.int64),
                "score": score,
            }
        )
        out = out.sort_values(
            ["doc_id", "score", "word"],
            ascending=[True, False, True],
            kind="stable",
        )
        return out.groupby("doc_id", sort=False).head(k).reset_index(drop=True)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(
            ["doc_id", "score", "word"],
            ascending=[True, False, True],
            kind="stable",
        )
        return out.groupby("doc_id", sort=False).head(k).reset_index(drop=True)

    scored = keyed_repartition(tf, width, ["word"]).map_batches(
        score_block, batch_format="pandas", batch_size=None
    )
    return keyed_repartition(scored, width, ["doc_id"]).map_batches(
        topk, batch_format="pandas", batch_size=None
    )


def token_length_percentiles(docs: "rd.Dataset", text_col: str = "text") -> "pa.Table":
    """Corpus token-length distribution: ``(stat, value)`` rows —
    ``n_docs`` plus the discrete order-statistic percentiles
    p1/p5/.../p100 of per-doc whitespace token counts (same percentile
    definition as :mod:`stats` — smallest value of rank ≥ ceil(q·n/100)).

    Token counts are small integers, so the exact distribution folds as
    an integer histogram: one streamed pass emits per-batch
    ``(n_tokens, count)`` partials; the driver holds one counter per
    DISTINCT length (bounded by the longest doc, never by corpus
    size) — exact percentiles with no distributed sort."""
    import pyarrow as pa

    from ..pipelines.stats import _QS

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v, c = np.unique(token_count(df[text_col]), return_counts=True)
        return pd.DataFrame({"n_tokens": v.astype(np.int64), "cnt": c.astype(np.int64)})

    hist: dict[int, int] = {}
    for b in docs.map_batches(partial, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        for v, c in zip(b["n_tokens"].to_numpy(), b["cnt"].to_numpy()):
            hist[int(v)] = hist.get(int(v), 0) + int(c)
    lens = np.array(sorted(hist), dtype=np.int64)
    counts = np.array([hist[int(v)] for v in lens], dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    stats = ["n_docs"]
    vals = [n]
    for q in _QS:
        rank = max(1, int(np.ceil(q * n / 100.0)))
        idx = int(np.searchsorted(cum, rank))
        stats.append(f"p{q}")
        vals.append(int(lens[min(idx, len(lens) - 1)]) if n else 0)
    return pa.table({"stat": stats, "value": np.asarray(vals, dtype=np.int64)})


def source_profile(
    docs: "rd.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> "rd.Dataset":
    """Per-source corpus profile — the curation dashboard every corpus
    intake runs: ``(source, n_docs, n_langs, total_tokens, mean_tokens,
    mean_chars)``, means rounded half-away to 6 decimals. Map-side
    partials are pre-aggregated per (source, lang) — a tiny table at
    any corpus size — then one single-block fold of the partials; no
    doc-level rows cross the exchange. The fold input is bounded by
    #sources × #langs × #map-tasks rows regardless of corpus bytes, so
    one block (not a per-CPU hash exchange) is the right width at any
    scale."""
    from ..state.partitioning import keyed_repartition

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {
                "source": df[source_col],
                "lang": df[lang_col],
                "tok": token_count(df[text_col]),
                "chars": df[text_col].str.len().to_numpy(np.int64),
            }
        )
        out = t.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("tok", "size"), tok=("tok", "sum"), chars=("chars", "sum")
        )
        return out.astype({"n_docs": "int64", "tok": "int64", "chars": "int64"})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=True)
        n = g["n_docs"].sum().astype(np.float64)
        tok = g["tok"].sum().astype(np.int64)
        chars = g["chars"].sum().astype(np.int64)

        def r6(x):
            return np.floor(x * 1e6 + 0.5) / 1e6

        return pd.DataFrame(
            {
                "source": n.index,
                "n_docs": n.to_numpy(np.int64),
                "n_langs": g["lang"].nunique().to_numpy(np.int64),
                "total_tokens": tok.to_numpy(),
                "mean_tokens": r6(tok.to_numpy() / n.to_numpy()),
                "mean_chars": r6(chars.to_numpy() / n.to_numpy()),
            }
        ).reset_index(drop=True)

    return keyed_repartition(
        docs.map_batches(partial, batch_format="pandas"), 1, ["source"]
    ).map_batches(fold, batch_format="pandas", batch_size=None)


def unigram_logloss(
    docs: "rd.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Corpus-adaptive LM quality score (the CCNet recipe's perplexity
    filter, with the honest in-sandbox model — a unigram LM trained on
    the corpus itself; KenLM is not in the container): per doc,
    ``(doc_id, n_words, logloss)`` where logloss is the average
    negative log-probability ``Σ tf·(-ln(cnt_w / total)) / Σ tf``
    rounded half-away to 6 — unusual-vocabulary docs score high, and
    thresholding it is the standard head/middle/tail split.

    Same single-tokenize dataflow as :func:`tfidf_top_terms` (the LM
    *is* a word-count table too big to broadcast at corpus scale): the
    exploded ``(doc_id, word, tf)`` table hash-repartitions on
    ``word``, which makes each word block-complete — the LM count
    ``cnt_w`` is a block-local group sum, so no separate count
    aggregate, tagged union, or second tokenize pass exists. The word
    blocks emit per-(block, doc) partial ``(Σtf, Σnll)`` rows — O(docs
    × width), not O(doc vocabulary) — and one exchange on doc_id folds
    the per-doc average.
    """
    from ..state.partitioning import (
        keyed_repartition,
        shuffle_width,
        source_size_bytes,
    )

    width = shuffle_width(source_size_bytes(docs))
    # total corpus words: pre-aggregated per batch, folded as a scalar
    total = float(
        sum(
            b["n"].sum()
            for b in docs.map_batches(
                lambda d: pd.DataFrame({"n": [int(token_count(d[text_col]).sum())]}),
                batch_format="pandas",
            ).iter_batches(batch_format="pandas")
        )
    )

    tf = docs.map_batches(_tf_explode(id_col, text_col), batch_format="pandas")

    def nll_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "tf": pd.Series([], dtype="int64"),
                    "nll": pd.Series([], dtype="float64"),
                }
            )
        cnt = (
            df.groupby("word", sort=False)["tf"]
            .transform("sum")
            .to_numpy(np.float64)
        )
        nll = df["tf"].to_numpy(np.float64) * -np.log(cnt / total)
        g = (
            pd.DataFrame(
                {"doc_id": df["doc_id"].to_numpy(np.int64), "tf": df["tf"], "nll": nll}
            )
            .groupby("doc_id", as_index=False, sort=False)
            .agg(tf=("tf", "sum"), nll=("nll", "sum"))
        )
        return g[["doc_id", "tf", "nll"]]

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_words": pd.Series([], dtype="int64"),
                    "logloss": pd.Series([], dtype="float64"),
                }
            )
        g = df.groupby("doc_id", sort=True).agg(
            n_words=("tf", "sum"), nll=("nll", "sum")
        )
        return pd.DataFrame(
            {
                "doc_id": g.index.to_numpy(np.int64),
                "n_words": g["n_words"].to_numpy(np.int64),
                "logloss": np.floor(
                    g["nll"].to_numpy() / np.maximum(g["n_words"].to_numpy(), 1) * 1e6
                    + 0.5
                )
                / 1e6,
            }
        )

    partials = keyed_repartition(tf, width, ["word"]).map_batches(
        nll_partial, batch_format="pandas", batch_size=None
    )
    return keyed_repartition(partials, width, ["doc_id"]).map_batches(
        fold, batch_format="pandas", batch_size=None
    )
