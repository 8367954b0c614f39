import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.dedup import (
    dedup_exact,
    minhash_lsh_neardup,
    ngram_jaccard_pairs,
    simhash_neardup,
)
from neo4j_graph_algorithms_ray.pipelines.text_analysis import (
    fingerprints,
    language_id,
    quality_scores,
    token_stats,
)
from neo4j_graph_algorithms_ray.stages.minhash import (
    char_shingles_u64,
    minhash_signature,
    signature_jaccard,
)


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(len(rows), dtype=np.int64),
                "text": rows,
            }
        )
    )


def test_dedup_exact_keeps_min_id():
    docs = _docs(["aaa", "bbb", "aaa", "ccc", "aaa", "bbb"])
    out = dedup_exact(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    expect = pd.DataFrame(
        {"doc_id": [0, 1, 3], "dup_count": [3, 2, 1]}, dtype="int64"
    )
    pd.testing.assert_frame_equal(out, expect)


def test_minhash_estimates_jaccard():
    a = char_shingles_u64("the quick brown fox jumps over the lazy dog" * 3)
    b = char_shingles_u64("the quick brown fox jumped over the lazy dog" * 3)
    c = char_shingles_u64("completely different content with no overlap at all")
    true_ab = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    est_ab = signature_jaccard(minhash_signature(a, 128), minhash_signature(b, 128))
    assert abs(true_ab - est_ab) < 0.15
    est_ac = signature_jaccard(minhash_signature(a, 128), minhash_signature(c, 128))
    assert est_ac < 0.1


def test_minhash_lsh_finds_neardups():
    base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    docs = _docs(
        [
            base,
            base.replace("quick", "fast"),  # near-dup of 0
            "unrelated document about ray data pipelines and arrow batches " * 5,
            base.replace("dog", "cat"),  # near-dup of 0
        ]
    )
    res = minhash_lsh_neardup(docs, threshold=0.5)
    groups = dict(zip(res.groups["doc_id"], res.groups["group_id"]))
    assert groups.get(1) == 0 and groups.get(3) == 0
    assert 2 not in groups  # unrelated doc in no group
    # exact n-gram verification agrees
    ver = ngram_jaccard_pairs(docs, res.pairs)
    assert (ver["jaccard"] > 0.5).all()


def test_neardup_single_task_and_shuffle_paths_agree(monkeypatch):
    import pandas as pd

    from neo4j_graph_algorithms_ray.pipelines import dedup as D

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    docs = _docs(
        [base, base.replace("quick", "fast"), "totally different text " * 8,
         base.replace("dog", "cat"), base]
    )
    small = minhash_lsh_neardup(docs, threshold=0.5)
    s_small = simhash_neardup(docs)
    monkeypatch.setattr(D, "_SINGLE_TASK_SCAN_MAX_DOCS", 0)
    big = D.minhash_lsh_neardup(docs, threshold=0.5)
    s_big = D.simhash_neardup(docs)
    pd.testing.assert_frame_equal(
        small.pairs, big.pairs.reset_index(drop=True), check_like=True
    )
    pd.testing.assert_frame_equal(
        small.groups, big.groups.reset_index(drop=True), check_like=True
    )
    pd.testing.assert_frame_equal(
        s_small.pairs, s_big.pairs.reset_index(drop=True), check_like=True
    )


def test_oversized_bucket_chains_stay_one_group():
    # a duplicate cluster LARGER than max_bucket must still come out as
    # one connected group (consecutive-chain pairs, not dropped)
    base = "the quick brown fox jumps over the lazy dog and runs away " * 5
    texts = [base] * 12 + ["completely different ray data arrow text " * 6]
    docs = _docs(texts)
    res = minhash_lsh_neardup(docs, threshold=0.5, max_bucket=4)
    groups = dict(zip(res.groups["doc_id"], res.groups["group_id"]))
    assert {groups.get(i) for i in range(12)} == {0}
    assert 12 not in groups
    # chain emits O(B) pairs per oversized bucket, far below all-pairs
    assert len(res.pairs) < 16 * 12 * 11 / 2
    s = simhash_neardup(docs, max_bucket=4)
    sg = dict(zip(s.groups["doc_id"], s.groups["group_id"]))
    assert {sg.get(i) for i in range(12)} == {0}


def test_simhash_neardup_exact_duplicates():
    docs = _docs(["hello world foo bar baz", "hello world foo bar baz", "zzz qqq"])
    res = simhash_neardup(docs)
    groups = dict(zip(res.groups["doc_id"], res.groups["group_id"]))
    assert groups.get(1) == 0


def test_token_stats_and_quality():
    docs = _docs(["one two  three\nfour", "", "single"])
    t = token_stats(docs).to_pandas().sort_values("doc_id")
    np.testing.assert_array_equal(t["n_tokens"].values, [4, 0, 1])
    np.testing.assert_array_equal(t["n_lines"].values, [2, 1, 1])
    q = quality_scores(docs).to_pandas().sort_values("doc_id")
    assert q["n_tokens"].tolist() == [4, 0, 1]
    assert (q["quality"] >= 0).all() and (q["quality"] <= 1).all()


def test_language_id_heuristic():
    docs = _docs(
        [
            "the cat is on the mat and it is happy for now",
            "der Hund ist nicht mit der Katze und das ist gut",
            "le chat est sur la table et il est content pour le moment",
            "el perro es un animal que vive en la casa y es feliz",
            "xyzzy plugh 12345",
        ]
    )
    out = language_id(docs).to_pandas().sort_values("doc_id")["lang_guess"].tolist()
    assert out == ["en", "de", "fr", "es", "other"]


def test_fingerprint_deterministic_and_shift_stable():
    docs1 = _docs(["abcdefghij" * 10, "zzzz" * 30])
    docs2 = _docs(["abcdefghij" * 10, "zzzz" * 30])
    f1 = fingerprints(docs1).to_pandas()["fingerprint"]
    f2 = fingerprints(docs2).to_pandas()["fingerprint"]
    pd.testing.assert_series_equal(f1, f2)


def test_repetition_stats_hand_checked():
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import repetition_stats

    docs = _docs(
        [
            "a b a b a",          # 5 words, 2 distinct, top word a=3, top bigram "a b"=2 of 4
            "x y z",              # no repetition
            "w",                  # single word, no bigrams
        ]
    )
    out = repetition_stats(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["n_words"].tolist() == [5, 3, 1]
    assert out["dup_word_frac"].tolist() == [0.6, 0.0, 0.0]
    assert out["top_word_frac"].tolist() == [0.6, round(1 / 3, 6), 1.0]
    assert out["top_bigram_frac"].tolist() == [0.5, 0.5, 0.0]


def test_top_ngrams_counts_and_order():
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import top_ngrams

    docs = _docs(["a b a b c", "a b x", "q r"])
    out = top_ngrams(docs, k=3).to_pandas()
    assert out.iloc[0].tolist() == ["a b", 3]
    # ties broken by ngram ascending
    assert out["cnt"].is_monotonic_decreasing
    assert len(out) == 3


def test_stratified_sample_cap_and_determinism():
    from neo4j_graph_algorithms_ray.pipelines.sampling import (
        _sample_hash,
        stratified_sample,
    )

    n = 100
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["t"] * n,
            "lang": ["en" if i % 3 else "fr" for i in range(n)],
        }
    )
    docs = rd.from_pandas(df).repartition(7)  # selection must not depend on blocking
    out = stratified_sample(docs, cap=10).to_pandas().sort_values("doc_id")
    assert (out.groupby("lang").size() == 10).all()
    # matches the SQL ROW_NUMBER definition exactly
    df["hv"] = _sample_hash(df["doc_id"].to_numpy())
    expect = (
        df.sort_values(["hv", "doc_id"]).groupby("lang").head(10)["doc_id"]
    )
    assert set(out["doc_id"]) == set(expect)


def test_decontaminate_flags_exact_ngram_overlap():
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import decontaminate

    bench = _docs(["q1 q2 q3 q4 q5 q6 q7 q8 tail"])
    corpus = _docs(
        [
            "x q1 q2 q3 q4 q5 q6 q7 q8 y",   # contains the benchmark 8-gram
            "q1 q2 q3 q4 q5 q6 q7 other",    # only a 7-gram prefix: clean
            "a b c",                          # shorter than n: zero ngrams
        ]
    )
    out = (
        decontaminate(corpus, bench, n=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_ngrams"].tolist() == [3, 1, 0]
    assert out["n_contaminated"].tolist() == [1, 0, 0]
    assert out["contaminated"].tolist() == [1, 0, 0]


def test_pii_scrub_masks_and_counts():
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import pii_scrub

    docs = _docs(
        [
            "mail a@b.io and c.d@e.org now",
            "go to https://x.y/z?a=1 then http://p.q",
            "host 10.0.0.1 dials 555-123-4567 twice 555.123.4567",
            "clean text only",
        ]
    )
    out = pii_scrub(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["text"].tolist() == [
        "mail [EMAIL] and [EMAIL] now",
        "go to [URL] then [URL]",
        "host [IP] dials [PHONE] twice [PHONE]",
        "clean text only",
    ]
    assert out["n_email"].tolist() == [2, 0, 0, 0]
    assert out["n_url"].tolist() == [0, 2, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 0, 1, 0]
    assert out["n_phone"].tolist() == [0, 0, 2, 0]


def test_pack_sequences_prefix_sum_across_blocks():
    from neo4j_graph_algorithms_ray.pipelines.packing import pack_sequences

    rng = np.random.default_rng(5)
    n = 300
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    # shuffle rows and split across many blocks: the layout must not
    # depend on input blocking or order
    docs = rd.from_pandas(df.sample(frac=1, random_state=3)).repartition(11)
    out = (
        pack_sequences(docs, budget=64, bucket_bits=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ntok = np.array([t.count(" ") + 1 for t in texts], dtype=np.int64)
    expect_off = np.cumsum(ntok) - ntok
    np.testing.assert_array_equal(out["n_tokens"].to_numpy(), ntok)
    np.testing.assert_array_equal(out["tok_offset"].to_numpy(), expect_off)
    np.testing.assert_array_equal(out["bin_id"].to_numpy(), expect_off // 64)
    np.testing.assert_array_equal(out["bin_pos"].to_numpy(), expect_off % 64)


def test_rebalance_weights_power_law():
    from neo4j_graph_algorithms_ray.pipelines.sampling import rebalance_weights

    n = 100
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["t"] * n,
            "lang": ["en"] * 75 + ["fr"] * 25,
        }
    )
    out = (
        rebalance_weights(rd.from_pandas(df).repartition(5), alpha=0.5)
        .to_pandas()
        .groupby("lang")["weight"]
        .agg(["min", "max"])
    )
    # (n_s/N)^(alpha-1): en -> 0.75^-0.5, fr -> 0.25^-0.5 = 2.0
    assert out.loc["fr", "min"] == out.loc["fr", "max"] == 2.0
    expect_en = round(0.75 ** -0.5, 6)
    assert abs(out.loc["en", "min"] - expect_en) < 2e-6
    assert out.loc["en", "min"] == out.loc["en", "max"]


def test_wrap_lines_rewraps_word_stream():
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import wrap_lines

    docs = _docs(["a b c d e", "x y"])
    out = wrap_lines(docs, words_per_line=2).to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == ["a b\nc d\ne", "x y"]


def test_line_dedup_keeps_first_occurrence_globally():
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import line_dedup

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": np.array([0, 1, 2], dtype=np.int64),
                # doc0: A,B ; doc1: B,C,B ; doc2: A (all dup -> empty)
                "text": ["A\nB", "B\nC\nB", "A"],
            }
        )
    )
    out = line_dedup(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["text"].tolist() == ["A\nB", "C", ""]
    assert out["n_kept"].tolist() == [2, 1, 0]
    assert out["n_dropped"].tolist() == [0, 2, 1]


def test_tfidf_scores_and_topk():
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import tfidf_top_terms

    docs = _docs(["a a b", "a c", "c d"])
    out = (
        tfidf_top_terms(docs, k=2)
        .to_pandas()
        .sort_values(["doc_id", "score", "word"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    n = 3.0

    def s(tf, df):
        return np.floor(tf * np.log((n + 1) / (df + 1)) * 1e6 + 0.5) / 1e6

    # doc0: a(tf2,df2)=2*ln(4/3), b(tf1,df1)=ln(2)
    d0 = out[out.doc_id == 0]
    assert d0.word.tolist() == ["b", "a"]
    assert d0.score.tolist() == [s(1, 1), s(2, 2)]
    assert len(out[out.doc_id == 1]) == 2
    assert (out.groupby("doc_id").size() <= 2).all()


def test_token_length_percentiles_exact_order_stats():
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import (
        token_length_percentiles,
    )

    docs = _docs(["a", "a b", "a b c", "a b c d"])
    t = token_length_percentiles(docs).to_pandas().set_index("stat")["value"]
    assert t["n_docs"] == 4
    assert t["p25"] == 1 and t["p50"] == 2 and t["p75"] == 3 and t["p100"] == 4
    assert t["p1"] == 1  # rank ceil(0.04)=1 -> smallest


def test_source_profile_groups_and_means():
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import source_profile

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(4, dtype=np.int64),
                "text": ["a b", "a b c d", "x", "y z"],
                "lang": ["en", "de", "en", "en"],
                "source": ["s1", "s1", "s2", "s2"],
            }
        )
    )
    out = source_profile(docs).to_pandas().sort_values("source").reset_index(drop=True)
    assert out.n_docs.tolist() == [2, 2]
    assert out.n_langs.tolist() == [2, 1]
    assert out.total_tokens.tolist() == [6, 3]
    assert out.mean_tokens.tolist() == [3.0, 1.5]


def test_dedup_keep_canonical_longest_survives():
    from neo4j_graph_algorithms_ray.pipelines.dedup import dedup_keep_canonical

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    docs = _docs(
        [
            base,                             # 0: member, same len as 1? no: see 1
            base.replace("quick", "fast"),    # 1: near-dup, SHORTER by 1 char
            "unrelated document about ray data pipelines and arrow batches " * 5,
            base.replace("dog", "dogg"),      # 3: near-dup, LONGER by 5 chars
        ]
    )
    out = (
        dedup_keep_canonical(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # group {0,1,3}: doc 3 is longest -> canonical; 2 untouched singleton
    assert out["doc_id"].tolist() == [2, 3]
    assert out.set_index("doc_id")["group_size"].to_dict() == {2: 1, 3: 3}


def test_dedup_keep_canonical_engines_agree():
    """The distributed keyed-exchange selection must emit exactly the
    driver engine's rows (forced on a small corpus: many dup groups of
    varied sizes + tie-breaking on equal lengths + singletons)."""
    from neo4j_graph_algorithms_ray.pipelines.dedup import dedup_keep_canonical

    rng = __import__("numpy").random.default_rng(3)
    texts = []
    base_words = [f"tok{i}" for i in range(40)]
    for gid in range(12):
        base = " ".join(rng.choice(base_words, size=60).tolist()) + f" group{gid} " * 4
        texts.append(base * 3)
        for k in range(int(rng.integers(0, 4))):
            # near-dup variants: same text, small suffix tweaks so
            # lengths differ (and one exact-length tie per group)
            suffix = " x" * k if k else ""
            texts.append(base * 3 + suffix)
    for s in range(10):
        texts.append(f"completely unrelated singleton number {s} " * 8 + "q" * s)
    docs = _docs(texts)
    a = (
        dedup_keep_canonical(docs, mode="driver")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dedup_keep_canonical(docs, mode="distributed")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["group_size"] >= 1).all() and len(a) <= len(texts)


def test_hll_distinct_words_accuracy_and_exact_bitmath():
    from neo4j_graph_algorithms_ray.pipelines.sketches import (
        _bit_length_u64,
        hll_distinct_words,
        word_hash_u64,
    )

    # exact bit_length vs python int.bit_length
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 1 << 54, size=1000, dtype=np.uint64)
    np.testing.assert_array_equal(
        _bit_length_u64(xs), [int(x).bit_length() for x in xs]
    )
    # word hash matches a scalar reference implementation
    B, M = 1099511628211, 1 << 64

    def mix(x):
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) % M
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) % M
        x ^= x >> 31
        return x

    for w in ["a", "hello", "x" * 40, "tokens"]:
        poly = sum(b * pow(B, j, M) for j, b in enumerate(w.encode()[:32])) % M
        assert int(word_hash_u64(np.array([w], object))[0]) == mix(poly)
    # estimate accuracy: 5000 distinct words, sigma ~ 3.2% at p=10
    vocab = [f"w{i:05d}" for i in range(5000)]
    texts = [" ".join(vocab[i * 50 : (i + 1) * 50]) for i in range(100)]
    docs = _docs(texts)
    t = hll_distinct_words(docs).to_pandas().set_index("stat")["value"]
    assert abs(t["hll_estimate"] - 5000) / 5000 < 0.15


def test_cms_never_undercounts_and_finds_heavy_hitters():
    from neo4j_graph_algorithms_ray.pipelines.sketches import cms_top_words

    # heavy hitter "zipf0" (500x), mid "zipf1" (50x), long tail
    texts = [" ".join(["zipf0"] * 5 + ["zipf1"] + [f"tail{i}_{j}" for j in range(3)]) for i in range(100)]
    out = cms_top_words(_docs(texts), k=5).to_pandas().set_index("word")["est_count"]
    assert out.index[0] == "zipf0" and out.iloc[0] >= 500  # CM upper bound
    assert out.index[1] == "zipf1" and out.iloc[1] >= 100
    # with 302 distinct words in 4x2048 counters, collisions are rare:
    # estimates should be close to exact
    assert out.iloc[0] <= 520 and out.iloc[1] <= 120


def test_weighted_sample_deterministic_and_rate_scaled():
    from neo4j_graph_algorithms_ray.pipelines.sampling import weighted_sample

    n = 2000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["t"] * n,
            # 90% en / 10% fr: temperature sampling must keep fr at a
            # HIGHER rate than en
            "lang": ["en" if i % 10 else "fr" for i in range(n)],
        }
    )
    docs = rd.from_pandas(df).repartition(5)
    out = weighted_sample(docs, alpha=0.3, scale=0.5).to_pandas()
    rates = out.groupby("lang").size() / df.groupby("lang").size()
    assert rates["fr"] > rates["en"] > 0.3
    # deterministic: same selection on re-run and independent of blocking
    out2 = weighted_sample(rd.from_pandas(df), alpha=0.3, scale=0.5).to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_unigram_logloss_rare_words_score_higher():
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import unigram_logloss

    # "common" appears 20x, "rare" once: doc of rare words must score
    # a higher logloss than a doc of common words
    docs = _docs(["common " * 10 + "common", "rare common", "common common"])
    out = unigram_logloss(docs).to_pandas().set_index("doc_id")
    assert out.loc[1, "logloss"] > out.loc[2, "logloss"]
    assert out.loc[0, "n_words"] == 11
    # hand check doc 2: both words 'common', p = cnt/total
    total = 11 + 2 + 2
    import numpy as np

    cnt_common = 14
    expect = -np.log(cnt_common / total)
    assert abs(out.loc[2, "logloss"] - round(expect, 6)) < 2e-6


def test_dedup_against_prior_anti_join():
    from neo4j_graph_algorithms_ray.pipelines.dedup import dedup_against

    new = _docs(["aaa", "bbb", "ccc", "bbb"])          # ids 0..3
    prior = _docs(["bbb", "zzz"])                      # "bbb" already ingested
    out = (
        dedup_against(new, prior)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # both copies of "bbb" are dropped; within-new dup handling is
    # dedup_exact's job, not this operator's
    assert out["doc_id"].tolist() == [0, 2]


def test_neardup_dataset_native_groups_path_agrees(monkeypatch):
    # force BOTH scale gates to zero: the banded scan runs through the
    # hash-repartition path and group assembly through the
    # Dataset-native cc_pairs_dataset kernel (pairs_ds/groups_ds with
    # no driver union-find) — results must match the default path.
    import pandas as pd

    from neo4j_graph_algorithms_ray.pipelines import dedup as D

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    docs = _docs(
        [base, base.replace("quick", "fast"), "totally different text " * 8,
         base.replace("dog", "cat"), base, base.replace("lazy", "sleepy")]
    )
    small = minhash_lsh_neardup(docs, threshold=0.5)
    monkeypatch.setattr(D, "_SINGLE_TASK_SCAN_MAX_DOCS", 0)
    monkeypatch.setattr(D, "_DRIVER_UNIONFIND_MAX_PAIRS", 0)
    big = D.minhash_lsh_neardup(docs, threshold=0.5)
    assert big._groups is None  # Dataset-native until first .groups access
    pd.testing.assert_frame_equal(
        small.pairs, big.pairs.reset_index(drop=True), check_like=True
    )
    pd.testing.assert_frame_equal(
        small.groups, big.groups.reset_index(drop=True), check_like=True
    )


def test_keep_canonical_gate_boundary_engines_agree(monkeypatch):
    # pin the auto engine switch AT the gate boundary: the same corpus
    # run with the gate exactly at n (driver path) and at n-1
    # (distributed path) must emit identical survivor tables.
    import pandas as pd

    from neo4j_graph_algorithms_ray.pipelines import dedup as D

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    texts = [base, base.replace("quick", "fast"), "other text entirely " * 8,
             base + " longer tail", base.replace("dog", "cat"), "short one"]
    docs = _docs(texts)
    n = len(texts)

    def run():
        return (
            D.dedup_keep_canonical(docs, threshold=0.5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    monkeypatch.setattr(D, "_SINGLE_TASK_SCAN_MAX_DOCS", n)  # ≤ gate → driver
    at_gate = run()
    monkeypatch.setattr(D, "_SINGLE_TASK_SCAN_MAX_DOCS", n - 1)  # > gate → distributed
    above_gate = run()
    pd.testing.assert_frame_equal(at_gate, above_gate)
    # and the fully Dataset-native group path (no driver union-find)
    monkeypatch.setattr(D, "_DRIVER_UNIONFIND_MAX_PAIRS", 0)
    native = run()
    pd.testing.assert_frame_equal(at_gate, native)


def test_minhash_signatures_batch_matches_perdoc():
    # the batched kernel must be BIT-identical to the per-doc
    # definition (min over (a*shingle+b) mod 2^64) for every input
    # shape: empty, shorter-than-k (zero-padded), unicode, long,
    # and both Arrow string encodings (the zero-copy buffer path)
    from neo4j_graph_algorithms_ray.stages.minhash import (
        char_shingles_u64,
        minhash_signature,
        minhash_signatures_batch,
    )

    texts = ["", "ab", "abcde", "the quick brown fox " * 9,
             "ünïcodé tèxt ø∂ƒ", "x" * 300, "word " * 50]
    want = np.stack([minhash_signature(char_shingles_u64(t), 64) for t in texts])
    assert np.array_equal(want, minhash_signatures_batch(texts, 64))
    assert np.array_equal(
        want, minhash_signatures_batch(pa.array(texts, pa.string()), 64)
    )
    assert np.array_equal(
        want, minhash_signatures_batch(pa.array(texts, pa.large_string()), 64)
    )
    # sliced array: offsets don't start at 0
    sl = pa.array(["pad", "pad2"] + texts).slice(2)
    assert np.array_equal(want, minhash_signatures_batch(sl, 64))
    # chunked: the combine_chunks path
    ch = pa.chunked_array([pa.array(texts[:3]), pa.array(texts[3:])])
    assert np.array_equal(want, minhash_signatures_batch(ch, 64))


def test_char_shingle_sets_batch_matches_perdoc():
    # the batched set kernel must be BIT-identical to char_shingles_u64
    # (sorted-unique per doc) for every input shape, including the
    # Arrow buffer paths and sliced/chunked arrays
    from neo4j_graph_algorithms_ray.stages.minhash import (
        char_shingle_sets_batch,
        char_shingles_u64,
    )

    texts = ["", "ab", "abcde", "the quick brown fox " * 9,
             "ünïcodé tèxt ø∂ƒ", "x" * 300, "word " * 50]
    want = [char_shingles_u64(t) for t in texts]

    def check(arg):
        vals, offs = char_shingle_sets_batch(arg)
        assert len(offs) == len(texts) + 1
        for i, w in enumerate(want):
            np.testing.assert_array_equal(vals[offs[i] : offs[i + 1]], w)

    check(texts)
    check(pa.array(texts, pa.string()))
    check(pa.array(texts, pa.large_string()))
    check(pa.array(["pad", "pad2"] + texts).slice(2))
    check(pa.chunked_array([pa.array(texts[:3]), pa.array(texts[3:])]))
    # empty batch
    v, o = char_shingle_sets_batch([])
    assert len(v) == 0 and o.tolist() == [0]


def test_ngram_containment_doc_in_doc():
    import pandas as pd

    short = "the quick brown fox jumps over the lazy dog"
    long = ("completely different preamble text here. " + short
            + " and a long unrelated suffix about arrow batches " * 4)
    docs = _docs([short, long, "nothing in common with either text"])
    cand = pd.DataFrame({"doc_a": [0, 0], "doc_b": [1, 2]})
    cont = ngram_jaccard_pairs(docs, cand, metric="containment")
    by = dict(zip(cont["doc_b"], cont["containment"]))
    jac = ngram_jaccard_pairs(docs, cand)
    jby = dict(zip(jac["doc_b"], jac["jaccard"]))
    # short doc fully embedded in long: containment ~1, jaccard low
    assert by[1] > 0.95
    assert jby[1] < 0.5
    assert by[2] < 0.1
    # unknown metric rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ngram_jaccard_pairs(docs, cand, metric="dice")


def test_bloom_dedup_one_sided_vs_exact():
    """Bloom incremental dedup: every kept doc is guaranteed new
    (kept ⊆ exact anti-join's kept at ANY filter size), planted prior
    duplicates are always dropped, and at the default sizing the
    result equals the exact op on this corpus."""
    import ray.data as rd

    from neo4j_graph_algorithms_ray.pipelines.dedup import (
        bloom_dedup_against,
        dedup_against,
    )

    texts = [f"document body number {i} with unique content" for i in range(60)]
    prior_texts = [texts[i] for i in range(0, 60, 4)] + [
        f"retired doc {j}" for j in range(10)
    ]
    docs = rd.from_arrow(
        pa.table({"doc_id": np.arange(60, dtype=np.int64), "text": texts})
    )
    prior = rd.from_arrow(
        pa.table(
            {"doc_id": np.arange(1000, 1000 + len(prior_texts), dtype=np.int64),
             "text": prior_texts}
        )
    )
    exact = set(dedup_against(docs, prior).to_pandas()["doc_id"])
    kept = set(
        bloom_dedup_against(docs, prior, bits=1 << 16, hashes=4)
        .to_pandas()["doc_id"]
    )
    assert kept == exact  # negligible FP odds at this sizing
    # tiny filter: false positives may drop extra docs, never keep dups
    tiny = set(
        bloom_dedup_against(docs, prior, bits=64, hashes=2)
        .to_pandas()["doc_id"]
    )
    assert tiny <= exact
    # planted prior duplicates (ids 0,4,8,...) never survive
    assert not (set(range(0, 60, 4)) & kept)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bloom_dedup_against(docs, prior, bits=100)  # not a power of two
