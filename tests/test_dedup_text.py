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
