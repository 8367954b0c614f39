"""Property-based parity: the temporal joins vs DuckDB on randomized
small inputs — ties on (key, time), duplicate rows, unmatched rows,
and multi-block layouts are all exercised by the generator. Few
examples (each spins real Ray pipelines), unbounded deadline."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),   # user: few keys -> collisions
        st.integers(min_value=0, max_value=9),   # t: small domain -> exact ties
        st.integers(min_value=1, max_value=99),  # payload
    ),
    min_size=1,
    max_size=12,
)


def _ds(df: pd.DataFrame, blocks: int = 3):
    return rd.from_pandas(df).repartition(blocks)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(l=rows, r=rows)
def test_asof_join_matches_duckdb(ray_session, l, r):
    from neo4j_graph_algorithms_ray.pipelines.joins import asof_join

    left = pd.DataFrame(l, columns=["u", "t", "a"]).astype(np.int64)
    # pre-aggregate the right side (the documented well-defined-asof
    # contract: one row per (key, time), ties resolved to MAX payload)
    right = (
        pd.DataFrame(r, columns=["u", "t", "w"])
        .astype(np.int64)
        .groupby(["u", "t"], as_index=False)["w"]
        .max()
    )
    out = (
        asof_join(_ds(left), _ds(right), on="t", by="u",
                  left_cols=["a"], right_cols=["w"])
        .to_pandas()
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.sql(
        """SELECT l.u, l.t, l.a, r.w FROM l
           ASOF JOIN r ON l.u = r.u AND l.t >= r.t"""
    ).df().astype(np.int64).sort_values(["u", "t", "a", "w"]).reset_index(drop=True)
    # left-side columns keep their declared int64 dtype (bit-exact at
    # any magnitude); only the nullable right payload promotes
    for c in ("u", "t", "a"):
        assert out[c].dtype == np.int64, (c, out[c].dtype)
    matched = out[out["w"].notna()] if "w" in out.columns else out
    if not len(want):
        assert not len(matched)
        return
    got = (
        matched.astype({c: "int64" for c in ("u", "t", "a", "w")})
        .sort_values(["u", "t", "a", "w"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["u", "t", "a", "w"]], want)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(l=rows, r=rows)
def test_interval_join_matches_duckdb(ray_session, l, r):
    from neo4j_graph_algorithms_ray.pipelines.joins import interval_join

    left = pd.DataFrame(l, columns=["u", "t", "a"]).astype(np.int64)
    right = pd.DataFrame(r, columns=["u", "s", "w"]).astype(np.int64)
    right["e"] = right["s"] + (right["w"] % 4)  # intervals of length 0..3
    out_ds = interval_join(_ds(left), _ds(right), on="t", by="u", start="s",
                           end="e", left_cols=["a"], right_cols=["w"])
    out = out_ds.to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = (
        con.sql(
            """SELECT l.u, l.t, l.a, r.s, r.e, r.w FROM l
               JOIN r ON l.u = r.u AND l.t BETWEEN r.s AND r.e"""
        )
        .df()
        .astype(np.int64)
        .sort_values(["u", "t", "a", "s", "w"])
        .reset_index(drop=True)
    )
    if not len(want):
        # fully-empty result: Ray's Dataset.to_pandas() yields NO
        # batches, so the pandas frame is column-less by Ray design;
        # the schema contract is still visible at the Dataset level.
        assert not len(out)
        sch = out_ds.schema()
        assert dict(zip(sch.names, map(str, sch.types))) == {
            c: "int64" for c in ("u", "t", "a", "s", "e", "w")
        }
        return
    # inner join: every declared-int64 column must COME BACK int64
    # (regression: the tagged-union fold used to promote to float64)
    for c in ("u", "t", "a", "s", "e", "w"):
        assert out[c].dtype == np.int64, (c, out[c].dtype)
    got = (
        out.sort_values(["u", "t", "a", "s", "w"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["u", "t", "a", "s", "e", "w"]], want)


def test_joins_exact_above_2_53(ray_session):
    """ids/timestamps > 2^53 survive both joins bit-exactly (they would
    round if any stage carried them through float64)."""
    from neo4j_graph_algorithms_ray.pipelines.joins import asof_join, interval_join

    big = 2**60 + 12345
    left = pd.DataFrame(
        {"k": [1, 1, 2], "t": np.array([10, 20, 5], np.int64),
         "lid": np.array([big, big + 1, big + 2], np.int64)}
    )
    right = pd.DataFrame(
        {"k": [1, 2], "t": np.array([8, 100], np.int64),
         "rpay": np.array([7, 9], np.int64)}
    )
    out = (
        asof_join(_ds(left), _ds(right), on="t", by="k",
                  left_cols=["lid"], right_cols=["rpay"])
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    assert out["lid"].tolist() == [big, big + 1, big + 2]
    assert out["lid"].dtype == np.int64
    r2 = pd.DataFrame(
        {"k": [1], "s": np.array([5], np.int64), "e": np.array([25], np.int64),
         "rp": np.array([big + 7], np.int64)}
    )
    o2 = (
        interval_join(_ds(left), _ds(r2), on="t", by="k", start="s", end="e",
                      left_cols=["lid"], right_cols=["rp"])
        .to_pandas().sort_values("t").reset_index(drop=True)
    )
    assert o2["rp"].tolist() == [big + 7, big + 7]
    assert o2["lid"].tolist() == [big, big + 1]
    assert all(o2[c].dtype == np.int64 for c in ("k", "t", "lid", "s", "e", "rp"))


texts = st.lists(
    st.lists(
        st.sampled_from(["A", "B", "C", "dup line", "x y"]),
        min_size=1,
        max_size=5,
    ).map("\n".join),
    min_size=1,
    max_size=10,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(t=texts)
def test_line_dedup_matches_duckdb_rownumber(ray_session, t):
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import line_dedup

    docs = pd.DataFrame(
        {"doc_id": np.arange(len(t), dtype=np.int64), "text": t}
    )
    out = (
        line_dedup(_ds(docs, 2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(
        """WITH ln AS (
  SELECT doc_id, (i - 1)::BIGINT AS line_no, l[i] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS l,
               unnest(generate_series(1, len(string_split(text, chr(10))))) AS i
        FROM documents)
), rk AS (
  SELECT doc_id, line_no, line,
         ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
  FROM ln)
SELECT doc_id,
  COALESCE(string_agg(line, chr(10) ORDER BY line_no) FILTER (WHERE rn = 1), '') AS text,
  (COUNT(*) FILTER (WHERE rn = 1))::BIGINT AS n_kept,
  (COUNT(*) FILTER (WHERE rn > 1))::BIGINT AS n_dropped
FROM rk GROUP BY doc_id ORDER BY doc_id"""
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["doc_id", "text", "n_kept", "n_dropped"]], want, check_dtype=False
    )


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    toks=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=20),
    budget=st.integers(min_value=1, max_value=8),
)
def test_pack_sequences_matches_window_cumsum(ray_session, toks, budget):
    from neo4j_graph_algorithms_ray.pipelines.packing import pack_sequences

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(toks), dtype=np.int64),
            "text": [" ".join(["w"] * n) if n else "" for n in toks],
        }
    )
    out = (
        pack_sequences(_ds(docs, 3), budget=budget)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = np.array(toks, dtype=np.int64)
    off = np.concatenate([[0], np.cumsum(n)[:-1]])
    np.testing.assert_array_equal(out["n_tokens"].to_numpy(), n)
    np.testing.assert_array_equal(out["tok_offset"].to_numpy(), off)
    np.testing.assert_array_equal(out["bin_id"].to_numpy(), off // budget)
    np.testing.assert_array_equal(out["bin_pos"].to_numpy(), off % budget)


edges_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(e=edges_st)
def test_wcc_matches_duckdb_on_random_graphs(ray_session, e):
    from neo4j_graph_algorithms_ray.pipelines.components import wcc
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    src = np.array([a for a, _ in e], dtype=np.int64)
    dst = np.array([b for _, b in e], dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)
    res = wcc(g)
    got = dict(zip(g.vids.tolist(), res.components.tolist()))
    con = duckdb.connect()
    con.register("edges", pd.DataFrame({"src": src, "dst": dst}))
    want = con.sql(
        """WITH RECURSIVE vertices AS (
  SELECT DISTINCT v FROM (SELECT src AS v FROM edges UNION SELECT dst FROM edges)
), und AS (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges),
lbl AS (
  SELECT v AS vid, v AS label FROM vertices
  UNION
  SELECT u.b AS vid, l.label FROM lbl l JOIN und u ON u.a = l.vid
)
SELECT vid, MIN(label) AS c FROM lbl GROUP BY vid"""
    ).df()
    assert got == dict(zip(want["vid"].tolist(), want["c"].tolist()))


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(e=edges_st)
def test_triangle_count_matches_duckdb_on_random_graphs(ray_session, e):
    from neo4j_graph_algorithms_ray.pipelines.triangles import triangle_count
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    src = np.array([a for a, _ in e], dtype=np.int64)
    dst = np.array([b for _, b in e], dtype=np.int64)
    keep = src != dst  # canonical undirected graph: no self-loops
    if not keep.any():
        return
    g = GraphTables.from_arrays(src[keep], dst[keep])
    got = triangle_count(g).triangle_count
    con = duckdb.connect()
    con.register("edges", pd.DataFrame({"src": src[keep], "dst": dst[keep]}))
    want = con.sql(
        """WITH und AS (
  SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM edges
  WHERE src <> dst GROUP BY 1, 2
)
SELECT COUNT(*) FROM und e1
JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v"""
    ).fetchone()[0]
    assert got == want, (got, want)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(e=edges_st)
def test_scc_matches_duckdb_on_random_digraphs(ray_session, e):
    from neo4j_graph_algorithms_ray.pipelines.components import scc
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    src = np.array([a for a, _ in e], dtype=np.int64)
    dst = np.array([b for _, b in e], dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)
    res = scc(g)
    got = dict(zip(g.vids.tolist(), res.components.tolist()))
    con = duckdb.connect()
    con.register("edges", pd.DataFrame({"src": src, "dst": dst}))
    want = con.sql(
        """WITH RECURSIVE vertices AS (
  SELECT DISTINCT v FROM (SELECT src AS v FROM edges UNION SELECT dst FROM edges)
), reach AS (
  SELECT v AS s, v AS t FROM vertices
  UNION
  SELECT r.s, e.dst FROM reach r JOIN edges e ON e.src = r.t
)
SELECT a.s AS vid, MIN(a.t) AS c
FROM reach a JOIN reach b ON b.s = a.t AND b.t = a.s
GROUP BY a.s"""
    ).df()
    assert got == dict(zip(want["vid"].tolist(), want["c"].tolist()))


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(e=edges_st)
def test_pagerank_matches_dense_recurrence_on_random_graphs(ray_session, e):
    from neo4j_graph_algorithms_ray.pipelines.pagerank import PageRankConfig, pagerank
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    src = np.array([a for a, _ in e], dtype=np.int64)
    dst = np.array([b for _, b in e], dtype=np.int64)
    g = GraphTables.from_arrays(src, dst)
    res = pagerank(g, PageRankConfig(fixed_iterations=5))
    # dense reference recurrence (the pinned unnormalized semantics:
    # per-node base (1-d) with NO 1/n normalization, dangling mass
    # NOT redistributed)
    n = g.n
    vid_to_i = {v: i for i, v in enumerate(g.vids.tolist())}
    out_deg = np.zeros(n)
    for a in src:
        out_deg[vid_to_i[a]] += 1
    r = np.full(n, 1.0 - 0.85)
    for _ in range(5):
        contrib = np.zeros(n)
        for a, b in zip(src, dst):
            ia, ib = vid_to_i[a], vid_to_i[b]
            contrib[ib] += r[ia] / out_deg[ia]
        r = (1 - 0.85) + 0.85 * contrib
    np.testing.assert_allclose(res.ranks, r, atol=1e-12)


events_st = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # user
        st.integers(min_value=0, max_value=8),            # second
        st.sampled_from(["view", "click", "purchase", "noise"]),
    ),
    min_size=1,
    max_size=15,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(e=events_st)
def test_funnel_matches_duckdb_chained_min_after(ray_session, e):
    from neo4j_graph_algorithms_ray.pipelines.windows import funnel

    ev = pd.DataFrame(
        {
            "user_id": np.array([r[0] for r in e], dtype=np.int64),
            "ts": pd.to_datetime([f"2024-01-01 00:00:{r[1]:02d}" for r in e]),
            "event_type": [r[2] for r in e],
        }
    )
    out = funnel(_ds(ev), steps=["view", "click", "purchase"]).to_pandas()
    con = duckdb.connect()
    con.register("events", ev)
    want = con.sql(
        """WITH base AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
), s1 AS (
  SELECT user_id, MIN(epoch_us(ts))::BIGINT AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts))::BIGINT AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1 GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts))::BIGINT AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2 GROUP BY e.user_id
)
SELECT b.user_id,
  (CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS steps_completed,
  (t3 IS NOT NULL)::BIGINT AS converted,
  COALESCE(t3 - t1, -1)::BIGINT AS time_to_convert_us
FROM base b LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id) ORDER BY user_id"""
    ).df().reset_index(drop=True)
    if not len(want):
        assert not len(out)
        return
    out = out.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=30, unique=True
    ),
    cap=st.integers(min_value=1, max_value=5),
)
def test_stratified_sample_matches_duckdb_rownumber(ray_session, ids, cap):
    from neo4j_graph_algorithms_ray.pipelines.sampling import stratified_sample

    docs = pd.DataFrame(
        {
            "doc_id": np.array(ids, dtype=np.int64),
            "text": ["t"] * len(ids),
            "lang": ["ab"[i % 2] for i in ids],
        }
    )
    out = (
        stratified_sample(_ds(docs), cap=cap)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(
        f"""WITH h AS (
  SELECT doc_id, lang, (doc_id * 2654435761) % 4294967296 AS hv FROM documents
), r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
  FROM h
)
SELECT doc_id, lang FROM r WHERE rn <= {cap} ORDER BY doc_id"""
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["doc_id", "lang"]], want, check_dtype=False)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    new=st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=1, max_size=10),
    pri=st.lists(st.sampled_from(["aa", "bb", "cc", "xx"]), min_size=0, max_size=6),
)
def test_dedup_against_matches_not_exists(ray_session, new, pri):
    from neo4j_graph_algorithms_ray.pipelines.dedup import dedup_against

    nd = pd.DataFrame(
        {"doc_id": np.arange(len(new), dtype=np.int64), "text": new}
    )
    pdd = pd.DataFrame(
        {
            "doc_id": np.arange(len(pri), dtype=np.int64) + 1000,
            "text": pd.Series(pri, dtype="object"),
        }
    )
    out = dedup_against(_ds(nd), _ds(pdd, 2) if len(pri) else _ds(pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "text": pd.Series([], dtype="object")}), 1)).to_pandas()
    con = duckdb.connect()
    con.register("nd", nd)
    con.register("pdd", pdd)
    want = con.sql(
        """SELECT n.doc_id FROM nd n WHERE NOT EXISTS (
             SELECT 1 FROM pdd p WHERE sha256(p.text) = sha256(n.text))
           ORDER BY doc_id"""
    ).df()["doc_id"].tolist()
    got = sorted(out["doc_id"].tolist()) if "doc_id" in out.columns else []
    assert got == want
