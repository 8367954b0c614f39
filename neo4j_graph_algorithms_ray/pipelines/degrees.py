"""Degree centrality (reference [later-branch]: algo.degree,
``algo/.../DegreeCentralityProc.java``) — trivial aggregations over the
edge table; kept as a pipeline for API parity."""

from __future__ import annotations

import pyarrow as pa

from ..state.graph import GraphTables


def degree_table(graph: GraphTables, weighted: bool = False) -> pa.Table:
    """(vid, out_deg, in_deg) — or weighted sums when ``weighted``."""
    out_deg = graph.out_degree(weighted=weighted)
    in_deg = graph.in_degree(weighted=weighted)
    if not weighted:
        out_deg = out_deg.astype("int64")
        in_deg = in_deg.astype("int64")
    return graph.to_table({"out_deg": out_deg, "in_deg": in_deg})
