"""SQL graph projection — the Cypher-projection analog (reference:
``algo/.../GraphLoader`` cypher mode, ``algo.<x>(nodeQuery, relQuery)``
[public tree, ~core/heavyweight/HeavyCypher*.java]): any SQL statement
over the registered parquet views that yields (src, dst[, weight]) rows
becomes a projected ``GraphTables``.

Like the reference — where the Cypher runtime executes on the Neo4j
instance and only the *algorithm* is parallel — the projection SQL runs
in ONE DuckDB instance; results stream out as Arrow record batches that
are put straight into the object store (never concatenated on the
driver), and everything downstream (densify, shard pool, pipelines) is
distributed. For projections that must themselves scale past one node,
derive edges with Dataset transforms instead (sources/tpch.py,
sources/corpus.py).
"""

from __future__ import annotations

import os
from typing import Optional

import pyarrow as pa
import ray
import ray.data as rd

from ..state.graph import GraphTables

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def edge_dataset_from_sql(
    sf_dir: str, edge_sql: str, *, batch_rows: int = 1 << 20
) -> "rd.Dataset":
    """Stream the SQL result into a Dataset, one object-store block per
    record batch — driver holds one batch at a time."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    reader = con.execute(edge_sql).fetch_record_batch(batch_rows)
    refs = []
    schema = reader.schema
    while True:
        try:
            b = reader.read_next_batch()
        except StopIteration:
            break
        if b.num_rows:
            refs.append(ray.put(pa.Table.from_batches([b])))
    if not refs:
        refs.append(ray.put(schema.empty_table()))
    return rd.from_arrow_refs(refs)


def graph_from_sql(
    sf_dir: str,
    edge_sql: str,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: Optional[str] = None,
    batch_rows: int = 1 << 20,
) -> GraphTables:
    """Project a graph from an arbitrary edge SQL (columns ``src``,
    ``dst``[, ``weight``])."""
    ds = edge_dataset_from_sql(sf_dir, edge_sql, batch_rows=batch_rows)
    return GraphTables.from_dataset(ds, src=src, dst=dst, weight=weight)
