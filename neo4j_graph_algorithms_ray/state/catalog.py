"""Named-graph catalog (reference: ``algo.graph.load`` /
``algo.graph.info`` / ``algo.graph.remove``,
``algo/.../GraphLoadProc.java`` [later-branch S10]).

The reference caches a projected in-memory graph under a name so
repeated procedure calls skip the load; the Ray analog keeps the
materialized ``GraphTables`` (edge Dataset blocks pinned in the object
store + the memoized CSR shard-actor pool) in a driver-side registry.
``remove`` drops the handles — Ray garbage-collects the blocks and
kills the shard actors once unreferenced.
"""

from __future__ import annotations

from typing import Callable, Optional

from .graph import GraphTables

_CATALOG: dict[str, GraphTables] = {}


def load(name: str, builder: Callable[[], GraphTables], overwrite: bool = False) -> GraphTables:
    """Build-or-get: project the graph once, reuse under ``name``."""
    if overwrite or name not in _CATALOG:
        _CATALOG[name] = builder()
    return _CATALOG[name]


def get(name: str) -> Optional[GraphTables]:
    return _CATALOG.get(name)


def info(name: str) -> Optional[dict]:
    """Reference YIELD shape: name, nodes, relationships, weighted."""
    g = _CATALOG.get(name)
    if g is None:
        return None
    return {
        "name": name,
        "nodes": g.n,
        "relationships": g.m,
        "weighted": g.weighted,
        "sharded": g._sharded is not None,
    }


def remove(name: str) -> bool:
    return _CATALOG.pop(name, None) is not None


def list_graphs() -> list[dict]:
    return [info(n) for n in sorted(_CATALOG)]


# ----------------------------------------------------------------------
# utility procedures (reference: ``algo.version`` / ``algo.list`` /
# ``algo.asNode`` — ``algo/.../ListProc.java`` / ``VersionProc.java``)
# ----------------------------------------------------------------------
ENGINE_VERSION = "2.0.0"  # engine release, bumped per round


def version() -> str:
    """``algo.version()`` analog: the engine version string."""
    return ENGINE_VERSION


def list_procedures(filter_prefix: str = "") -> list[dict]:
    """``algo.list`` analog: every registered pipeline/procedure with
    its module path, discovered from the pipelines package."""
    import importlib
    import inspect
    import pkgutil

    import neo4j_graph_algorithms_ray.pipelines as pp

    out = []
    for m in pkgutil.iter_modules(pp.__path__):
        mod = importlib.import_module(f"{pp.__name__}.{m.name}")
        for fname, fn in inspect.getmembers(mod, inspect.isfunction):
            if fname.startswith("_") or fn.__module__ != mod.__name__:
                continue
            name = f"{m.name}.{fname}"
            if filter_prefix and not name.startswith(filter_prefix):
                continue
            out.append(
                {
                    "name": name,
                    "signature": str(inspect.signature(fn)),
                    "description": (inspect.getdoc(fn) or "").split("\n")[0],
                }
            )
    return sorted(out, key=lambda r: r["name"])


def as_node(graph: GraphTables, dense_id: int) -> dict:
    """``algo.asNode`` analog: resolve a dense vertex index back to the
    original vertex id (the engine's node identity)."""
    vids = graph.vids
    if not 0 <= dense_id < len(vids):
        raise KeyError(f"dense id {dense_id} out of range [0, {len(vids)})")
    return {"dense_id": int(dense_id), "vid": int(vids[dense_id])}
