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
