from .graph import GraphTables
from .dense import scatter_combine, dense_combine, block_cache_key

__all__ = ["GraphTables", "scatter_combine", "dense_combine", "block_cache_key"]
