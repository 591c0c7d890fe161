from .container import Index, IndexMeta
from .build import build_index
from .build_ooc import build_index_ooc
from .sharded import ShardedIndex, ShardedIndexMeta, load_index_any

__all__ = ["Index", "IndexMeta", "build_index", "build_index_ooc",
           "ShardedIndex", "ShardedIndexMeta", "load_index_any"]
