from .container import Index, IndexMeta
from .build import build_index

__all__ = ["Index", "IndexMeta", "build_index"]
