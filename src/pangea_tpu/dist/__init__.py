from .mesh import (MeshConfig, choose_mesh, make_mesh,
                   make_sharded_classify_fn, place_index)

__all__ = ["MeshConfig", "choose_mesh", "make_mesh",
           "make_sharded_classify_fn", "place_index"]
