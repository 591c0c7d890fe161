from .mesh import (MeshConfig, choose_mesh, initialize_multihost, make_mesh,
                   make_sharded_classify_fn, place_index)

__all__ = ["MeshConfig", "choose_mesh", "initialize_multihost", "make_mesh",
           "make_sharded_classify_fn", "place_index"]
