"""Multi-chip parallel execution: meshes, sharded transforms, halo rings."""

from .sharded import make_mesh, shard_rows, dwt2, idwt2, dwt3, idwt3
from . import mesh2d

__all__ = ["make_mesh", "shard_rows", "dwt2", "idwt2", "dwt3", "idwt3",
           "mesh2d"]
