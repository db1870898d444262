"""Multi-chip parallel execution: meshes, sharded transforms, halo rings,
and the distributed application layer (best-basis, noisest, denoise)."""

from .sharded import (make_mesh, shard_rows, dwt1, idwt1, dwt2, idwt2,
                      dwt3, idwt3)
from .apps import (bestbasistree, noisest, denoise, wpt, iwpt,
                   modwt, imodwt)
from . import mesh2d

__all__ = ["make_mesh", "shard_rows", "dwt1", "idwt1", "dwt2", "idwt2",
           "dwt3", "idwt3", "bestbasistree", "noisest", "denoise",
           "wpt", "iwpt", "modwt", "imodwt", "mesh2d"]
