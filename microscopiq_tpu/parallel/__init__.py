"""Distribution layer: device meshes, sharding rules, distributed init."""

from .mesh import (  # noqa: F401
    make_mesh,
    param_shardings,
    shard_params,
)
