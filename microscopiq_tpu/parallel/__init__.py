"""Distribution layer: device meshes, sharding rules, distributed init."""

from .mesh import (  # noqa: F401
    kv_state_shardings,
    make_mesh,
    param_shardings,
    shard_kv_state,
    shard_params,
)
