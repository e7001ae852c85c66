"""Distribution layer: device meshes, sharding rules, distributed init."""

from .distributed import (  # noqa: F401
    broadcast_from_primary,
    global_batch,
    init_distributed,
    is_primary,
    make_hybrid_mesh,
    process_chunk,
    replicate,
    sync,
)
from .mesh import (  # noqa: F401
    kv_state_shardings,
    make_mesh,
    param_shardings,
    shard_kv_state,
    shard_params,
)
