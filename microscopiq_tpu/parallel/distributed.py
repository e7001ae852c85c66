"""Multi-host (DCN) runtime wiring.

The reference has no distributed runtime at all (SURVEY.md §2.11); this
module supplies the multi-host half of the TPU story. The design follows
the standard TPU-pod recipe: one JAX process per host joined through
``jax.distributed.initialize`` (gRPC coordination over DCN), a single
global mesh whose **data axis spans hosts** (collectives over DCN are
cheap there: gradient psum once per step) and whose **model axis stays
inside each host's ICI domain** (TP collectives ride ICI every layer).
Host-local batches are stitched into global arrays with
``multihost_utils`` so pjit sees one logical program.

Everything degrades to a no-op in single-process mode, so the same
driver script runs unchanged on one chip, one host, or a pod. The
cross-process path is exercised for real by ``tests/test_distributed.py``
(two coordinated CPU processes, cross-process psum + global batch).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None
                     ) -> tuple:
    """Join (or skip joining) the multi-host runtime. Returns
    ``(process_index, process_count)``.

    Resolution order: explicit args → ``MICROSCOPIQ_COORDINATOR`` /
    ``MICROSCOPIQ_NUM_PROCESSES`` / ``MICROSCOPIQ_PROCESS_ID`` env vars →
    TPU-pod auto-detection (``jax.distributed.initialize()`` with no
    args, only when a TPU metadata environment is present) → single-
    process no-op. Idempotent."""
    global _INITIALIZED
    coordinator_address = coordinator_address or \
        os.environ.get("MICROSCOPIQ_COORDINATOR")
    if num_processes is None and "MICROSCOPIQ_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MICROSCOPIQ_NUM_PROCESSES"])
    if process_id is None and "MICROSCOPIQ_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MICROSCOPIQ_PROCESS_ID"])

    if _INITIALIZED:
        return jax.process_index(), jax.process_count()

    # NB: don't touch jax.process_count() before initialize — any
    # backend query locks in the single-process runtime
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address, num_processes=num_processes,
            process_id=process_id, local_device_ids=local_device_ids)
        _INITIALIZED = True
    elif _pod_metadata_complete():
        # TPU pod slice: runtime metadata carries the full topology.
        # Auto-init can still fail on hosts with partial/stale metadata
        # (e.g. a single-host dev box that exports TPU_WORKER_HOSTNAMES
        # but no coordinator) — degrade to single-process rather than
        # crash, honoring the module contract.
        try:
            jax.distributed.initialize()
            _INITIALIZED = True
        except (ValueError, RuntimeError):
            pass
    return jax.process_index(), jax.process_count()


def _pod_metadata_complete() -> bool:
    """True only when the environment carries enough TPU-pod topology
    for argless ``jax.distributed.initialize()`` to succeed: either a
    Megascale coordinator, or worker hostnames *plus* this worker's id
    and >1 worker. A lone ``TPU_WORKER_HOSTNAMES`` on a single-host dev
    machine must NOT trigger auto-init (it crashes with
    "coordinator_address should be defined")."""
    if os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    worker_id = os.environ.get("TPU_WORKER_ID") or \
        os.environ.get("CLOUD_TPU_TASK_ID")
    return bool(hostnames) and worker_id is not None and \
        len(hostnames.split(",")) > 1


def make_hybrid_mesh(ici_model: Optional[int] = None,
                     ici_data: int = 1,
                     dcn_data: Optional[int] = None,
                     devices: Optional[Sequence] = None) -> Mesh:
    """Global ``(data, model)`` mesh for multi-host runs.

    ``data`` = ``dcn_data * ici_data`` (hosts × in-host data groups),
    ``model`` = ``ici_model`` and NEVER crosses a host boundary: devices
    are ordered host-major, so each mesh row's model axis is one host's
    ICI domain. Per-layer TP collectives therefore ride ICI; only the
    once-per-step data-axis psum crosses DCN. Single-process this
    degenerates to ``mesh.make_mesh`` semantics."""
    devs = list(devices if devices is not None else jax.devices())
    nproc = jax.process_count()
    per_host = len(devs) // max(nproc, 1)
    if dcn_data is None:
        dcn_data = nproc if nproc > 1 else 1
    if ici_model is None:
        ici_model = per_host // ici_data if nproc > 1 else \
            len(devs) // (dcn_data * ici_data)
    data = dcn_data * ici_data
    assert data * ici_model == len(devs), \
        (dcn_data, ici_data, ici_model, len(devs))
    # host-major order keeps each host's devices contiguous → the model
    # axis (fastest-varying) stays inside one host
    devs = sorted(devs, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(data, ici_model)
    return Mesh(arr, ("data", "model"))


def global_batch(batch: Any, mesh: Mesh, spec: P = P("data")) -> Any:
    """Stitch each host's local batch shard into one global array
    (every host passes its own slice; together they tile ``spec``)."""
    if jax.process_count() == 1:
        tospec = lambda a: jax.device_put(
            a, NamedSharding(mesh, spec))
        return jax.tree_util.tree_map(tospec, batch)
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        batch, mesh, spec)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a host-local pytree across the global mesh."""
    return global_batch(tree, mesh, P())


def sync(name: str = "barrier") -> None:
    """Cross-host barrier (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def broadcast_from_primary(tree: Any) -> Any:
    """Host 0's value everywhere (no-op single-process)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def is_primary() -> bool:
    return jax.process_index() == 0


def process_chunk(items: Sequence, process_index: Optional[int] = None,
                  process_count: Optional[int] = None):
    """This host's slice of a work list (eval shards, file lists) —
    the multi-host analog of ``vlm.mm_utils.get_chunk``."""
    from ..vlm.mm_utils import get_chunk

    return get_chunk(list(items),
                     process_count if process_count is not None
                     else jax.process_count(),
                     process_index if process_index is not None
                     else jax.process_index())
