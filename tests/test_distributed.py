"""Multi-host DCN runtime tests.

Single-process degeneracies run inline on the virtual 8-device mesh;
the real cross-process path launches two coordinated CPU JAX processes
(tests/dcn_worker.py) that join via jax.distributed, build the hybrid
mesh, and run a TP-sharded forward over a DCN-spanning global batch.
The reference has no distributed runtime (SURVEY.md §2.11) — this is
TPU-native capability the framework supplies.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from microscopiq_tpu.parallel.distributed import (broadcast_from_primary,
                                                  global_batch,
                                                  init_distributed,
                                                  is_primary,
                                                  make_hybrid_mesh,
                                                  process_chunk, replicate,
                                                  sync)


def test_single_process_degenerate():
    """Every helper must no-op cleanly in single-process mode so one
    driver script runs unchanged from laptop to pod."""
    idx, count = init_distributed()
    assert (idx, count) == (0, 1)
    assert is_primary()
    sync()

    mesh = make_hybrid_mesh(ici_model=4, dcn_data=2)   # 8 devices
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "model")

    x = np.arange(16, dtype=np.float32).reshape(4, 4)
    gx = global_batch(x, mesh, P("data", None))
    np.testing.assert_array_equal(np.asarray(gx), x)
    r = replicate({"w": x}, mesh)
    np.testing.assert_array_equal(np.asarray(r["w"]), x)
    assert broadcast_from_primary({"a": 1}) == {"a": 1}
    assert process_chunk(list(range(10))) == list(range(10))
    assert process_chunk(list(range(10)), 1, 2) == [5, 6, 7, 8, 9]


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn():
    """Two real coordinated JAX processes: cross-process mesh, host-
    major model axis, broadcast, global batch stitch, sharded forward
    with verified numerics, barrier."""
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=root + os.pathsep +
               os.environ.get("PYTHONPATH", ""))
    worker = os.path.join(os.path.dirname(__file__), "dcn_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=root)
        for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"proc {i} failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert outs[0]["primary"] and not outs[1]["primary"]
    assert outs[0]["n_devices"] == outs[1]["n_devices"] == 4
    # both processes computed the same global loss on host-0's weights
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"])
    # work-list sharding covers the list disjointly
    assert outs[0]["chunk"] + outs[1]["chunk"] == list(range(10))
