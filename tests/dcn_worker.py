"""Worker process for the real multi-host DCN test.

Launched (twice) by tests/test_distributed.py with a shared coordinator
port: joins the distributed runtime, builds the hybrid (data, model)
mesh whose model axis stays inside this process's devices, then runs a
TP-sharded linear forward over a DCN-spanning data-sharded global batch
and checks the math against a local replay. Prints one JSON line.
"""

import json
import os
import sys


def main():
    port, proc = sys.argv[1], int(sys.argv[2])
    import jax

    from microscopiq_tpu.parallel.distributed import (
        broadcast_from_primary, global_batch, init_distributed, is_primary,
        make_hybrid_mesh, process_chunk, replicate, sync)

    idx, count = init_distributed(f"localhost:{port}", num_processes=2,
                                  process_id=proc)
    assert (idx, count) == (proc, 2), (idx, count)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_hybrid_mesh(ici_model=2)          # (data=2 DCN, model=2 ICI)
    assert mesh.devices.shape == (2, 2)
    # model axis must not cross a host boundary
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1

    # host 0's weight everywhere (checkpoint-load pattern)
    rng = np.random.default_rng(0 if proc == 0 else 99)
    W_local = rng.normal(size=(8, 16)).astype(np.float32)
    W_host = broadcast_from_primary(W_local)      # host 0's draw wins
    W = replicate(W_host, mesh)

    # each host contributes its own half of the global batch
    xs_all = np.arange(4 * 8, dtype=np.float32).reshape(4, 8) / 10.0
    x_local = xs_all[proc * 2:(proc + 1) * 2]
    x = global_batch(x_local, mesh, P("data", None))
    assert x.shape == (4, 8)

    @jax.jit
    def fwd(x, w):
        y = x @ w                                  # TP over model axis
        return y, (y * y).sum()

    xw = jax.device_put(W, NamedSharding(mesh, P(None, "model")))
    y, loss = fwd(x, xw)
    # every process validates ITS OWN addressable rows of the global
    # result (remote shards are not fetchable) + the replicated loss
    want_y = xs_all @ np.asarray(W_host)
    for shard in y.addressable_shards:
        rows = shard.index[0]
        np.testing.assert_allclose(np.asarray(shard.data),
                                   want_y[rows][:, shard.index[1]],
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(loss), float((want_y ** 2).sum()),
                               rtol=1e-5)

    chunk = process_chunk(list(range(10)))
    sync("done")
    print(json.dumps({
        "proc": proc, "primary": is_primary(),
        "loss": float(loss), "chunk": chunk,
        "n_devices": len(jax.devices()),
    }), flush=True)


if __name__ == "__main__":
    main()
