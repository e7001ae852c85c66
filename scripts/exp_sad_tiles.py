#!/usr/bin/env python
"""Tile-shape sweep for the SAD decode GEMV (VERDICT r2 item 1).

The kernel sits at the VPU/DMA balance point: per k-step the partial-
scale multiply + nbt-reduction costs O(nbt*TM*TN) VPU work against a
TK*TN-byte code DMA. TM=16 (the bf16 minimum for M=8 decode) doubles
that VPU work vs TM=8 (legal with an f32 x tile); TN sets the DMA
contiguity (1024 B vs 2048+ B bursts against an N-strided serving
layout). This sweeps (TM, TN, TK) on the bench shape and prints one
JSON line per config with device us/iter and GB/s of codes.

Run on the real chip: python scripts/exp_sad_tiles.py
"""

import json
import os
import pathlib
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from microscopiq_tpu.ops import packing as pk
    import importlib
    dm = importlib.import_module("microscopiq_tpu.ops.pallas.dequant_matmul")
    from microscopiq_tpu.utils.observability import (device_kernel_stats,
                                                     trace)

    assert jax.default_backend() == "tpu"
    K, N, M, ITERS = 4096, 28672, 8, 64
    rng = np.random.default_rng(0)
    W = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        w = pk.to_serving_layout(pk.pack_mx(
            jnp.asarray(W), 8, "fp6_e3m2", 32, axis=0, transport="emi8"))
    w = jax.device_put(w, jax.devices()[0])
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    code_bytes = K * N

    y_ref = None
    configs = [(0, 0, 0),                    # production defaults
               (8, 1024, 1024), (8, 2048, 1024), (8, 2048, 2048),
               (16, 2048, 1024), (8, 3584, 1024), (8, 1024, 2048),
               (8, 512, 1024), (16, 1024, 2048),
               # r5: full-row / near-full-row TN — the (NB, rows, TN)
               # layout's N-stride disappears (fully contiguous DMA
               # per k-step burst); chasing the 714 -> 753 GB/s gap
               (8, 7168, 512), (8, 7168, 1024), (8, 14336, 512),
               (8, 14336, 256), (8, 28672, 256), (8, 28672, 512),
               (8, 28672, 128)]
    for TM, TN, TK in configs:
        os.environ["MICROSCOPIQ_SAD_TM"] = str(TM)
        os.environ["MICROSCOPIQ_SAD_TN"] = str(TN)
        os.environ["MICROSCOPIQ_SAD_TK"] = str(TK)
        tag = f"tm{TM}_tn{TN}_tk{TK}"

        def step(x, _):
            y = dm.dequant_matmul_sad(x, w)
            # fold output into the carry so the loop body can't hoist
            return x + y[:, :K] * 1e-30, None

        def loop(x):
            x, _ = jax.lax.scan(step, x, None, length=ITERS)
            return x

        run = jax.jit(loop)
        try:
            out = run(x0).block_until_ready()
        except Exception as e:
            print(json.dumps({"config": tag, "error": str(e)[:200]}))
            continue
        y1 = dm.dequant_matmul_sad(x0, w)
        if y_ref is None:
            y_ref = dm.dequant_matmul_reference(x0, w)
        err = float(jnp.abs(y1 - y_ref).max())

        d = f"/tmp/sad_tiles_{tag}"
        shutil.rmtree(d, ignore_errors=True)
        with trace(d):
            run(x0).block_until_ready()
        st = device_kernel_stats(d)
        tot = st.get("while", {}).get("total_us") if st else None
        us = tot / ITERS if tot else None
        gbps = code_bytes / (us * 1e-6) / 1e9 if us else None
        print(json.dumps({"config": tag,
                          "device_us_per_iter": round(us, 1) if us else None,
                          "GBps_codes": round(gbps, 1) if gbps else None,
                          "max_err": err}), flush=True)
    for k in ("MICROSCOPIQ_SAD_TM", "MICROSCOPIQ_SAD_TN",
              "MICROSCOPIQ_SAD_TK"):
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
