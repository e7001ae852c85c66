#!/usr/bin/env python
"""Decode-regime GEMV benchmark for the fp6 serving transports.

Compares, on one real chip, y = x @ W (K=N=4096) for the SAME fp6
quantized tensor served three ways:

  dense — bf16 weights, plain XLA dot (16 bits/elem)
  emi8  — one (e'|m̂) byte per element, scale-after-dot GEMV (8 bits)
  pf6   — raw 6-bit fp codes in two sub-byte planes, in-kernel raw-fp
          decode (6 bits/elem; VERDICT r1 item 2b)

The open question this measures: pf6 moves 25% fewer bytes than emi8
but its decode is ~3x the VPU ops (field extract + implicit-bit select
+ sign vs sign-extend + shift). On v5e the SAD GEMV sits near the
VPU/DMA balance point, so this can go either way — whichever wins
becomes the serving default for fp6.

Methodology per MEMORY/bench.py: interleaved min-of-k in one process,
work amortized under lax.scan with the output folded into the carry.
Prints one JSON line per variant.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))



def _device_us_per_iter(fn, x0, iters, tag):
    """On-device while-loop time per iteration via a profiler trace —
    wall clock through the remote-TPU tunnel carries 100-400 us/iter of
    host overhead at these sizes, so device time is the honest kernel
    number (see STATUS.md methodology warning)."""
    import shutil

    import jax

    if jax.default_backend() != "tpu":
        return None
    from microscopiq_tpu.utils.observability import (device_kernel_stats,
                                                     trace)

    d = f"/tmp/gemv_trace_{tag}"
    shutil.rmtree(d, ignore_errors=True)
    try:
        with trace(d):
            float(fn(x0))
        stats = device_kernel_stats(d)
        tot = stats.get("while", {}).get("total_us")
        return round(tot / iters, 1) if tot else None
    except Exception:
        return None


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from microscopiq_tpu.ops import packing as pk
    from microscopiq_tpu.ops.pallas.dequant_matmul import dequant_matmul_sad

    K, N, M, ITERS = 4096, 4096, 8, 128
    rng = np.random.default_rng(0)
    W = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)

    print("packing...", flush=True)
    t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        pe = pk.to_serving_layout(pk.pack_mx(
            jnp.asarray(W), 8, "fp6_e3m2", 32, axis=0, transport="emi8"))
        pf = pk.to_serving_layout(pk.pack_mx(
            jnp.asarray(W), 8, "fp6_e3m2", 32, axis=0, transport="pf6"))
        print(f"packed {time.perf_counter() - t0:.1f}s", flush=True)
    dev = jax.devices()[0]
    pe, pf = jax.device_put((pe, pf), dev)
    jax.block_until_ready((pe, pf))
    Wb = jax.device_put(jnp.asarray(W, jnp.bfloat16), dev)
    x0 = jax.device_put(
        jnp.asarray(rng.standard_normal((M, K)).astype(np.float32)), dev)

    def loop(fn):
        @jax.jit
        def run(x):
            def step(x, _):
                y = fn(x)
                return x + jnp.sum(y, axis=1, keepdims=True) * 1e-30, ()
            x, _ = lax.scan(step, x, None, length=ITERS)
            return jnp.sum(x)
        return run

    variants = {
        "dense": loop(lambda x: lax.dot_general(
            x.astype(jnp.bfloat16), Wb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)),
        "emi8": loop(lambda x: dequant_matmul_sad(x, pe)),
        "pf6": loop(lambda x: dequant_matmul_sad(x, pf)),
    }
    for name, f in variants.items():
        float(f(x0))
        print(f"warmed {name} {time.perf_counter() - t0:.1f}s", flush=True)

    best = {k: 9e9 for k in variants}
    for _ in range(6):
        for k, f in variants.items():
            t0 = time.perf_counter()
            float(f(x0))
            best[k] = min(best[k], time.perf_counter() - t0)

    bytes_per = {"dense": K * N * 2, "emi8": K * N + K * N // 32,
                 "pf6": K * N * 3 // 4 + K * N // 32}
    dev = {k: _device_us_per_iter(f, x0, ITERS, k)
           for k, f in variants.items()}
    for k, t in best.items():
        per = t / ITERS
        print(json.dumps({
            "metric": f"fp6 GEMV {k} (K={K}, N={N}, M={M})",
            "value": round(per * 1e6, 1), "unit": "us/iter",
            "vs_baseline": round(best["dense"] / t, 3),
            "extra": {"GBps": round(bytes_per[k] / per / 1e9, 1),
                      "device_us": dev[k],
                      "vs_dense_device": (round(dev["dense"] / dev[k], 3)
                                          if dev.get(k) and dev.get("dense")
                                          else None),
                      "GBps_device": (round(bytes_per[k] / dev[k] / 1e3, 1)
                                      if dev.get(k) else None),
                      "backend": jax.default_backend()},
        }))


if __name__ == "__main__":
    main()
