#!/usr/bin/env python
"""Decode-regime GEMV benchmark for the two-level outlier format.

Compares, on one real chip, y = x @ W for a fused gate-up-sized weight
(K=4096, N=14336) in three servings of the SAME quantized tensor:

  dense    — bf16 weights, plain XLA dot (the baseline bench.py uses)
  sideband — PackedMXOutlier via the dequant-then-dot outlier kernel
             (in-kernel per-budget-slot scatter; the pre-emi8m path)
  emi8m    — the merged per-element byte stream via the scale-after-dot
             GEMV (ops/packing.py merge_outlier_emi8), 8 bits/elem
  nb       — the compact N-blocked transport (PackedOutlierNB: sb2
             inliers + fixed-budget outlier side-band) at the paper's
             ~3.5-4 bits/elem, via dequant_matmul_nb

Methodology per MEMORY/bench.py: all variants timed interleaved in one
process (chip clock drifts), min-of-k, work amortized under lax.scan with
the output summed into the carry so XLA cannot dead-code the columns.

Prints one JSON line per variant.
"""

import json
import pathlib
import sys
import time

import numpy as np

# NOTE: do not launch with PYTHONPATH=<repo> — that breaks the container's
# axon PJRT plugin registration. Self-locate the package instead.
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
    from microscopiq_tpu.ops.outlier import (
        quantize_mx_outlier_hessian_decisions)
    from microscopiq_tpu.ops.pallas.dequant_matmul import (
        dequant_matmul_nb, dequant_matmul_outlier, dequant_matmul_sad)

    # K=N=4096 keeps host-side packing fast on this 1-CPU box; the GEMV
    # is equally DMA-bound at this size (16 MB of codes per iteration)
    K, N, M, ITERS = 4096, 4096, 8, 128
    rng = np.random.default_rng(0)
    W = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    W[rng.random((K, N)) < 0.03] *= 10.0          # outlier mass

    # pack on host CPU (through the tunnel it would be one dispatch per op)
    print("packing...", flush=True)
    t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        p = pk.pack_mx_outlier(jnp.asarray(W), 8, 8, "int2", "fp4",
                               std_dev=2.0, block_size=16,
                               outlier_budget=4, axis=0)
        jax.block_until_ready(p)
        print(f"packed {time.perf_counter() - t0:.1f}s", flush=True)
        m = pk.to_serving_layout(pk.merge_outlier_emi8(p))
        print(f"merged {time.perf_counter() - t0:.1f}s", flush=True)
        # compact transport: RTN decisions on the (N, K) GPTQ layout,
        # outliers capped to the budget (the RTL's bounded SCOPE routing)
        BUDGET = 2
        _, _, dec = quantize_mx_outlier_hessian_decisions(
            jnp.asarray(W.T), 8, 8, "int2", "fp4_e2m1", "max", 2.0, [0],
            16, max_outliers_per_block=BUDGET)
        dec["block_size"] = 16
        pnb = pk.pack_outlier_nb(dec, budget=BUDGET)
        print(f"nb packed ({pnb.bits_per_element:.2f} bits/elem) "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    dev = jax.devices()[0]
    p, m, pnb = jax.device_put((p, m, pnb), dev)
    jax.block_until_ready((p, m, pnb))
    print(f"on device {time.perf_counter() - t0:.1f}s", flush=True)
    Wb = jax.device_put(jnp.asarray(W, jnp.bfloat16), dev)
    x0 = jax.device_put(
        jnp.asarray(rng.standard_normal((M, K)).astype(np.float32)), dev)

    def loop(fn):
        @jax.jit
        def run(x):
            def step(x, _):
                y = fn(x)
                # consume every column: defeats DCE, keeps x stable
                return x + jnp.sum(y, axis=1, keepdims=True) * 1e-30, ()
            x, _ = lax.scan(step, x, None, length=ITERS)
            return jnp.sum(x)
        return run

    variants = {
        "dense": loop(lambda x: lax.dot_general(
            x.astype(jnp.bfloat16), Wb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)),
        "sideband": loop(lambda x: dequant_matmul_outlier(x, p)),
        "emi8m": loop(lambda x: dequant_matmul_sad(x, m)),
        "nb": loop(lambda x: dequant_matmul_nb(x, pnb)),
    }
    for name, f in variants.items():
        float(f(x0))                               # compile + warm
        print(f"warmed {name} {time.perf_counter() - t0:.1f}s", flush=True)

    best = {k: 9e9 for k in variants}
    for _ in range(6):
        for k, f in variants.items():
            t0 = time.perf_counter()
            float(f(x0))
            best[k] = min(best[k], time.perf_counter() - t0)

    nb_bytes = (pnb.codes.size + pnb.scale_exp.size + pnb.out_byte.size
                + pnb.out_scale_exp.size)
    bytes_per = {"dense": K * N * 2, "sideband": K * N + K * N // 16 * 10,
                 "emi8m": K * N + K * N // 16, "nb": nb_bytes}
    dev = {k: _device_us_per_iter(f, x0, ITERS, k)
           for k, f in variants.items()}
    for k, t in best.items():
        per = t / ITERS
        print(json.dumps({
            "metric": f"outlier GEMV {k} (K={K}, N={N}, M={M})",
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
