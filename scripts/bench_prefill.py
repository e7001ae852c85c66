#!/usr/bin/env python
"""Prefill benchmark: packed (fused in-kernel-decode matmul) vs dense.

The decode benches cover the bandwidth-bound regime; this measures the
compute-bound prefill (B=8, S=128) where the packed path must amortize
its per-element decode under the MXU time (ops/pallas/dequant_matmul.py
M>64 path, TM=512). Interleaved arms, min-of-k, plus on-device time via
the profiler (wall through the tunnel carries fixed host overhead).

Prints one JSON line per arm.
"""

import json
import pathlib
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import importlib.util

    import jax
    import jax.numpy as jnp

    spec = importlib.util.spec_from_file_location(
        "benchmod", pathlib.Path(__file__).resolve().parent.parent
        / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM
    from microscopiq_tpu.nn import fuse_projections
    from microscopiq_tpu.specs import finalize_mx_specs

    on_tpu = jax.default_backend() == "tpu"
    layers = 6 if on_tpu else 2
    B, S0 = 8, 128
    max_len = S0 + 8
    specs = finalize_mx_specs({"w_elem_format": "fp6_e3m2",
                               "scale_bits": 8, "block_size": 32})

    def build(packed):
        cfg = (LlamaConfig.llama3_8b(num_hidden_layers=layers,
                                     dtype=jnp.bfloat16,
                                     fused_projections=True)
               if on_tpu else
               LlamaConfig.tiny(dtype=jnp.bfloat16,
                                fused_projections=True))
        model = LlamaForCausalLM(cfg, use_pallas=on_tpu)
        params = bench.build_params(cfg, jax.random.PRNGKey(0),
                                    packed_specs=packed)
        params = {"params": fuse_projections(params["params"])}
        ids = jnp.asarray(np.random.default_rng(0).integers(
            0, cfg.vocab_size, (B, S0)))
        prefill, _, state0, make_state = bench.make_decoder(
            model, cfg, B, S0, 1, max_len)
        tok0, st = prefill(params, ids, state0)
        jax.block_until_ready(st)

        def timed():
            s2 = make_state()
            jax.block_until_ready(s2)
            t0 = time.perf_counter()
            _, st = prefill(params, ids, s2)
            jax.block_until_ready(st)
            return time.perf_counter() - t0, lambda: prefill(
                params, ids, make_state())

        return timed

    arms = {"dense": build(None), "packed": build(specs)}
    best = {k: 9e9 for k in arms}
    reruns = {}
    for _ in range(5):
        for k, f in arms.items():
            dt, rerun = f()
            best[k] = min(best[k], dt)
            reruns[k] = rerun

    dev = {}
    if on_tpu:
        from microscopiq_tpu.utils.observability import (
            device_kernel_stats, trace)

        for k, rerun in reruns.items():
            d = f"/tmp/prefill_trace_{k}"
            shutil.rmtree(d, ignore_errors=True)
            with trace(d):
                import jax as _j

                _j.block_until_ready(rerun()[1])
            rows = device_kernel_stats(d)
            pf = [v["total_us"] for n, v in rows.items()
                  if n.startswith("jit_prefill")]
            dev[k] = round(max(pf), 1) if pf else None

    for k, t in best.items():
        print(json.dumps({
            "metric": f"prefill ms, {layers}L 8B arch, B={B}, S={S0}, "
                      f"{k}",
            "value": round(t * 1e3, 2), "unit": "ms",
            "vs_baseline": round(best["dense"] / t, 3),
            "extra": {"device_us": dev.get(k),
                      "backend": jax.default_backend()},
        }))


if __name__ == "__main__":
    main()
