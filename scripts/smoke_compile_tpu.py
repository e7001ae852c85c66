#!/usr/bin/env python
"""On-device compile + run smoke test for the packed-GEMM kernels.

VERDICT r3 weak #1: the M>=1024 prefill tier failed to compile at the 8B
gate_up shape (scoped-VMEM OOM) for a full round because tests run
interpret-mode on CPU and bench.py is decode-only. This script compiles
and runs dequant_matmul on the REAL chip for every (transport x M-tier)
at the Llama-3-8B serving shapes and checks each result against the
pure-JAX twin. Writes SMOKE_r04.json at the repo root.

Usage: python scripts/smoke_compile_tpu.py [--fast]
  --fast: skip M=2048 and the down_proj shape (halves the compile count)
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SHAPES = {
    "qkv": (4096, 6144),        # fused q+k+v, Llama-3-8B GQA
    "gate_up": (4096, 28672),   # fused gate+up (the r3 failure shape)
    "down": (14336, 4096),
}
# decode-path transports are exercised at M<=8 (SAD tier); prefill
# transports at the batched-prefill tiers
DECODE_TRANSPORTS = [("emi8", "fp6_e3m2"), ("emi8", "fp4_e2m1"),
                     ("sb4", "int4"), ("sb2", "int2"),
                     ("pf6", "fp6_e3m2"), ("native", "int8")]
PREFILL_TRANSPORTS = [("emi8", "fp6_e3m2"), ("native", "int8")]
PREFILL_MS = [128, 512, 1024, 2048]


def main():
    import jax
    import jax.numpy as jnp

    from microscopiq_tpu.ops import packing as pk
    import importlib
    dm = importlib.import_module(
        "microscopiq_tpu.ops.pallas.dequant_matmul")

    assert jax.default_backend() == "tpu", "smoke test needs the chip"
    fast = "--fast" in sys.argv
    rng = np.random.default_rng(0)
    results, failures = [], 0

    shapes = dict(SHAPES)
    if fast:
        shapes.pop("down")

    for name, (K, N) in shapes.items():
        W = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
        packs = {}
        for transport, fmt in set(DECODE_TRANSPORTS + PREFILL_TRANSPORTS):
            with jax.default_device(jax.devices("cpu")[0]):
                packs[(transport, fmt)] = jax.device_put(
                    pk.to_serving_layout(pk.pack_mx(
                        jnp.asarray(W), 8, fmt, 32, axis=0,
                        transport=transport)),
                    jax.devices()[0])

        cases = [(t, f, m) for (t, f) in DECODE_TRANSPORTS for m in (1, 8)]
        cases += [(t, f, m) for (t, f) in PREFILL_TRANSPORTS
                  for m in PREFILL_MS if not (fast and m == 2048)]
        for transport, fmt, M in cases:
            w = packs[(transport, fmt)]
            x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
            tag = f"{name}/{transport}:{fmt}/M={M}"
            t0 = time.time()
            try:
                y = jax.jit(dm.dequant_matmul)(x, w)
                y.block_until_ready()
                yr = dm.dequant_matmul_reference(
                    x, pk.from_serving_layout(w))
                err = float(jnp.abs(y - yr).max())
                denom = float(jnp.abs(yr).max()) or 1.0
                ok = bool(err <= 1e-3 * denom + 1e-5)
                results.append({"case": tag, "ok": ok,
                                "max_err": err,
                                "compile_s": round(time.time() - t0, 1)})
                if not ok:
                    failures += 1
            except Exception as e:  # noqa: BLE001
                results.append({"case": tag, "ok": False,
                                "error": str(e)[:300]})
                failures += 1
            print(json.dumps(results[-1]), flush=True)
        for v in packs.values():
            for leaf in jax.tree_util.tree_leaves(v):
                if hasattr(leaf, "delete"):
                    leaf.delete()

    artifact = {"n_cases": len(results), "n_failures": failures,
                "ok": failures == 0, "cases": results}
    out = pathlib.Path(__file__).resolve().parent.parent / "SMOKE_r04.json"
    out.write_text(json.dumps(artifact, indent=1))
    print(f"wrote {out}: {len(results)} cases, {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
