#!/usr/bin/env python
"""On-device compile + run smoke test for EVERY Pallas kernel.

VERDICT r3 weak #1 / r4 weak #6: interpret-mode CPU tests do not catch
Mosaic compile failures (the M>=1024 prefill tier was uncompilable for a
round while its interpret tests were green), and the r4 smoke covered
only 8 dequant_matmul transports. This script compiles and runs every
Pallas kernel in the package on the REAL chip at model-scale shapes and
checks each result against its pure-JAX twin:

  A. dequant_matmul      decode (6 transports x M in {1,8}) and prefill
                         (emi8 fp6/fp4 + native int8 at M tiers up to
                         2048, plus the sb4/pf6 prefill dispatch —
                         they fall back to the XLA twin by design) at
                         the three Llama-3-8B serving shapes
  B. dequant_matmul_sad_s8   W8A8 decode (int8 native + sb4)
  C. emi8m               merged-outlier GEMV through the SAD kernel
  D. dequant_matmul_outlier  side-band scatter kernel (M=8 / M=128)
  E. dequant_matmul_nb   compact 4-bit transport (M=1 / 8 / 1024 — the
                         M-tiled grid added for ADVICE r4)
  F. quantize_mx_pallas  on-device block-quantize, 4 formats, bit-exact
                         vs pack_mx(exact_scale=True)
  G. quant_attention_decode  fused quant-KV flash decode: bits 4/2,
                         grouped + per-token V scales, GEAR rank-2
                         low-rank arm, per-slot depth vector arm

Writes SMOKE_r05.json at the repo root; exits nonzero on any failure.

Usage: python scripts/smoke_compile_tpu.py [--fast]
  --fast: skip M=2048, the down_proj shape, and the attention arms
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
DECODE_TRANSPORTS = [("emi8", "fp6_e3m2"), ("emi8", "fp4_e2m1"),
                     ("sb4", "int4"), ("sb2", "int2"),
                     ("pf6", "fp6_e3m2"), ("native", "int8")]
PREFILL_MS = [128, 512, 1024, 2048]


class Runner:
    def __init__(self):
        self.results = []
        self.failures = 0

    def case(self, tag, fn, ref_fn, rtol=1e-3, atol=1e-5):
        import jax.numpy as jnp
        t0 = time.time()
        try:
            y = fn()
            y.block_until_ready()
            yr = ref_fn()
            err = float(jnp.abs(y.astype(jnp.float32)
                                - yr.astype(jnp.float32)).max())
            denom = float(jnp.abs(yr).max()) or 1.0
            ok = bool(err <= rtol * denom + atol)
            self.results.append({"case": tag, "ok": ok, "max_err": err,
                                 "compile_s": round(time.time() - t0, 1)})
            if not ok:
                self.failures += 1
        except Exception as e:  # noqa: BLE001
            self.results.append({"case": tag, "ok": False,
                                 "error": str(e)[:300]})
            self.failures += 1
        print(json.dumps(self.results[-1]), flush=True)


def section_dequant_matmul(r, fast):
    import jax
    import jax.numpy as jnp

    from microscopiq_tpu.ops import packing as pk
    import importlib
    dm = importlib.import_module(
        "microscopiq_tpu.ops.pallas.dequant_matmul")

    rng = np.random.default_rng(0)
    shapes = dict(SHAPES)
    if fast:
        shapes.pop("down")
    prefill = {
        "qkv": [("emi8", "fp6_e3m2", m) for m in PREFILL_MS],
        "gate_up": ([("emi8", "fp6_e3m2", m) for m in PREFILL_MS]
                    + [("native", "int8", m) for m in PREFILL_MS]
                    + [("emi8", "fp4_e2m1", 512),
                       ("emi8", "fp4_e2m1", 1024),
                       ("sb4", "int4", 1024),       # XLA-fallback dispatch
                       ("pf6", "fp6_e3m2", 1024)]),
        "down": [("emi8", "fp6_e3m2", m) for m in PREFILL_MS],
    }

    for name, (K, N) in shapes.items():
        W = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
        want = set(DECODE_TRANSPORTS) | {(t, f)
                                         for t, f, _ in prefill[name]}
        packs = {}
        for transport, fmt in want:
            with jax.default_device(jax.devices("cpu")[0]):
                packs[(transport, fmt)] = jax.device_put(
                    pk.to_serving_layout(pk.pack_mx(
                        jnp.asarray(W), 8, fmt, 32, axis=0,
                        transport=transport)),
                    jax.devices()[0])

        cases = [(t, f, m) for (t, f) in DECODE_TRANSPORTS for m in (1, 8)]
        cases += [(t, f, m) for (t, f, m) in prefill[name]
                  if not (fast and m == 2048)]
        for transport, fmt, M in cases:
            w = packs[(transport, fmt)]
            x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
            r.case(f"{name}/{transport}:{fmt}/M={M}",
                   lambda x=x, w=w: jax.jit(dm.dequant_matmul)(x, w),
                   lambda x=x, w=w: dm.dequant_matmul_reference(
                       x, pk.from_serving_layout(w)))
        for v in packs.values():
            for leaf in jax.tree_util.tree_leaves(v):
                if hasattr(leaf, "delete"):
                    leaf.delete()

    # --- B: W8A8 scale-after-dot ---
    K, N = SHAPES["qkv"]
    W = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    for fmt in ("int8", "int4"):
        transport = "sb4" if fmt == "int4" else "native"
        with jax.default_device(jax.devices("cpu")[0]):
            w = pk.to_serving_layout(pk.pack_mx(
                jnp.asarray(W), 8, fmt, 32, axis=0, transport=transport))
        w = jax.device_put(w, jax.devices()[0])
        x = jnp.asarray(rng.standard_normal((8, K)), jnp.float32)
        r.case(f"s8xs8/{transport}:{fmt}/M=8",
               lambda x=x, w=w: jax.jit(dm.dequant_matmul_sad_s8)(x, w),
               lambda x=x, w=w: dm.dequant_matmul_sad_s8_reference(x, w),
               rtol=2e-3, atol=1e-4)


def section_outlier(r, fast):
    import jax
    import jax.numpy as jnp

    from microscopiq_tpu.ops import packing as pk
    from microscopiq_tpu.ops.outlier import (
        quantize_mx_outlier_hessian_decisions)
    import importlib
    dm = importlib.import_module(
        "microscopiq_tpu.ops.pallas.dequant_matmul")

    rng = np.random.default_rng(1)
    K = N = 4096
    W = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    W[rng.random((K, N)) < 0.03] *= 10.0
    with jax.default_device(jax.devices("cpu")[0]):
        p = pk.pack_mx_outlier(jnp.asarray(W), 8, 8, "int2", "fp4",
                               std_dev=2.0, block_size=16,
                               outlier_budget=4, axis=0)
        m = pk.to_serving_layout(pk.merge_outlier_emi8(p))
        BUDGET = 2
        _, _, dec = quantize_mx_outlier_hessian_decisions(
            jnp.asarray(W.T), 8, 8, "int2", "fp4_e2m1", "max", 2.0, [0],
            16, max_outliers_per_block=BUDGET)
        dec["block_size"] = 16
        pnb = pk.pack_outlier_nb(dec, budget=BUDGET)
    dev = jax.devices()[0]
    p, m, pnb = jax.device_put((p, m, pnb), dev)

    for M in (1, 8):
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
        r.case(f"emi8m/M={M}",
               lambda x=x: jax.jit(dm.dequant_matmul_sad)(x, m),
               lambda x=x: dm.dequant_matmul_reference(
                   x, pk.from_serving_layout(m)))
    for M in (8, 128):
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
        r.case(f"outlier_sideband/M={M}",
               lambda x=x: jax.jit(dm.dequant_matmul_outlier)(x, p),
               lambda x=x: dm.dequant_matmul_outlier_reference(x, p),
               rtol=2e-3, atol=1e-4)
    for M in (1, 8, 1024):
        if fast and M == 1024:
            continue
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
        r.case(f"nb/M={M}",
               lambda x=x: jax.jit(dm.dequant_matmul_nb)(x, pnb),
               lambda x=x: dm.dequant_matmul_nb_reference(x, pnb),
               rtol=2e-3, atol=1e-4)


def section_mx_quant(r):
    import jax
    import jax.numpy as jnp

    from microscopiq_tpu.ops import packing as pk
    from microscopiq_tpu.ops.pallas.mx_quant import quantize_mx_pallas

    rng = np.random.default_rng(2)
    W = (rng.standard_normal((2048, 4096)) *
         np.exp(rng.uniform(-3, 3, (2048, 1)))).astype(np.float32)
    Wj = jax.device_put(jnp.asarray(W), jax.devices()[0])
    for fmt in ("fp6_e3m2", "fp4_e2m1", "int8", "int4"):
        with jax.default_device(jax.devices("cpu")[0]):
            want = pk.pack_mx(jnp.asarray(W), 8, fmt, 32,
                              exact_scale=True)
            dq_want = pk.dequantize_mx(want)
        r.case(f"mx_quant/{fmt}",
               lambda fmt=fmt: pk.dequantize_mx(
                   jax.jit(quantize_mx_pallas,
                           static_argnums=(1, 2, 3))(Wj, 8, fmt, 32)),
               lambda dq=dq_want: dq, rtol=0, atol=0)


def section_quant_attention(r):
    import jax
    import jax.numpy as jnp

    from microscopiq_tpu.kv.cache import (QuantKVConfig,
                                          QuantizedDecodeCache,
                                          init_quant_cache)
    from microscopiq_tpu.ops.pallas.quant_attention import (
        quant_attention_decode, quant_attention_decode_reference)

    rng = np.random.default_rng(3)
    B, KVH, H, hd, gap = 8, 8, 32, 128, 64
    maxlen, length = 576, 500

    def build(cfg):
        state = init_quant_cache(1, B, maxlen, KVH, hd, cfg)
        cache = QuantizedDecodeCache(state, cfg)
        k = jnp.asarray(rng.standard_normal((B, length, KVH, hd)),
                        jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, length, KVH, hd)),
                        jnp.float32)
        pos = jnp.arange(length)[None, :]
        cache.update(0, k, v, pos, None)
        st = cache.finalize()
        full = [st.kq, st.k_mn, st.k_sc, st.vq, st.v_mn, st.v_sc,
                st.res_k, st.res_v]
        if cfg.rank:
            full += [st.k_p, st.k_q, st.v_p, st.v_q]
        return tuple(full)

    q = jnp.asarray(rng.standard_normal((B, H, hd)), jnp.float32)
    scale = hd ** -0.5
    arms = {
        "b4_vg64": QuantKVConfig(bits=4, gap=gap, v_group=64),
        "b4_vtok": QuantKVConfig(bits=4, gap=gap, v_group=hd),
        "b2_vg64": QuantKVConfig(bits=2, gap=gap, v_group=64),
        "b4_gear_r2": QuantKVConfig(bits=4, gap=gap, v_group=64, rank=2),
    }
    for tag, cfg in arms.items():
        try:
            full = build(cfg)
        except Exception as e:  # noqa: BLE001
            r.results.append({"case": f"qattn/{tag}", "ok": False,
                              "error": "state build: " + str(e)[:250]})
            r.failures += 1
            print(json.dumps(r.results[-1]), flush=True)
            continue
        # layer/v_group/scale are STATIC in production (python-level
        # constants closed over inside the model's jit) — tracing
        # `scale` makes the kernel capture a tracer and fail
        r.case(f"qattn/{tag}",
               lambda full=full, cfg=cfg: jax.jit(
                   quant_attention_decode,
                   static_argnums=(2, 4, 5))(q, full, 0,
                                             jnp.int32(length),
                                             cfg.v_group, scale),
               lambda full=full, cfg=cfg: quant_attention_decode_reference(
                   q, full, 0, jnp.int32(length), cfg.v_group, scale),
               rtol=2e-2, atol=2e-2)
    # per-slot depth vector (continuous-batching slot cache)
    cfg = arms["b4_vg64"]
    full = build(cfg)
    lens = jnp.asarray(
        rng.integers(gap, length, B).astype(np.int32))
    r.case("qattn/b4_slot_lengths",
           lambda: jax.jit(quant_attention_decode,
                           static_argnums=(2, 4, 5))(
               q, full, 0, lens, cfg.v_group, scale),
           lambda: quant_attention_decode_reference(
               q, full, 0, lens, cfg.v_group, scale),
           rtol=2e-2, atol=2e-2)


def main():
    import jax

    assert jax.default_backend() == "tpu", "smoke test needs the chip"
    fast = "--fast" in sys.argv
    sections = None                    # e.g. --sections=qattn,mx_quant
    for a in sys.argv[1:]:
        if a.startswith("--sections="):
            sections = set(a.split("=", 1)[1].split(","))
    r = Runner()

    def want(name):
        return sections is None or name in sections

    if want("dequant"):
        section_dequant_matmul(r, fast)
    if want("outlier"):
        section_outlier(r, fast)
    if want("mx_quant"):
        section_mx_quant(r)
    if want("qattn") and not fast:
        section_quant_attention(r)

    out = pathlib.Path(__file__).resolve().parent.parent / "SMOKE_r05.json"
    cases = r.results
    if sections is not None and out.exists():
        # partial rerun: merge over the existing artifact by case name
        old = json.loads(out.read_text())["cases"]
        new_names = {c["case"] for c in cases}
        cases = [c for c in old if c["case"] not in new_names] + cases
    failures = sum(not c["ok"] for c in cases)
    artifact = {"n_cases": len(cases), "n_failures": failures,
                "ok": failures == 0, "cases": cases}
    out.write_text(json.dumps(artifact, indent=1))
    print(f"wrote {out}: {len(cases)} cases, {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
