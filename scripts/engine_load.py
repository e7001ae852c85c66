#!/usr/bin/env python
"""Continuous-batching engine under load (VERDICT r4 ask #9).

Drives the slot engine (serve/engine.py) with Poisson arrivals and
mixed prompt lengths on one real chip — the serving regime the
BASELINE north-star names ("continuous batching across hosts";
reference worker: vlm/llava/serve/model_worker.py:44-223 serves ONE
request per generate call). Records per-request TTFT (arrival ->
first token), end-to-end latency, engine token throughput, and slot
occupancy, for the dense-KV engine and the quantized-KV engine
(KIVI-4bit slot cache) on the same MX-FP6-packed 8B-dim model.

Writes ENGINE_r05.json.

Usage: python scripts/engine_load.py [--layers N] [--requests N]
                                     [--rate R]   # arrivals per second
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def run_arm(tag, cache_kind, layers, n_requests, rate, seed=0):
    import jax
    import jax.numpy as jnp

    from microscopiq_tpu.kv.cache import QuantKVConfig
    from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM
    from microscopiq_tpu.nn import fuse_projections
    from microscopiq_tpu.serve.engine import BatchEngine, Request
    from microscopiq_tpu.specs import finalize_mx_specs
    from microscopiq_tpu.utils.observability import metrics

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import bench as benchmod

    on_tpu = jax.default_backend() == "tpu"
    cfg = (LlamaConfig.llama3_8b(num_hidden_layers=layers,
                                 dtype=jnp.bfloat16,
                                 fused_projections=True)
           if on_tpu else LlamaConfig.tiny(fused_projections=True))
    specs = finalize_mx_specs({"w_elem_format": "fp6_e3m2",
                               "scale_bits": 8, "block_size": 32})
    model = LlamaForCausalLM(cfg, use_pallas=on_tpu)
    params = benchmod.build_params(cfg, jax.random.PRNGKey(0),
                                   packed_specs=specs)
    params = {"params": fuse_projections(params["params"])}

    qcfg = QuantKVConfig(bits=4, gap=64, v_group=cfg.head_dim)
    engine = BatchEngine(model, params, n_slots=8, max_len=512,
                        prompt_buckets=(32, 64, 128, 256),
                        cache_kind=cache_kind,
                        quant_cfg=qcfg if cache_kind == "quant" else None,
                        h2o_budget=256, h2o_recent=16)

    rng = np.random.default_rng(seed)
    lens = rng.choice([24, 48, 96, 200], n_requests,
                      p=[0.35, 0.3, 0.2, 0.15])
    prompts = [rng.integers(0, cfg.vocab_size, n).astype(np.int32)
               for n in lens]
    arrivals = np.cumsum(rng.exponential(1.0 / rate, n_requests))

    # warm the compiles OUTSIDE the timed window (one prefill per
    # bucket + the decode step)
    for L in (32, 64, 128, 256):
        w = Request(rng.integers(0, cfg.vocab_size, L - 4)
                    .astype(np.int32), max_new_tokens=2)
        engine.submit(w)
        engine.run_until_drained()

    first_tok = {}
    done_at = {}
    reqs = []
    for i, p in enumerate(prompts):
        def cb(tok, done, i=i):
            t = time.perf_counter()
            if i not in first_tok:
                first_tok[i] = t
            if done:
                done_at[i] = t

        reqs.append(Request(p, max_new_tokens=48, on_token=cb))

    metrics.reset() if hasattr(metrics, "reset") else None
    t0 = time.perf_counter()
    nxt = 0
    occupancy = []
    steps = 0
    while len(done_at) < n_requests:
        now = time.perf_counter() - t0
        while nxt < n_requests and arrivals[nxt] <= now:
            reqs[nxt]._t_submit = time.perf_counter()
            engine.submit(reqs[nxt])
            nxt += 1
        live = engine.step()
        occupancy.append(live)
        steps += 1
        if live == 0 and nxt < n_requests:
            time.sleep(min(0.005, max(0.0, arrivals[nxt] - now)))
        if steps > 200000:
            break
    wall = time.perf_counter() - t0

    ttfts = sorted((first_tok[i] - reqs[i]._t_submit)
                   for i in range(n_requests) if i in first_tok)
    lats = sorted((done_at[i] - reqs[i]._t_submit)
                  for i in range(n_requests) if i in done_at)
    total_new = sum(len(r.out_tokens) for r in reqs)

    def pct(xs, p):
        return round(xs[min(len(xs) - 1, int(p * len(xs)))] * 1e3, 1)

    occ = np.asarray(occupancy, np.float32)
    res = {
        "cache": cache_kind,
        "layers": layers,
        "n_requests": n_requests,
        "arrival_rate_per_s": rate,
        "completed": len(done_at),
        "wall_s": round(wall, 2),
        "gen_tokens_per_s": round(total_new / wall, 1),
        "p50_ttft_ms": pct(ttfts, 0.50),
        "p99_ttft_ms": pct(ttfts, 0.99),
        "p50_latency_ms": pct(lats, 0.50),
        "p99_latency_ms": pct(lats, 0.99),
        "mean_active_slots": round(float(occ[occ > 0].mean()), 2)
        if (occ > 0).any() else 0.0,
        "decode_steps": steps,
    }
    print(json.dumps({"arm": tag, **res}), flush=True)
    # free HBM for the next arm
    for leaf in jax.tree_util.tree_leaves((params, engine.state)):
        if hasattr(leaf, "delete"):
            leaf.delete()
    return res


def main():
    import jax

    layers = 8 if jax.default_backend() == "tpu" else 2
    n_requests, rate = 48, 6.0
    if "--layers" in sys.argv:
        layers = int(sys.argv[sys.argv.index("--layers") + 1])
    if "--requests" in sys.argv:
        n_requests = int(sys.argv[sys.argv.index("--requests") + 1])
    if "--rate" in sys.argv:
        rate = float(sys.argv[sys.argv.index("--rate") + 1])

    art = {"model": f"Llama-3-8B dims at {layers}L, MX-FP6 emi8 packed "
                    "weights, 8 slots, buckets (32,64,128,256)",
           "workload": f"{n_requests} requests, Poisson arrivals, "
                       "prompt lengths {24,48,96,200}, 48 new tokens",
           "arms": {}}
    for tag, kind in (("dense_kv", "dense"), ("quant_kv_kivi4", "quant"),
                      ("h2o_budget256", "h2o")):
        art["arms"][tag] = run_arm(tag, kind, layers, n_requests, rate)
    # moderate-load point: arrivals well under capacity, so TTFT
    # reflects prefill latency instead of queueing
    art["arms"]["quant_kv_kivi4_moderate"] = run_arm(
        "quant_kv_kivi4_moderate", "quant", layers, max(n_requests // 2,
                                                        16), rate / 3.0)
    out = pathlib.Path(__file__).resolve().parent.parent / \
        "ENGINE_r05.json"
    out.write_text(json.dumps(art, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
