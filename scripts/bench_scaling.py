#!/usr/bin/env python
"""Tokens/s vs #chips scaling bench — turnkey for a pod run.

Measures the packed-weight (+ optionally quantized-KV) decode step over
(1, N)-model TP meshes built from prefixes of ``jax.devices()``, and
reports scaling efficiency vs the single-device run (BASELINE.md target:
>=85% tokens/s scaling 1 -> 16 chips).

On this container only one real TPU chip is reachable, so the default
run validates the mechanism on a virtual CPU mesh
(--virtual N => XLA_FLAGS=--xla_force_host_platform_device_count=N);
on a real slice, run plainly:  python scripts/bench_scaling.py

Prints one JSON line per mesh size:
  {"metric": "decode tokens/s (chips=4)", "value": ..., "unit": "tok/s",
   "vs_baseline": <efficiency vs 1 chip>}
"""

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chips", default="",
                    help="comma list of mesh sizes; default 1,2,4,...,N")
    ap.add_argument("--virtual", type=int, default=0,
                    help="use an N-device virtual CPU mesh (validation)")
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--ffn", type=int, default=2816)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=32)
    ap.add_argument("--steps", type=int, default=32,
                    help="decode steps per timing run")
    ap.add_argument("--cache", default="quant", choices=["dense", "quant"])
    ap.add_argument("--reps", type=int, default=3)
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.virtual}").strip()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    from microscopiq_tpu.eval.generate import generate
    from microscopiq_tpu.kv.cache import QuantKVConfig
    from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM
    from microscopiq_tpu.nn import pack_params
    from microscopiq_tpu.parallel import make_mesh, shard_params
    from microscopiq_tpu.specs import finalize_mx_specs

    devs = jax.devices()
    n_dev = len(devs)
    sizes = ([int(c) for c in args.chips.split(",") if c]
             if args.chips else
             [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev])
    print(f"backend={jax.default_backend()} devices={n_dev} "
          f"meshes={sizes}", file=sys.stderr)

    cfg = LlamaConfig(
        vocab_size=8192, hidden_size=args.hidden,
        intermediate_size=args.ffn, num_hidden_layers=args.layers,
        num_attention_heads=args.heads,
        num_key_value_heads=args.kv_heads,
        max_position_embeddings=args.prompt + args.steps + 8)
    model = LlamaForCausalLM(
        cfg, use_pallas=(jax.default_backend() == "tpu"))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                   (args.batch, args.prompt)))
    params = model.init(jax.random.PRNGKey(0), ids)
    specs = finalize_mx_specs({"w_elem_format": "fp6_e3m2",
                               "scale_bits": 8, "block_size": 32})
    packed = pack_params(params["params"], specs,
                         skip=("embed_tokens", "lm_head"))
    qcfg = (QuantKVConfig(bits=4, gap=32)
            if args.cache == "quant" else None)
    prompt = np.asarray(ids)

    results = {}
    for n in sizes:
        mesh = make_mesh(n, data=1, model=n, devices=devs[:n])
        p_sh = {"params": shard_params(packed, mesh)}

        def run():
            out = generate(model, p_sh, prompt,
                           max_new_tokens=args.steps,
                           cache_kind=args.cache, quant_cfg=qcfg)
            return out

        run()                                        # compile + warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        toks = args.batch * args.steps / best
        results[n] = toks

    base = results[sizes[0]] / sizes[0]
    for n in sizes:
        eff = results[n] / (base * n)
        print(json.dumps({
            "metric": f"decode tokens/s (chips={n}, {args.cache} KV)",
            "value": round(results[n], 1), "unit": "tok/s",
            "vs_baseline": round(eff, 3)}))


if __name__ == "__main__":
    main()
