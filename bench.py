#!/usr/bin/env python
"""Single-chip serving benchmark: decode throughput of a packed MX-FP6
Llama-3-8B architecture vs the dense bf16 baseline (same arch, same chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N}

vs_baseline = packed decode tokens/s / dense bf16 decode tokens/s. Decode
is HBM-bandwidth-bound on the weights, the regime quantized serving is
for: the packed path streams 1 byte/weight (emi8 fp6 codes) through the
scale-after-dot Pallas GEMV instead of 2 (bf16), with fused qkv/gate-up
projections. Both paths share the identical attention/cache/lm_head code.

Methodology: decode steps run under lax.scan inside one jit (the tunnel
adds ~30 ms per dispatch, and this chip's clock drifts ~1.5x over
minutes, so dense and packed are measured interleaved and min-of-k is
reported for each).
"""

import gc
import json
import time

import numpy as np


def build_params(cfg, key, packed_specs=None):
    """Random param tree for LlamaForCausalLM, built layer by layer."""
    import jax
    import jax.numpy as jnp
    from microscopiq_tpu.ops.packing import pack_mx

    D, I = cfg.hidden_size, cfg.intermediate_size
    H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)

    def dense(key, shape):
        return (jax.random.normal(key, shape, jnp.bfloat16) * 0.02)

    def kernel(key, shape):
        w = dense(key, shape)
        if packed_specs is not None:
            fmt = packed_specs["w_elem_format"]
            transport = ("emi8" if fmt in ("fp4", "fp4_e2m1", "fp6_e3m2",
                                           "fp6_e2m3") else "native")
            p = pack_mx(w.astype(jnp.float32),
                        packed_specs["scale_bits"] or 8, fmt,
                        packed_specs["block_size"], axis=0,
                        transport=transport)
            del w
            return p
        return w

    keys = iter(jax.random.split(key, 16 + 16 * cfg.num_hidden_layers))
    model = {"embed_tokens": dense(next(keys), (cfg.vocab_size, D))}
    for i in range(cfg.num_hidden_layers):
        model[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": {"kernel": kernel(next(keys), (D, H * hd))},
                "k_proj": {"kernel": kernel(next(keys), (D, KVH * hd))},
                "v_proj": {"kernel": kernel(next(keys), (D, KVH * hd))},
                "o_proj": {"kernel": kernel(next(keys), (H * hd, D))},
            },
            "mlp": {
                "gate_proj": {"kernel": kernel(next(keys), (D, I))},
                "up_proj": {"kernel": kernel(next(keys), (D, I))},
                "down_proj": {"kernel": kernel(next(keys), (I, D))},
            },
            "input_layernorm": {"scale": jnp.ones(D, jnp.bfloat16)},
            "post_attention_layernorm": {"scale": jnp.ones(D, jnp.bfloat16)},
        }
    model["norm"] = {"scale": jnp.ones(D, jnp.bfloat16)}
    return {"params": {"model": model,
                       "lm_head": {"kernel": dense(next(keys),
                                                   (D, cfg.vocab_size))}}}


def make_decoder(model, cfg, B, S0, steps, max_len):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from microscopiq_tpu.kv.cache import DenseDecodeCache, init_dense_cache

    state0 = init_dense_cache(cfg.num_hidden_layers, B, max_len,
                              cfg.num_key_value_heads, cfg.head_dim)

    @jax.jit
    def prefill(params, ids, state):
        cache = DenseDecodeCache(state)
        pos = jnp.broadcast_to(jnp.arange(S0)[None, :], (B, S0))
        logits = model.apply(params, ids, positions=pos, cache=cache)
        return (jnp.argmax(logits[:, -1], -1).astype(jnp.int32),
                cache.finalize())

    @jax.jit
    def decode(params, tok0, state):
        def step(carry, _):
            tok, st = carry
            cache = DenseDecodeCache(st)
            pos = jnp.broadcast_to(st.length[None, None], (B, 1))
            logits = model.apply(params, tok[:, None], positions=pos,
                                 cache=cache)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            return (nxt, cache.finalize()), nxt
        (_, _), toks = lax.scan(step, (tok0, state), None, length=steps)
        return toks

    return prefill, decode, state0


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM
    from microscopiq_tpu.nn import fuse_projections
    from microscopiq_tpu.specs import finalize_mx_specs

    on_tpu = jax.default_backend() == "tpu"
    layers = 12 if on_tpu else 2   # both param sets live at once (interleaved timing); 12L dense+packed+caches fit 16 GB HBM
    cfg = LlamaConfig.llama3_8b(num_hidden_layers=layers,
                                dtype=jnp.bfloat16,
                                fused_projections=True)
    if not on_tpu:
        cfg = LlamaConfig.tiny(dtype=jnp.bfloat16, fused_projections=True)

    B, S0, STEPS = 8, 128, 32
    max_len = S0 + STEPS + 8
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (B, S0)))
    specs = finalize_mx_specs({"w_elem_format": "fp6_e3m2",
                               "scale_bits": 8, "block_size": 32})

    runs = {}
    for tag, packed in (("dense", None), ("packed", specs)):
        model = LlamaForCausalLM(cfg, use_pallas=on_tpu)
        params = build_params(cfg, jax.random.PRNGKey(0),
                              packed_specs=packed)
        params = {"params": fuse_projections(params["params"])}
        prefill, decode, state0 = make_decoder(model, cfg, B, S0, STEPS,
                                               max_len)
        tok0, st = prefill(params, ids, state0)
        toks = decode(params, tok0, st)
        _ = np.asarray(toks)[:1]          # compile + warm
        runs[tag] = (decode, params, tok0, st)
        gc.collect()

    best = {tag: 9e9 for tag in runs}
    for _ in range(6):                    # interleave to cancel drift
        for tag, (decode, params, tok0, st) in runs.items():
            t0 = time.perf_counter()
            toks = decode(params, tok0, st)
            _ = np.asarray(toks)[:1]
            best[tag] = min(best[tag], time.perf_counter() - t0)

    tps = {tag: B * STEPS / t for tag, t in best.items()}
    print(json.dumps({
        "metric": f"decode tokens/s, Llama-3-8B arch ({layers}L) MX-FP6 "
                  f"emi8 packed + fused-GEMV, B={B}, 1 chip",
        "value": round(tps["packed"], 1),
        "unit": "tokens/s",
        "vs_baseline": round(tps["packed"] / tps["dense"], 4),
        "extra": {"dense_bf16_tokens_per_s": round(tps["dense"], 1),
                  "ms_per_step_packed": round(best["packed"] / STEPS * 1e3,
                                              2),
                  "ms_per_step_dense": round(best["dense"] / STEPS * 1e3,
                                             2),
                  "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
