#!/usr/bin/env python
"""Single-chip benchmark: prefill throughput of a packed MX-FP6 Llama-3-8B
architecture vs the dense bf16 baseline (same arch, same chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s", "vs_baseline": N}

vs_baseline = packed tokens/s / dense-bf16 tokens/s (>1 means the fused
dequant-GEMM path beats dense bf16).

Notes: models are built layer-by-layer on device with random weights (no
network access); dense and packed runs happen sequentially so both fit in
one v5e's 16 GB HBM. Timing forces a host transfer at the end because
block_until_ready() does not synchronize through the axon relay.
"""

import gc
import json
import sys
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


def bench_forward(model, params, ids, iters=8):
    import jax
    f = jax.jit(lambda p, i: model.apply(p, i))
    out = f(params, ids)
    _ = np.asarray(out[0, 0, :3])  # sync (compile + warmup)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(params, ids)
    _ = np.asarray(out[0, 0, :3])  # force completion through the relay
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM
    from microscopiq_tpu.specs import finalize_mx_specs

    on_tpu = jax.default_backend() == "tpu"
    layers = 16 if on_tpu else 2   # half-depth so dense bf16 also fits HBM
    cfg = LlamaConfig.llama3_8b(num_hidden_layers=layers,
                                dtype=jnp.bfloat16)
    if not on_tpu:
        cfg = LlamaConfig.tiny(dtype=jnp.bfloat16)

    B, S = 4, 512
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (B, S)))
    tokens = B * S

    specs = finalize_mx_specs({"w_elem_format": "fp6_e3m2",
                               "scale_bits": 8, "block_size": 32})

    # dense bf16 baseline
    model_d = LlamaForCausalLM(cfg, use_pallas=on_tpu)
    params_d = build_params(cfg, jax.random.PRNGKey(0))
    dt_dense = bench_forward(model_d, params_d, ids)
    del params_d
    gc.collect()

    # packed MX-FP6
    model_q = LlamaForCausalLM(cfg, use_pallas=on_tpu)
    params_q = build_params(cfg, jax.random.PRNGKey(0), packed_specs=specs)
    dt_packed = bench_forward(model_q, params_q, ids)

    tps_packed = tokens / dt_packed
    tps_dense = tokens / dt_dense
    print(json.dumps({
        "metric": f"prefill tokens/s, Llama-3-8B arch ({layers}L) "
                  f"MX-FP6 packed, B={B} S={S}, 1 chip",
        "value": round(tps_packed, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tps_packed / tps_dense, 4),
        "extra": {"dense_bf16_tokens_per_s": round(tps_dense, 1),
                  "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
