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
            from microscopiq_tpu.ops.packing import to_serving_layout
            fmt = packed_specs["w_elem_format"]
            transport = ("emi8" if fmt in ("fp4", "fp4_e2m1", "fp6_e3m2",
                                           "fp6_e2m3") else "native")
            # pre-blocked serving layout: the SAD kernel consumes it
            # without the per-call full-tensor reshape copy
            p = to_serving_layout(pack_mx(
                w.astype(jnp.float32),
                packed_specs["scale_bits"] or 8, fmt,
                packed_specs["block_size"], axis=0,
                transport=transport))
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


def _tree_bytes(tree):
    import jax

    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype"))


def main():
    import jax
    import jax.numpy as jnp

    from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM
    from microscopiq_tpu.nn import fuse_projections
    from microscopiq_tpu.specs import finalize_mx_specs

    on_tpu = jax.default_backend() == "tpu"
    # Phase 1 (ratio): dense and packed interleaved in one process — the
    # chip clock drifts 1.5-2x between minutes, so only interleaved
    # ratios are trustworthy. Both models resident => 12L fits 16 GB.
    # Phase 2 (full depth): the FULL 32L packed model, alone. Dense bf16
    # Llama-3-8B (~16 GB weights) does not fit the chip at all — the
    # packed transport is what makes single-chip 8B serving possible —
    # so the full-depth dense baseline is the interleaved per-layer
    # measurement extrapolated to 32L.
    ratio_layers = 12 if on_tpu else 2
    full_layers = 32 if on_tpu else 2
    B, S0, STEPS = 8, 128, 32
    max_len = S0 + STEPS + 8
    specs = finalize_mx_specs({"w_elem_format": "fp6_e3m2",
                               "scale_bits": 8, "block_size": 32})

    def build(layers, packed):
        cfg = LlamaConfig.llama3_8b(num_hidden_layers=layers,
                                    dtype=jnp.bfloat16,
                                    fused_projections=True)
        if not on_tpu:
            cfg = LlamaConfig.tiny(dtype=jnp.bfloat16,
                                   fused_projections=True)
        model = LlamaForCausalLM(cfg, use_pallas=on_tpu)
        params = build_params(cfg, jax.random.PRNGKey(0),
                              packed_specs=packed)
        params = {"params": fuse_projections(params["params"])}
        ids = jnp.asarray(np.random.default_rng(0).integers(
            0, cfg.vocab_size, (B, S0)))
        prefill, decode, state0 = make_decoder(model, cfg, B, S0, STEPS,
                                               max_len)
        tok0, st = prefill(params, ids, state0)
        toks = decode(params, tok0, st)
        _ = np.asarray(toks)[:1]          # compile + warm
        return decode, params, tok0, st

    runs = {tag: build(ratio_layers, pk)
            for tag, pk in (("dense", None), ("packed", specs))}
    best = {tag: 9e9 for tag in runs}
    for _ in range(6):                    # interleave to cancel drift
        for tag, (decode, params, tok0, st) in runs.items():
            t0 = time.perf_counter()
            toks = decode(params, tok0, st)
            _ = np.asarray(toks)[:1]
            best[tag] = min(best[tag], time.perf_counter() - t0)
    ratio = best["dense"] / best["packed"]

    del runs
    gc.collect()

    # ---- phase 2: full-depth packed model, HBM-bandwidth accounting
    decode, params, tok0, st = build(full_layers, specs)
    weight_bytes = _tree_bytes(params)
    kv_bytes = _tree_bytes(st)
    tb = 9e9
    for _ in range(4):
        t0 = time.perf_counter()
        toks = decode(params, tok0, st)
        _ = np.asarray(toks)[:1]
        tb = min(tb, time.perf_counter() - t0)
    step_s = tb / STEPS
    tps_full = B * STEPS / tb
    # every decode step streams all weights once; KV is read+written a
    # tiny slice but read fully by attention over the filled prefix
    fill = (S0 + STEPS / 2) / max_len
    hbm_bytes = weight_bytes + kv_bytes * fill
    achieved = hbm_bytes / step_s
    peak = 819e9                          # v5e HBM peak (~819 GB/s)
    dense_ms_ext = best["dense"] / STEPS * 1e3 * full_layers / ratio_layers

    print(json.dumps({
        "metric": f"decode tokens/s, Llama-3-8B ({full_layers}L, full "
                  f"depth) MX-FP6 emi8 packed + fused-GEMV, B={B}, 1 chip",
        "value": round(tps_full, 1),
        "unit": "tokens/s",
        "vs_baseline": round(ratio, 4),
        "extra": {
            "note": ("vs_baseline is the interleaved dense-vs-packed "
                     f"ratio at {ratio_layers}L (dense bf16 8B does not "
                     "fit one 16 GB chip; packed does)"),
            "ms_per_step_full": round(step_s * 1e3, 2),
            "ms_per_step_dense_extrapolated": round(dense_ms_ext, 2),
            "weight_gb": round(weight_bytes / 1e9, 2),
            "achieved_GBps": round(achieved / 1e9, 1),
            "hbm_fraction": round(achieved / peak, 3),
            "ratio_layers": ratio_layers,
            "ms_per_step_packed_ratio_phase": round(
                best["packed"] / STEPS * 1e3, 2),
            "ms_per_step_dense_ratio_phase": round(
                best["dense"] / STEPS * 1e3, 2),
            "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
