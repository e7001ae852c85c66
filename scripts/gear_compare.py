#!/usr/bin/env python
"""KIVI vs GEAR KV-cache comparison, end-to-end through the jitted
decode path (VERDICT r2 item 4 artifact).

Mirrors the reference's GSM8K KV experiments (kv_quant/GEARLM/
evaluation_gsm8k.py with CompressionConfig methods KIVI / GEARL-KIVI /
GEARS-KIVI): each method serves the SAME model and token stream through
``eval.generate``'s real cache machinery; reported per method are

  * teacher-forced decode perplexity delta vs the dense-KV run (every
    next-token logprob computed with the quantized cache in the loop),
  * greedy-generation token agreement with the dense run,
  * the analytic compression ratio (codes + scales + GEAR side-band),
  * synthetic-GSM8K harness accuracy (pipeline check).

No network in this environment, so the model is a fixed-seed toy Llama
and the corpus/GSM8K set are the synthetic fallbacks — the DELTAS
between methods are the signal (codec fidelity through the real decode
path), not the absolute numbers. Writes GEAR_KV_r03.json.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from microscopiq_tpu.eval.generate import generate
    from microscopiq_tpu.kv.cache import (QuantKVConfig,
                                          QuantizedDecodeCache,
                                          init_quant_cache)
    from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig.tiny(num_hidden_layers=4, hidden_size=128,
                           num_attention_heads=4, num_key_value_heads=2,
                           intermediate_size=256, vocab_size=512)
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))

    rng = np.random.default_rng(7)
    B, S_prompt, T = 4, 96, 96
    # structured synthetic stream (markov-ish) so K/V carry signal
    base = rng.integers(0, cfg.vocab_size, (B, 8))
    ids = np.concatenate([base] * ((S_prompt + T) // 8 + 1), axis=1)
    ids = (ids + rng.integers(0, 3, ids.shape)) % cfg.vocab_size
    ids = ids[:, :S_prompt + T].astype(np.int32)

    gap = 32
    methods = {
        "dense": None,
        "KIVI": QuantKVConfig(bits=4, gap=gap, v_group=cfg.head_dim),
        "GEARL-KIVI-r2": QuantKVConfig(bits=4, gap=gap,
                                       v_group=cfg.head_dim, rank=2),
        "GEARL-KIVI-r4": QuantKVConfig(bits=4, gap=gap,
                                       v_group=cfg.head_dim, rank=4),
        "GEARS-KIVI": QuantKVConfig(bits=4, gap=gap, v_group=cfg.head_dim,
                                    out_k=8),
        "GEARSL-KIVI": QuantKVConfig(bits=4, gap=gap,
                                     v_group=cfg.head_dim, rank=2,
                                     out_k=8),
        "KIVI-2bit": QuantKVConfig(bits=2, gap=gap, v_group=cfg.head_dim),
        "GEARL-2bit-r4": QuantKVConfig(bits=2, gap=gap,
                                       v_group=cfg.head_dim, rank=4),
    }

    def teacher_forced_nll(quant_cfg):
        """Decode loop over ids with the given cache; mean NLL of the
        true next token, computed from logits produced WITH the
        quantized cache in the attention path."""
        from microscopiq_tpu.eval.generate import _make_cache
        max_len = ((S_prompt + T) // gap + 2) * gap
        state, wrap = _make_cache(
            "dense" if quant_cfg is None else "quant", cfg, B, max_len,
            quant_cfg)

        @jax.jit
        def prefill(params, chunk, state):
            cache = wrap(state)
            positions = jnp.arange(chunk.shape[1])[None, :]
            logits = model.apply(params, chunk, positions=positions,
                                 cache=cache)
            return logits[:, -1], cache.finalize()

        @jax.jit
        def step(params, tok, state):
            cache = wrap(state)
            positions = state.length[None, None] if state.length.ndim == 0 \
                else state.length[:, None]
            logits = model.apply(params, tok, positions=positions,
                                 cache=cache)
            return logits[:, -1], cache.finalize()

        logits_last, state = prefill(params, jnp.asarray(ids[:, :S_prompt]),
                                     state)
        nll, agree = [], []
        for t in range(S_prompt, S_prompt + T):
            tgt = jnp.asarray(ids[:, t])
            lp = jax.nn.log_softmax(logits_last.astype(jnp.float32), -1)
            nll.append(-np.asarray(lp[jnp.arange(B), tgt]))
            agree.append(np.asarray(jnp.argmax(logits_last, -1)))
            if t < S_prompt + T - 1:
                logits_last, state = step(params, tgt[:, None], state)
        return float(np.mean(nll)), np.stack(agree, 1)

    results = {}
    dense_nll, dense_arg = None, None
    for name, qc in methods.items():
        nll, argm = teacher_forced_nll(qc)
        if name == "dense":
            dense_nll, dense_arg = nll, argm
        ratio, ratio8b = None, None
        if qc is not None:
            st = init_quant_cache(cfg.num_hidden_layers, B, 2 * gap,
                                  cfg.num_key_value_heads, cfg.head_dim,
                                  qc)
            ratio = float(QuantizedDecodeCache(st, qc).compression_ratio)
            # same config at Llama-3-8B cache dims (KVH=8, hd=128,
            # gap=64): the ratio the method would deliver in serving
            import dataclasses
            qc8 = dataclasses.replace(qc, gap=64, v_group=128)
            st8 = init_quant_cache(1, 1, 128, 8, 128, qc8)
            ratio8b = float(QuantizedDecodeCache(st8, qc8)
                            .compression_ratio)
        results[name] = {
            "decode_ppl": round(float(np.exp(nll)), 4),
            "delta_ppl_vs_dense": round(float(np.exp(nll) -
                                              np.exp(dense_nll)), 4),
            "top1_agreement_vs_dense": round(
                float((argm == dense_arg).mean()), 4),
            "kv_compression_ratio": (round(ratio, 3)
                                     if ratio is not None else 1.0),
            "ratio_at_llama8b_dims": (round(ratio8b, 3)
                                      if ratio8b is not None else 1.0),
        }
        print(json.dumps({"method": name, **results[name]}), flush=True)

    # GSM8K harness pipeline run (synthetic set; toy model => accuracy
    # is noise — recorded for pipeline completeness, deltas above are
    # the fidelity signal)
    from microscopiq_tpu.eval.gsm8k import evaluate_gsm8k

    class ByteTok:
        def encode(self, s):
            return [min(b, 511) for b in s.encode()][-64:]

        def decode(self, toks):
            return bytes(int(t) % 128 for t in toks).decode(
                "ascii", "replace")

    tok = ByteTok()
    gsm = {}
    for name in ("KIVI", "GEARL-KIVI-r2"):
        qc = methods[name]

        def gen_fn(prompts):
            pids = [tok.encode(p) for p in prompts]
            outs = generate(model, params, pids, max_new_tokens=16,
                            cache_kind="quant", quant_cfg=qc)
            return [tok.decode(o) for o in outs]

        gsm[name] = evaluate_gsm8k(gen_fn, limit=8, batch_size=4)[
            "accuracy"]

    art = {"model": "toy-llama-4L-128d (fixed seed; no network)",
           "corpus": "synthetic markov stream; deltas are the signal",
           "teacher_forced_decode": results,
           "gsm8k_synthetic_accuracy": gsm}
    out = pathlib.Path(__file__).resolve().parent.parent / \
        "GEAR_KV_r03.json"
    out.write_text(json.dumps(art, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
