#!/usr/bin/env python
"""Trained VLM accuracy probe for packed weights + quantized KV.

VERDICT r4 missing #3: every VLM accuracy number so far came from an
untrained toy ("score is noise"). This applies the round-4/5 KV-probe
methodology (train until the task is learned, then measure degradation)
to the MULTIMODAL path — the same kind of signal as the reference's VQA
driver (vlm/llava.py:90-141), at a scale this no-network environment
can produce.

Task — visual retrieval: the image is an 8x8 grid of cells, each a
solid color from an 8-color palette; the prompt is
``[BOS] [IMG x 64] q_i`` and the model must answer the color token of
cell i. Every query is answered by attending to the right image PATCH
through the cache under test, so accuracy degrades with KV fidelity
exactly like the text retrieval probe — and the image tokens are
continuous CLIP/projector embeddings, the real VLM regime (no token
identity shortcut). head_dim=16 keys make 2-bit quantization noise
comparable to the attention margins (same hardness lever as
scripts/kv_accuracy.py).

Arms: dense / packed MX-FP6 text tower (weights) / KIVI-4bit KV /
KIVI-2bit KV / GEAR-L 2bit KV / packed weights + KIVI-4bit combined.
Expected shape: dense ~= fp6 ~= 4bit ~= 1.0, KIVI-2bit visibly down,
GEAR-2bit recovering most of it.

Writes VLM_PROBE_r05.json. Usage: python scripts/vlm_probe.py [--steps N]
"""

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

GRID = 8                      # cells per side
NCELL = GRID * GRID           # 64 image tokens, one per cell
NCOLOR = 8

PALETTE = np.array(
    [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0],
     [1, 0, 1], [0, 1, 1], [1, 1, 1], [-1, -1, -1]], np.float32)


def sample_images(rng, B):
    """(B, 64, 64, 3) channel-last images + (B, NCELL) cell color ids."""
    cells = rng.integers(0, NCOLOR, (B, GRID, GRID))
    img = PALETTE[cells]                       # (B, G, G, 3)
    img = np.repeat(np.repeat(img, 8, axis=1), 8, axis=2)
    return img.astype(np.float32), cells.reshape(B, -1)


def build_batch(rng, task_vocab, B, n_queries):
    """ids (B, 1+NCELL+2Q), img mask, pixel values, query cells, answers."""
    BOS, Q0, C0 = task_vocab
    pix, cells = sample_images(rng, B)
    q = np.argsort(rng.random((B, NCELL)), axis=1)[:, :n_queries]
    ans = np.take_along_axis(cells, q, axis=1)          # color ids
    S = 1 + NCELL + 2 * n_queries
    ids = np.zeros((B, S), np.int32)
    ids[:, 0] = BOS
    mask = np.zeros((B, S), bool)
    mask[:, 1:1 + NCELL] = True
    ids[:, 1 + NCELL::2] = Q0 + q
    ids[:, 2 + NCELL::2] = C0 + ans
    return ids, mask, pix, q, ans


VOCAB = 2 + NCELL + NCOLOR           # BOS, PAD, queries, colors
BOS, Q0, C0 = 0, 2, 2 + NCELL
TASK_VOCAB = (BOS, Q0, C0)


def probe_model():
    """The trained-probe LLaVA config/model (shared with vlm_bench's
    long-horizon KV-agreement section, which loads this model's saved
    params — an untrained model's near-zero argmax margins make long
    agreement pure noise)."""
    from microscopiq_tpu.models import LlamaConfig
    from microscopiq_tpu.vlm.clip import CLIPVisionConfig
    from microscopiq_tpu.vlm.llava import LlavaConfig, LlavaForCausalLM

    text = LlamaConfig.tiny(num_hidden_layers=2, hidden_size=128,
                            num_attention_heads=8, num_key_value_heads=2,
                            intermediate_size=256, vocab_size=VOCAB,
                            max_position_embeddings=256)
    vis = CLIPVisionConfig.tiny(image_size=64, patch_size=8,
                                hidden_size=64, intermediate_size=128)
    cfg = LlavaConfig(text=text, vision=vis, projector_type="linear",
                      vision_select_feature="patch")
    assert cfg.num_image_tokens == NCELL
    return cfg, LlavaForCausalLM(cfg, use_pallas=False)


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from microscopiq_tpu.eval.generate import _make_cache
    from microscopiq_tpu.kv.cache import QuantKVConfig
    from microscopiq_tpu.specs import finalize_mx_specs

    steps = 1200
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])

    task_vocab = TASK_VOCAB
    cfg, model = probe_model()
    text = cfg.text

    rng = np.random.default_rng(0)
    NQ = 8
    ids0, mask0, pix0, _, _ = build_batch(rng, task_vocab, 1, NQ)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids0),
                        pixel_values=jnp.asarray(pix0),
                        image_token_mask=jnp.asarray(mask0))

    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, 2e-3, 150),
         optax.constant_schedule(2e-3)], [150])
    opt = optax.adam(sched)
    opt_state = opt.init(params)
    qpos = jnp.arange(1 + NCELL, 1 + NCELL + 2 * NQ, 2)

    @jax.jit
    def train_step(params, opt_state, ids, mask, pix, ans):
        def loss_fn(p):
            logits = model.apply(p, ids, pixel_values=pix,
                                 image_token_mask=mask)
            sel = logits[:, qpos].astype(jnp.float32)    # (B, Q, V)
            lp = jax.nn.log_softmax(sel, -1)
            tgt = C0 + ans
            loss = -jnp.take_along_axis(lp, tgt[..., None], -1).mean()
            acc = (jnp.argmax(sel, -1) == tgt).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    ckpt = pathlib.Path(f"/tmp/vlm_probe_params_{steps}.pkl")
    if ckpt.exists() and "--retrain" not in sys.argv:
        import pickle
        params = pickle.loads(ckpt.read_bytes())
        print("loaded", ckpt, flush=True)
    else:
        t0 = time.time()
        B = 64
        for s in range(steps):
            ids, mask, pix, _, ans = build_batch(rng, task_vocab, B, NQ)
            params, opt_state, loss, acc = train_step(
                params, opt_state, jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(pix), jnp.asarray(ans))
            if s % 100 == 0 or s == steps - 1:
                print(f"step {s}: loss {float(loss):.4f} "
                      f"acc {float(acc):.3f}", flush=True)
        print(f"trained in {time.time() - t0:.0f}s", flush=True)
        import pickle
        ckpt.write_bytes(pickle.dumps(
            jax.tree_util.tree_map(lambda a: np.asarray(a), params)))

    # ---- cache-under-test eval: prefill [BOS][IMG], decode q -> a ----
    def probe_accuracy(params, *, kind="dense", quant_cfg=None,
                       B=64, n_batches=4, seed=99):
        S_ctx = 1 + NCELL
        gap = quant_cfg.gap if quant_cfg is not None else 16
        max_len = ((S_ctx + 2 + gap) // gap + 1) * gap
        state0, wrap = _make_cache(kind, cfg.text, B, max_len, quant_cfg)

        @jax.jit
        def run(params, ids, mask, pix):
            cache = wrap(state0)
            pos = jnp.broadcast_to(jnp.arange(S_ctx)[None], (B, S_ctx))
            model.apply(params, ids[:, :S_ctx], positions=pos,
                        cache=cache, pixel_values=pix,
                        image_token_mask=mask[:, :S_ctx])
            state = cache.finalize()
            cache = wrap(state)
            pos = jnp.full((B, 1), S_ctx, jnp.int32)
            logits = model.apply(params, ids[:, S_ctx:S_ctx + 1],
                                 positions=pos, cache=cache)
            return jnp.argmax(logits[:, -1], -1)

        r = np.random.default_rng(seed)
        hits = total = 0
        for _ in range(n_batches):
            ids, mask, pix, _, ans = build_batch(r, task_vocab, B, 1)
            pred = np.asarray(run(params, jnp.asarray(ids),
                                  jnp.asarray(mask), jnp.asarray(pix)))
            hits += int((pred == C0 + ans[:, 0]).sum())
            total += B
        return hits / total

    hd = text.head_dim
    gap = 8          # small residual window: 56/64 image tokens live in
    #                  quantized chunks at decode time
    dense_acc = probe_accuracy(params, kind="dense")
    print(f"dense: {dense_acc:.4f}", flush=True)
    if dense_acc < 0.9:
        print("task not learned; rerun with more --steps")
        sys.exit(1)

    # packed MX-FP6 text tower (weights arm)
    from microscopiq_tpu.nn import quantize_params
    specs6 = finalize_mx_specs({"w_elem_format": "fp6_e3m2",
                                "scale_bits": 8, "block_size": 32,
                                "bfloat": 16})
    p6 = dict(params)
    p6["params"] = dict(params["params"])
    p6["params"]["model"] = quantize_params(
        params["params"]["model"], specs6, skip=("embed_tokens",))
    fp6_acc = probe_accuracy(p6, kind="dense")
    print(f"fp6 weights: {fp6_acc:.4f}", flush=True)

    arms = {
        "KIVI-4bit": QuantKVConfig(bits=4, gap=gap, v_group=hd),
        "KIVI-2bit": QuantKVConfig(bits=2, gap=gap, v_group=hd),
        "GEARL-2bit-r4": QuantKVConfig(bits=2, gap=gap, v_group=hd,
                                       rank=4),
    }
    results = {"dense": {"accuracy": round(dense_acc, 4)},
               "packed_fp6_weights": {
                   "accuracy": round(fp6_acc, 4),
                   "delta_vs_dense": round(fp6_acc - dense_acc, 4)}}
    for name, qc in arms.items():
        acc = probe_accuracy(params, kind="quant", quant_cfg=qc)
        results[name] = {"accuracy": round(acc, 4),
                         "delta_vs_dense": round(acc - dense_acc, 4)}
        print(json.dumps({"arm": name, **results[name]}), flush=True)
    acc = probe_accuracy(p6, kind="quant", quant_cfg=arms["KIVI-4bit"])
    results["packed_fp6+KIVI-4bit"] = {
        "accuracy": round(acc, 4),
        "delta_vs_dense": round(acc - dense_acc, 4)}
    print(json.dumps({"arm": "packed_fp6+KIVI-4bit",
                      **results["packed_fp6+KIVI-4bit"]}), flush=True)

    import jax as _jax
    checks = {
        "dense_learned": dense_acc >= 0.9,
        "fp6_weights_lossless": abs(fp6_acc - dense_acc) <= 0.02,
        "4bit_beats_2bit": (results["KIVI-4bit"]["accuracy"]
                            > results["KIVI-2bit"]["accuracy"]),
        "gear_corrects_2bit": (results["GEARL-2bit-r4"]["accuracy"]
                               > results["KIVI-2bit"]["accuracy"]),
        "separation": dense_acc - results["KIVI-2bit"]["accuracy"] > 0.05,
    }
    art = {
        "task": ("8x8 color-grid visual retrieval: answer the color of "
                 "cell i; every answer requires attending to the right "
                 "image patch through the cache under test "
                 "(56/64 image tokens sit in quantized chunks at "
                 f"gap={gap})"),
        "model": ("toy LLaVA: CLIP tiny (64px/8px patches, 64 image "
                  "tokens) + linear projector + 2L-128d text tower, "
                  "head_dim=16, trained end-to-end from scratch"),
        "backend": _jax.default_backend(),
        "train_steps": steps,
        "results": results,
        "ordering_checks": checks,
        "all_checks_pass": all(checks.values()),
    }
    out = pathlib.Path(__file__).resolve().parent.parent / \
        "VLM_PROBE_r05.json"
    out.write_text(json.dumps(art, indent=1))
    print("wrote", out, "all_checks_pass:", all(checks.values()))


if __name__ == "__main__":
    main()
