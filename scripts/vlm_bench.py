#!/usr/bin/env python
"""VLM (LLaVA) performance + accuracy artifact (VERDICT r3 missing #3).

Records, on one chip (BASELINE configs[3]; reference driver
vlm/llava.py:90-141):

  1. Image-prefill throughput: CLIP ViT-L/14-336 tower (577 image
     tokens) + projector + text-tower prefill, tokens/s and ms, for the
     dense bf16 text tower AND the MX-FP6 packed one (pack_llava_lm).
     The text tower uses Llama-8B dims at --layers depth (default 8; a
     32L dense bf16 tower cannot fit a 16 GB chip) — per-layer text
     cost is reported so full-depth extrapolation is explicit.
  2. VQA pipeline accuracy: a toy LLaVA runs the REAL eval_vqa harness
     (synthetic images + questions with fabricated ground truth) to an
     answers jsonl + exact-match score — pipeline completeness, toy
     accuracy is noise.
  3. KV-fidelity through the VLM path: greedy-generation token
     agreement of quant-KV (KIVI-4bit) vs dense-KV on the same
     multimodal prompts.

Writes VLM_r05.json (r5: measured 32L packed image prefill, 128-token KV agreement; the TRAINED accuracy probe is scripts/vlm_probe.py).
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from microscopiq_tpu.kv.cache import QuantKVConfig
    from microscopiq_tpu.models import LlamaConfig
    from microscopiq_tpu.specs import finalize_mx_specs
    from microscopiq_tpu.vlm.clip import CLIPVisionConfig
    from microscopiq_tpu.vlm.eval_vqa import eval_vqa, generate_mm
    from microscopiq_tpu.vlm.llava import (LlavaConfig, LlavaForCausalLM,
                                           pack_llava_lm)

    on_tpu = jax.default_backend() == "tpu"
    layers = 8 if on_tpu else 2
    if "--layers" in sys.argv:
        layers = int(sys.argv[sys.argv.index("--layers") + 1])
    art = {}

    # ---- 1. image-prefill throughput at serving dims ----------------
    if on_tpu:
        text = LlamaConfig.llama3_8b(num_hidden_layers=layers,
                                     dtype=jnp.bfloat16)
        vis = CLIPVisionConfig.vit_large_336()
        cfg = LlavaConfig(text=text, vision=vis)
    else:
        cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    n_img = cfg.num_image_tokens
    S_text = 32
    S = n_img + S_text
    B = 1

    rng = np.random.default_rng(0)
    ids = np.zeros((B, S), np.int32)
    ids[:, n_img:] = rng.integers(2, 1000, (B, S_text))
    img_mask = np.zeros((B, S), bool)
    img_mask[:, :n_img] = True
    pix = rng.standard_normal(
        (B, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)

    print(f"init ({layers}L text, {n_img} image tokens)...", flush=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.asarray(ids),
                                 pixel_values=jnp.asarray(pix),
                                 image_token_mask=jnp.asarray(img_mask))

    def bench_prefill(p, tag):
        @jax.jit
        def prefill(p, ids, mask_img, pixv):
            positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
            logits = model.apply(p, ids, positions=positions,
                                 pixel_values=pixv,
                                 image_token_mask=mask_img)
            # reduce on device: returning the full (B, S, 128256) f32
            # logits would time a 312 MB device->host pull, and
            # block_until_ready alone has proven unreliable through the
            # remote-TPU plugin — materialize a scalar instead
            return jnp.sum(logits[:, -1]).astype(jnp.float32)

        args = (jnp.asarray(ids), jnp.asarray(img_mask),
                jnp.asarray(pix))
        _ = float(prefill(p, *args))
        best = 9e9
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(prefill(p, *args))
            best = min(best, time.perf_counter() - t0)
        res = {"prefill_ms": round(best * 1e3, 2),
               "image_prefill_tokens_per_s": round(S / best, 1),
               "layers": layers, "seq": S, "image_tokens": n_img}
        print(tag, json.dumps(res), flush=True)
        return res

    art["prefill_dense"] = bench_prefill(params, "dense")
    if on_tpu:
        specs = finalize_mx_specs({"w_elem_format": "fp6_e3m2",
                                   "scale_bits": 8, "block_size": 32})
        # pack ON the TPU: the quantizer is jax ops (bench.py packs 8B
        # on-device the same way); host-side packing of a 1.7B tree on
        # this 1-core box takes tens of minutes
        packed = pack_llava_lm(params, specs)
        packed = jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(
                a, "block_until_ready") else a, packed)
        art["prefill_packed_fp6"] = bench_prefill(packed, "packed")

        # r5 (VERDICT r4 missing #3): MEASURED full-depth 32L packed
        # image prefill, not an extrapolation. The packed text tower
        # fits one chip at 32L (dense bf16 does not). Layer VALUES are
        # replicated from the 8L pack into 32 DISTINCT device buffers
        # (full HBM residency; prefill time is a layout property).
        FULL = 32
        if layers < FULL:
            import jax.numpy as _jnp

            @jax.jit
            def _copy(t):
                return jax.tree_util.tree_map(lambda a: a + 0, t)

            mt = dict(packed["params"]["model"])
            for i in range(layers, FULL):
                mt[f"layers_{i}"] = _copy(mt[f"layers_{i % layers}"])
            packed_full = {"params": dict(packed["params"])}
            packed_full["params"]["model"] = mt
            import dataclasses as _dc
            cfg_full = _dc.replace(
                cfg, text=_dc.replace(cfg.text, num_hidden_layers=FULL))
            model_full = LlavaForCausalLM(cfg_full)
            saved_model = model
            try:
                # rebind the closure cell bench_prefill reads
                model = model_full           # noqa: F811
                art["prefill_packed_fp6_fulldepth"] = dict(
                    bench_prefill(packed_full, "packed_32L"),
                    layers=FULL, measured=True)
            finally:
                model = saved_model
            for i in range(layers, FULL):
                for leaf in jax.tree_util.tree_leaves(mt[f"layers_{i}"]):
                    if hasattr(leaf, "delete"):
                        leaf.delete()
        for leaf in jax.tree_util.tree_leaves(packed):
            if hasattr(leaf, "delete"):
                leaf.delete()

    # dense text-tower-only per-layer cost (for full-depth extrapolation)
    art["note"] = ("full-depth 32L extrapolation: prefill_ms scales with"
                   " text layers; vision tower + projector cost is the "
                   "difference vs layers * per-layer cost")

    # ---- 2+3. toy VQA pipeline + quant-KV agreement -----------------
    tiny = LlavaConfig.tiny()
    tmodel = LlavaForCausalLM(tiny)
    tn_img = tiny.num_image_tokens
    tS = tn_img + 16
    tids = np.zeros((1, tS), np.int32)
    tids[:, tn_img:] = rng.integers(2, 200, (1, tS - tn_img))
    tmask = np.zeros((1, tS), bool)
    tmask[:, :tn_img] = True
    tpix = rng.standard_normal(
        (1, tiny.vision.image_size, tiny.vision.image_size, 3)
    ).astype(np.float32)
    tparams = tmodel.init(jax.random.PRNGKey(1), jnp.asarray(tids),
                          pixel_values=jnp.asarray(tpix),
                          image_token_mask=jnp.asarray(tmask))

    # r5: 128-token horizon (the r4 artifact covered only 12), on the
    # TRAINED probe model when its checkpoint exists — an untrained
    # model's argmax margins are ~0, so every arm diverges on numeric
    # noise and long-horizon agreement is pure noise (measured 0.23 on
    # the untrained toy vs 12-token 1.0).
    KV_TOKENS = 128
    probe_ckpt = sorted(pathlib.Path("/tmp").glob("vlm_probe_params_*"))
    if probe_ckpt:
        import importlib.util
        import pickle
        spec_ = importlib.util.spec_from_file_location(
            "vlm_probe", pathlib.Path(__file__).parent / "vlm_probe.py")
        vp = importlib.util.module_from_spec(spec_)
        spec_.loader.exec_module(vp)
        pcfg, pmodel = vp.probe_model()
        pparams = pickle.loads(probe_ckpt[-1].read_bytes())
        pimg, _ = vp.sample_images(np.random.default_rng(5), 1)
        pn = pcfg.num_image_tokens
        pids = np.zeros((1, pn + 2), np.int32)
        pids[0, 0] = vp.BOS
        pids[0, -1] = vp.Q0 + 3
        pm = np.zeros((1, pn + 2), bool)
        pm[0, 1:1 + pn] = True
        out_dense = generate_mm(pmodel, pparams, pids, pm, pimg,
                                max_new_tokens=KV_TOKENS)
        out_quant = generate_mm(
            pmodel, pparams, pids, pm, pimg,
            max_new_tokens=KV_TOKENS, cache_kind="quant",
            quant_cfg=QuantKVConfig(bits=4, gap=8,
                                    v_group=pcfg.text.head_dim))
        model_note = "trained probe model (scripts/vlm_probe.py ckpt)"
    else:
        out_dense = generate_mm(tmodel, tparams, tids, tmask, tpix,
                                max_new_tokens=KV_TOKENS)
        out_quant = generate_mm(
            tmodel, tparams, tids, tmask, tpix,
            max_new_tokens=KV_TOKENS, cache_kind="quant",
            quant_cfg=QuantKVConfig(bits=4, gap=8,
                                    v_group=tiny.text.head_dim))
        model_note = ("untrained toy (probe ckpt absent): agreement is "
                      "noise at this horizon")
    agree = float((out_dense == out_quant).mean())
    art["kv_fidelity"] = {
        "kivi4_vs_dense_token_agreement": round(agree, 4),
        "tokens": int(out_dense.size), "model": model_note}
    print("kv agreement:", agree, flush=True)

    # real eval_vqa harness end-to-end (toy score, pipeline proof)
    class Tok:
        eos_token_id = 199

        def encode(self, s):
            return [2 + (b % 120) for b in s.encode()][:24]

        def decode(self, toks):
            return " ".join(str(int(t)) for t in toks)

    questions = [{"question_id": i, "image": f"img{i}",
                  "text": f"What is in image {i}?"} for i in range(4)]
    answers = eval_vqa(
        tmodel, tparams, Tok(), questions,
        image_loader=lambda name: rng.standard_normal(
            (tiny.vision.image_size, tiny.vision.image_size, 3)),
        answers_file="/tmp/vlm_answers.jsonl", max_new_tokens=8)
    gt = {i: "0" for i in range(4)}   # fabricated ground truth
    score = float(np.mean([
        gt[a["question_id"]] in a["text"] for a in answers]))
    art["vqa_pipeline"] = {"n_questions": len(answers),
                           "answers_file_written": True,
                           "toy_exact_match": round(score, 4),
                           "note": "untrained toy model; score is noise "
                                   "— pipeline completeness evidence"}
    print("vqa pipeline:", art["vqa_pipeline"], flush=True)

    art["backend"] = jax.default_backend()
    out = pathlib.Path(__file__).resolve().parent.parent / "VLM_r05.json"
    out.write_text(json.dumps(art, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
