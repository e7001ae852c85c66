"""VQA-style generation eval for LLaVA.

Parity targets: ``vlm/llava/eval/model_vqa.py`` (question jsonl →
answers jsonl, chunked across workers) and ``vlm/llava.py:90-141``
(``eval_model`` single-query generate). The data-parallel sharding of
``vlm/scripts/v1_5/eval/vqav2.sh:10-26`` (one process per device over
question chunks, merged jsonl) is reproduced with host-side chunking —
on TPU pods each host takes its chunk; a single host loops.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.generate import _make_cache
from .conversation import conv_templates
from .llava import LlavaForCausalLM
from .mm_utils import (expand_image_tokens, get_chunk, process_images,
                       tokenizer_image_token)


def generate_mm(model: LlavaForCausalLM, params, input_ids: np.ndarray,
                image_token_mask: np.ndarray, pixel_values: np.ndarray,
                max_new_tokens: int, eos_token_id: Optional[int] = None,
                cache_kind: str = "dense", quant_cfg=None) -> np.ndarray:
    """Greedy multimodal decode, batch = 1 (reference eval behavior:
    model_vqa.py generates one question at a time).

    input_ids: (1, S) expanded prompt (image slots zeroed, mask True).
    """
    B, S = input_ids.shape
    max_len = S + max_new_tokens + 1
    gap = 1 if quant_cfg is None else quant_cfg.gap
    max_len = ((max_len + gap - 1) // gap) * gap + gap
    state, wrap = _make_cache(cache_kind, model.cfg.text, B, max_len,
                              quant_cfg)

    @jax.jit
    def prefill(params, ids, mask_img, pix, state):
        cache = wrap(state)
        positions = jnp.broadcast_to(jnp.arange(ids.shape[1])[None, :],
                                     ids.shape)
        logits = model.apply(params, ids, positions=positions,
                             cache=cache, pixel_values=pix,
                             image_token_mask=mask_img)
        return logits[:, -1], cache.finalize()

    @jax.jit
    def step(params, tok, state):
        cache = wrap(state)
        positions = jnp.broadcast_to(state.length[None, None], (B, 1))
        logits = model.apply(params, tok, positions=positions,
                             cache=cache)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), \
            cache.finalize()

    logits, state = prefill(params, jnp.asarray(input_ids),
                            jnp.asarray(image_token_mask),
                            jnp.asarray(pixel_values), state)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    out = [np.asarray(tok)]
    for _ in range(max_new_tokens - 1):
        if eos_token_id is not None and (out[-1] == eos_token_id).all():
            break
        tok, state = step(params, tok[:, None], state)
        out.append(np.asarray(tok))
    return np.stack(out, axis=1)


def eval_vqa(model: LlavaForCausalLM, params, tokenizer,
             questions: List[dict], image_loader,
             answers_file: str,
             conv_mode: str = "llava_v1",
             max_new_tokens: int = 128,
             num_chunks: int = 1, chunk_idx: int = 0,
             model_id: str = "microscopiq-llava",
             cache_kind: str = "dense", quant_cfg=None) -> List[dict]:
    """questions: [{question_id, image, text}, ...]; image_loader(name)
    → (H, W, 3) array. Writes answers jsonl (model_vqa.py:27-74)."""
    questions = get_chunk(questions, num_chunks, chunk_idx)
    os.makedirs(os.path.dirname(answers_file) or ".", exist_ok=True)
    vis = model.cfg.vision
    results = []
    with open(answers_file, "w") as f:
        for q in questions:
            conv = conv_templates[conv_mode].copy()
            conv.append_message(conv.roles[0], "<image>\n" + q["text"])
            conv.append_message(conv.roles[1], None)
            prompt = conv.get_prompt()
            ids = tokenizer_image_token(prompt, tokenizer)
            input_ids, img_mask = expand_image_tokens(
                ids, model.cfg.num_image_tokens)
            pix = process_images([image_loader(q["image"])],
                                 vis.image_size)
            out = generate_mm(model, params, input_ids[None],
                              img_mask[None], pix, max_new_tokens,
                              eos_token_id=getattr(tokenizer,
                                                   "eos_token_id", None),
                              cache_kind=cache_kind, quant_cfg=quant_cfg)
            text = tokenizer.decode([int(t) for t in out[0]
                                     if t != getattr(tokenizer,
                                                     "eos_token_id", -1)])
            rec = {"question_id": q.get("question_id"),
                   "prompt": q["text"], "text": text.strip(),
                   "model_id": model_id, "metadata": {}}
            f.write(json.dumps(rec) + "\n")
            results.append(rec)
    return results


def merge_answer_chunks(chunk_files: List[str], out_file: str) -> None:
    """cat chunk jsonls → merged file (vqav2.sh:28-38)."""
    with open(out_file, "w") as out:
        for cf in chunk_files:
            with open(cf) as f:
                out.write(f.read())
