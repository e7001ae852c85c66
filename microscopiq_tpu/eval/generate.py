"""Jitted generation loop over the static-shape KV caches.

Replaces the reference's HF ``model.generate`` usage
(``kv_quant/evaluation_gsm8k.py:457-529``): one compiled prefill call and
one compiled decode step serve every sequence length (static shapes), with
greedy or temperature sampling, ragged (left-padded) batches and
per-sequence stop handling.

Left-padding semantics match HF ``tokenizer(padding="longest",
padding_side="left")`` + ``model.generate`` as the reference uses them
(``kv_quant/evaluation_gsm8k.py:267-277``): prompts are right-aligned in
the batch, pad slots never attend (cache masks them via the per-row
``offset`` field), real positions are ``slot - offset[b]``, and rows that
hit EOS are frozen to ``pad_token_id`` while the rest of the batch keeps
decoding.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..kv.cache import (
    DenseDecodeCache,
    QuantizedDecodeCache,
    QuantKVConfig,
    init_dense_cache,
    init_quant_cache,
)


def _make_cache(kind, cfg_model, batch, max_len, quant_cfg, offset=None):
    KVH = cfg_model.num_key_value_heads if hasattr(
        cfg_model, "num_key_value_heads") else cfg_model.num_attention_heads
    hd = cfg_model.head_dim
    L = cfg_model.num_hidden_layers
    if kind == "dense":
        state = init_dense_cache(L, batch, max_len, KVH, hd, offset=offset)
        wrap = DenseDecodeCache
    elif kind == "quant":
        quant_cfg = quant_cfg or QuantKVConfig()
        state = init_quant_cache(L, batch, max_len, KVH, hd, quant_cfg,
                                 offset=offset)
        wrap = lambda st: QuantizedDecodeCache(st, quant_cfg)
    else:
        raise ValueError(kind)
    return state, wrap


def pad_prompts(prompts: Sequence[Sequence[int]], pad_token_id: int = 0):
    """Left-pad ragged prompts to a (B, S_max) batch.

    Returns (ids, lens): right-aligned int32 ids and per-row true lengths
    — the static-shape analog of HF ``padding="longest"`` +
    ``padding_side="left"`` (kv_quant/evaluation_gsm8k.py:267-277).
    """
    lens = np.asarray([len(p) for p in prompts], np.int32)
    S = int(lens.max())
    ids = np.full((len(prompts), S), pad_token_id, np.int32)
    for i, p in enumerate(prompts):
        if len(p):
            ids[i, S - len(p):] = np.asarray(p, np.int32)
    return ids, lens


def generate(model, params, prompt_ids: np.ndarray, max_new_tokens: int,
             cache_kind: str = "dense",
             quant_cfg: Optional[QuantKVConfig] = None,
             eos_token_id: Union[int, Sequence[int], None] = None,
             temperature: float = 0.0,
             key: Optional[jax.Array] = None,
             max_len: Optional[int] = None,
             prompt_lens: Optional[np.ndarray] = None,
             pad_token_id: int = 0) -> np.ndarray:
    """Greedy/temperature decode.

    prompt_ids: (B, S_prompt) right-aligned token ids, or a ragged list of
    per-sequence id lists (padded internally via :func:`pad_prompts`).
    prompt_lens: per-row true lengths for a pre-padded (B, S) batch; rows
    are assumed LEFT-padded (right-aligned). None = all rows full length.
    Returns (B, T<=max_new_tokens) generated ids; rows that stopped early
    are padded with ``pad_token_id`` after their EOS (HF semantics).
    """
    if isinstance(prompt_ids, (list, tuple)):
        assert prompt_lens is None
        prompt_ids, prompt_lens = pad_prompts(prompt_ids, pad_token_id)
    prompt_ids = np.asarray(prompt_ids)
    B, S = prompt_ids.shape
    if prompt_lens is None:
        offset_np = np.zeros(B, np.int32)
    else:
        offset_np = (S - np.asarray(prompt_lens, np.int32)).astype(np.int32)
    offset = jnp.asarray(offset_np)
    if eos_token_id is None:
        eos_ids = ()
    elif isinstance(eos_token_id, (int, np.integer)):
        eos_ids = (int(eos_token_id),)
    else:
        eos_ids = tuple(int(e) for e in eos_token_id)

    gap = (quant_cfg.gap if quant_cfg else QuantKVConfig().gap)
    need = S + max_new_tokens
    if max_len is None:
        max_len = ((need + gap - 1) // gap) * gap + gap
    state, wrap = _make_cache(cache_kind, model.cfg, B, max_len, quant_cfg,
                              offset=offset)

    @jax.jit
    def prefill(params, ids, state):
        cache = wrap(state)
        # real position of prompt column j in row b is j - offset[b];
        # pads clip to 0 (their K/V are masked out of every attention row)
        positions = jnp.maximum(
            jnp.arange(ids.shape[1])[None, :] - offset[:, None], 0)
        logits = model.apply(params, ids, positions=positions, cache=cache,
                             last_only=True)
        return logits[:, -1], cache.finalize()

    @jax.jit
    def step(params, tok, state, k):
        cache = wrap(state)
        positions = (state.length - offset)[:, None]     # (B, 1) real pos
        logits = model.apply(params, tok, positions=positions, cache=cache)
        logits = logits[:, -1]
        if temperature > 0:
            k, sub = jax.random.split(k)
            nxt = jax.random.categorical(sub, logits / temperature, -1)
        else:
            nxt = jnp.argmax(logits, -1)
        return nxt.astype(jnp.int32), cache.finalize(), k

    if key is None:
        key = jax.random.PRNGKey(0)

    logits_last, state = prefill(params, jnp.asarray(prompt_ids), state)
    if temperature > 0:
        key, sub = jax.random.split(key)
        tok = jax.random.categorical(sub, logits_last / temperature, -1)
    else:
        tok = jnp.argmax(logits_last, -1)
    tok = tok.astype(jnp.int32)

    finished = np.zeros(B, bool)

    def host_tok(t):
        """Freeze finished rows to pad; a row finishing THIS step still
        emits its EOS (HF generate semantics)."""
        t = np.asarray(t)
        out_t = np.where(finished, pad_token_id, t)
        for e in eos_ids:
            finished[:] |= (t == e)
        return out_t

    out = [host_tok(tok)]
    for _ in range(max_new_tokens - 1):
        if finished.all():
            break
        tok, state, key = step(params, tok[:, None], state, key)
        out.append(host_tok(tok))
    return np.stack(out, axis=1)
