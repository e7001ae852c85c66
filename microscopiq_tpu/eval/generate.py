"""Jitted generation loop over the static-shape KV caches.

Replaces the reference's HF ``model.generate`` usage
(``kv_quant/evaluation_gsm8k.py:457-529``): one compiled prefill call and
one compiled decode step serve every sequence length (static shapes), with
greedy or temperature sampling and stop-token support.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

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


def _make_cache(kind, cfg_model, batch, max_len, quant_cfg):
    KVH = cfg_model.num_key_value_heads if hasattr(
        cfg_model, "num_key_value_heads") else cfg_model.num_attention_heads
    hd = cfg_model.head_dim
    L = cfg_model.num_hidden_layers
    if kind == "dense":
        state = init_dense_cache(L, batch, max_len, KVH, hd)
        wrap = DenseDecodeCache
    elif kind == "quant":
        quant_cfg = quant_cfg or QuantKVConfig()
        state = init_quant_cache(L, batch, max_len, KVH, hd, quant_cfg)
        wrap = lambda st: QuantizedDecodeCache(st, quant_cfg)
    else:
        raise ValueError(kind)
    return state, wrap


def generate(model, params, prompt_ids: np.ndarray, max_new_tokens: int,
             cache_kind: str = "dense",
             quant_cfg: Optional[QuantKVConfig] = None,
             eos_token_id: Optional[int] = None,
             temperature: float = 0.0,
             key: Optional[jax.Array] = None,
             max_len: Optional[int] = None) -> np.ndarray:
    """Greedy/temperature decode. prompt_ids: (B, S_prompt) right-aligned
    (left-padding handled by the caller via position offsets is TODO;
    current harness uses equal-length prompts per batch)."""
    B, S = prompt_ids.shape
    gap = (quant_cfg.gap if quant_cfg else QuantKVConfig().gap)
    need = S + max_new_tokens
    if max_len is None:
        max_len = ((need + gap - 1) // gap) * gap + gap
    state, wrap = _make_cache(cache_kind, model.cfg, B, max_len, quant_cfg)

    @jax.jit
    def prefill(params, ids, state):
        cache = wrap(state)
        positions = jnp.broadcast_to(jnp.arange(ids.shape[1])[None, :],
                                     ids.shape)
        logits = model.apply(params, ids, positions=positions, cache=cache)
        return logits[:, -1], cache.finalize()

    @jax.jit
    def step(params, tok, state, k):
        cache = wrap(state)
        positions = jnp.broadcast_to(state.length[None, None], (B, 1))
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

    out = [np.asarray(tok)]
    finished = np.zeros(B, bool)
    for _ in range(max_new_tokens - 1):
        tok, state, key = step(params, tok[:, None], state, key)
        t = np.asarray(tok)
        out.append(t)
        if eos_token_id is not None:
            finished |= (t == eos_token_id)
            if finished.all():
                break
    return np.stack(out, axis=1)
