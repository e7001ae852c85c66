"""H2O heavy-hitter KV-cache eviction (static-shape, jit-friendly).

The reference gestures at H2O through
``compress_config.compress_method[layer] == "H2O"`` hooks in its forked
attention (``kv_quant/GEARLM/Simulated/modeling_llama_new.py:563-580``)
that call ``self.h2ocache.selection(attn_weights, k, v, q)`` — but the
``H2OCache`` import (``modeling_llama_new.py:59``) does not exist
anywhere in the repo, so the capability ships broken. This module
implements the policy the hooks describe (H2O, Zhang et al. 2023:
retain the tokens carrying the most accumulated attention mass — the
"heavy hitters" — plus a recent window, evict the rest) in TPU-idiomatic
form:

* a **fixed slot budget** instead of concat-and-filter: every shape is
  static, so one compiled decode step serves all lengths;
* scores are **fed back** by the attention after softmax
  (``cache.observe(layer, probs)``) rather than recomputed — the
  reference hook recomputes q @ kᵀ a second time after selection;
* eviction = one masked argmin + one ``dynamic_update_slice`` per step:
  the incoming token overwrites the lowest-score unprotected slot.

Policy detail (tested against a python oracle in tests/test_h2o.py):
scores accumulate the softmax attention mass each key receives, summed
over query heads (GQA groups share slots, so eviction is a per-(batch,
slot) decision — "head-agreement" H2O). The ``recent_window`` most
recent tokens are protected, matching H2O's heavy-hitter + recent
split. Slot positions ride along, so causal masks and RoPE stay exact
for the surviving set.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class H2OKVState:
    k: jax.Array        # (L, B, budget, KVH, hd)
    v: jax.Array        # (L, B, budget, KVH, hd)
    pos: jax.Array      # (L, B, budget) int32, real position; -1 = empty
    score: jax.Array    # (L, B, budget) f32, accumulated attention mass
    length: jax.Array   # () int32 — tokens SEEN (not tokens kept)


def init_h2o_cache(n_layers, batch, budget, kv_heads, head_dim,
                   dtype=jnp.bfloat16) -> H2OKVState:
    shape = (n_layers, batch, budget, kv_heads, head_dim)
    return H2OKVState(
        k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
        pos=jnp.full((n_layers, batch, budget), -1, jnp.int32),
        score=jnp.zeros((n_layers, batch, budget), jnp.float32),
        length=jnp.zeros((), jnp.int32))


class H2OCache:
    """Heavy-hitter eviction cache with the decode-cache protocol
    (update → (k, v, mask); finalize → state) plus an ``observe`` hook
    the attention calls with post-softmax probabilities."""

    def __init__(self, state: H2OKVState, recent_window: int = 8):
        self.state = state
        self.recent_window = int(recent_window)
        self._k = state.k
        self._v = state.v
        self._pos = state.pos
        self._score = state.score
        self._len = state.length

    # -- decode-cache protocol ------------------------------------------
    def update(self, layer_idx: int, k, v, positions, mask):
        B, S, KVH, hd = k.shape
        budget = self._k.shape[2]
        if S > 1:
            # prefill: the prompt must fit the budget (the reference's
            # H2O path likewise only prunes during decode for q_len==1;
            # its q_len>1 branch just recomputes logits)
            assert S <= budget, (S, budget)
            kl = jax.lax.dynamic_update_slice(
                self._k[layer_idx], k.astype(self._k.dtype), (0, 0, 0, 0))
            vl = jax.lax.dynamic_update_slice(
                self._v[layer_idx], v.astype(self._v.dtype), (0, 0, 0, 0))
            pos_row = jnp.concatenate(
                [positions.astype(jnp.int32),
                 jnp.full((B, budget - S), -1, jnp.int32)], axis=1)
            self._k = self._k.at[layer_idx].set(kl)
            self._v = self._v.at[layer_idx].set(vl)
            self._pos = self._pos.at[layer_idx].set(pos_row)
            self._score = self._score.at[layer_idx].set(0.0)
            self._len = self.state.length + S
        else:
            # decode: fill the next free slot while under budget, else
            # evict the lowest-score slot outside the recent window
            seen = self.state.length
            slot_pos = self._pos[layer_idx]               # (B, budget)
            protected = slot_pos >= (seen - self.recent_window)
            neg = jnp.where(protected, jnp.inf,
                            self._score[layer_idx])      # (B, budget)
            victim = jnp.argmin(neg, axis=1)             # (B,)
            tgt = jnp.where(seen < budget,
                            jnp.full((B,), 0, jnp.int32) + seen,
                            victim.astype(jnp.int32))    # (B,)
            bidx = jnp.arange(B)
            kl = self._k[layer_idx].at[bidx, tgt].set(
                k[:, 0].astype(self._k.dtype))
            vl = self._v[layer_idx].at[bidx, tgt].set(
                v[:, 0].astype(self._v.dtype))
            self._k = self._k.at[layer_idx].set(kl)
            self._v = self._v.at[layer_idx].set(vl)
            self._pos = self._pos.at[layer_idx, bidx, tgt].set(
                positions[:, 0].astype(jnp.int32))
            self._score = self._score.at[layer_idx, bidx, tgt].set(0.0)
            self._len = seen + 1

        slot_pos = self._pos[layer_idx]                   # (B, budget)
        q_pos = positions                                 # (B, S)
        mask = ((slot_pos[:, None, :] <= q_pos[..., None]) &
                (slot_pos[:, None, :] >= 0))
        return (self._k[layer_idx], self._v[layer_idx], mask[:, None])

    def observe(self, layer_idx: int, probs):
        """Accumulate attention mass per slot. probs: (B, budget) —
        softmax probabilities summed over heads and query positions."""
        self._score = self._score.at[layer_idx].add(
            probs.astype(jnp.float32))

    def finalize(self) -> H2OKVState:
        return H2OKVState(self._k, self._v, self._pos, self._score,
                          self._len)
