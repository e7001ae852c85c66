"""Sink (attention-sink / StreamingLLM) rolling-window KV cache.

Parity target: ``kv_quant/GEARLM/Simulated/cache_utils.py:201-376``
(``SinkCache``): keep ``sink_tokens`` initial tokens plus a rolling window
of recent tokens; on overflow evict the oldest non-sink token and
**re-rotate** the shifted keys so their RoPE phase matches their new
in-window position (queries use clamped positions).

Static-shape TPU version: a fixed (sink + window) buffer; eviction is a
roll of the non-sink region plus a constant single-slot RoPE back-rotation
applied to the shifted keys — one compiled decode step serves any stream
length.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class SinkKVState:
    k: jax.Array        # (L, B, C, KVH, hd) — keys rotated to SLOT phase
    v: jax.Array
    length: jax.Array   # () int32, total tokens seen


def init_sink_cache(n_layers, batch, sink_tokens, window, kv_heads,
                    head_dim, dtype=jnp.bfloat16):
    C = sink_tokens + window
    shape = (n_layers, batch, C, kv_heads, head_dim)
    return SinkKVState(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                       jnp.zeros((), jnp.int32))


def _rope_delta(k: jax.Array, delta: float, theta: float) -> jax.Array:
    """Rotate keys by `delta` positions (the re-rotation trick,
    cache_utils.py:259-306)."""
    hd = k.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    ang = delta * freqs
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = jnp.split(k.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)
    return out.astype(k.dtype)


class SinkDecodeCache:
    """Decode-only sink cache. Keys must arrive rotated to their *slot*
    position (the model should call with positions=slot; see update)."""

    def __init__(self, state: SinkKVState, sink_tokens: int,
                 rope_theta: float = 10000.0):
        self.state = state
        self.sink = sink_tokens
        self.theta = rope_theta
        self._new_k = state.k
        self._new_v = state.v
        self._new_len = state.length

    @property
    def capacity(self) -> int:
        return self.state.k.shape[2]

    def slot_positions(self, n_new: int = 1) -> jax.Array:
        """Positions the incoming token(s) should be rotated at: the
        clamped in-window slot."""
        return jnp.minimum(self.state.length + jnp.arange(n_new),
                           self.capacity - 1)

    def update(self, layer_idx: int, k, v, positions, mask):
        st = self.state
        B, S, KVH, hd = k.shape
        C = self.capacity
        sink = self.sink

        kl = self._new_k[layer_idx]
        vl = self._new_v[layer_idx]

        if S > 1:
            # prefill must fit in the buffer
            kl = jax.lax.dynamic_update_slice(
                kl, k.astype(kl.dtype), (0, st.length, 0, 0))
            vl = jax.lax.dynamic_update_slice(
                vl, v.astype(vl.dtype), (0, st.length, 0, 0))
        else:
            def append(args):
                kl, vl = args
                kl = jax.lax.dynamic_update_slice(
                    kl, k.astype(kl.dtype), (0, st.length, 0, 0))
                vl = jax.lax.dynamic_update_slice(
                    vl, v.astype(vl.dtype), (0, st.length, 0, 0))
                return kl, vl

            def evict(args):
                kl, vl = args
                # shift non-sink region left by one and re-rotate the
                # shifted keys one slot back
                win_k = _rope_delta(kl[:, sink + 1:], -1.0, self.theta)
                win_v = vl[:, sink + 1:]
                kl = kl.at[:, sink:C - 1].set(win_k)
                vl = vl.at[:, sink:C - 1].set(win_v)
                kl = kl.at[:, C - 1].set(k[:, 0].astype(kl.dtype))
                vl = vl.at[:, C - 1].set(v[:, 0].astype(vl.dtype))
                return kl, vl

            kl, vl = jax.lax.cond(st.length < C, append, evict, (kl, vl))

        self._new_k = self._new_k.at[layer_idx].set(kl)
        self._new_v = self._new_v.at[layer_idx].set(vl)
        new_len = st.length + S
        self._new_len = new_len

        n_live = jnp.minimum(new_len, C)
        key_slot = jnp.arange(C)
        valid = key_slot[None, None, :] < n_live
        if S > 1:
            q_pos = positions
            m = (key_slot[None, None, :] <= q_pos[..., None]) & valid
        else:
            m = valid  # decode: attend to every live slot
        return kl, vl, m[:, None, :, :]

    def finalize(self) -> SinkKVState:
        return SinkKVState(self._new_k, self._new_v, self._new_len)
