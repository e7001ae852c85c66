"""Continuous-batching serving engine (TPU-native).

The reference serves one request per ``model.generate`` call behind a
semaphore (``vlm/llava/serve/model_worker.py:123-194``); throughput-
oriented TPU serving instead keeps ONE compiled decode step hot and
multiplexes requests onto fixed batch slots:

- a slot KV cache with a per-slot length vector (static shapes; the
  attention mask already derives from per-token ``positions``, so slots
  at different depths coexist in one batched step);
- prefill compiles per prompt-length bucket and writes K/V straight into
  the admitted slot's rows;
- a host scheduler admits queued requests into free slots between decode
  steps and retires slots on EOS/max-tokens — requests join and leave
  the batch WITHOUT stopping decode for the others (continuous
  batching), the scheduler the BASELINE north-star asks for.

Everything under jit is static-shape: slot count, bucket sizes, and
cache capacity are fixed at engine build; per-request state lives in
int32 vectors.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Any, Callable, List, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# ---------------------------------------------------------------------------
# Slot KV cache: DenseKVState with a per-slot length vector
# ---------------------------------------------------------------------------
@flax.struct.dataclass
class SlotKVState:
    k: jax.Array            # (L, B, S_max, KVH, hd)
    v: jax.Array
    lengths: jax.Array      # (B,) int32 per-slot token count


def init_slot_cache(n_layers, n_slots, max_len, kv_heads, head_dim,
                    dtype=jnp.bfloat16) -> SlotKVState:
    shape = (n_layers, n_slots, max_len, kv_heads, head_dim)
    return SlotKVState(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                       jnp.zeros((n_slots,), jnp.int32))


class SlotDecodeCache:
    """Batched decode cache over independent slots.

    Each slot writes at its own ``lengths[b]`` offset (one vmapped
    dynamic_update_slice = a scatter). The attention mask is purely
    positional — ``key_pos <= q_pos`` — which both enforces causality and
    hides any stale rows beyond a slot's length, because a slot's
    positions always equal its own depth.
    """

    def __init__(self, state: SlotKVState, active: jax.Array):
        self.state = state
        self.active = active                    # (B,) bool
        self._new_k = state.k
        self._new_v = state.v
        self._new_len = state.lengths

    def update(self, layer_idx: int, k, v, positions, mask):
        st = self.state
        B, S, KVH, hd = k.shape

        def put(buf, kk, start):                # (S_max, KVH, hd) per slot
            return lax.dynamic_update_slice(buf, kk, (start, 0, 0))

        kl = jax.vmap(put)(st.k[layer_idx], k.astype(st.k.dtype),
                           st.lengths)
        vl = jax.vmap(put)(st.v[layer_idx], v.astype(st.v.dtype),
                           st.lengths)
        self._new_k = self._new_k.at[layer_idx].set(kl)
        self._new_v = self._new_v.at[layer_idx].set(vl)
        # inactive slots re-write the same row and do not advance
        self._new_len = jnp.where(self.active, st.lengths + S, st.lengths)

        S_max = st.k.shape[2]
        key_pos = jnp.arange(S_max)[None, :]
        m = key_pos[:, None, :] <= positions[..., None]     # (B, S, S_max)
        return kl, vl, m[:, None, :, :]

    def finalize(self) -> SlotKVState:
        return SlotKVState(self._new_k, self._new_v, self._new_len)


class SlotPrefillCache:
    """Writes a single sequence's K/V into one slot's rows [0, S)."""

    def __init__(self, state: SlotKVState, slot: jax.Array):
        self.state = state
        self.slot = slot
        self._new_k = state.k
        self._new_v = state.v

    def update(self, layer_idx: int, k, v, positions, mask):
        st = self.state
        B, S, KVH, hd = k.shape             # B == 1
        self._new_k = lax.dynamic_update_slice(
            self._new_k, k[None].astype(st.k.dtype),
            (layer_idx, self.slot, 0, 0, 0))
        self._new_v = lax.dynamic_update_slice(
            self._new_v, v[None].astype(st.v.dtype),
            (layer_idx, self.slot, 0, 0, 0))
        key_pos = jnp.arange(S)[None, :]
        m = key_pos[:, None, :] <= positions[..., None]
        return k, v, m[:, None, :, :]

    def finalize(self, true_len: jax.Array) -> SlotKVState:
        st = self.state
        return SlotKVState(
            self._new_k, self._new_v,
            st.lengths.at[self.slot].set(true_len))


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class Request:
    prompt_ids: np.ndarray                  # (S,) int32
    max_new_tokens: int = 64
    eos_id: int = -1                        # -1: never stops on a token
    temperature: float = 0.0                # 0 = greedy
    # called with (new_token:int, done:bool) from the scheduler thread
    on_token: Optional[Callable[[int, bool], None]] = None
    # filled by the engine
    out_tokens: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    error: Optional[str] = None


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket "
                     f"{buckets[-1]}")


class BatchEngine:
    """Continuous-batching decode engine over a fixed slot pool.

    One compiled ``decode_step`` serves every step; ``prefill`` compiles
    once per prompt-length bucket. Per-request temperature: 0 = greedy
    (the eval harness's semantics, eval/generate.py), >0 = categorical
    sampling with a per-step folded key.
    """

    def __init__(self, model, params, n_slots: int = 8,
                 max_len: int = 512,
                 prompt_buckets=(32, 64, 128, 256),
                 cache_dtype=jnp.bfloat16, seed: int = 0,
                 cache_kind: str = "dense", quant_cfg=None,
                 h2o_budget: int = 0, h2o_recent: int = 8):
        from ..kv.cache import (QuantKVConfig, SlotQuantizedDecodeCache,
                                SlotQuantPrefillCache,
                                init_slot_quant_cache)
        from ..kv.h2o import (SlotH2ODecodeCache, SlotH2OPrefillCache,
                              init_slot_h2o_cache)

        cfg = model.cfg
        self.model = model
        self.params = params
        self.n_slots = n_slots
        self.max_len = max_len
        self.buckets = tuple(sorted(prompt_buckets))
        self.cache_kind = cache_kind
        if cache_kind == "h2o":
            # heavy-hitter eviction per slot: kv capacity is the H2O
            # budget (>= the largest prompt bucket so prefill fits);
            # max_len still bounds positions/max_new_tokens bookkeeping
            budget = h2o_budget or max(self.buckets)
            assert budget >= max(self.buckets), (budget, self.buckets)
            self.state = init_slot_h2o_cache(
                cfg.num_hidden_layers, n_slots, budget,
                cfg.num_key_value_heads, cfg.head_dim, cache_dtype)
            mk_prefill = lambda st, slot, tl: SlotH2OPrefillCache(
                st, slot, tl)
            mk_decode = lambda st, act: SlotH2ODecodeCache(
                st, act, h2o_recent)
        elif cache_kind == "quant":
            qcfg = quant_cfg or QuantKVConfig()
            assert max_len % qcfg.gap == 0
            self.state = init_slot_quant_cache(
                cfg.num_hidden_layers, n_slots, max_len,
                cfg.num_key_value_heads, cfg.head_dim, qcfg)
            mk_prefill = lambda st, slot, tl: SlotQuantPrefillCache(
                st, qcfg, slot, tl)
            mk_decode = lambda st, act: SlotQuantizedDecodeCache(
                st, qcfg, act)
        else:
            self.state = init_slot_cache(
                cfg.num_hidden_layers, n_slots, max_len,
                cfg.num_key_value_heads, cfg.head_dim, cache_dtype)
            mk_prefill = lambda st, slot, tl: SlotPrefillCache(st, slot)
            mk_decode = lambda st, act: SlotDecodeCache(st, act)
        # host-side per-slot bookkeeping
        self.slot_req: List[Optional[Request]] = [None] * n_slots
        self.tokens = np.zeros((n_slots,), np.int32)
        self.remaining = np.zeros((n_slots,), np.int32)
        self.temps = np.zeros((n_slots,), np.float32)
        self._base_key = jax.random.PRNGKey(seed)
        self._step_no = 0

        def sample(logits, temps, key):
            # per-slot temperature: 0 = greedy, else categorical
            greedy = jnp.argmax(logits, -1).astype(jnp.int32)
            scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
            drawn = jax.random.categorical(key, scaled, -1
                                           ).astype(jnp.int32)
            return jnp.where(temps > 0, drawn, greedy)

        def lengths_of(state):
            return state.lengths if hasattr(state, "lengths") \
                else state.length

        def prefill(params, ids, state, slot, true_len, temp, key):
            cache = mk_prefill(state, slot, true_len)
            S = ids.shape[1]
            pos = jnp.arange(S)[None, :]
            # logit_index gathers the last REAL token's hidden state
            # BEFORE the lm_head (ids are right-padded to a bucket), so
            # the vocab matmul runs on 1 token instead of S
            logits = self.model.apply(
                params, ids, positions=pos, cache=cache,
                logit_index=(true_len - 1)[None].astype(jnp.int32))
            tok = sample(logits[:, 0], temp[None], key)[0]
            return tok, cache.finalize(true_len)

        def decode_step(params, toks, state, active, temps, key):
            cache = mk_decode(state, active)
            pos = lengths_of(state)[:, None]        # (B, 1)
            logits = self.model.apply(params, toks[:, None],
                                      positions=pos, cache=cache)
            nxt = sample(logits[:, -1], temps, key)
            return jnp.where(active, nxt, toks), cache.finalize()

        self._prefill = jax.jit(prefill)
        self._decode = jax.jit(decode_step)
        self._lock = threading.Lock()
        self._queue: "queue.Queue[Request]" = queue.Queue()

    def _next_key(self):
        self._step_no += 1
        return jax.random.fold_in(self._base_key, self._step_no)

    # ---- scheduling ----------------------------------------------------
    def submit(self, req: Request):
        self._queue.put(req)

    def _admit(self, req: Request, slot: int):
        ids = np.asarray(req.prompt_ids, np.int32).reshape(-1)
        S = _bucket(len(ids), self.buckets)
        if len(ids) + req.max_new_tokens > self.max_len:
            req.max_new_tokens = self.max_len - len(ids)
        padded = np.zeros((1, S), np.int32)
        padded[0, :len(ids)] = ids
        tok, self.state = self._prefill(
            self.params, jnp.asarray(padded), self.state,
            jnp.int32(slot), jnp.int32(len(ids)),
            jnp.float32(req.temperature), self._next_key())
        t = int(tok)
        self.slot_req[slot] = req
        self.tokens[slot] = t
        self.remaining[slot] = req.max_new_tokens
        self.temps[slot] = req.temperature
        self._emit(req, slot, t)

    def _emit(self, req: Request, slot: int, tok: int):
        req.out_tokens.append(tok)
        self.remaining[slot] -= 1
        if tok == req.eos_id or self.remaining[slot] <= 0:
            req.done = True
            self.slot_req[slot] = None
        if req.on_token is not None:
            req.on_token(tok, req.done)

    def _active_mask(self) -> np.ndarray:
        return np.asarray([r is not None for r in self.slot_req])

    def step(self) -> int:
        """Admit pending requests into free slots, run one decode step.
        Returns the number of live slots after the step."""
        from ..utils.observability import metrics

        with self._lock:
            for slot in range(self.n_slots):
                if self.slot_req[slot] is None:
                    try:
                        req = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    try:
                        with metrics.timer("engine.prefill"):
                            self._admit(req, slot)
                        metrics.count("engine.admitted")
                    except ValueError as e:
                        # reject (e.g. prompt exceeds the largest
                        # bucket) without killing the other requests
                        req.error = str(e)
                        req.done = True
                        metrics.count("engine.rejected")
                        if req.on_token is not None:
                            req.on_token(-1, True)
            active = self._active_mask()
            metrics.gauge("engine.active_slots", int(active.sum()))
            metrics.gauge("engine.queued", self._queue.qsize())
            if not active.any():
                return 0
            with metrics.timer("engine.decode_step"):
                toks, self.state = self._decode(
                    self.params, jnp.asarray(self.tokens), self.state,
                    jnp.asarray(active), jnp.asarray(self.temps),
                    self._next_key())
                toks = np.asarray(toks)
            metrics.count("engine.tokens", int(active.sum()))
            for slot in range(self.n_slots):
                req = self.slot_req[slot]
                if req is not None:
                    self.tokens[slot] = toks[slot]
                    self._emit(req, slot, int(toks[slot]))
            return sum(r is not None for r in self.slot_req)

    def run_until_drained(self, max_steps: int = 100000):
        """Drive steps until queue and slots are empty (offline batch)."""
        steps = 0
        while (not self._queue.empty() or self._active_mask().any()) \
                and steps < max_steps:
            self.step()
            steps += 1

    def generate(self, prompts: List[np.ndarray], max_new_tokens: int = 64,
                 eos_id: int = -1,
                 temperature: float = 0.0) -> List[List[int]]:
        """Batch-generate: submit all, drain, return token lists."""
        reqs = [Request(np.asarray(p), max_new_tokens, eos_id,
                        temperature=temperature)
                for p in prompts]
        for r in reqs:
            self.submit(r)
        self.run_until_drained()
        return [r.out_tokens for r in reqs]


def engine_generate_stream_fn(engine: BatchEngine, tokenizer,
                              poll_s: float = 0.0):
    """Adapt a BatchEngine to the worker's generate_stream_fn protocol:
    tokens stream out as the scheduler produces them, interleaved with
    other in-flight requests (the worker's semaphore becomes a no-op
    admission bound)."""

    def fn(prompt: str, max_new_tokens: int, temperature: float):
        out: "queue.Queue" = queue.Queue()
        req = Request(np.asarray(tokenizer.encode(prompt), np.int32),
                      max_new_tokens,
                      eos_id=getattr(tokenizer, "eos_id", -1),
                      temperature=temperature,
                      on_token=lambda t, d: out.put((t, d)))
        engine.submit(req)
        toks: List[int] = []
        while True:
            engine.step()
            try:
                while True:
                    t, d = out.get_nowait()
                    if t >= 0:                # -1 = rejection sentinel
                        toks.append(t)
                        yield tokenizer.decode(toks)
                    if d:
                        return
            except queue.Empty:
                pass

    return fn
