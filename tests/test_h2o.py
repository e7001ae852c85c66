"""H2O heavy-hitter KV eviction (kv/h2o.py) vs dense-recompute oracles.

The reference's H2O hooks (kv_quant/GEARLM/Simulated/
modeling_llama_new.py:563-580) reference an H2OCache class that is
absent from the repo; kv/h2o.py implements the policy those hooks
describe. Correctness here is gated two ways (VERDICT r2 item 9):

* the slot machinery vs a plain-python oracle that runs the SAME policy
  (accumulate attention mass, evict the min-score unprotected slot), and
* the attention output through the cache vs dense attention recomputed
  over exactly the kept (k, v, position) set.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from microscopiq_tpu.kv import H2OCache, init_h2o_cache
from microscopiq_tpu.kv.cache import DenseDecodeCache, init_dense_cache

RNG = np.random.default_rng(0)


def _attn(q, k, v, mask, scale):
    """Plain single-query attention over a slot set. q: (B,H,hd),
    k/v: (B,L,KVH,hd), mask: (B,1,1,L)."""
    B, H, hd = q.shape
    KVH = k.shape[2]
    rep = H // KVH
    qg = q.reshape(B, KVH, rep, hd)
    logits = jnp.einsum("bgrd,bkgd->bgrk", qg, k) * scale
    logits = jnp.where(mask[:, 0, 0][:, None, None, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
    out = jnp.einsum("bgrk,bkgd->bgrd", probs.astype(v.dtype), v)
    return out.reshape(B, H * hd), probs


def test_h2o_no_eviction_matches_dense():
    """With budget >= total tokens H2O never evicts: slots fill in order
    and outputs equal the dense ring cache exactly."""
    B, KVH, hd, S, steps, budget = 2, 2, 8, 6, 5, 16
    k0 = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    v0 = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    pos0 = jnp.broadcast_to(jnp.arange(S)[None], (B, S))

    hc = H2OCache(init_h2o_cache(1, B, budget, KVH, hd, jnp.float32))
    dc = DenseDecodeCache(init_dense_cache(1, B, budget, KVH, hd,
                                           jnp.float32))
    kh, vh, mh = hc.update(0, k0, v0, pos0, None)
    kd, vd, md = dc.update(0, k0, v0, pos0, None)
    np.testing.assert_array_equal(np.asarray(kh[:, :S]),
                                  np.asarray(kd[:, :S]))
    np.testing.assert_array_equal(np.asarray(mh[..., :S]),
                                  np.asarray(md[..., :S]))
    hs, ds = hc.finalize(), dc.finalize()
    for t in range(S, S + steps):
        hc, dc = H2OCache(hs), DenseDecodeCache(ds)
        k1 = jnp.asarray(RNG.standard_normal((B, 1, KVH, hd)), jnp.float32)
        v1 = jnp.asarray(RNG.standard_normal((B, 1, KVH, hd)), jnp.float32)
        pos = jnp.full((B, 1), t)
        kh, vh, mh = hc.update(0, k1, v1, pos, None)
        kd, vd, md = dc.update(0, k1, v1, pos, None)
        np.testing.assert_array_equal(np.asarray(mh), np.asarray(md))
        np.testing.assert_array_equal(np.asarray(kh), np.asarray(kd))
        # attention output equality through both caches
        q = jnp.asarray(RNG.standard_normal((B, 4, hd)), jnp.float32)
        yh, ph = _attn(q, kh, vh, mh, hd ** -0.5)
        yd, _ = _attn(q, kd, vd, md, hd ** -0.5)
        np.testing.assert_allclose(np.asarray(yh), np.asarray(yd),
                                   atol=1e-6)
        hc.observe(0, ph.sum(axis=(1, 2)))
        hs, ds = hc.finalize(), dc.finalize()


def test_h2o_eviction_matches_python_oracle():
    """Slot machinery vs a step-by-step python oracle of the policy."""
    B, KVH, hd, S, budget, window = 1, 1, 4, 8, 8, 2
    steps = 10
    hc_state = init_h2o_cache(1, B, budget, KVH, hd, jnp.float32)

    # oracle state
    opos = np.full((budget,), -1, np.int64)
    oscore = np.zeros((budget,), np.float64)

    k0 = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    v0 = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    hc = H2OCache(hc_state, recent_window=window)
    hc.update(0, k0, v0, jnp.arange(S)[None], None)
    opos[:S] = np.arange(S)
    seen = S

    # deterministic synthetic scores so the oracle and cache see the
    # same observations: slot s gets score (s % 3) + 0.1
    def fake_probs(pos):
        return jnp.asarray(((np.maximum(pos, 0) % 3) + 0.1) *
                           (pos >= 0))[None].astype(jnp.float32)

    hc.observe(0, fake_probs(opos))
    oscore += np.asarray(fake_probs(opos))[0]
    st = hc.finalize()

    for t in range(steps):
        hc = H2OCache(st, recent_window=window)
        k1 = jnp.asarray(RNG.standard_normal((B, 1, KVH, hd)), jnp.float32)
        v1 = jnp.asarray(RNG.standard_normal((B, 1, KVH, hd)), jnp.float32)
        hc.update(0, k1, v1, jnp.full((B, 1), seen), None)

        # oracle: same policy
        if seen < budget:
            tgt = seen
        else:
            protected = opos >= (seen - window)
            masked = np.where(protected, np.inf, oscore)
            tgt = int(np.argmin(masked))
        opos[tgt] = seen
        oscore[tgt] = 0.0
        seen += 1

        np.testing.assert_array_equal(
            np.asarray(hc._pos[0, 0]), opos.astype(np.int32))
        hc.observe(0, fake_probs(opos))
        oscore += np.asarray(fake_probs(opos))[0]
        st = hc.finalize()
        np.testing.assert_allclose(np.asarray(st.score[0, 0]), oscore,
                                   rtol=1e-5)


def test_h2o_output_matches_dense_recompute_over_kept_set():
    """Attention through the (evicting) cache == dense attention
    recomputed over exactly the kept (k, v, position) entries."""
    B, KVH, H, hd, budget, window = 1, 2, 4, 8, 8, 2
    S = budget
    scale = hd ** -0.5
    k0 = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    v0 = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    hc = H2OCache(init_h2o_cache(1, B, budget, KVH, hd, jnp.float32),
                  recent_window=window)
    hc.update(0, k0, v0, jnp.arange(S)[None], None)
    hc.observe(0, jnp.asarray(RNG.random((B, budget)), jnp.float32))
    st = hc.finalize()

    kept_k = {int(p): np.asarray(k0[0, p]) for p in range(S)}
    kept_v = {int(p): np.asarray(v0[0, p]) for p in range(S)}

    for t in range(S, S + 6):
        hc = H2OCache(st, recent_window=window)
        k1 = jnp.asarray(RNG.standard_normal((B, 1, KVH, hd)), jnp.float32)
        v1 = jnp.asarray(RNG.standard_normal((B, 1, KVH, hd)), jnp.float32)
        kc, vc, mask = hc.update(0, k1, v1, jnp.full((B, 1), t), None)

        q = jnp.asarray(RNG.standard_normal((B, H, hd)), jnp.float32)
        y_cache, probs = _attn(q, kc, vc, mask, scale)

        # dense recompute over the kept set (positions from the cache)
        pos_np = np.asarray(hc._pos[0, 0])
        kept_k[t] = np.asarray(k1[0, 0])
        kept_v[t] = np.asarray(v1[0, 0])
        kd = jnp.asarray(np.stack([kept_k[int(p)] for p in pos_np]))[None]
        vd = jnp.asarray(np.stack([kept_v[int(p)] for p in pos_np]))[None]
        md = jnp.ones((B, 1, 1, budget), bool)
        y_dense, _ = _attn(q, kd, vd, md, scale)
        np.testing.assert_allclose(np.asarray(y_cache),
                                   np.asarray(y_dense), atol=1e-5)
        # slot buffers hold exactly the kept tokens
        np.testing.assert_array_equal(
            np.asarray(kc[0]),
            np.stack([kept_k[int(p)] for p in pos_np]))
        hc.observe(0, probs.sum(axis=(1, 2)))
        st = hc.finalize()


def test_h2o_heavy_hitter_survives():
    """A token that keeps receiving attention mass is never evicted;
    low-score old tokens are evicted first."""
    B, KVH, hd, budget, window = 1, 1, 4, 6, 1
    S = budget
    hc = H2OCache(init_h2o_cache(1, B, budget, KVH, hd, jnp.float32),
                  recent_window=window)
    k0 = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    hc.update(0, k0, k0, jnp.arange(S)[None], None)
    heavy = 2
    sc = np.full((B, budget), 0.01, np.float32)
    sc[0, heavy] = 10.0
    hc.observe(0, jnp.asarray(sc))
    st = hc.finalize()

    for t in range(S, S + 4):
        hc = H2OCache(st, recent_window=window)
        k1 = jnp.asarray(RNG.standard_normal((B, 1, KVH, hd)), jnp.float32)
        hc.update(0, k1, k1, jnp.full((B, 1), t), None)
        assert heavy in np.asarray(hc._pos[0, 0]).tolist()
        sc = np.full((B, budget), 0.01, np.float32)
        sc[0, np.asarray(hc._pos[0, 0]) == heavy] = 10.0
        hc.observe(0, jnp.asarray(sc))
        st = hc.finalize()
    # the heavy hitter must survive every eviction round; the first
    # victim is deterministically the oldest low-score token (pos 0).
    # (Later rounds may evict fresh insertions rather than originals —
    # newcomers start at score 0, faithful H2O behavior.)
    final = set(np.asarray(st.pos[0, 0]).tolist())
    assert heavy in final
    assert 0 not in final


def test_h2o_model_decode_jits():
    """A toy Llama decode step with H2OCache compiles and runs under jit
    (budget < sequence → real evictions inside the jitted step)."""
    from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, use_pallas=False)
    B, S, budget = 1, 8, 8
    KVH, hd = cfg.num_key_value_heads, cfg.head_dim
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((B, S), jnp.int32))

    st = init_h2o_cache(cfg.num_hidden_layers, B, budget, KVH, hd,
                        jnp.float32)
    cache = H2OCache(st, recent_window=2)
    ids = jnp.asarray(RNG.integers(0, cfg.vocab_size, (B, S)))
    logits = model.apply(params, ids, positions=jnp.arange(S)[None],
                         cache=cache)
    st = cache.finalize()
    assert int(st.length) == S

    @jax.jit
    def step(params, st, tok, t):
        cache = H2OCache(st, recent_window=2)
        logits = model.apply(params, tok[:, None],
                             positions=jnp.full((B, 1), t), cache=cache)
        return logits[:, -1].argmax(-1), cache.finalize()

    tok = logits[:, -1].argmax(-1)
    for t in range(S, S + 6):
        tok, st = step(params, st, tok, t)
    assert int(st.length) == S + 6
    # budget respected: kept positions are unique, none empty after fill
    pos = np.asarray(st.pos[0, 0])
    assert len(set(pos.tolist())) == budget and (pos >= 0).all()
