"""QuantH2OCache (kv/h2o.py): H2O eviction composed with slot
quantization, vs dense-recompute oracles.

The reference lists "H2O" as a compress_method alongside the quantized
methods (kv_quant/GEARLM/Simulated/modeling_llama_new.py:563-580) but
its H2OCache import is broken, so the composition never runs there.
Invariants tested here:

* driven with IDENTICAL scripted scores, the eviction trajectory (pos)
  matches the dense H2OCache exactly at every bit width — quantization
  must not perturb the policy;
* every surviving quantized slot equals the direct per-token
  quantize-dequantize of the original token (recompute oracle), at 2,
  4 and 8 bit;
* residual-ring tokens (the most recent ones) are EXACT;
* a toy Llama decode step with QuantH2OCache compiles and runs under
  jit, and at 8 bit its logits track the dense H2OCache closely.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microscopiq_tpu.kv import (H2OCache, QuantH2OCache, init_h2o_cache,
                                init_quant_h2o_cache)
from microscopiq_tpu.kv.h2o import _dqtok, _qtok

RNG = np.random.default_rng(0)


def _drive(mk, st, recent_window, ks, vs, scores):
    """Feed a (T, B, KVH, hd) token stream + scripted per-step scores.
    A fresh cache wraps the finalized state each step, mirroring how the
    jitted decode step reconstructs the cache (protocol: state is
    immutable; ``state.length`` is the pre-step length)."""
    T, B, KVH, hd = ks.shape
    S0 = 4
    cache = mk(st, recent_window)
    cache.update(0, jnp.asarray(ks[:S0]).transpose(1, 0, 2, 3),
                 jnp.asarray(vs[:S0]).transpose(1, 0, 2, 3),
                 jnp.arange(S0)[None].repeat(B, 0), None)
    cache.observe(0, jnp.asarray(scores[0]))
    st = cache.finalize()
    outs = []
    for t in range(S0, T):
        cache = mk(st, recent_window)
        k, v, m = cache.update(
            0, jnp.asarray(ks[t : t + 1]).transpose(1, 0, 2, 3),
            jnp.asarray(vs[t : t + 1]).transpose(1, 0, 2, 3),
            jnp.full((B, 1), t, jnp.int32), None)
        cache.observe(0, jnp.asarray(scores[t - S0 + 1]))
        st = cache.finalize()
        outs.append((np.asarray(k), np.asarray(v), np.asarray(m)))
    return outs, st


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_quant_h2o_policy_matches_dense_and_recompute_oracle(bits):
    B, KVH, hd, budget, T = 2, 2, 16, 8, 14
    ks = RNG.standard_normal((T, B, KVH, hd)).astype(np.float32)
    vs = RNG.standard_normal((T, B, KVH, hd)).astype(np.float32)
    # scripted scores: deterministic, no ties
    scores = RNG.random((T - 3, B, budget)).astype(np.float32)

    _, std = _drive(H2OCache,
                    init_h2o_cache(1, B, budget, KVH, hd, jnp.float32),
                    2, ks, vs, scores)
    _, stq = _drive(QuantH2OCache,
                    init_quant_h2o_cache(1, B, budget, KVH, hd,
                                         bits=bits, group=8,
                                         residual_len=4,
                                         dtype=jnp.float32),
                    2, ks, vs, scores)

    # identical eviction trajectory
    np.testing.assert_array_equal(np.asarray(std.pos), np.asarray(stq.pos))
    assert int(stq.length) == T

    # recompute oracle: each kept slot == qdq(original token), residual
    # tokens exact
    pos = np.asarray(stq.pos)[0]                       # (B, budget)
    kq = np.asarray(_dqtok(stq.ck[0], stq.mnk[0], stq.sck[0], bits,
                           jnp.float32))               # (B, budget, KVH, hd)
    R = 4
    for b in range(B):
        for s in range(budget):
            p = int(pos[b, s])
            assert p >= 0
            want_packed, mn, sc = _qtok(jnp.asarray(ks[p, b]), bits, 8)
            want = np.asarray(_dqtok(want_packed, mn, sc, bits,
                                     jnp.float32))
            np.testing.assert_allclose(kq[b, s], want, rtol=0, atol=1e-6)
            if p >= T - R:                             # residual: exact
                np.testing.assert_allclose(
                    np.asarray(stq.rk[0, b, p % R]), ks[p, b], atol=1e-6)

    # the attention view the model saw: quant error bounded per bit width
    # (scale = range/(2^bits-1); error <= scale/2 per group)
    kd, vd = QuantH2OCache(stq, 2)._view(0)
    err = float(jnp.max(jnp.abs(
        jnp.asarray(kd)[0, 0] - jnp.asarray(ks[int(pos[0, 0]), 0]))))
    rng_half = (ks.max() - ks.min()) / (2 ** bits - 1)
    assert err <= rng_half + 1e-6


def test_quant_h2o_view_residual_override_is_exact():
    B, KVH, hd, budget = 1, 1, 8, 6
    ks = RNG.standard_normal((6, B, KVH, hd)).astype(np.float32)
    _, st = _drive(QuantH2OCache,
                   init_quant_h2o_cache(1, B, budget, KVH, hd, bits=2,
                                        group=8, residual_len=3,
                                        dtype=jnp.float32),
                   1, ks, ks,
                   RNG.random((3, B, budget)).astype(np.float32))
    pos = np.asarray(st.pos)[0, 0]
    kd, _ = QuantH2OCache(st, 1)._view(0)
    for s, p in enumerate(pos.tolist()):
        if p >= 6 - 3:                      # in the ring: exact at 2 bit
            np.testing.assert_allclose(np.asarray(kd)[0, s, 0],
                                       ks[p, 0, 0], atol=1e-6)


def test_quant_h2o_model_decode_jits_and_tracks_dense():
    from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, use_pallas=False)
    B, S, budget = 1, 8, 8
    KVH, hd = cfg.num_key_value_heads, cfg.head_dim
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((B, S), jnp.int32))
    ids = jnp.asarray(RNG.integers(0, cfg.vocab_size, (B, S)))

    def run(mk_cache):
        st_args = mk_cache()
        cache, st = st_args
        logits = model.apply(params, ids, positions=jnp.arange(S)[None],
                             cache=cache)
        st = cache.finalize()
        outs = [np.asarray(logits[:, -1])]

        @jax.jit
        def step(params, st, tok, t):
            c = type(cache)(st, recent_window=2)
            lg = model.apply(params, tok[:, None],
                             positions=jnp.full((B, 1), t), cache=c)
            return lg[:, -1], c.finalize()

        tok = logits[:, -1].argmax(-1)
        for t in range(S, S + 5):
            lg, st = step(params, st, tok, t)
            tok = lg.argmax(-1)
            outs.append(np.asarray(lg))
        return np.stack(outs), st

    dense_out, _ = run(lambda: (H2OCache(
        init_h2o_cache(cfg.num_hidden_layers, B, budget, KVH, hd,
                       jnp.float32), recent_window=2), None))
    quant_out, stq = run(lambda: (QuantH2OCache(
        init_quant_h2o_cache(cfg.num_hidden_layers, B, budget, KVH, hd,
                             bits=8, group=16, residual_len=4,
                             dtype=jnp.float32), recent_window=2), None))
    assert int(stq.length) == S + 5
    # 8-bit slots + exact residual: logits track dense H2O closely
    denom = np.abs(dense_out).max() + 1e-9
    assert np.max(np.abs(dense_out - quant_out)) / denom < 0.05


def test_quant_h2o_init_irregular_head_dim():
    """ADVICE r4: head_dim=80 with default group=32 must not fail at
    trace time — the group rounds down to a divisor (16); an
    unpackable head_dim raises a clear error instead of a reshape."""
    import pytest

    from microscopiq_tpu.kv.h2o import init_quant_h2o_cache

    st = init_quant_h2o_cache(1, 2, 8, 2, 80, bits=4, group=32)
    assert st.group == 20 and 80 % st.group == 0   # largest divisor <= 32
    assert st.ck.shape[-1] == 80 // 2          # per = 8 // bits

    with pytest.raises(ValueError, match="divisible by the packing"):
        init_quant_h2o_cache(1, 2, 8, 2, 9, bits=2)


def test_slot_h2o_matches_batch_h2o_oracle_at_uniform_depth():
    """Policy-correctness oracle (r5 review finding): at uniform slot
    depths with identical token/score streams, the per-slot engine
    cache must make EXACTLY the eviction decisions of the batched
    H2OCache — same kept positions, same stores, same scores."""
    from microscopiq_tpu.kv.h2o import (H2OCache, SlotH2ODecodeCache,
                                        SlotH2OPrefillCache,
                                        init_h2o_cache,
                                        init_slot_h2o_cache)

    L, B, budget, KVH, hd, recent = 1, 3, 8, 2, 4, 2
    S = 6
    rng = np.random.default_rng(0)
    k0 = rng.standard_normal((B, S, KVH, hd)).astype(np.float32)
    v0 = rng.standard_normal((B, S, KVH, hd)).astype(np.float32)
    pos = np.broadcast_to(np.arange(S), (B, S)).astype(np.int32)
    probs0 = rng.random((B, budget)).astype(np.float32)

    st = init_h2o_cache(L, B, budget, KVH, hd, jnp.float32)
    c = H2OCache(st, recent_window=recent)
    c.update(0, jnp.asarray(k0), jnp.asarray(v0), jnp.asarray(pos), None)
    c.observe(0, jnp.asarray(probs0))
    st = c.finalize()

    sst = init_slot_h2o_cache(L, B, budget, KVH, hd, jnp.float32)
    for b in range(B):
        pc = SlotH2OPrefillCache(sst, jnp.int32(b), jnp.int32(S))
        pc.update(0, jnp.asarray(k0[b:b + 1]), jnp.asarray(v0[b:b + 1]),
                  jnp.asarray(pos[b:b + 1]), None)
        pc.observe(0, jnp.asarray(probs0[b:b + 1]))
        sst = pc.finalize(S)

    for t in range(S, S + 7):            # crosses the budget boundary
        kt = rng.standard_normal((B, 1, KVH, hd)).astype(np.float32)
        vt = rng.standard_normal((B, 1, KVH, hd)).astype(np.float32)
        pt = np.full((B, 1), t, np.int32)
        pr = rng.random((B, budget)).astype(np.float32)

        c = H2OCache(st, recent_window=recent)
        c.update(0, jnp.asarray(kt), jnp.asarray(vt), jnp.asarray(pt),
                 None)
        c.observe(0, jnp.asarray(pr))
        st = c.finalize()

        dc = SlotH2ODecodeCache(sst, jnp.ones((B,), bool), recent)
        dc.update(0, jnp.asarray(kt), jnp.asarray(vt), jnp.asarray(pt),
                  None)
        dc.observe(0, jnp.asarray(pr))
        sst = dc.finalize()

        np.testing.assert_array_equal(np.asarray(st.pos),
                                      np.asarray(sst.pos))
        np.testing.assert_array_equal(np.asarray(st.k),
                                      np.asarray(sst.k))
        np.testing.assert_allclose(np.asarray(st.score),
                                   np.asarray(sst.score), rtol=1e-6)
        assert int(st.length) == int(sst.lengths[0])


def test_h2o_recent_window_must_be_under_budget():
    import pytest

    from microscopiq_tpu.kv.h2o import (H2OCache, SlotH2ODecodeCache,
                                        init_h2o_cache,
                                        init_slot_h2o_cache)

    st = init_h2o_cache(1, 1, 8, 2, 4)
    with pytest.raises(ValueError, match="recent_window"):
        H2OCache(st, recent_window=8)
    sst = init_slot_h2o_cache(1, 2, 8, 2, 4)
    with pytest.raises(ValueError, match="recent_window"):
        SlotH2ODecodeCache(sst, jnp.ones((2,), bool), recent_window=9)
