"""KV quantization tests: codec parity vs reference fixtures, true
compression round-trips, power iteration quality, compress_insert
dispatcher, and the static-shape decode caches (dense exactness +
quantized closeness + generation loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microscopiq_tpu.kv import (
    CompressionConfig,
    QuantKVConfig,
    compress_insert,
    fake_channel_group_quant,
    fake_dense_sparse_quant,
    fake_token_group_quant,
    fake_uniform_quant,
    gearl_token_quant,
    gears_token_quant,
    gearsl_channel_quant,
    init_dense_cache,
    init_quant_cache,
    DenseDecodeCache,
    QuantizedDecodeCache,
    power_iteration_lowrank,
    true_gear_compress,
    true_gear_decompress,
    true_outlier_compress,
    true_outlier_decompress,
    true_uniform_compress,
    true_uniform_decompress,
    pack_4bit_halves,
    unpack_4bit_halves,
)

RNG = np.random.default_rng(5)


# ---------------- codec parity vs reference fixtures ----------------
def test_token_group_parity(golden_gear):
    x = jnp.asarray(golden_gear["x"])
    for key, bits, g in [("token4_g32", 4, 32), ("token2_g64", 2, 64)]:
        got = np.asarray(fake_token_group_quant(x, bits, g))
        np.testing.assert_allclose(got, golden_gear[key], rtol=1e-5,
                                   atol=1e-5)


def test_channel_group_parity(golden_gear):
    x = jnp.asarray(golden_gear["x"])
    got = np.asarray(fake_channel_group_quant(x, 4, 32))
    np.testing.assert_allclose(got, golden_gear["chan4_g32"], rtol=1e-5,
                               atol=1e-5)


def test_uniform_parity(golden_gear):
    x = jnp.asarray(golden_gear["x"])
    got = np.asarray(fake_uniform_quant(x, 4))
    np.testing.assert_allclose(got, golden_gear["uniform4"], rtol=1e-5,
                               atol=1e-5)


def test_dense_sparse_parity(golden_gear):
    x = jnp.asarray(golden_gear["x"])
    got = np.asarray(fake_dense_sparse_quant(x, 4, 0.05))
    want = golden_gear["densesparse4"]
    # outlier restoration is exact; inner grid may differ by <= 1 step on
    # sort ties — compare with one-step tolerance
    step = (want.max() - want.min()) / 15
    assert np.abs(got - want).max() <= step + 1e-5


def test_true_uniform_parity(golden_gear):
    x = jnp.asarray(golden_gear["x"])
    c = true_uniform_compress(x, 4)
    np.testing.assert_allclose(
        np.asarray(true_uniform_decompress(c)), golden_gear["true_u4_dec"],
        rtol=1e-5, atol=1e-4)
    c8 = true_uniform_compress(x, 8)
    np.testing.assert_allclose(
        np.asarray(true_uniform_decompress(c8)), golden_gear["true_u8_dec"],
        rtol=1e-5, atol=1e-4)


# ---------------- functional properties ----------------
def test_pack_halves_roundtrip():
    u = jnp.asarray(RNG.integers(0, 16, 128).astype(np.uint8))
    np.testing.assert_array_equal(
        np.asarray(unpack_4bit_halves(pack_4bit_halves(u))), np.asarray(u))


def test_true_outlier_roundtrip():
    x = jnp.asarray(RNG.standard_normal((1, 2, 16, 8)).astype(np.float32))
    base, vals, idxs = true_outlier_compress(x, 4, 0.1)
    dec = true_outlier_decompress(base, vals, idxs)
    # preserved outliers are exact
    flat = np.asarray(x).ravel()
    np.testing.assert_allclose(np.asarray(dec).ravel()[np.asarray(idxs)],
                               flat[np.asarray(idxs)], rtol=1e-6)


def test_power_iteration_improves_error():
    # low-rank-dominated error matrix
    B, H, S, D = 1, 2, 32, 16
    u = RNG.standard_normal((B, S, 4)).astype(np.float32)
    v = RNG.standard_normal((B, 4, H * D)).astype(np.float32)
    err = (u @ v).reshape(B, S, H, D).transpose(0, 2, 1, 3)
    err = jnp.asarray(err + 0.01 * RNG.standard_normal(err.shape))
    approx = power_iteration_lowrank(err, loop=4, rank=4)
    res = float(jnp.linalg.norm(err - approx) / jnp.linalg.norm(err))
    assert res < 0.1, res


def test_gear_codecs_reduce_error_vs_plain():
    x = jnp.asarray(RNG.standard_normal((1, 4, 64, 32)).astype(np.float32))
    plain = fake_token_group_quant(x, 2, 64)
    gl = gearl_token_quant(x, 2, 64, rank=4, loop=3)
    e_plain = float(jnp.linalg.norm(x - plain))
    e_gl = float(jnp.linalg.norm(x - gl))
    assert e_gl < e_plain

    xo = x.at[0, 0, 5, 3].set(40.0)
    gs = gears_token_quant(xo, 2, 64, sparsity=0.01)
    assert abs(float(gs[0, 0, 5, 3]) - 40.0) < 1e-4  # outlier preserved


def test_true_gear_roundtrip():
    x = jnp.asarray(RNG.standard_normal((1, 2, 32, 16)).astype(np.float32))
    g = true_gear_compress(x, 4, left=0.05, rank=4, loop=3)
    dec = true_gear_decompress(g)
    rel = float(jnp.linalg.norm(dec - x) / jnp.linalg.norm(x))
    base = true_uniform_decompress(true_uniform_compress(x, 4))
    rel_base = float(jnp.linalg.norm(base - x) / jnp.linalg.norm(x))
    assert rel < rel_base  # outliers + low-rank help


def test_compress_insert_dispatcher():
    cfg = CompressionConfig(compress_method="KIVI", attention_number=2,
                            quantize_bit=4, group_size=16)
    cfg.copy_for_all_attention()
    k = jnp.asarray(RNG.standard_normal((1, 2, 64, 16)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((1, 2, 64, 16)).astype(np.float32))
    k2, v2 = compress_insert(k, v, cfg, 0)
    assert not np.allclose(np.asarray(k2), np.asarray(k))
    assert k2.shape == k.shape
    assert 0 < cfg.compress_ratio() < 1


# ---------------- decode caches ----------------
def _toy_attention_consume(cache, k_new, v_new, positions):
    return cache.update(0, k_new, v_new, positions, None)


def test_dense_cache_decode_matches_full():
    B, KVH, hd, S = 1, 2, 8, 12
    k_all = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    v_all = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)

    state = init_dense_cache(1, B, 16, KVH, hd, jnp.float32)
    cache = DenseDecodeCache(state)
    pos = jnp.arange(S)[None, :]
    k_out, v_out, mask = cache.update(0, k_all, v_all, pos, None)
    np.testing.assert_allclose(np.asarray(k_out[:, :S]), np.asarray(k_all),
                               rtol=1e-6)
    m = np.asarray(mask[0, 0])
    assert m[3, 3] and not m[3, 4]  # causal
    assert not m[S - 1, S]          # beyond length masked

    # then a decode step
    state = cache.finalize()
    cache = DenseDecodeCache(state)
    k1 = jnp.asarray(RNG.standard_normal((B, 1, KVH, hd)), jnp.float32)
    v1 = jnp.asarray(RNG.standard_normal((B, 1, KVH, hd)), jnp.float32)
    k_out, _, mask = cache.update(0, k1, v1, jnp.asarray([[S]]), None)
    np.testing.assert_allclose(np.asarray(k_out[:, S]), np.asarray(k1[:, 0]),
                               rtol=1e-6)
    assert np.asarray(mask)[0, 0, 0, S]


def test_quant_cache_close_to_dense():
    B, KVH, hd = 1, 2, 32
    gap = 16
    cfg = QuantKVConfig(bits=4, gap=gap, v_group=16,
                        residual_dtype=jnp.float32)
    S = 40  # 2 full chunks + 8 residual
    k_all = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    v_all = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)

    state = init_quant_cache(1, B, 64, KVH, hd, cfg)
    cache = QuantizedDecodeCache(state, cfg)
    pos = jnp.arange(S)[None, :]
    k_out, v_out, mask = cache.update(0, k_all, v_all, pos, None)

    # residual tokens (last 8) are exact
    res = np.asarray(k_out[:, 64:64 + 8])
    np.testing.assert_allclose(res, np.asarray(k_all[:, 32:]), atol=1e-3)
    # quantized chunks are close
    chunk = np.asarray(k_out[:, :32])
    err = np.abs(chunk - np.asarray(k_all[:, :32])).mean()
    assert err < 0.15, err
    # mask: all S tokens visible from the last query position
    m = np.asarray(mask)[0, 0, -1]
    assert m[:32].all() and m[64:64 + 8].all()
    assert not m[32:64].any() and not m[64 + 8:].any()

    # decode steps across a chunk boundary (tokens 40..48)
    state = cache.finalize()
    for t in range(40, 49):
        cache = QuantizedDecodeCache(state, cfg)
        k1 = jnp.asarray(RNG.standard_normal((B, 1, KVH, hd)), jnp.float32)
        v1 = jnp.asarray(RNG.standard_normal((B, 1, KVH, hd)), jnp.float32)
        k_out, v_out, mask = cache.update(0, k1, v1,
                                          jnp.asarray([[t]]), None)
        state = cache.finalize()
        assert int(state.length) == t + 1
        m = np.asarray(mask)[0, 0, 0]
        assert m.sum() == t + 1  # exactly the live tokens visible


def test_generate_with_caches():
    from microscopiq_tpu.eval.generate import generate
    from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig.tiny(num_key_value_heads=2, hidden_size=64)
    model = LlamaForCausalLM(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    prompt = np.asarray(RNG.integers(0, 256, (2, 8)))

    out_dense = generate(model, params, prompt, max_new_tokens=6,
                         cache_kind="dense")
    assert out_dense.shape == (2, 6)

    # dense-cache greedy decode must match no-cache argmax continuation
    full = prompt.copy()
    for _ in range(6):
        logits = model.apply(params, jnp.asarray(full))
        nxt = np.asarray(jnp.argmax(logits[:, -1], -1))[:, None]
        full = np.concatenate([full, nxt], 1)
    np.testing.assert_array_equal(out_dense, full[:, 8:])

    out_q = generate(model, params, prompt, max_new_tokens=6,
                     cache_kind="quant",
                     quant_cfg=QuantKVConfig(bits=8, gap=8, v_group=16))
    assert out_q.shape == (2, 6)


def test_sink_cache_window_and_rerotation():
    from microscopiq_tpu.kv import SinkDecodeCache, init_sink_cache
    B, KVH, hd = 1, 1, 8
    sink, window = 2, 4
    state = init_sink_cache(1, B, sink, window, KVH, hd, jnp.float32)

    # feed 10 tokens one by one; keys rotated at their slot positions
    import microscopiq_tpu.models.llama as L
    raw_ks = [jnp.asarray(RNG.standard_normal((B, 1, KVH, hd)), jnp.float32)
              for _ in range(10)]
    for t, kr in enumerate(raw_ks):
        cache = SinkDecodeCache(state, sink)
        slot = cache.slot_positions(1)[None, :]
        k_rot, _ = L.rope(kr, kr, slot, hd, 10000.0)
        k_all, v_all, mask = cache.update(0, k_rot, kr, slot, None)
        state = cache.finalize()
        live = int(np.asarray(mask).sum())
        assert live == min(t + 1, sink + window)

    assert int(state.length) == 10
    # sink tokens stay: slot 0/1 hold tokens 0/1 rotated at slots 0/1
    k0_expect, _ = L.rope(raw_ks[0], raw_ks[0],
                          jnp.asarray([[0]]), hd, 10000.0)
    np.testing.assert_allclose(np.asarray(state.k[0][:, 0]),
                               np.asarray(k0_expect[:, 0]), atol=1e-5)
    # the newest token sits in the last slot, rotated at slot C-1
    kn_expect, _ = L.rope(raw_ks[-1], raw_ks[-1],
                          jnp.asarray([[sink + window - 1]]), hd, 10000.0)
    np.testing.assert_allclose(np.asarray(state.k[0][:, -1]),
                               np.asarray(kn_expect[:, 0]), atol=1e-5)
    # re-rotation consistency: token 7 entered at slot 5 when length was 7;
    # after 2 evictions it sits at slot 3 with phase rotated back by 2
    k7_expect, _ = L.rope(raw_ks[7], raw_ks[7],
                          jnp.asarray([[3]]), hd, 10000.0)
    np.testing.assert_allclose(np.asarray(state.k[0][:, 3]),
                               np.asarray(k7_expect[:, 0]), atol=1e-4)


def test_k_group_matches_gear_channel_codec():
    """K sub-chunk grouping must reproduce the reference KIVI channel
    codec (compress_function.py:41-70) on the same window: quantize a
    gap-token chunk with k_group=g == fake_channel_group_quant(g)."""
    from microscopiq_tpu.kv.cache import _dequant_k, _quant_chunk_k
    from microscopiq_tpu.kv.gear import fake_channel_group_quant

    B, KVH, hd, gap, g = 2, 2, 16, 32, 8
    x = jnp.asarray(RNG.standard_normal((B, KVH, 1, gap, hd)), jnp.float32)
    q, mn, sc = _quant_chunk_k(x, 4, g)
    deq = _dequant_k(q, mn, sc, jnp.float32, 4)      # (B,KVH,1,gap,hd)
    # gear codec wants (B, H, S, D)
    ref = fake_channel_group_quant(x[:, :, 0], 4, g)
    np.testing.assert_allclose(np.asarray(deq[:, :, 0]), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    assert mn.shape == (B, KVH, 1, gap // g, hd)


def test_decoupled_kivi_knobs_semantics():
    """gap (chunk cadence), k_group (K channel-group), residual_len
    (protected fp window) are independent: the assembled K must equal
    group-quantized chunks over tokens at least residual_len old and the
    EXACT recent tokens, at every decode step."""
    from microscopiq_tpu.kv.cache import (QuantizedDecodeCache,
                                          _dequant_k, _quant_chunk_k,
                                          init_quant_cache)

    B, KVH, hd = 1, 2, 16
    gap, kg, rl = 8, 4, 6
    cfg = QuantKVConfig(bits=4, gap=gap, k_group=kg, residual_len=rl,
                        v_group=16, residual_dtype=jnp.float32)
    S_max = 64
    T = 40
    ks = jnp.asarray(RNG.standard_normal((B, T, KVH, hd)), jnp.float32)
    vs = jnp.asarray(RNG.standard_normal((B, T, KVH, hd)), jnp.float32)

    prefill = 11
    state = init_quant_cache(1, B, S_max, KVH, hd, cfg)
    cache = QuantizedDecodeCache(state, cfg)
    pos = jnp.arange(prefill)[None, :]
    cache.update(0, ks[:, :prefill], vs[:, :prefill], pos, None)
    state = cache.finalize()

    for t in range(prefill, T):
        cache = QuantizedDecodeCache(state, cfg)
        k_out, v_out, mask = cache.update(
            0, ks[:, t:t + 1], vs[:, t:t + 1], jnp.asarray([[t]]), None)
        state = cache.finalize()
        n = t + 1
        nfull = max(n - rl, 0) // gap
        # expected quantized chunks: groups of `kg` tokens, channel-wise
        for c in range(nfull):
            w = ks[:, c * gap:(c + 1) * gap]            # (B,gap,KVH,hd)
            wc = w.transpose(0, 2, 1, 3)[:, :, None]    # (B,KVH,1,gap,hd)
            q, mn, sc = _quant_chunk_k(wc, cfg.bits, kg)
            exp = _dequant_k(q, mn, sc, jnp.float32, cfg.bits)[:, :, 0]
            got = k_out[:, c * gap:(c + 1) * gap].transpose(0, 2, 1, 3)
            np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                       atol=1e-5)
        # residual tokens are bit-exact, in order, at the right slots
        n_res = n - nfull * gap
        res = k_out[:, S_max:S_max + n_res]
        np.testing.assert_array_equal(
            np.asarray(res), np.asarray(ks[:, nfull * gap:n]))
        assert rl <= n_res <= rl + gap or n <= rl + gap
        # mask sees exactly n tokens
        assert int(np.asarray(mask)[0, 0, -1].sum()) == n


def test_slot_cache_decoupled_knobs():
    """Slot (continuous-batching) cache honors k_group/residual_len: two
    slots at different depths decode with exact residual windows."""
    from microscopiq_tpu.kv.cache import (SlotQuantizedDecodeCache,
                                          init_slot_quant_cache)

    B, KVH, hd = 2, 2, 16
    gap, kg, rl = 8, 4, 4
    cfg = QuantKVConfig(bits=4, gap=gap, k_group=kg, residual_len=rl,
                        v_group=16, residual_dtype=jnp.float32)
    state = init_slot_quant_cache(1, B, 64, KVH, hd, cfg)
    T = 30
    ks = jnp.asarray(RNG.standard_normal((B, T, KVH, hd)), jnp.float32)
    vs = jnp.asarray(RNG.standard_normal((B, T, KVH, hd)), jnp.float32)
    active = jnp.asarray([True, True])
    for t in range(T):
        cache = SlotQuantizedDecodeCache(state, cfg, active)
        k_out, _, mask = cache.update(
            0, ks[:, t:t + 1], vs[:, t:t + 1],
            jnp.full((B, 1), t, jnp.int32), None)
        state = cache.finalize()
        n = t + 1
        nfull = max(n - rl, 0) // gap
        n_res = n - nfull * gap
        res = k_out[:, 64:64 + n_res]
        np.testing.assert_array_equal(
            np.asarray(res), np.asarray(ks[:, nfull * gap:n]))
        assert int(np.asarray(mask)[0, 0, 0].sum()) == n
    assert np.asarray(state.length).tolist() == [T, T]
