"""GEAR extensions of the quantized decode cache: per-chunk low-rank
error correction (GEAR-L, kv_quant/GEARLM/Simulated/compress_function.py
:398-426) and the exact outlier side-band (GEAR-S, TrueCompression/models/
TrueCompressFunction.py:95-119), wired into the jitted static-shape cache
(kv/cache.py) and the fused flash-decode kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microscopiq_tpu.kv.cache import (QuantKVConfig, QuantizedDecodeCache,
                                      SlotQuantizedDecodeCache,
                                      _apply_gear, _compress_chunks,
                                      _dequant_k, _dequant_v,
                                      init_quant_cache,
                                      init_slot_quant_cache)
from microscopiq_tpu.ops.pallas.quant_attention import (
    quant_attention_decode, quant_attention_decode_reference)

RNG = np.random.default_rng(31)


def _chunked(x, gap):
    """(B, S, KVH, hd) -> head-major chunks (B, KVH, nch, gap, hd)."""
    B, S, KVH, hd = x.shape
    nch = S // gap
    return x[:, :nch * gap].reshape(B, nch, gap, KVH, hd
                                    ).transpose(0, 3, 1, 2, 4)


def _assemble(cache_state, cfg, B, KVH, hd, layer=0):
    st = cache_state
    kd = _dequant_k(st.kq[layer], st.k_mn[layer], st.k_sc[layer],
                    jnp.float32, cfg.bits)
    vd = _dequant_v(st.vq[layer], st.v_mn[layer], st.v_sc[layer],
                    cfg.v_group, jnp.float32, cfg.bits)
    g = lambda n: (getattr(st, n)[layer]
                   if getattr(st, n) is not None else None)
    kd = _apply_gear(kd, g("k_p"), g("k_q"), g("k_ov"), g("k_oi"), cfg)
    vd = _apply_gear(vd, g("v_p"), g("v_q"), g("v_ov"), g("v_oi"), cfg)
    return kd, vd


def test_full_rank_recovers_chunks_exactly():
    """With rank >= min(gap, KVH*hd) the per-chunk error is full-rank-
    projected, so chunks reconstruct the ORIGINAL values (the low-rank
    correction equals the quantization error exactly)."""
    B, KVH, hd, gap, S = 1, 1, 4, 8, 16
    cfg = QuantKVConfig(bits=4, gap=gap, v_group=hd, rank=4, loop=3,
                        lr_dtype=jnp.float32)
    k = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    state = init_quant_cache(1, B, S, KVH, hd, cfg)
    cache = QuantizedDecodeCache(state, cfg)
    cache.update(0, k, v, jnp.arange(S)[None], None)
    st = cache.finalize()
    kd, vd = _assemble(st, cfg, B, KVH, hd)
    np.testing.assert_allclose(np.asarray(kd).reshape(-1),
                               np.asarray(_chunked(k, gap)).reshape(-1),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(vd).reshape(-1),
                               np.asarray(_chunked(v, gap)).reshape(-1),
                               atol=2e-5, rtol=1e-4)


def test_gearl_beats_kivi_error():
    """Rank-4 correction must strictly shrink the chunk reconstruction
    error vs plain KIVI on random data."""
    B, KVH, hd, gap, S = 2, 2, 32, 32, 64
    k = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    errs = {}
    for rank in (0, 4):
        cfg = QuantKVConfig(bits=4, gap=gap, v_group=hd, rank=rank)
        state = init_quant_cache(1, B, S, KVH, hd, cfg)
        cache = QuantizedDecodeCache(state, cfg)
        cache.update(0, k, v, jnp.arange(S)[None], None)
        st = cache.finalize()
        kd, _ = _assemble(st, cfg, B, KVH, hd)
        errs[rank] = float(jnp.mean(
            (kd - _chunked(k, gap).astype(jnp.float32)) ** 2))
    # quantization error of i.i.d. data is noise-like; a rank-4
    # projection of a (32, 64) error catches a bounded slice of its
    # energy — the point is a strict, reproducible improvement
    assert errs[4] < 0.85 * errs[0], errs


def test_outlier_sideband_exact():
    """GEAR-S: the out_k extreme values per (chunk, head) round-trip
    exactly through the quantized store."""
    B, KVH, hd, gap, S, k_out = 1, 2, 16, 16, 32, 3
    cfg = QuantKVConfig(bits=4, gap=gap, v_group=hd, out_k=k_out)
    x = RNG.standard_normal((B, S, KVH, hd)).astype(np.float32)
    # plant huge outliers
    x[0, 3, 0, 5] = 40.0
    x[0, 20, 1, 2] = -55.0
    k = jnp.asarray(x)
    v = jnp.asarray(x * 0.5)
    state = init_quant_cache(1, B, S, KVH, hd, cfg)
    cache = QuantizedDecodeCache(state, cfg)
    cache.update(0, k, v, jnp.arange(S)[None], None)
    st = cache.finalize()
    kd, vd = _assemble(st, cfg, B, KVH, hd)
    kc = np.asarray(_chunked(k, gap))
    kda = np.asarray(kd)
    # chunk 0, head 0 contains the +40 outlier at (token 3, feat 5)
    assert kda[0, 0, 0, 3, 5] == pytest.approx(40.0, abs=1e-6)
    assert kda[0, 1, 1, 4, 2] == pytest.approx(-55.0, abs=1e-6)
    # and the overall error is bounded (scales not blown up by outliers)
    inl = np.abs(kda - kc) < 0.2
    assert inl.mean() > 0.95


def test_decode_fold_matches_prefill_chunks():
    """Chunks folded token-by-token in decode (predicated writes +
    lax.cond-gated GEAR math) must equal the prefill-ingested chunks."""
    B, KVH, hd, gap = 1, 1, 8, 8
    S = 2 * gap
    cfg = QuantKVConfig(bits=4, gap=gap, v_group=hd, rank=2, loop=2,
                        out_k=2, lr_dtype=jnp.float32,
                        residual_dtype=jnp.float32)
    k = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)

    state_p = init_quant_cache(1, B, S, KVH, hd, cfg)
    cp = QuantizedDecodeCache(state_p, cfg)
    cp.update(0, k, v, jnp.arange(S)[None], None)
    st_p = cp.finalize()

    st_d = init_quant_cache(1, B, S, KVH, hd, cfg)

    @jax.jit
    def step(st, kt, vt, pos):
        c = QuantizedDecodeCache(st, cfg)
        c.update(0, kt, vt, pos, None)
        return c.finalize()

    for t in range(S):
        st_d = step(st_d, k[:, t:t + 1], v[:, t:t + 1],
                    jnp.full((B, 1), t, jnp.int32))

    for name in ("kq", "k_mn", "k_sc", "vq", "v_mn", "v_sc",
                 "k_p", "k_q", "v_p", "v_q", "k_ov", "k_oi",
                 "v_ov", "v_oi"):
        a, b = getattr(st_p, name), getattr(st_d, name)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=name)


def test_fused_kernel_gearl_matches_twin():
    """Interpret-mode fused flash decode with rank-2 corrections equals
    the dequantize-everything twin."""
    B, KVH, hd, gap, maxlen, length = 1, 2, 128, 64, 256, 170
    H = 4
    cfg = QuantKVConfig(bits=4, gap=gap, v_group=hd, rank=2, loop=2)
    state = init_quant_cache(1, B, maxlen, KVH, hd, cfg)
    cache = QuantizedDecodeCache(state, cfg)
    k = jnp.asarray(RNG.standard_normal((B, length, KVH, hd)),
                    jnp.float32)
    v = jnp.asarray(RNG.standard_normal((B, length, KVH, hd)),
                    jnp.float32)
    cache.update(0, k, v, jnp.arange(length)[None], None)
    st = cache.finalize()
    full = (st.kq, st.k_mn, st.k_sc, st.vq, st.v_mn, st.v_sc,
            st.res_k, st.res_v, st.k_p, st.k_q, st.v_p, st.v_q)
    q = jnp.asarray(RNG.standard_normal((B, H, hd)), jnp.float32)
    scale = hd ** -0.5
    y_ref = np.asarray(quant_attention_decode_reference(
        q, full, 0, jnp.int32(length), cfg.v_group, scale))
    y_ker = np.asarray(quant_attention_decode(
        q, full, 0, jnp.int32(length), cfg.v_group, scale,
        interpret=True))
    np.testing.assert_allclose(y_ker, y_ref, atol=2e-2, rtol=2e-2)
    # and the low-rank term actually matters: dropping it changes output
    y_kivi = np.asarray(quant_attention_decode_reference(
        q, full[:8], 0, jnp.int32(length), cfg.v_group, scale))
    assert np.abs(y_ref - y_kivi).max() > 1e-4


def test_slot_cache_gearl_matches_shared():
    """Per-slot GEAR cache at equal depths == shared-length cache."""
    B, KVH, hd, gap = 2, 1, 8, 8
    S = gap + 3
    cfg = QuantKVConfig(bits=4, gap=gap, v_group=hd, rank=2, loop=2,
                        lr_dtype=jnp.float32)
    k = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((B, S, KVH, hd)), jnp.float32)

    st_sh = init_quant_cache(1, B, 2 * gap, KVH, hd, cfg)
    st_sl = init_slot_quant_cache(1, B, 2 * gap, KVH, hd, cfg)

    @jax.jit
    def step_sh(st, kt, vt, pos):
        c = QuantizedDecodeCache(st, cfg)
        out = c.update(0, kt, vt, pos, None)
        return out, c.finalize()

    @jax.jit
    def step_sl(st, kt, vt, pos):
        c = SlotQuantizedDecodeCache(st, cfg, jnp.ones((B,), bool))
        out = c.update(0, kt, vt, pos, None)
        return out, c.finalize()

    def attn(kv):
        ka, va, m = kv
        q = jnp.ones((B, 1, KVH, hd), jnp.float32)
        logits = jnp.einsum("bqhd,bthd->bhqt", q, ka.astype(jnp.float32))
        logits = jnp.where(m[:, 0][:, None], logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqt,bthd->bqhd", p, va.astype(jnp.float32))

    for t in range(S):
        pos = jnp.full((B, 1), t, jnp.int32)
        out_sh, st_sh = step_sh(st_sh, k[:, t:t + 1], v[:, t:t + 1], pos)
        out_sl, st_sl = step_sl(st_sl, k[:, t:t + 1], v[:, t:t + 1], pos)
        # same number of attendable keys every step ...
        assert int(out_sh[2].sum()) == int(out_sl[2].sum())
        # ... and attention-equivalent views (at the fold step the two
        # caches expose the same tokens at different slots — shared
        # counts the fresh chunk immediately, the slot cache keeps the
        # residual valid one more step — so outputs differ only by that
        # chunk's quantization error)
        np.testing.assert_allclose(np.asarray(attn(out_sh)),
                                   np.asarray(attn(out_sl)),
                                   atol=0.12, rtol=0.1)
    # the stores themselves must agree exactly
    for name in ("kq", "k_mn", "k_sc", "vq", "v_mn", "v_sc",
                 "k_p", "k_q", "v_p", "v_q"):
        np.testing.assert_allclose(np.asarray(getattr(st_sh, name)),
                                   np.asarray(getattr(st_sl, name)),
                                   atol=1e-5, rtol=1e-4, err_msg=name)


def test_compression_ratio_accounts_sideband():
    cfg0 = QuantKVConfig(bits=4, gap=64, v_group=128)
    cfg1 = QuantKVConfig(bits=4, gap=64, v_group=128, rank=4, out_k=4)
    st = init_quant_cache(1, 1, 128, 2, 128, cfg1)
    c0 = QuantizedDecodeCache(init_quant_cache(1, 1, 128, 2, 128, cfg0),
                              cfg0)
    c1 = QuantizedDecodeCache(st, cfg1)
    assert c1.compression_ratio < c0.compression_ratio
    assert c1.compression_ratio > 1.5
