"""Differential tests for the fused quantized-KV flash-decode attention
kernel (interpret mode) vs its pure-JAX twin, and the twin vs the
XLA cache-assembly path (kv/cache.py QuantizedDecodeCache.update)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microscopiq_tpu.kv.cache import (QuantKVConfig, QuantizedDecodeCache,
                                      init_quant_cache)
from microscopiq_tpu.ops.pallas.quant_attention import (
    quant_attention_decode, quant_attention_decode_reference)

RNG = np.random.default_rng(11)


def _make_state(B=2, KVH=2, hd=128, gap=64, maxlen=256, length=170,
                bits=4, v_group=64):
    cfg = QuantKVConfig(bits=bits, gap=gap, v_group=v_group)
    state = init_quant_cache(1, B, maxlen, KVH, hd, cfg)
    cache = QuantizedDecodeCache(state, cfg)
    k = jnp.asarray(RNG.standard_normal((B, length, KVH, hd)),
                    jnp.float32)
    v = jnp.asarray(RNG.standard_normal((B, length, KVH, hd)),
                    jnp.float32)
    pos = jnp.arange(length)[None, :]
    cache.update(0, k, v, pos, None)
    st = cache.finalize()
    full = (st.kq, st.k_mn, st.k_sc, st.vq, st.v_mn, st.v_sc,
            st.res_k, st.res_v)
    return cfg, st, full, k, v


@pytest.mark.parametrize("length", [170, 64, 63, 256])
def test_kernel_matches_twin(length):
    B, KVH, hd, gap = 2, 2, 128, 64
    H = 8  # rep = 4
    cfg, st, slices, k, v = _make_state(B, KVH, hd, gap, 256, length)
    q = jnp.asarray(RNG.standard_normal((B, H, hd)), jnp.float32)
    scale = hd ** -0.5
    y_ref = np.asarray(quant_attention_decode_reference(
        q, slices, 0, jnp.int32(length), cfg.v_group, scale))
    y_ker = np.asarray(quant_attention_decode(
        q, slices, 0, jnp.int32(length), cfg.v_group, scale,
        interpret=True))
    np.testing.assert_allclose(y_ker, y_ref, atol=2e-2, rtol=2e-2)


def test_twin_matches_cache_assembly():
    """Twin == attention over the dense K/V the cache update assembles."""
    B, KVH, hd, gap, length = 1, 2, 128, 64, 170
    cfg, st, slices, k, v = _make_state(B, KVH, hd, gap, 256, length)
    H, rep = 8, 4
    q = jnp.asarray(RNG.standard_normal((B, H, hd)), jnp.float32)
    scale = hd ** -0.5
    y_twin = np.asarray(quant_attention_decode_reference(
        q, slices, 0, jnp.int32(length), cfg.v_group, scale))

    # reassemble via the cache path (one more dummy decode token at the
    # same position as the last ingested one is avoided: use update's
    # assembly directly by reading the state buffers)
    from microscopiq_tpu.kv.cache import _dequant_k, _dequant_v
    k_chunks = _dequant_k(st.kq[0], st.k_mn[0], st.k_sc[0], jnp.float32)
    C = st.kq.shape[3 - 1]  # (B, KVH, C, gap, hd) -> C at index 2
    C = st.kq[0].shape[1]
    k_chunks = k_chunks.reshape(B, KVH, -1, hd)
    v_chunks = _dequant_v(st.vq[0], st.v_mn[0], st.v_sc[0], cfg.v_group,
                          jnp.float32).reshape(B, KVH, -1, hd)
    nfull = length // gap
    res_len = length % gap
    k_res = st.res_k[0].astype(jnp.float32).transpose(0, 2, 1, 3)
    v_res = st.res_v[0].astype(jnp.float32).transpose(0, 2, 1, 3)
    k_all = jnp.concatenate([k_chunks, k_res], 2)
    v_all = jnp.concatenate([v_chunks, v_res], 2)
    valid = jnp.concatenate([jnp.arange(k_chunks.shape[2]) < nfull * gap,
                             jnp.arange(gap) < res_len])
    qg = q.reshape(B, KVH, rep, hd)
    logits = jnp.einsum("bgrd,bgtd->bgrt", qg, k_all) * scale
    logits = jnp.where(valid[None, None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, -1)
    y_direct = np.asarray(jnp.einsum("bgrt,bgtd->bgrd", probs, v_all)
                          .reshape(B, H, hd))
    np.testing.assert_allclose(y_twin, y_direct, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("v_group", [128, 64, 32])
def test_kernel_grouped_v_scales(v_group):
    """Gh = hd//v_group ∈ {1, 2, 4}: the grouped fast path (stacked
    folded dots + lane masks, Gh sublane-major flat scales) must match
    the twin for every group count (compress_function.py:41-70 group
    semantics)."""
    B, KVH, hd, gap, length = 1, 2, 128, 64, 170
    cfg, st, slices, k, v = _make_state(B, KVH, hd, gap, 256, length,
                                        v_group=v_group)
    q = jnp.asarray(RNG.standard_normal((B, 8, hd)), jnp.float32)
    scale = hd ** -0.5
    y_ref = np.asarray(quant_attention_decode_reference(
        q, slices, 0, jnp.int32(length), cfg.v_group, scale))
    y_ker = np.asarray(quant_attention_decode(
        q, slices, 0, jnp.int32(length), cfg.v_group, scale,
        interpret=True))
    np.testing.assert_allclose(y_ker, y_ref, atol=2e-2, rtol=2e-2)


def test_kernel_mha_rep1():
    """MHA case (rep=1) also works."""
    B, KVH, hd, gap, length = 1, 4, 128, 64, 130
    cfg, st, slices, k, v = _make_state(B, KVH, hd, gap, 256, length)
    q = jnp.asarray(RNG.standard_normal((B, KVH, hd)), jnp.float32)
    scale = hd ** -0.5
    y_ref = np.asarray(quant_attention_decode_reference(
        q, slices, 0, jnp.int32(length), cfg.v_group, scale))
    y_ker = np.asarray(quant_attention_decode(
        q, slices, 0, jnp.int32(length), cfg.v_group, scale,
        interpret=True))
    np.testing.assert_allclose(y_ker, y_ref, atol=2e-2, rtol=2e-2)


def test_kernel_per_slot_lengths():
    """Per-slot (B,) length vector (continuous batching): each slot's
    output equals running the kernel alone at that slot's depth."""
    B, KVH, hd, gap = 3, 2, 128, 64
    H = 8
    lengths = [170, 64, 31]
    cfg, st, full, k, v = _make_state(B, KVH, hd, gap, 256,
                                      max(lengths))
    q = jnp.asarray(RNG.standard_normal((B, H, hd)), jnp.float32)
    scale = hd ** -0.5
    lvec = jnp.asarray(lengths, jnp.int32)
    y_vec = np.asarray(quant_attention_decode(
        q, full, 0, lvec, cfg.v_group, scale, interpret=True))
    y_ref = np.asarray(quant_attention_decode_reference(
        q, full, 0, lvec, cfg.v_group, scale))
    np.testing.assert_allclose(y_vec, y_ref, atol=2e-2, rtol=2e-2)
    # cross-check one slot against a scalar-length run of the same state
    y_scalar = np.asarray(quant_attention_decode(
        q[1:2], tuple(b[:, 1:2] for b in full), 0,
        jnp.int32(lengths[1]), cfg.v_group, scale, interpret=True))
    np.testing.assert_allclose(y_vec[1:2], y_scalar, atol=2e-2,
                               rtol=2e-2)


def test_kernel_per_token_v_scales_matches_twin():
    """v_group == hd (Gh=1): per-token V scales take the lane-native
    fast path (flat scale operand, scale folded into probability rows)."""
    B, KVH, hd, gap = 2, 2, 128, 64
    H = 8
    cfg, st, full, k, v = _make_state(B, KVH, hd, gap, 256, 170,
                                      v_group=128)
    q = jnp.asarray(RNG.standard_normal((B, H, hd)), jnp.float32)
    scale = hd ** -0.5
    y_ref = np.asarray(quant_attention_decode_reference(
        q, full, 0, jnp.int32(170), cfg.v_group, scale))
    y_ker = np.asarray(quant_attention_decode(
        q, full, 0, jnp.int32(170), cfg.v_group, scale, interpret=True))
    np.testing.assert_allclose(y_ker, y_ref, atol=2e-2, rtol=2e-2)
