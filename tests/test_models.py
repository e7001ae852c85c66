"""Model tests: forward shapes, HF weight-conversion parity against the
torch implementations (transformers, CPU), and quantized/packed modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microscopiq_tpu.models import (
    LlamaConfig, LlamaForCausalLM, OPTConfig, OPTForCausalLM,
    convert_llama, convert_opt, state_dict_from_torch_model,
)
from microscopiq_tpu.specs import finalize_mx_specs


def test_llama_tiny_forward():
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16)))
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    assert logits.shape == (2, 16, 256)
    assert np.isfinite(np.asarray(logits)).all()


def test_llama_vs_hf_transformers():
    """Our Llama forward must match HF's torch LlamaForCausalLM on the
    same random weights (GQA + RoPE parity)."""
    import torch
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM as HFLlama

    hf_cfg = HFConfig(vocab_size=128, hidden_size=64, intermediate_size=112,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64,
                      rms_norm_eps=1e-5, rope_theta=10000.0,
                      attn_implementation="eager", tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = HFLlama(hf_cfg).eval()

    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=112,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64)
    params = convert_llama(state_dict_from_torch_model(hf), cfg)
    model = LlamaForCausalLM(cfg)

    ids = np.random.default_rng(1).integers(0, 128, (2, 12))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mpt_vs_hf_transformers():
    """MPT family knobs (ALiBi / biasless LN / exact-GELU / tied lm_head)
    must match HF's torch MptForCausalLM on the same random weights —
    including the key-index-only ALiBi formulation."""
    import torch
    from transformers import MptConfig as HFMptConfig
    from transformers import MptForCausalLM as HFMpt

    hf_cfg = HFMptConfig(d_model=64, n_heads=4, n_layers=2,
                         vocab_size=128, max_seq_len=64,
                         attn_implementation="eager")
    torch.manual_seed(0)
    hf = HFMpt(hf_cfg).eval()

    cfg = LlamaConfig.tiny_mpt(vocab_size=128, hidden_size=64,
                               intermediate_size=256,
                               num_hidden_layers=2, num_attention_heads=4,
                               num_key_value_heads=4)
    from microscopiq_tpu.models import convert_mpt
    params = convert_mpt(state_dict_from_torch_model(hf), cfg)
    model = LlamaForCausalLM(cfg)

    ids = np.random.default_rng(1).integers(0, 128, (2, 12))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mpt_decode_cache_matches_prefill():
    """ALiBi decode through the KV cache must equal full prefill logits —
    the key-slot bias must line up across cache appends."""
    from microscopiq_tpu.kv.cache import DenseDecodeCache, init_dense_cache

    cfg = LlamaConfig.tiny_mpt()
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 256, (1, 10)))
    params = model.init(jax.random.PRNGKey(0), ids)
    full = np.asarray(model.apply(params, ids))

    state = init_dense_cache(cfg.num_hidden_layers, 1, 16,
                             cfg.num_key_value_heads, cfg.head_dim,
                             dtype=jnp.float32)
    step_logits = []
    for t in range(10):
        cache = DenseDecodeCache(state)
        out = model.apply(params, ids[:, t:t + 1],
                          positions=jnp.array([[t]]), cache=cache)
        state = cache.finalize()
        step_logits.append(np.asarray(out)[:, 0])
    got = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(got, full, rtol=2e-4, atol=2e-4)


def test_mistral_sliding_window_mask():
    cfg = LlamaConfig.tiny(sliding_window=8)
    model = LlamaForCausalLM(cfg)
    ids = jnp.zeros((1, 32), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_mixtral_moe_forward():
    cfg = LlamaConfig.tiny(num_local_experts=4, num_experts_per_tok=2)
    model = LlamaForCausalLM(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    assert np.isfinite(np.asarray(logits)).all()
    # experts exist in the tree
    assert "experts_0" in params["params"]["model"]["layers_0"][
        "block_sparse_moe"]


def test_opt_vs_hf_transformers():
    import torch
    from transformers import OPTConfig as HFOPTConfig
    from transformers import OPTForCausalLM as HFOPT

    hf_cfg = HFOPTConfig(vocab_size=128, hidden_size=64, ffn_dim=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=64, do_layer_norm_before=True,
                         attn_implementation="eager")
    torch.manual_seed(0)
    hf = HFOPT(hf_cfg).eval()

    cfg = OPTConfig(vocab_size=128, hidden_size=64, ffn_dim=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    max_position_embeddings=64)
    params = convert_opt(state_dict_from_torch_model(hf), cfg)
    model = OPTForCausalLM(cfg)

    ids = np.random.default_rng(1).integers(0, 128, (2, 10))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_llama_mx_fakequant_mode():
    cfg = LlamaConfig.tiny()
    specs = finalize_mx_specs({
        "w_elem_format": "fp6_e3m2", "a_elem_format": "fp6_e3m2",
        "scale_bits": 8, "block_size": 32, "bfloat": 16})
    model = LlamaForCausalLM(cfg, mx_specs=specs)
    plain = LlamaForCausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 16)))
    params = plain.init(jax.random.PRNGKey(0), ids)
    lq = model.apply(params, ids)
    l0 = plain.apply(params, ids)
    # quantization perturbs but does not destroy the logits
    rel = float(jnp.mean(jnp.abs(lq - l0)) / (jnp.mean(jnp.abs(l0)) + 1e-9))
    assert 0 < rel < 0.5


def test_llama_packed_mode():
    from microscopiq_tpu.nn import pack_params
    cfg = LlamaConfig.tiny()
    plain = LlamaForCausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 16)))
    params = plain.init(jax.random.PRNGKey(0), ids)
    specs = finalize_mx_specs({"w_elem_format": "fp6_e3m2", "scale_bits": 8,
                               "block_size": 32})
    packed = jax.tree_util.tree_map(lambda x: x, params)
    packed = {"params": pack_params(params["params"], specs)}
    model = LlamaForCausalLM(cfg, use_pallas=False)  # CPU twin path
    lq = model.apply(packed, ids)
    l0 = plain.apply(params, ids)
    rel = float(jnp.mean(jnp.abs(lq - l0)) / (jnp.mean(jnp.abs(l0)) + 1e-9))
    assert rel < 0.3
    assert np.isfinite(np.asarray(lq)).all()


def test_last_only_and_logit_index_match_full_logits():
    """The prefill fast path (vocab matmul on 1 token) must produce the
    same logits as slicing the full (B, S, V) output — for the final
    position (last_only) and for per-row gathered positions
    (logit_index, the right-padded serving-engine case)."""
    import jax
    import jax.numpy as jnp

    from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, use_pallas=False)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 12)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)

    full = model.apply(params, ids)
    last = model.apply(params, ids, last_only=True)
    np.testing.assert_allclose(np.asarray(last[:, 0]),
                               np.asarray(full[:, -1]), rtol=1e-5)

    idx = jnp.asarray([3, 9], jnp.int32)
    gathered = model.apply(params, ids, logit_index=idx)
    np.testing.assert_allclose(
        np.asarray(gathered[:, 0]),
        np.asarray(full)[np.arange(2), np.asarray(idx)], rtol=1e-5)
