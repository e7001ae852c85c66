"""Ragged (left-padded) batched generation — differential vs HF torch.

The reference evaluates GSM8K by left-padding ragged prompt batches and
calling HF ``model.generate`` (kv_quant/evaluation_gsm8k.py:267-277,
457-529). These tests pin our static-shape analog (per-row cache offsets)
to be token-identical with that torch pipeline on the same weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microscopiq_tpu.eval.generate import generate, pad_prompts
from microscopiq_tpu.kv.cache import QuantKVConfig
from microscopiq_tpu.models import (
    OPTConfig, OPTForCausalLM, convert_opt, state_dict_from_torch_model,
)

PAD = 1


@pytest.fixture(scope="module")
def opt_pair():
    import torch
    from transformers import OPTConfig as HFOPTConfig
    from transformers import OPTForCausalLM as HFOPT

    hf_cfg = HFOPTConfig(vocab_size=128, hidden_size=64, ffn_dim=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=64,
                         do_layer_norm_before=True, pad_token_id=PAD,
                         attn_implementation="eager")
    torch.manual_seed(0)
    hf = HFOPT(hf_cfg).eval()
    cfg = OPTConfig(vocab_size=128, hidden_size=64, ffn_dim=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    max_position_embeddings=64)
    params = convert_opt(state_dict_from_torch_model(hf), cfg)
    model = OPTForCausalLM(cfg, use_pallas=False)
    return hf, model, params


def _ragged_prompts(rng, lens, vocab=128):
    return [rng.integers(2, vocab, (n,)).tolist() for n in lens]


def test_ragged_generate_vs_hf_tokens(opt_pair):
    import torch

    hf, model, params = opt_pair
    rng = np.random.default_rng(3)
    prompts = _ragged_prompts(rng, [5, 3, 7, 1])
    ids, lens = pad_prompts(prompts, PAD)
    mask = (np.arange(ids.shape[1])[None, :] >=
            (ids.shape[1] - lens)[:, None]).astype(np.int64)

    with torch.no_grad():
        want = hf.generate(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask),
            max_new_tokens=8, do_sample=False, num_beams=1,
            eos_token_id=None, pad_token_id=PAD).numpy()[:, ids.shape[1]:]

    got = generate(model, params, prompts, max_new_tokens=8,
                   pad_token_id=PAD)
    np.testing.assert_array_equal(got, want)


def test_ragged_rows_match_singleton_runs(opt_pair):
    _, model, params = opt_pair
    rng = np.random.default_rng(5)
    prompts = _ragged_prompts(rng, [6, 2, 4])
    batched = generate(model, params, prompts, max_new_tokens=6,
                       pad_token_id=PAD)
    for i, p in enumerate(prompts):
        solo = generate(model, params, np.asarray([p]), max_new_tokens=6,
                        pad_token_id=PAD)
        np.testing.assert_array_equal(batched[i], solo[0])


def test_ragged_quant_cache_residual_exact(opt_pair):
    """With gap >= total length the quant cache holds everything in the
    fp residual window, so ragged quant decode must match ragged dense
    exactly — this isolates the offset masking in the quant path."""
    _, model, params = opt_pair
    rng = np.random.default_rng(7)
    prompts = _ragged_prompts(rng, [5, 2])
    dense = generate(model, params, prompts, max_new_tokens=5,
                     pad_token_id=PAD)
    quant = generate(model, params, prompts, max_new_tokens=5,
                     cache_kind="quant",
                     quant_cfg=QuantKVConfig(bits=4, gap=64),
                     pad_token_id=PAD)
    np.testing.assert_array_equal(dense, quant)


def test_ragged_quant_cache_chunked_close(opt_pair):
    """With folding active (gap < prompt length) quantization error may
    perturb tokens, but the masks must still hide pads: check the run is
    finite-and-sane and the FIRST token (produced from exact prefill
    activations) matches dense."""
    _, model, params = opt_pair
    rng = np.random.default_rng(9)
    prompts = _ragged_prompts(rng, [20, 11, 17])
    dense = generate(model, params, prompts, max_new_tokens=4,
                     pad_token_id=PAD)
    quant = generate(model, params, prompts, max_new_tokens=4,
                     cache_kind="quant",
                     quant_cfg=QuantKVConfig(bits=8, gap=8),
                     pad_token_id=PAD)
    assert quant.shape == dense.shape
    np.testing.assert_array_equal(dense[:, 0], quant[:, 0])


def test_eos_freezes_finished_rows(opt_pair):
    _, model, params = opt_pair
    rng = np.random.default_rng(11)
    prompts = _ragged_prompts(rng, [4, 6])
    probe = generate(model, params, prompts, max_new_tokens=6,
                     pad_token_id=PAD)
    # pick an eos row 0 emits at some step t0 and not before
    eos, t0 = int(probe[0, 2]), 2
    if eos in probe[0, :t0]:
        t0 = int(np.argmax(probe[0] == eos))
    out = generate(model, params, prompts, max_new_tokens=6,
                   eos_token_id=eos, pad_token_id=PAD)
    # row 0: identical through its EOS, pad after
    np.testing.assert_array_equal(out[0, :t0 + 1], probe[0, :t0 + 1])
    assert (out[0, t0 + 1:] == PAD).all()
    # row 1: identical until ITS first eos (if any), since the frozen
    # row must not perturb live rows
    stop1 = (int(np.argmax(probe[1] == eos)) + 1
             if eos in probe[1] else probe.shape[1])
    np.testing.assert_array_equal(out[1, :stop1], probe[1, :stop1])
