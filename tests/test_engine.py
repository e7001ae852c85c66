"""Continuous-batching engine: parity with the single-sequence decode loop
and slot-reuse/mid-flight-admission behavior.

The invariant under test: multiplexing requests of different lengths onto
one batched decode step must produce the same greedy tokens as running
each request alone through eval.generate (the reference-parity loop).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microscopiq_tpu.eval.generate import generate
from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM
from microscopiq_tpu.serve.engine import BatchEngine, Request


@pytest.fixture(scope="module")
def tiny_model():
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, use_pallas=False)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    return model, params, cfg


def _reference(model, params, prompt, n):
    out = generate(model, params, np.asarray(prompt, np.int32)[None], n,
                   cache_kind="dense")
    return out[0].tolist()


def test_engine_matches_single_sequence(tiny_model):
    model, params, cfg = tiny_model
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, (s,)).astype(np.int32)
               for s in (5, 11, 8)]
    eng = BatchEngine(model, params, n_slots=4, max_len=64,
                      prompt_buckets=(8, 16))
    outs = eng.generate(prompts, max_new_tokens=6)
    for p, got in zip(prompts, outs):
        assert got == _reference(model, params, p, 6)


def test_engine_slot_reuse_more_requests_than_slots(tiny_model):
    model, params, cfg = tiny_model
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, cfg.vocab_size, (s,)).astype(np.int32)
               for s in (4, 7, 6, 9, 5)]
    eng = BatchEngine(model, params, n_slots=2, max_len=64,
                      prompt_buckets=(16,))
    outs = eng.generate(prompts, max_new_tokens=4)
    for p, got in zip(prompts, outs):
        assert got == _reference(model, params, p, 4)


def test_engine_mid_flight_admission(tiny_model):
    model, params, cfg = tiny_model
    rng = np.random.default_rng(2)
    p1 = rng.integers(0, cfg.vocab_size, (6,)).astype(np.int32)
    p2 = rng.integers(0, cfg.vocab_size, (9,)).astype(np.int32)
    eng = BatchEngine(model, params, n_slots=4, max_len=64,
                      prompt_buckets=(16,))
    r1 = Request(p1, max_new_tokens=8)
    eng.submit(r1)
    eng.step()
    eng.step()          # r1 is 3 tokens in
    r2 = Request(p2, max_new_tokens=5)
    eng.submit(r2)      # joins while r1 decodes
    eng.run_until_drained()
    assert r1.out_tokens == _reference(model, params, p1, 8)
    assert r2.out_tokens == _reference(model, params, p2, 5)


def test_engine_eos_and_stream_callback(tiny_model):
    model, params, cfg = tiny_model
    rng = np.random.default_rng(3)
    p = rng.integers(0, cfg.vocab_size, (5,)).astype(np.int32)
    ref = _reference(model, params, p, 8)
    eos = ref[2]                      # force an early stop at token 3
    seen = []
    r = Request(p, max_new_tokens=8, eos_id=eos,
                on_token=lambda t, d: seen.append((t, d)))
    eng = BatchEngine(model, params, n_slots=1, max_len=64,
                      prompt_buckets=(8,))
    eng.submit(r)
    eng.run_until_drained()
    assert r.out_tokens == ref[:3]
    assert [t for t, _ in seen] == ref[:3]
    assert seen[-1][1] is True and all(not d for _, d in seen[:-1])


def test_engine_records_metrics(tiny_model):
    from microscopiq_tpu.utils.observability import metrics

    model, params, cfg = tiny_model
    rng = np.random.default_rng(4)
    before = metrics.counters["engine.tokens"]
    eng = BatchEngine(model, params, n_slots=2, max_len=64,
                      prompt_buckets=(8,))
    eng.generate([rng.integers(0, cfg.vocab_size, (5,)).astype(np.int32)],
                 max_new_tokens=4)
    assert metrics.counters["engine.tokens"] - before == 3  # 3 decode steps
    assert metrics.counters["engine.admitted"] >= 1
    assert metrics.timers["engine.decode_step"]
