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


def test_engine_backed_gsm8k_eval(tiny_model, tmp_path):
    """The CoT harness runs over the continuous-batching engine with
    ragged prompts and produces the same generations as per-sequence
    decoding."""
    from microscopiq_tpu.eval.gsm8k import engine_generate_fn

    model, params, cfg = tiny_model

    class Tok:
        def encode(self, s):
            return [7 + (ord(c) % 100) for c in s][:12]

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    eng = BatchEngine(model, params, n_slots=2, max_len=64,
                      prompt_buckets=(16,))
    fn = engine_generate_fn(eng, Tok(), max_new_tokens=4)
    prompts = ["what is 2+2", "a much longer question"]
    outs = fn(prompts)
    assert len(outs) == 2 and all(len(o.split()) == 4 for o in outs)
    for p, o in zip(prompts, outs):
        ref = _reference(model, params,
                         np.asarray(Tok().encode(p), np.int32), 4)
        assert o == " ".join(map(str, ref))


def test_engine_with_model_sharded_params(tiny_model):
    """Continuous batching over a model-parallel mesh: engine params
    sharded on the (data, model) mesh produce the same tokens as the
    unsharded engine (jit partitions the decode step; no engine code is
    sharding-aware)."""
    from microscopiq_tpu.nn.mapping import pack_params
    from microscopiq_tpu.parallel import make_mesh, shard_params
    from microscopiq_tpu.specs import finalize_mx_specs

    model, params, cfg = tiny_model
    # block 8 keeps the tiny model's (K/B, N) scale rows divisible by
    # the 4-way model axis
    specs = finalize_mx_specs({"w_elem_format": "fp6_e3m2",
                               "scale_bits": 8, "block_size": 8})
    pq = {"params": pack_params(params["params"], specs, skip=())}
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, cfg.vocab_size, (s,)).astype(np.int32)
               for s in (5, 9)]

    eng0 = BatchEngine(model, pq, n_slots=2, max_len=64,
                       prompt_buckets=(16,))
    ref = eng0.generate(prompts, max_new_tokens=4)

    mesh = make_mesh(8, data=2, model=4)
    p_sh = {"params": shard_params(pq["params"], mesh)}
    eng = BatchEngine(model, p_sh, n_slots=2, max_len=64,
                      prompt_buckets=(16,))
    got = eng.generate(prompts, max_new_tokens=4)
    assert got == ref


def test_engine_temperature_sampling(tiny_model):
    model, params, cfg = tiny_model
    rng = np.random.default_rng(6)
    p = [rng.integers(0, cfg.vocab_size, (6,)).astype(np.int32)]

    def run(seed, temp):
        eng = BatchEngine(model, params, n_slots=1, max_len=64,
                          prompt_buckets=(8,), seed=seed)
        return eng.generate(p, max_new_tokens=12, temperature=temp)[0]

    greedy = run(0, 0.0)
    assert greedy == _reference(model, params, p[0], 12)  # temp 0 parity
    s0, s0b, s1 = run(0, 5.0), run(0, 5.0), run(1, 5.0)
    assert s0 == s0b                    # reproducible per seed
    assert s0 != greedy and s0 != s1    # high temp actually samples


def test_engine_quantized_kv_matches_single_sequence(tiny_model):
    """Continuous batching over the per-slot QUANTIZED KV cache: each
    request's tokens equal its single-sequence run through the scalar
    quantized cache (same chunk boundaries, same refold schedule)."""
    from microscopiq_tpu.kv.cache import QuantKVConfig

    model, params, cfg = tiny_model
    qcfg = QuantKVConfig(bits=4, gap=8, v_group=8)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, cfg.vocab_size, (s,)).astype(np.int32)
               for s in (5, 11, 19)]          # tail-only / 1 chunk+tail
    eng = BatchEngine(model, params, n_slots=4, max_len=64,
                      prompt_buckets=(8, 24), cache_kind="quant",
                      quant_cfg=qcfg)
    outs = eng.generate(prompts, max_new_tokens=14)  # crosses refolds
    for p, got in zip(prompts, outs):
        ref = generate(model, params, np.asarray(p, np.int32)[None], 14,
                       cache_kind="quant", quant_cfg=qcfg,
                       max_len=64)[0].tolist()
        assert got == ref, (got, ref)


def test_engine_quantized_kv_slot_reuse(tiny_model):
    from microscopiq_tpu.kv.cache import QuantKVConfig

    model, params, cfg = tiny_model
    qcfg = QuantKVConfig(bits=4, gap=8, v_group=8)
    rng = np.random.default_rng(8)
    prompts = [rng.integers(0, cfg.vocab_size, (s,)).astype(np.int32)
               for s in (4, 9, 6, 12)]
    eng = BatchEngine(model, params, n_slots=2, max_len=64,
                      prompt_buckets=(16,), cache_kind="quant",
                      quant_cfg=qcfg)
    outs = eng.generate(prompts, max_new_tokens=10)
    for p, got in zip(prompts, outs):
        ref = generate(model, params, np.asarray(p, np.int32)[None], 10,
                       cache_kind="quant", quant_cfg=qcfg,
                       max_len=64)[0].tolist()
        assert got == ref, (got, ref)


def test_engine_rejects_oversized_prompt_without_stalling(tiny_model):
    model, params, cfg = tiny_model
    rng = np.random.default_rng(9)
    big = rng.integers(0, cfg.vocab_size, (40,)).astype(np.int32)
    ok = rng.integers(0, cfg.vocab_size, (5,)).astype(np.int32)
    eng = BatchEngine(model, params, n_slots=2, max_len=64,
                      prompt_buckets=(8,))
    r_big = Request(big, max_new_tokens=4)
    r_ok = Request(ok, max_new_tokens=4)
    eng.submit(r_big)
    eng.submit(r_ok)
    eng.run_until_drained()
    assert r_big.done and r_big.error and not r_big.out_tokens
    assert r_ok.out_tokens == _reference(model, params, ok, 4)


def test_engine_h2o_unconstrained_budget_matches_dense(tiny_model):
    """With an H2O budget large enough that nothing is ever evicted,
    the per-slot heavy-hitter engine must be token-identical to the
    dense engine — the eviction machinery is exercised (scores, slot
    writes, per-slot lengths) but every decision keeps everything."""
    model, params, cfg = tiny_model
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, cfg.vocab_size, (s,)).astype(np.int32)
               for s in (5, 11, 8)]
    eng = BatchEngine(model, params, n_slots=4, max_len=64,
                      prompt_buckets=(16,), cache_kind="h2o",
                      h2o_budget=48)
    outs = eng.generate(prompts, max_new_tokens=6)
    for p, got in zip(prompts, outs):
        assert got == _reference(model, params, p, 6)


def test_engine_h2o_slot_reuse_and_tight_budget(tiny_model):
    """Tight budget: decode evicts (budget < prompt+new for the long
    prompts) yet the engine must stay live, complete every request
    through slot reuse, and emit the requested token counts."""
    model, params, cfg = tiny_model
    rng = np.random.default_rng(8)
    prompts = [rng.integers(0, cfg.vocab_size, (s,)).astype(np.int32)
               for s in (14, 15, 13, 16, 12)]
    eng = BatchEngine(model, params, n_slots=2, max_len=64,
                      prompt_buckets=(16,), cache_kind="h2o",
                      h2o_budget=16, h2o_recent=4)
    outs = eng.generate(prompts, max_new_tokens=8)
    assert all(len(o) == 8 for o in outs)
    # eviction happened: every request exceeded the budget
    assert all(len(p) + 8 > 16 for p in prompts)


def test_engine_h2o_per_slot_depth_independence(tiny_model):
    """A late-admitted short request must decode exactly as it would
    alone while sharing the batch with a deep slot (per-slot seen
    counts, protected windows, and masks must not leak across slots)."""
    model, params, cfg = tiny_model
    rng = np.random.default_rng(9)
    long_p = rng.integers(0, cfg.vocab_size, (15,)).astype(np.int32)
    short_p = rng.integers(0, cfg.vocab_size, (4,)).astype(np.int32)
    eng = BatchEngine(model, params, n_slots=2, max_len=64,
                      prompt_buckets=(16,), cache_kind="h2o",
                      h2o_budget=48)
    r_long = Request(long_p, max_new_tokens=10)
    r_short = Request(short_p, max_new_tokens=5)
    eng.submit(r_long)
    for _ in range(3):                       # long one runs ahead
        eng.step()
    eng.submit(r_short)
    eng.run_until_drained()
    assert r_long.out_tokens == _reference(model, params, long_p, 10)
    assert r_short.out_tokens == _reference(model, params, short_p, 5)
