"""Packed storage tests: pack→dequant must be bit-exact with the fake-quant
reference path; sub-byte transport packings must round-trip exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import assert_bitexact
from microscopiq_tpu.formats import get_format_params
from microscopiq_tpu.ops.elemwise import quantize_elemwise
from microscopiq_tpu.ops.mx import quantize_mx
from microscopiq_tpu.ops.outlier import quantize_mx_outlier_hessian
from microscopiq_tpu.ops.packing import (
    container_dtype,
    decode_fp_bits,
    dequantize_mx,
    dequantize_mx_outlier,
    encode_fp_bits,
    pack_fp4,
    pack_fp6,
    pack_int2,
    pack_int4,
    pack_mx,
    pack_mx_outlier,
    unpack_fp4,
    unpack_fp6,
    unpack_int2,
    unpack_int4,
)

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("fmt", ["int8", "int4", "int2", "fp8_e4m3",
                                 "fp8_e5m2", "fp6_e3m2", "fp6_e2m3",
                                 "fp4_e2m1"])
@pytest.mark.parametrize("sb,bs", [(8, 16), (4, 32)])
def test_pack_dequant_bitexact_vs_fakequant(fmt, sb, bs):
    W = (RNG.standard_normal((24, 96)) *
         np.exp(RNG.uniform(-3, 3, (24, 1)))).astype(np.float32)
    want = np.asarray(quantize_mx(jnp.asarray(W), sb, fmt,
                                  axes=[-1], block_size=bs))
    p = pack_mx(jnp.asarray(W), sb, fmt, bs)
    got = np.asarray(dequantize_mx(p))
    assert_bitexact(got, want, f"{fmt}|sb{sb}|bs{bs}")


def test_pack_ragged_dim():
    W = RNG.standard_normal((8, 37)).astype(np.float32)
    p = pack_mx(jnp.asarray(W), 8, "fp6_e3m2", 16)
    got = np.asarray(dequantize_mx(p))
    want = np.asarray(quantize_mx(jnp.asarray(W), 8, "fp6_e3m2",
                                  axes=[-1], block_size=16))
    assert got.shape == (8, 37)
    assert_bitexact(got, want, "ragged")


@pytest.mark.parametrize("ifmt,ofmt", [("int2", "fp4_e2m1"),
                                       ("fp6_e3m2", "fp8_e4m3")])
def test_pack_outlier_matches_fakequant(ifmt, ofmt):
    """With an outlier budget >= block_size the packed path must agree
    with the reference fake-quant outlier quantizer (hessian variant)
    except for the +1e-6-free scale divide — compare against our parity-
    tested quantizer, which uses exact power-of-two scaling, so bit-exact."""
    W = RNG.standard_normal((16, 64)).astype(np.float32)
    W[3, 17] = 8.0
    W[9, 40] = -6.5
    bs = 16
    want, _ = quantize_mx_outlier_hessian(
        jnp.asarray(W), 8, 8, ifmt, ofmt, std_dev=2, axes=[-1], block_size=bs)
    p = pack_mx_outlier(jnp.asarray(W), 8, 8, ifmt, ofmt, std_dev=2,
                        block_size=bs, outlier_budget=bs)
    got = np.asarray(dequantize_mx_outlier(p))
    assert_bitexact(got, np.asarray(want), f"outlier {ifmt}/{ofmt}")


def test_pack_outlier_budget_truncates_gracefully():
    W = RNG.standard_normal((4, 32)).astype(np.float32)
    W[0, :8] += 20.0  # many outliers in block 0
    p = pack_mx_outlier(jnp.asarray(W), 8, 8, "int2", "fp4_e2m1",
                        std_dev=2, block_size=16, outlier_budget=2)
    assert p.out_codes.shape == (4, 2, 2)
    got = np.asarray(dequantize_mx_outlier(p))
    assert np.isfinite(got).all()
    # the 2 largest outliers of block 0 must be represented
    assert np.abs(got[0, :8]).max() > 5.0


def test_bits_per_element():
    # bits_per_element reports REALIZED container bits: native fp6 rides an
    # int8 container (8 b/elem); pf6 is the true 6-bit transport.
    p = pack_mx(jnp.ones((4, 32)), 8, "fp6_e3m2", 32)
    assert p.bits_per_element == 8 + 8 / 32
    p6 = pack_mx(jnp.ones((32, 4)), 8, "fp6_e3m2", 32, axis=0,
                 transport="pf6")
    assert p6.bits_per_element == 6 + 8 / 32
    p4 = pack_mx(jnp.ones((32, 4)), 8, "fp4_e2m1", 32, axis=0,
                 transport="pf4")
    assert p4.bits_per_element == 4 + 8 / 32


@pytest.mark.parametrize("fmt", ["fp4_e2m1", "fp6_e3m2", "fp6_e2m3",
                                 "fp8_e4m3", "fp8_e5m2"])
def test_fp_bits_roundtrip_full_grid(fmt):
    """encode/decode must round-trip every representable grid value."""
    ebits, mbits, emax, max_norm, _ = get_format_params(fmt)
    nbits = 1 + ebits + (mbits - 2)
    codes = np.arange(2 ** nbits, dtype=np.uint8)
    vals = np.asarray(decode_fp_bits(jnp.asarray(codes), fmt))
    # Exclude encodings beyond max_norm (e4m3 reserves them for NaN,
    # e5m2 for Inf/NaN); the packer never emits them.
    keep = np.abs(vals) <= max_norm
    codes, vals = codes[keep], vals[keep]
    # every decoded value must quantize to itself (it's on the grid)
    requant = np.asarray(quantize_elemwise(jnp.asarray(vals), fmt,
                                           saturate_normals=True))
    np.testing.assert_array_equal(requant, vals)
    back = np.asarray(encode_fp_bits(jnp.asarray(vals), fmt))
    # -0 and +0 encode differently but decode equal; compare decoded
    vals2 = np.asarray(decode_fp_bits(jnp.asarray(back), fmt))
    np.testing.assert_array_equal(vals2, vals)


@pytest.mark.parametrize("pack,unpack,lo,hi", [
    (pack_int4, unpack_int4, -8, 7),
    (pack_int2, unpack_int2, -2, 1),
])
def test_int_transport_roundtrip(pack, unpack, lo, hi):
    codes = RNG.integers(lo, hi + 1, size=(16, 64)).astype(np.int8)
    packed = pack(jnp.asarray(codes))
    assert packed.dtype == jnp.uint8
    out = np.asarray(unpack(packed))
    np.testing.assert_array_equal(out, codes)


def test_fp4_transport_roundtrip():
    grid = np.asarray(decode_fp_bits(jnp.arange(16, dtype=jnp.uint8),
                                     "fp4_e2m1"))
    vals = RNG.choice(grid, size=(8, 32)).astype(np.float32)
    out = np.asarray(unpack_fp4(pack_fp4(jnp.asarray(vals))))
    np.testing.assert_array_equal(out, vals)


def test_fp6_transport_roundtrip():
    grid = np.asarray(decode_fp_bits(jnp.arange(64, dtype=jnp.uint8),
                                     "fp6_e3m2"))
    vals = RNG.choice(grid, size=(8, 48)).astype(np.float32)
    packed = pack_fp6(jnp.asarray(vals))
    assert packed.shape == (8, 36)  # 48 codes -> 36 bytes
    out = np.asarray(unpack_fp6(packed))
    np.testing.assert_array_equal(out, vals)


def test_container_embeds_exactly():
    """Every fp4/fp6 grid value must be exactly representable in its
    container dtype (the basis of the native-dequant design)."""
    for fmt in ["fp4_e2m1", "fp6_e3m2", "fp6_e2m3"]:
        ebits, mbits, _, _, _ = get_format_params(fmt)
        nbits = 1 + ebits + (mbits - 2)
        grid = np.asarray(decode_fp_bits(
            jnp.arange(2 ** nbits, dtype=jnp.uint8), fmt))
        cast = np.asarray(jnp.asarray(grid).astype(container_dtype(fmt))
                          .astype(jnp.float32))
        np.testing.assert_array_equal(cast, grid)


def test_subbyte_transport_bitexact():
    """sb4/sb2 GEMM transports decode bit-exactly vs native containers
    (packing._subbyte_pack/_subbyte_unpack)."""
    import jax.numpy as jnp

    from microscopiq_tpu.ops.packing import dequantize_mx, pack_mx

    rng = np.random.default_rng(5)
    for fmt, tr, per in (("int4", "sb4", 2), ("int2", "sb2", 4)):
        W = jnp.asarray(rng.normal(0, .5, (64, 96)).astype(np.float32))
        a = np.asarray(dequantize_mx(pack_mx(W, 8, fmt, 16, axis=0)))
        p = pack_mx(W, 8, fmt, 16, axis=0, transport=tr)
        b = np.asarray(dequantize_mx(p))
        np.testing.assert_array_equal(a, b)
        assert p.codes.shape == (64 // per, 96)


def test_pf_transport_bitexact():
    """pf4/pf6 raw-fp-bit transports decode bit-exactly vs the native
    containers at 4/6 bits per element (packing._pf_pack layout)."""
    import jax.numpy as jnp

    from microscopiq_tpu.ops.packing import (dequantize_mx,
                                             from_serving_layout, pack_mx,
                                             to_serving_layout)

    rng = np.random.default_rng(7)
    for fmt, tr, bs, rows in (("fp6_e3m2", "pf6", 32, 24),
                              ("fp6_e2m3", "pf6", 32, 24),
                              ("fp4_e2m1", "pf4", 16, 8)):
        W = jnp.asarray(rng.normal(0, .5, (128, 96)).astype(np.float32))
        W = W.at[0, :4].set(jnp.asarray([0.0, -0.0, 1e-9, 27.5]))
        a = np.asarray(dequantize_mx(pack_mx(W, 8, fmt, bs, axis=0)))
        p = pack_mx(W, 8, fmt, bs, axis=0, transport=tr)
        b = np.asarray(dequantize_mx(p))
        np.testing.assert_array_equal(a, b)
        assert p.codes.shape == (128 * rows // bs, 96)
        assert p.bits_per_element == 8 * rows / bs + 8 / bs
        s = to_serving_layout(p)
        assert s.codes.shape == (128 // bs, rows, 96)
        np.testing.assert_array_equal(
            np.asarray(dequantize_mx(from_serving_layout(s))), a)


# ---------------------------------------------------------------------------
# emi8m: two-level outlier format merged into one per-element byte stream
# ---------------------------------------------------------------------------
def _outlier_case(seed, K, N, ifmt, ofmt, bs):
    from microscopiq_tpu.ops.packing import pack_mx_outlier

    rng = np.random.default_rng(seed)
    W = rng.standard_normal((K, N)).astype(np.float32)
    W[rng.random((K, N)) < 0.05] *= 12.0
    return W, pack_mx_outlier(jnp.asarray(W), 8, 8, ifmt, ofmt,
                              std_dev=2.0, block_size=bs,
                              outlier_budget=4, axis=0)


@pytest.mark.parametrize("ifmt,ofmt,bs", [
    ("int2", "fp4", 16),          # the paper's canonical config
    ("int4", "fp6_e3m2", 16),
    ("fp6_e3m2", "fp6_e3m2", 32),
])
def test_merge_outlier_emi8_bitexact(ifmt, ofmt, bs):
    from microscopiq_tpu.ops.packing import (dequantize_mx,
                                             dequantize_mx_outlier,
                                             merge_outlier_emi8)

    _, p = _outlier_case(0, 256, 128, ifmt, ofmt, bs)
    m = merge_outlier_emi8(p)
    assert m.transport == "emi8m" and m.codes.dtype == jnp.int8
    assert_bitexact(dequantize_mx_outlier(p), dequantize_mx(m))


def test_emi8m_rebase_exact():
    from microscopiq_tpu.ops.packing import (dequantize_mx, emi8m_rebase,
                                             merge_outlier_emi8)

    _, p = _outlier_case(1, 128, 64, "int2", "fp4", 16)
    m = merge_outlier_emi8(p)
    m2 = emi8m_rebase(m, m.transport_mw + 1, m.transport_fold + 3)
    assert_bitexact(dequantize_mx(m), dequantize_mx(m2))


def test_emi8m_sad_kernel_matches_outlier_reference():
    from microscopiq_tpu.ops.packing import merge_outlier_emi8
    from microscopiq_tpu.ops.pallas.dequant_matmul import (
        dequant_matmul_outlier_reference, dequant_matmul_sad)

    _, p = _outlier_case(2, 256, 256, "int2", "fp4", 16)
    m = merge_outlier_emi8(p)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    y_ref = dequant_matmul_outlier_reference(x, p)
    y = dequant_matmul_sad(x, m, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=0, atol=2e-6 * float(
                                   jnp.abs(y_ref).max()))


def test_pack_params_outlier_merges_to_emi8m():
    from microscopiq_tpu.nn.mapping import pack_params
    from microscopiq_tpu.ops.packing import (PackedMX,
                                             dequantize_mx,
                                             dequantize_mx_outlier)
    from microscopiq_tpu.specs import MxSpecs, finalize_mx_specs

    specs = finalize_mx_specs(MxSpecs(
        w_elem_format="int2", a_elem_format=None,
        w_outlier_elem_format="fp4", scale_bits=8, block_size=16))
    rng = np.random.default_rng(4)
    params = {"layer": {"kernel": jnp.asarray(
        rng.standard_normal((64, 32)).astype(np.float32) * 2.0)}}
    merged = pack_params(params, specs, skip=(), outlier_budget=4)
    side = pack_params(params, specs, skip=(), outlier_budget=4,
                       outlier_transport="sideband")
    mk, sk = merged["layer"]["kernel"], side["layer"]["kernel"]
    assert isinstance(mk, PackedMX) and mk.transport == "emi8m"
    assert_bitexact(dequantize_mx(mk), dequantize_mx_outlier(sk))


def test_serving_layout_roundtrip_subbyte():
    from microscopiq_tpu.ops.packing import (dequantize_mx,
                                             from_serving_layout, pack_mx,
                                             to_serving_layout)

    rng = np.random.default_rng(5)
    W = rng.standard_normal((64, 32)).astype(np.float32)
    for fmt, tr, bs in (("int4", "sb4", 16), ("int2", "sb2", 16),
                        ("int8", "native", 32)):
        p = pack_mx(jnp.asarray(W), 8, fmt, bs, axis=0, transport=tr)
        s = to_serving_layout(p)
        assert s.codes.ndim == 3
        back = from_serving_layout(s)
        np.testing.assert_array_equal(np.asarray(back.codes),
                                      np.asarray(p.codes))
        np.testing.assert_array_equal(np.asarray(dequantize_mx(back)),
                                      np.asarray(dequantize_mx(p)))


def test_pack_emi8m_absolute_gptq_geometry_bitexact():
    """Absolute emi8m must represent an ALREADY-fake-quantized tensor
    exactly for ANY quantization geometry — here the GPTQ drivers'
    out-axis (axes=[0]) 16-element blocks (llm/opt.py:87-94), whose
    outlier masks cannot be re-derived post hoc (the 113->148 ppl
    regression this path fixes)."""
    from microscopiq_tpu.ops.outlier import quantize_mx_outlier_hessian
    from microscopiq_tpu.ops.packing import (dequantize_mx,
                                             pack_emi8m_absolute)

    rng = np.random.default_rng(11)
    W = rng.standard_normal((96, 64)).astype(np.float32)
    W[rng.random((96, 64)) < 0.04] *= 10.0
    q, _ = quantize_mx_outlier_hessian(
        jnp.asarray(W), 8, 8, "int2", "fp4", "max", 2.0, [0], 16)
    p = pack_emi8m_absolute(q, block_size=16, axis=0, elem_format="int2")
    assert p.transport == "emi8m"
    assert_bitexact(dequantize_mx(p), q)


def test_pack_emi8m_absolute_rejects_unrepresentable():
    from microscopiq_tpu.ops.packing import pack_emi8m_absolute

    rng = np.random.default_rng(12)
    raw = jnp.asarray(rng.standard_normal((32, 32)).astype(np.float32))
    with pytest.raises(ValueError):
        pack_emi8m_absolute(raw, block_size=16, axis=0)


# ---------------------------------------------------------------------------
# Compact N-blocked transport (paper bit budget)
# ---------------------------------------------------------------------------
def _gptq_decisions(cap, seed=3, N=96, K=64):
    from microscopiq_tpu.quant import GPTQ, MXQuantizer

    rng = np.random.default_rng(seed)
    W = rng.standard_normal((N, K)).astype(np.float32)
    W[rng.random(W.shape) < 0.05] *= 8.0
    X = rng.standard_normal((4, 16, K)).astype(np.float32)
    g = GPTQ(jnp.asarray(W), mode="mx_prune")
    g.quantizer = MXQuantizer(8, 8, "int2", "fp4", std_dev=2.0, axes=(0,),
                              block_size=16, max_outliers_per_block=cap)
    for i in range(X.shape[0]):
        g.add_batch(jnp.asarray(X[i]))
    Q, _ = g.fasterquant(blocksize=32, collect_decisions=True)
    return Q, g.decisions


@pytest.mark.parametrize("cap,budget,max_bits", [
    (0, 0, 16.0),    # auto-sized budget, lossless whatever the count
    (1, 1, 3.51),    # the paper's 3.5-bit point
    (2, 2, 4.01),
])
def test_pack_outlier_nb_exact(cap, budget, max_bits):
    """Compact transport must reproduce the GPTQ fake-quant output
    EXACTLY (decision-threading contract), at the stated bit budget."""
    from microscopiq_tpu.ops.packing import (dequantize_outlier_nb,
                                             pack_outlier_nb)

    Q, dec = _gptq_decisions(cap)
    p = pack_outlier_nb(dec, budget=budget)
    D = dequantize_outlier_nb(p)
    np.testing.assert_array_equal(np.asarray(D), np.asarray(Q))
    assert p.bits_per_element <= max_bits


def test_pack_outlier_nb_budget_overflow_raises():
    from microscopiq_tpu.ops.packing import pack_outlier_nb

    _, dec = _gptq_decisions(cap=0)        # uncapped: blocks exceed 1
    with pytest.raises(ValueError):
        pack_outlier_nb(dec, budget=1)


def test_dequant_matmul_nb_kernel_matches_reference():
    from microscopiq_tpu.ops.packing import pack_outlier_nb
    from microscopiq_tpu.ops.pallas.dequant_matmul import (
        dequant_matmul_nb, dequant_matmul_nb_reference)

    _, dec = _gptq_decisions(cap=2, N=160, K=128)
    p = pack_outlier_nb(dec, budget=2)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((3, 128)).astype(np.float32))
    y_ref = dequant_matmul_nb_reference(x, p)
    y = dequant_matmul_nb(x, p, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0,
        atol=3e-6 * float(jnp.abs(y_ref).max()))


def test_dequant_matmul_nb_kernel_multi_k_and_m_tiles(monkeypatch):
    """nk >= 2 exercises the cross-K accumulator zero/+= path and the
    final un-permute at k == nk-1 (ADVICE r4: the rewritten _nb_kernel
    was only CI-covered at nk == 1); M > TM exercises the M grid
    dimension added with the ADVICE r4 VMEM cap."""
    from microscopiq_tpu.ops.packing import pack_outlier_nb
    from microscopiq_tpu.ops.pallas.dequant_matmul import (
        dequant_matmul_nb, dequant_matmul_nb_reference)

    monkeypatch.setenv("MICROSCOPIQ_NB_TK", "128")   # K=256 -> nk=2
    monkeypatch.setenv("MICROSCOPIQ_NB_TM", "8")     # M=20 -> 3 M tiles
    _, dec = _gptq_decisions(cap=2, N=160, K=256)
    p = pack_outlier_nb(dec, budget=2)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((20, 256)).astype(np.float32))
    y_ref = dequant_matmul_nb_reference(x, p)
    y = dequant_matmul_nb(x, p, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0,
        atol=3e-6 * float(jnp.abs(y_ref).max()))


@pytest.mark.parametrize("N", [200, 1000])
def test_dequant_matmul_sad_ragged_n(monkeypatch, N):
    """r5: the SAD GEMV no longer requires TN | N — the ragged edge
    tile is masked by Pallas (the old divisor ladder fell to TN=128 on
    the lm_head and ran at half rate). OOB reads land only in sliced-
    off output columns and clipped exponents keep them finite."""
    from microscopiq_tpu.ops.packing import pack_mx, to_serving_layout
    from microscopiq_tpu.ops.pallas.dequant_matmul import (
        dequant_matmul_reference, dequant_matmul_sad)

    monkeypatch.setenv("MICROSCOPIQ_SAD_TN", "256")
    rng = np.random.default_rng(3)
    W = (rng.standard_normal((128, N)) * 0.5).astype(np.float32)
    w = to_serving_layout(pack_mx(jnp.asarray(W), 8, "fp6_e3m2", 32,
                                  axis=0, transport="emi8"))
    x = jnp.asarray(rng.standard_normal((5, 128)), jnp.float32)
    y = dequant_matmul_sad(x, w, interpret=True)
    y_ref = dequant_matmul_reference(x, w)
    assert y.shape == (5, N)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=0,
        atol=3e-6 * float(jnp.abs(y_ref).max()))
