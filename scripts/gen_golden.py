#!/usr/bin/env python
"""Generate golden parity fixtures by *running* the reference implementation.

This script executes the reference repo's quantizers (torch, CPU) on fixed
inputs and dumps the results as .npz fixtures under tests/golden/. The
committed fixtures are pure data; the reference code itself is never
vendored. Tests then assert our JAX implementation is bit-exact against
these fixtures — the TPU analog of the reference's own CPU-vs-CUDA
differential testing (number_system/mx/tests/test_quantize_mx.py:37-66).

Run (requires /root/reference mounted):
    python scripts/gen_golden.py
"""

import os
import sys

import numpy as np
import torch

REF = os.environ.get("MICROSCOPIQ_REF", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

sys.path.insert(0, os.path.join(REF, "number_system"))
sys.path.insert(0, REF)

from mx import elemwise_ops as ref_elemwise  # noqa: E402
from mx import mx_ops as ref_mx  # noqa: E402
from mx.formats import _get_format_params  # noqa: E402
from utils import quant as ref_quant  # noqa: E402

torch.manual_seed(0)
np.random.seed(0)

FORMATS = ["int8", "int4", "int2", "fp8_e5m2", "fp8_e4m3", "fp6_e3m2",
           "fp6_e2m3", "fp4_e2m1", "fp16", "bf16"]
ROUNDS = ["nearest", "floor", "even"]


def all_encodings(ebits, mbits):
    """Enumerate all float32 values with given exponent bits and top
    `mbits` mantissa bits (plus sign). Mirrors the coverage idea of the
    reference's tests/common_lib.py."""
    n = 2 ** (1 + ebits + mbits)
    enc = np.arange(n, dtype=np.uint32)
    sign = (enc >> (ebits + mbits)) & 1
    exp = (enc >> mbits) & (2 ** ebits - 1)
    mant = enc & (2 ** mbits - 1)
    # place exponent centered around 127, mantissa in top bits
    exp_f32 = np.clip(exp.astype(np.int64) - 2 ** (ebits - 1) + 127, 0, 254)
    bits = (sign.astype(np.uint32) << 31) | (exp_f32.astype(np.uint32) << 23) \
        | (mant.astype(np.uint32) << (23 - mbits))
    return bits.view(np.float32)


def main():
    os.makedirs(OUT, exist_ok=True)

    # ---------------- elemwise quantizer fixtures ----------------
    x_enc = all_encodings(5, 5)  # 2048 values incl. subnormal-ish edge exps
    x_rand = np.random.randn(4096).astype(np.float32) * \
        np.logspace(-12, 12, 4096).astype(np.float32)
    special = np.array([0.0, -0.0, np.inf, -np.inf, np.nan,
                        1e-40, -1e-40, 3.4e38, -3.4e38, 1.0, -1.0],
                       dtype=np.float32)
    x = np.concatenate([x_enc, x_rand, special])

    elem_cases = {}
    for fmt in FORMATS:
        ebits, mbits, _, max_norm, _ = _get_format_params(fmt)
        for rnd in ROUNDS:
            for sat in [False, True]:
                for denorm in [True, False]:
                    key = f"{fmt}|{rnd}|sat{int(sat)}|dn{int(denorm)}"
                    out = ref_elemwise._quantize_elemwise_core(
                        torch.from_numpy(x.copy()), mbits, ebits, max_norm,
                        round=rnd, saturate_normals=sat, allow_denorm=denorm)
                    elem_cases[key] = out.numpy()
    np.savez_compressed(os.path.join(OUT, "elemwise.npz"),
                        x=x, **elem_cases)
    print(f"elemwise: {len(elem_cases)} cases")

    # ---------------- MX block quantizer fixtures ----------------
    mx_inputs = {
        "m2d": (np.random.randn(64, 96).astype(np.float32) *
                np.logspace(-6, 6, 96, dtype=np.float32)),
        "m2d_small": np.random.randn(7, 13).astype(np.float32),
        "m3d": np.random.randn(4, 33, 20).astype(np.float32) * 100.0,
        "zeros": np.zeros((8, 32), np.float32),
        "big": np.random.randn(16, 64).astype(np.float32) * 1e30,
    }
    mx_cases = {}
    for name, a in mx_inputs.items():
        for fmt in ["int8", "fp6_e3m2", "fp4_e2m1", "int2"]:
            for sb in [4, 8]:
                for bs in [0, 16, 32]:
                    for ax in [0, -1]:
                        key = f"{name}|{fmt}|sb{sb}|bs{bs}|ax{ax}"
                        out = ref_mx._quantize_mx(
                            torch.from_numpy(a.copy()), sb, fmt,
                            axes=[ax], block_size=bs, round="nearest")
                        mx_cases[key] = out.numpy()
    np.savez_compressed(os.path.join(OUT, "mx.npz"),
                        **{f"in_{k}": v for k, v in mx_inputs.items()},
                        **mx_cases)
    print(f"mx: {len(mx_cases)} cases")

    # ---------------- outlier quantizer fixtures ----------------
    ol_inputs = {
        "w2d": np.random.randn(128, 1).astype(np.float32),
        "w2d_outliers": (np.random.randn(256, 1).astype(np.float32) +
                         10.0 * (np.random.rand(256, 1) > 0.95).astype(np.float32)),
        "mat": np.random.randn(96, 64).astype(np.float32),
    }
    ol_cases = {}
    for name, a in ol_inputs.items():
        for (ifmt, ofmt) in [("int2", "fp4_e2m1"), ("fp6_e3m2", "fp8_e4m3")]:
            for bs in [16, 32]:
                key = f"{name}|{ifmt}|{ofmt}|bs{bs}"
                q, n = ref_quant.quantize_mx_outlier_hessian(
                    torch.from_numpy(a.copy()), 8, 8, ifmt, ofmt,
                    std_dev=2, axes=[0], block_size=bs)
                ol_cases[f"h|{key}"] = q.numpy()
                ol_cases[f"hn|{key}"] = n.numpy()
                q1 = ref_quant.quantize_mx_outlier_v1(
                    torch.from_numpy(a.copy()), 8, 8, ifmt, ofmt,
                    std_dev=2, axes=[0], block_size=bs)
                ol_cases[f"v1|{key}"] = q1.numpy()
                qop = ref_mx._quantize_mx_outlier_v1(
                    torch.from_numpy(a.copy()), 8, 8, ifmt, ofmt,
                    std_dev=2, axes=[0], block_size=bs)
                ol_cases[f"op|{key}"] = qop.numpy()
    np.savez_compressed(os.path.join(OUT, "outlier.npz"),
                        **{f"in_{k}": v for k, v in ol_inputs.items()},
                        **ol_cases)
    print(f"outlier: {len(ol_cases)} cases")

    # ---------------- GPTQ end-to-end fixture ----------------
    sys.path.insert(0, os.path.join(REF, "llm"))
    import importlib
    gptq_mod = importlib.import_module("gptq")
    torch.cuda.synchronize = lambda *a, **k: None  # CPU-only torch
    torch.manual_seed(1)
    lin = torch.nn.Linear(64, 48, bias=False)
    X = torch.randn(8, 16, 64)
    g = gptq_mod.GPTQ(lin)
    g.quantizer = ref_quant.MXQuantizer()
    g.quantizer.configure(8, 8, "int2", "fp4_e2m1", std_dev=2,
                          axes=[0], block_size=16)
    for i in range(8):
        g.add_batch(X[i], lin(X[i]))
    H = g.H.clone().numpy()
    g.fasterquant(blocksize=32, percdamp=0.01, groupsize=-1)
    np.savez_compressed(
        os.path.join(OUT, "gptq.npz"),
        W=lin.weight.detach().numpy() * 0 + np.asarray(
            torch.nn.Linear(64, 48, bias=False).weight.detach()),  # unused
        W_orig=_regen_weight(),
        X=X.numpy(), H=H, Q=lin.weight.data.numpy())
    print("gptq fixture done")


def _regen_weight():
    torch.manual_seed(1)
    lin = torch.nn.Linear(64, 48, bias=False)
    return lin.weight.detach().numpy()


def gen_gear():
    """GEAR/KIVI codec fixtures from the reference's compress_function /
    TrueCompressFunction (run separately: python scripts/gen_golden.py gear)."""
    # the reference package __init__ is broken (missing H2OCache import,
    # SURVEY.md §4) — load the codec modules directly by file path
    import importlib.util

    def _load(name, rel):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF, "kv_quant", rel))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    cf = _load("cf", "GEARLM/Simulated/compress_function.py")
    tcf = _load("tcf", "GEARLM/TrueCompression/models/TrueCompressFunction.py")

    torch.manual_seed(3)
    x = torch.randn(2, 4, 64, 32)  # (B, H, S, D)
    cases = {"x": x.numpy()}
    cases["token4_g32"] = cf.fake_groupwise_token_asymmetric_quantization(
        x.clone(), 4, 32).numpy()
    cases["token2_g64"] = cf.fake_groupwise_token_asymmetric_quantization(
        x.clone(), 2, 64).numpy()
    cases["chan4_g32"] = cf.fake_groupwise_channel_asymmetric_quantization_new(
        x.clone(), 4, 32).numpy()
    cases["uniform4"] = cf.fake_uniformquantization(x.clone(), 4).numpy()
    cases["densesparse4"] = cf.fake_dense_sparse_uniformquantization(
        x.clone(), 4, 0.05).numpy()

    c, shape, mn, sc = tcf.true_uniform_quantization_compress(x.clone(), 4)
    cases["true_u4_codes"] = c.numpy()
    cases["true_u4_meta"] = np.array([mn.item(), sc.item()], np.float32)
    dec = tcf.true_uniform_quantization_decompress(
        c, 4, shape, mn, sc, torch.float32)
    cases["true_u4_dec"] = dec.numpy()

    c8, shape8, mn8, sc8 = tcf.true_uniform_quantization_compress(x.clone(), 8)
    dec8 = tcf.true_uniform_quantization_decompress(
        c8, 8, shape8, mn8, sc8, torch.float32)
    cases["true_u8_dec"] = dec8.numpy()

    np.savez_compressed(os.path.join(OUT, "gear.npz"), **cases)
    print(f"gear: {len(cases)} cases")


def gen_conv():
    """Conv2d forward + per-axis re-quantized backward fixtures
    (convolution.py:120-326): grads of sum(out) wrt input/weight/bias,
    with quantize_backprop on and off."""
    from mx.convolution import conv2d as ref_conv2d
    from mx.specs import apply_mx_specs
    from mx.transpose_convolution import ConvTranspose2dFunction

    def ref_convt2d(x, w, b, stride=1, padding=1, mx_specs=None):
        return ConvTranspose2dFunction.apply(x, w, b, stride, padding,
                                             0, 1, 1, mx_specs)

    torch.manual_seed(3)
    cases = {}
    x0 = torch.randn(2, 8, 9, 9, dtype=torch.float32)
    w0 = torch.randn(6, 4, 3, 3, dtype=torch.float32) * 0.3
    b0 = torch.randn(6, dtype=torch.float32) * 0.1
    wt0 = torch.randn(8, 6, 3, 3, dtype=torch.float32) * 0.3  # (I,O,kh,kw)
    cases["x"] = x0.numpy()
    cases["w"] = w0.numpy()
    cases["b"] = b0.numpy()
    cases["wt"] = wt0.numpy()

    for qbp in (True, False):
        specs = apply_mx_specs({
            "a_elem_format": "fp6_e3m2", "w_elem_format": "fp6_e3m2",
            "block_size": 4, "bfloat": 16, "quantize_backprop": qbp,
            "custom_cuda": False})
        for name, fn, w, kw in [
                ("conv", ref_conv2d, w0, dict(stride=2, padding=1,
                                              groups=2)),
                ("convt", ref_convt2d, wt0, dict(stride=2, padding=1)),
        ]:
            x = x0.clone().requires_grad_(True)
            ww = w.clone().requires_grad_(True)
            bb = b0.clone().requires_grad_(True)
            out = fn(x, ww, bb, mx_specs=specs, **kw)
            out.sum().backward()
            key = f"{name}|qbp{int(qbp)}"
            cases[key + "|out"] = out.detach().numpy()
            cases[key + "|gx"] = x.grad.numpy()
            cases[key + "|gw"] = ww.grad.numpy()
            cases[key + "|gb"] = bb.grad.numpy()

    np.savez_compressed(os.path.join(OUT, "conv.npz"), **cases)
    print(f"conv: {len(cases)} arrays")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "gear":
        gen_gear()
    elif len(sys.argv) > 1 and sys.argv[1] == "conv":
        gen_conv()
    else:
        main()
