#!/usr/bin/env python
"""Kernel experiment: emi8 in-kernel decode variants for the SAD GEMV.

The serving GEMV streams emi8 bytes at 565 GB/s vs a 686 GB/s structural
floor measured by an int8 zero-decode ablation (STATUS.md). The delta is
the per-element decode: i8->i32 unpack + 2 shifts + mask + i32->bf16
convert, all in 32-bit lanes. Variants measured here:

  i32   — current production decode (baseline)
  i16   — same ops in 16-bit lanes (2 elems/32-bit lane; legal for plain
          emi8 where |m̂·2^e'| ≤ 448 for fp6)
  zero  — astype(bf16) only (the structural floor, wrong numerics)
  dense — XLA bf16 GEMV for scale

Prints one JSON line per variant with on-device us/iter.
"""

import functools
import json
import pathlib
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from microscopiq_tpu.ops import packing as pk
    from microscopiq_tpu.ops.pallas.dequant_matmul import (
        _exp2_i32, _round_up)

    K, N, M, ITERS = 4096, 16384, 8, 64
    B = 32
    rng = np.random.default_rng(0)
    W = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)

    with jax.default_device(jax.devices("cpu")[0]):
        pe = pk.to_serving_layout(pk.pack_mx(
            jnp.asarray(W), 8, "fp6_e3m2", 32, axis=0, transport="emi8"))
    dev = jax.devices()[0]
    codes = jax.device_put(pe.codes, dev)          # (NB, B, N) int8
    se = jax.device_put(pe.scale_exp, dev)         # (NB, N) int8
    mw = 4
    fold = pk.emi8_fold("fp6_e3m2")

    # --- ebf8 re-encode (numpy, host): byte = [s | E5 | m2] such that
    # bf16 bits = ((b & 0x7F) << 5) | ((b & 0x80) << 8) | (OFF << 7)
    # represent value * 2^(EBIAS). E=0 encodes zero.
    cn = np.asarray(pe.codes).astype(np.int32)
    mhat = cn >> (8 - mw)
    eprime = cn & ((1 << (8 - mw)) - 1)
    val = (mhat << eprime).astype(np.float64)      # integer values, exact
    m48, e48 = np.frexp(np.abs(val))               # |val| = m48 * 2^e48
    # normalized: |val| = 1.f * 2^(e48-1); f has <=2 explicit bits here
    frac = np.where(val != 0, np.round((m48 * 2 - 1) * 4), 0).astype(np.int32)
    E = np.where(val != 0, e48, 0).astype(np.int32)  # 1..18 -> 5 bits
    assert E.max() < 32 and frac.max() < 4
    sgn = (val < 0).astype(np.int32)
    ebf8 = ((sgn << 7) | (E << 2) | frac).astype(np.uint8).view(np.int8)
    # assembled bf16 value = (1.f) * 2^(E - 127) = |val| * 2^-126
    # (|val| = 1.f * 2^(E-1)); byte 0 -> bf16 0 exactly. The 2^126
    # rescale folds into the per-block scale exponent.
    fold_ebf = fold - 126
    codes_ebf = jax.device_put(jnp.asarray(ebf8), dev)

    NB = K // B
    TM = 16
    TN = 1024
    TK = 2048
    nbt = TK // B
    nk = K // TK

    def make_kernel(variant):
        def kern(x_ref, c_ref, s_ref, o_ref, acc_ref):
            k = pl.program_id(2)

            @pl.when(k == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            p3 = c_ref[:]
            if variant == "i32":
                c = p3.astype(jnp.int32)
                mhat = lax.shift_right_arithmetic(c, 8 - mw)
                w = lax.shift_left(
                    mhat, c & ((1 << (8 - mw)) - 1)).astype(jnp.bfloat16)
            elif variant == "i16":
                c = p3.astype(jnp.int16)
                mhat = lax.shift_right_arithmetic(c, 8 - mw)
                w = lax.shift_left(
                    mhat, c & ((1 << (8 - mw)) - 1)).astype(jnp.bfloat16)
            elif variant == "ebf8":
                # byte -> bf16 bit assembly, all 16-bit lane ops, no
                # variable shift, no int32->bf16 repack
                c = p3.astype(jnp.int16)
                t = ((c & 0x7F) << 5) | ((c & 0x80) << 8)
                w = lax.bitcast_convert_type(t, jnp.bfloat16)
            elif variant == "f32dot":
                c = p3.astype(jnp.int32)
                mhat = lax.shift_right_arithmetic(c, 8 - mw)
                w = lax.shift_left(
                    mhat, c & ((1 << (8 - mw)) - 1)).astype(jnp.float32)
            elif variant == "zero":
                w = p3.astype(jnp.bfloat16)
            part = lax.dot_general(
                x_ref[:], w, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            f = fold_ebf if variant.startswith("ebf8") else fold
            sc = _exp2_i32(s_ref[:].astype(jnp.int32) - f)
            acc_ref[:] += jnp.sum(part * sc[:, None, :], axis=0)

            @pl.when(k == nk - 1)
            def _():
                o_ref[:] = acc_ref[:].astype(jnp.float32)

        return kern

    def build(variant):
        grid = (1, N // TN, nk)
        cds = codes_ebf if variant.startswith("ebf8") else codes

        def run(x2):  # x2: (M, K) bf16
            xb = jnp.pad(x2, ((0, TM - M), (0, 0))).reshape(
                TM, NB, B).transpose(1, 0, 2)
            return pl.pallas_call(
                make_kernel(variant),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((nbt, TM, B), lambda i, j, k: (k, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nbt, B, TN), lambda i, j, k: (k, 0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nbt, TN), lambda i, j, k: (k, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((TM, N), jnp.float32),
                scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel",
                                         "arbitrary")),
                cost_estimate=pl.CostEstimate(
                    flops=2 * TM * N * K,
                    bytes_accessed=TM * K * 2 + N * K + TM * N * 4,
                    transcendentals=0),
            )(xb, cds, se)

        @jax.jit
        def loop(x0):
            def step(x, _):
                y = run(x)
                # thread the carry through the kernel input (STATUS.md:
                # loop-invariant bodies get hoisted)
                nx = x.at[:M, :M].add(
                    (y[:M, :M] * 1e-30).astype(jnp.bfloat16))
                return nx, ()
            xf, _ = lax.scan(step, x0, None, length=ITERS)
            return jnp.sum(xf)

        return loop

    Wd = jax.device_put(jnp.asarray(W[:, :N]).astype(jnp.bfloat16), dev)

    @jax.jit
    def dense_loop(x0):
        def step(x, _):
            y = lax.dot_general(x, Wd, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            nx = x.at[:M, :M].add((y[:M, :M] * 1e-30).astype(jnp.bfloat16))
            return nx, ()
        xf, _ = lax.scan(step, x0, None, length=ITERS)
        return jnp.sum(xf)

    x0 = jax.device_put(
        jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16), dev)

    from microscopiq_tpu.utils.observability import (device_kernel_stats,
                                                     trace)

    def measure(fn, tag):
        float(fn(x0))          # compile + warm
        d = f"/tmp/exp_decode_{tag}"
        shutil.rmtree(d, ignore_errors=True)
        t0 = time.perf_counter()
        with trace(d):
            float(fn(x0))
        wall = time.perf_counter() - t0
        stats = device_kernel_stats(d)
        tot = stats.get("while", {}).get("total_us")
        us = round(tot / ITERS, 1) if tot else None
        gbps = round((K * N) / (us * 1e-6) / 1e9, 1) if us else None
        print(json.dumps({"variant": tag, "device_us_per_iter": us,
                          "codes_GBps": gbps,
                          "wall_s": round(wall, 3)}), flush=True)
        return us

    # numeric parity: each variant (except the deliberately-wrong 'zero')
    # must reproduce the i32 production decode exactly
    def once(variant):
        cds = codes_ebf if variant.startswith("ebf8") else codes
        xb = jnp.pad(x0, ((0, TM - M), (0, 0))).reshape(
            TM, NB, B).transpose(1, 0, 2)
        return pl.pallas_call(
            make_kernel(variant),
            grid=(1, N // TN, nk),
            in_specs=[
                pl.BlockSpec((nbt, TM, B), lambda i, j, k: (k, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbt, B, TN), lambda i, j, k: (k, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbt, TN), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TM, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        )(xb, cds, se)

    ref = np.asarray(once("i32"))
    for tag in ("i16", "ebf8", "f32dot"):
        try:
            got = np.asarray(once(tag))
            exact = bool((got == ref).all())
            md = float(np.abs(got - ref).max())
            print(json.dumps({"variant": tag, "parity_exact": exact,
                              "max_delta": md}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": tag,
                              "parity_error": str(e)[:300]}), flush=True)

    for tag in ("i32", "i16", "ebf8", "f32dot", "zero"):
        try:
            measure(build(tag), tag)
        except Exception as e:
            print(json.dumps({"variant": tag,
                              "error": str(e)[:300]}), flush=True)
    measure(dense_loop, "dense_bf16")


if __name__ == "__main__":
    main()
