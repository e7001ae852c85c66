#!/usr/bin/env python
"""Prefill decode/MXU overlap experiment (VERDICT r4 ask #1).

The shipping prefill kernel (dequant_matmul.py:_dq_matmul_kernel) decodes
an emi8 tile and dots it in one dependency chain per grid step; measured
1489 us vs 1280 us dense at the 8B gate_up shape (4096, 28672), M=1024.
Grid steps are scheduling regions in Mosaic, so the VPU decode of step
k+1 never co-issues with the MXU dot of step k (the r3 pl.when
double-buffer pipelines made it WORSE: 2178+ us — guards are barriers).

New idea tested here: keep everything in ONE straight-line kernel body —
unroll S sub-chunks of the K tile and interleave textually:

    w[0] = decode(chunk 0)
    for s: w[s+1] = decode(chunk s+1); acc += x_s @ w[s]

The TPU core is in-order but the MXU is decoupled (push operands / pop
results), so if Mosaic keeps program order the VPU decode of chunk s+1
executes while the MXU drains chunk s. No guards, no cross-step state.

Arms:
  dense        bf16 weights, XLA dot (baseline)
  inkernel     shipping kernel (decode+dot per grid step)
  native_floor int8-container codes: convert+scale only, no emi8 shifts
               (lower bound for ANY byte-transport decode)
  unroll{4,8}  straight-line interleaved sub-chunks as above
  seq{4}       same sub-chunks but decode_s immediately before dot_s
               (control: measures unrolling alone vs interleaving)

Prints one JSON line per arm with device us/iter, exactly the honest
full-N consume methodology of scripts/exp_prefill_pipe.py.
"""

import functools
import json
import pathlib
import shutil
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from microscopiq_tpu.ops import packing as pk
    import importlib
    dm = importlib.import_module("microscopiq_tpu.ops.pallas.dequant_matmul")
    from microscopiq_tpu.ops.pallas.dequant_matmul import (_exp2_i32,
                                                           _round_up)
    from microscopiq_tpu.utils.observability import (device_kernel_stats,
                                                     trace)

    assert jax.default_backend() == "tpu"
    K, N, M, ITERS = 4096, 28672, 1024, 16
    B = 32
    rng = np.random.default_rng(0)
    W = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        w = pk.to_serving_layout(pk.pack_mx(
            jnp.asarray(W), 8, "fp6_e3m2", B, axis=0, transport="emi8"))
        w8 = pk.to_serving_layout(pk.pack_mx(
            jnp.asarray(W), 8, "int8", B, axis=0))
    w = jax.device_put(w, jax.devices()[0])
    w8 = jax.device_put(w8, jax.devices()[0])
    Wd = jax.device_put(jnp.asarray(W, jnp.bfloat16), jax.devices()[0])
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    mw = pk.emi8_params("fp6_e3m2")[0]
    fold = pk.emi8_fold("fp6_e3m2")

    def _decode_chunk(c3, se, *, emi8: bool):
        """(nbs, B, TN) int8 codes + (nbs, TN) scale exps -> (nbs*B, TN)."""
        nbs, B_, tn = c3.shape
        if emi8:
            c = c3.astype(jnp.int32)
            mhat = lax.shift_right_arithmetic(c, 8 - mw)
            w3 = lax.shift_left(
                mhat, c & ((1 << (8 - mw)) - 1)).astype(jnp.bfloat16)
            fo = fold
        else:
            w3 = c3.astype(jnp.bfloat16)
            fo = dm._scale_fold("int8")
        sei = se.astype(jnp.int32) - fo
        w3 = w3 * _exp2_i32(sei)[:, None, :].astype(jnp.bfloat16)
        return w3.reshape(nbs * B_, tn)

    def unroll_kernel(x_ref, c_ref, s_ref, o_ref, acc_ref, *, nk, S,
                      interleave: bool, emi8: bool):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        nbt = c_ref.shape[0]
        nbs = nbt // S
        x = x_ref[:]                                  # (TM, TK) bf16
        chunks = [(c_ref[s * nbs:(s + 1) * nbs],
                   s_ref[s * nbs:(s + 1) * nbs]) for s in range(S)]
        if interleave:
            wdec = _decode_chunk(*chunks[0], emi8=emi8)
            for s in range(S):
                wnext = (_decode_chunk(*chunks[s + 1], emi8=emi8)
                         if s + 1 < S else None)
                acc_ref[:] += lax.dot_general(
                    x[:, s * nbs * B:(s + 1) * nbs * B], wdec,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                wdec = wnext
        else:
            for s in range(S):
                wdec = _decode_chunk(*chunks[s], emi8=emi8)
                acc_ref[:] += lax.dot_general(
                    x[:, s * nbs * B:(s + 1) * nbs * B], wdec,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(jnp.float32)

    def unroll(x, *, S=4, interleave=True, TM=1024, TN=512, TK=2048,
               emi8=True):
        ww = w if emi8 else w8
        NB, rows, Nn = ww.codes.shape
        Kp = NB * B
        nbt = TK // B
        nk = Kp // TK
        grid = (M // TM, Nn // TN, nk)
        return pl.pallas_call(
            functools.partial(unroll_kernel, nk=nk, S=S,
                              interleave=interleave, emi8=emi8),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, TK), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbt, rows, TN), lambda i, j, k: (k, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbt, TN), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, Nn), jnp.float32),
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * Nn * Kp,
                bytes_accessed=M * Kp * 2 + Nn * Kp,
                transcendentals=0),
        )(x.astype(jnp.bfloat16), ww.codes, ww.scale_exp)

    arms = {
        "dense": lambda x: (x.astype(jnp.bfloat16) @ Wd).astype(jnp.float32),
        "inkernel": lambda x: dm.dequant_matmul(x, w),
        "native_floor": lambda x: unroll(x, S=1, interleave=False,
                                         emi8=False),
        "seq1_tk2048": lambda x: unroll(x, S=1, interleave=False),
        "seq4": lambda x: unroll(x, S=4, interleave=False),
        "unroll4": lambda x: unroll(x, S=4, interleave=True),
        "unroll8": lambda x: unroll(x, S=8, interleave=True),
        "unroll4_tn1024": lambda x: unroll(x, S=4, interleave=True,
                                           TN=1024),
        "unroll8_tk4096": lambda x: unroll(x, S=8, interleave=True,
                                           TK=4096, TN=512),
    }

    y_ref = np.asarray(dm.dequant_matmul_reference(
        x0, pk.from_serving_layout(w)))
    y_ref8 = np.asarray(dm.dequant_matmul_reference(
        x0, pk.from_serving_layout(w8)))
    from jax import lax as _lax
    for tag, fn in arms.items():
        run = jax.jit(lambda x, fn=fn: _lax.scan(
            lambda c, _: (c + jnp.sum(fn(c), axis=1, keepdims=True)
                          * 1e-30, None),
            x, None, length=ITERS)[0])
        try:
            run(x0).block_until_ready()
        except Exception as e:
            print(json.dumps({"arm": tag, "error": str(e)[:300]}),
                  flush=True)
            continue
        if tag == "dense":
            err = None
        else:
            ref = y_ref8 if tag == "native_floor" else y_ref
            err = float(np.abs(np.asarray(fn(x0)) - ref).max())
        d = f"/tmp/prefill_ov_{tag}"
        shutil.rmtree(d, ignore_errors=True)
        with trace(d):
            run(x0).block_until_ready()
        st = device_kernel_stats(d)
        tot = st.get("while", {}).get("total_us") if st else None
        us = tot / ITERS if tot else None
        print(json.dumps({"arm": tag,
                          "device_us_per_iter": round(us, 1) if us else None,
                          "max_err": err}), flush=True)


if __name__ == "__main__":
    main()
