#!/usr/bin/env python
"""Software-pipelined prefill dequant-GEMM experiment (VERDICT r3 items 1-2).

The shipping prefill kernel decodes emi8 codes and feeds the MXU in the
same dependency chain, so per layer the ~1.1 ms VPU decode SERIALIZES
with the ~1.2 ms MXU dot. Variants measured at the Llama-3-8B gate_up
shape (4096, 28672) with M=1024:

  dense      — bf16 weights, XLA dot (the baseline to beat)
  inkernel   — shipping dequant-then-dot prefill kernel
  pipe_*     — double-buffered decode pipelined along the K grid axis
               (decodes tile k while the MXU consumes tile k-1)
  residentx_* — x stays RESIDENT in VMEM (full K), pipeline along the N
               grid axis: no k-axis accumulator, each j-step is one
               (TM,K)x(K,TN) dot, and the old pipe's per-(j,k) x re-fetch
               (56*8 x-tile DMAs = 448 MB) disappears entirely.

Methodology (r3 VERDICT weak #3): the scan body consumes ALL N output
columns via a full row-reduction folded into the carry — the previous
version consumed only y[:, :K], so XLA dead-code-eliminated 24,576 of
the dense arm's 28,672 output columns and its "baseline" was peak for a
7x smaller matmul. The same reduction is applied to every arm.

Prints one JSON line per arm with device us/iter.
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
            jnp.asarray(W), 8, "fp6_e3m2", 32, axis=0, transport="emi8"))
    w = jax.device_put(w, jax.devices()[0])
    Wd = jax.device_put(jnp.asarray(W, jnp.bfloat16), jax.devices()[0])
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    mw = pk.emi8_params("fp6_e3m2")[0]
    fold = pk.emi8_fold("fp6_e3m2")

    # ---- k-axis pipelined kernel (r2 design) ----
    def pipe_kernel(x_ref, c_ref, s_ref, o_ref, w0, w1, acc_ref, *, nk,
                    TK, TN):
        k = pl.program_id(2)
        parity = k % 2

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def decode():
            c3 = c_ref[:].astype(jnp.int32)          # (nbt, B, TN)
            mhat = lax.shift_right_arithmetic(c3, 8 - mw)
            w3 = lax.shift_left(
                mhat, c3 & ((1 << (8 - mw)) - 1)).astype(jnp.bfloat16)
            se = s_ref[:].astype(jnp.int32) - fold   # (nbt, TN)
            w3 = w3 * _exp2_i32(se)[:, None, :].astype(jnp.bfloat16)
            return w3.reshape(TK, TN)

        @pl.when((k < nk) & (parity == 0))
        def _():
            w0[:] = decode()

        @pl.when((k < nk) & (parity == 1))
        def _():
            w1[:] = decode()

        # consume the buffer the PREVIOUS step wrote — no dependency on
        # this step's decode, so Mosaic can co-issue MXU and VPU work
        @pl.when((k > 0) & (parity == 1))
        def _():
            acc_ref[:] += lax.dot_general(
                x_ref[:].astype(jnp.bfloat16), w0[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when((k > 0) & (parity == 0))
        def _():
            acc_ref[:] += lax.dot_general(
                x_ref[:].astype(jnp.bfloat16), w1[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(k == nk)
        def _():
            o_ref[:] = acc_ref[:].astype(jnp.float32)

    def pipe(x, TM=1024, TN=256, TK=512):
        ww = w
        NB, rows, Nn = ww.codes.shape
        Kp = NB * B
        nbt = TK // B
        nk = Kp // TK
        grid = (M // TM, Nn // TN, nk + 1)
        return pl.pallas_call(
            functools.partial(pipe_kernel, nk=nk, TK=TK, TN=TN),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, TK),
                             lambda i, j, k: (i, jnp.maximum(k - 1, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbt, rows, TN),
                             lambda i, j, k: (jnp.minimum(k, nk - 1), 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nbt, TN),
                             lambda i, j, k: (jnp.minimum(k, nk - 1), j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, Nn), jnp.float32),
            scratch_shapes=[pltpu.VMEM((TK, TN), jnp.bfloat16),
                            pltpu.VMEM((TK, TN), jnp.bfloat16),
                            pltpu.VMEM((TM, TN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * Nn * Kp, bytes_accessed=M * Kp * 4 + Nn * Kp,
                transcendentals=0),
        )(x, ww.codes, ww.scale_exp)

    # ---- resident-x kernel: pipeline along N, x fetched once ----
    def rx_kernel(x_ref, c_ref, s_ref, o_ref, w0, w1, *, nj, TN, Kfull):
        j = pl.program_id(1)
        parity = j % 2

        def decode():
            c3 = c_ref[:].astype(jnp.int32)          # (K//B, B, TN)
            mhat = lax.shift_right_arithmetic(c3, 8 - mw)
            w3 = lax.shift_left(
                mhat, c3 & ((1 << (8 - mw)) - 1)).astype(jnp.bfloat16)
            se = s_ref[:].astype(jnp.int32) - fold   # (K//B, TN)
            w3 = w3 * _exp2_i32(se)[:, None, :].astype(jnp.bfloat16)
            return w3.reshape(Kfull, TN)

        @pl.when((j < nj) & (parity == 0))
        def _():
            w0[:] = decode()

        @pl.when((j < nj) & (parity == 1))
        def _():
            w1[:] = decode()

        @pl.when((j > 0) & (parity == 1))
        def _():
            o_ref[:] = lax.dot_general(
                x_ref[:], w0[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when((j > 0) & (parity == 0))
        def _():
            o_ref[:] = lax.dot_general(
                x_ref[:], w1[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    def residentx(x, TM=1024, TN=256):
        ww = w
        NB, rows, Nn = ww.codes.shape
        Kp = NB * B
        nj = Nn // TN
        grid = (M // TM, nj + 1)
        return pl.pallas_call(
            functools.partial(rx_kernel, nj=nj, TN=TN, Kfull=Kp),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, Kp), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, rows, TN),
                             lambda i, j: (0, 0, jnp.minimum(j, nj - 1)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, TN),
                             lambda i, j: (0, jnp.minimum(j, nj - 1)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TM, TN), lambda i, j: (i, jnp.maximum(j - 1, 0)),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, Nn), jnp.float32),
            scratch_shapes=[pltpu.VMEM((Kp, TN), jnp.bfloat16),
                            pltpu.VMEM((Kp, TN), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=110 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * Nn * Kp, bytes_accessed=M * Kp * 2 + Nn * Kp,
                transcendentals=0),
        )(x.astype(jnp.bfloat16), ww.codes, ww.scale_exp)

    arms = {
        "dense": lambda x: (x.astype(jnp.bfloat16) @ Wd).astype(jnp.float32),
        "inkernel": lambda x: dm.dequant_matmul(x, w),
        "pipe_tn256": pipe,
        "pipe_tn512": lambda x: pipe(x, TN=512, TK=512),
        "residentx_tn256": residentx,
        "residentx_tn512": lambda x: residentx(x, TN=512),
    }

    y_ref = np.asarray(dm.dequant_matmul_reference(
        x0, pk.from_serving_layout(w)))
    for tag, fn in arms.items():
        # consume ALL N columns: full row-reduction into the (M, K)
        # carry. Without this XLA narrows the dense dot to the sliced
        # columns (r3 VERDICT weak #3: 184.9 us was peak for a 7x
        # smaller matmul).
        run = jax.jit(lambda x, fn=fn: lax.scan(
            lambda c, _: (c + jnp.sum(fn(c), axis=1, keepdims=True)
                          * 1e-30, None),
            x, None, length=ITERS)[0])
        try:
            run(x0).block_until_ready()
        except Exception as e:
            print(json.dumps({"arm": tag, "error": str(e)[:300]}),
                  flush=True)
            continue
        if tag != "dense":
            err = float(np.abs(np.asarray(fn(x0)) - y_ref).max())
        else:
            err = None
        d = f"/tmp/prefill_pipe_{tag}"
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
