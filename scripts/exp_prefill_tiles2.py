#!/usr/bin/env python
"""Prefill pallas-dot schedule sweep (round 5).

exp_prefill_floor.py showed the decode is nearly free: the pure-dot
pallas kernel (predecoded bf16 weights, no decode at all) runs 1473 us
vs XLA dense 1280 us at the same (4096, 28672) M=1024 shape — the 15%
gap is pallas grid-step overhead, not VPU work. 56 grid steps x ~22 us
of MXU each leaves ~4 us/step of pipeline overhead. Fewer, bigger steps
should close it. This sweeps (TM, TN, TK) for BOTH the pure dot and the
emi8 in-kernel-decode kernel and prints device us/iter per config.
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
    from microscopiq_tpu.ops.pallas.dequant_matmul import _exp2_i32
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
    w = jax.device_put(w, jax.devices()[0])
    Wd = jax.device_put(jnp.asarray(W, jnp.bfloat16), jax.devices()[0])
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    mw = pk.emi8_params("fp6_e3m2")[0]
    fold = pk.emi8_fold("fp6_e3m2")

    def kern(*refs, nk, decode):
        if decode == "pre":
            x_ref, c_ref, o_ref, acc_ref = refs
            s_ref = None
        else:
            x_ref, c_ref, s_ref, o_ref, acc_ref = refs
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if decode == "pre":
            wt = c_ref[:]
        else:
            c3 = c_ref[:].astype(jnp.int32)
            mhat = lax.shift_right_arithmetic(c3, 8 - mw)
            w3 = lax.shift_left(
                mhat, c3 & ((1 << (8 - mw)) - 1)).astype(jnp.bfloat16)
            se = s_ref[:].astype(jnp.int32) - fold
            w3 = w3 * _exp2_i32(se)[:, None, :].astype(jnp.bfloat16)
            nbt, B_, tn = w3.shape
            wt = w3.reshape(nbt * B_, tn)
        acc_ref[:] += lax.dot_general(
            x_ref[:], wt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(k == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(jnp.float32)

    def run_cfg(x, *, decode, TM, TN, TK, out_bf16=False):
        nk = K // TK
        nbt = TK // B
        grid = (M // TM, N // TN, nk)
        odt = jnp.bfloat16 if out_bf16 else jnp.float32
        if decode == "pre":
            wspec = pl.BlockSpec((TK, TN), lambda i, j, k: (k, j),
                                 memory_space=pltpu.VMEM)
            ops = (Wd,)
        else:
            wspec = pl.BlockSpec((nbt, 1, TN), lambda i, j, k: (k, 0, j),
                                 memory_space=pltpu.VMEM)
            ops = (w.codes, w.scale_exp)
        in_specs = [pl.BlockSpec((TM, TK), lambda i, j, k: (i, k),
                                 memory_space=pltpu.VMEM)]
        if decode == "pre":
            in_specs.append(wspec)
        else:
            in_specs.append(
                pl.BlockSpec((nbt, B, TN), lambda i, j, k: (k, 0, j),
                             memory_space=pltpu.VMEM))
            in_specs.append(
                pl.BlockSpec((nbt, TN), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM))
        return pl.pallas_call(
            functools.partial(kern, nk=nk, decode=decode),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), odt),
            scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=120 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K, bytes_accessed=M * K * 2 + N * K,
                transcendentals=0),
        )(x.astype(jnp.bfloat16), *ops)

    cfgs = [("pre", 1024, 2048, 1024), ("pre", 1024, 4096, 1024),
            ("pre", 1024, 4096, 2048), ("pre", 1024, 2048, 2048),
            ("pre", 1024, 4096, 4096), ("pre", 512, 4096, 2048),
            ("pre", 1024, 7168, 2048),
            ("emi8", 1024, 4096, 1024), ("emi8", 1024, 4096, 2048),
            ("emi8", 1024, 2048, 2048), ("emi8", 1024, 7168, 2048)]

    for decode, TM, TN, TK in cfgs:
        tag = f"{decode}_tm{TM}_tn{TN}_tk{TK}"
        fn = functools.partial(run_cfg, decode=decode, TM=TM, TN=TN,
                               TK=TK)
        run = jax.jit(lambda x, fn=fn: lax.scan(
            lambda c, _: (c + jnp.sum(fn(c), axis=1, keepdims=True)
                          .astype(c.dtype) * 1e-30, None),
            x, None, length=ITERS)[0])
        try:
            run(x0).block_until_ready()
        except Exception as e:
            print(json.dumps({"cfg": tag, "error": str(e)[:250]}),
                  flush=True)
            continue
        d = f"/tmp/pt2_{tag}"
        shutil.rmtree(d, ignore_errors=True)
        with trace(d):
            run(x0).block_until_ready()
        st = device_kernel_stats(d)
        tot = st.get("while", {}).get("total_us") if st else None
        us = tot / ITERS if tot else None
        print(json.dumps({"cfg": tag,
                          "device_us": round(us, 1) if us else None}),
              flush=True)


if __name__ == "__main__":
    main()
