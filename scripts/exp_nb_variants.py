#!/usr/bin/env python
"""NB (compact N-blocked transport) GEMV kernel experiments.

r3 VERDICT weak #6: the ~4 b/elem transport decodes at ~0.3x dense GEMV
speed — the in-kernel sb2 unpack + per-slot outlier scatter is ~8 VPU
ops per weight element, all on FULL-SIZE (TN, TK) arrays. These variants
restructure the kernel so the heavy VPU work happens on quarter- or
sixteenth-size arrays and the MXU does the expansion:

  cur     — shipping kernel (dequant_matmul_nb)
  fd      — field-decomposed: the 4 sb2 fields of a packed byte are the
            rows {r, r+4, r+8, r+12} of ONE 16-row block (packing.
            _subbyte_pack layout), so all 4 share the block scale.
            Extract+convert+scale each field on the (TN/4, TK) quarter
            array and run 4 quarter-size MXU dots into a field-major
            accumulator; outliers stay the full-size masked scatter.
  fd_dot  — fd inliers + outliers as a one-hot-weighted SECOND dot:
            A[i,b,r,k] = [pos==4i+r]*val built in field-major row order
            (2 full-size ops per budget slot instead of 3) and expanded
            by the MXU, accumulating into the same field-major acc.
  fd_sc   — fd inliers + per-field quarter-size scatter (safest layouts:
            everything 2D, nothing full-size except the dots).

Correctness: every variant is checked on-device against
dequant_matmul_nb_reference before timing. Prints one JSON line per
variant with wall + device us/iter.
"""

import functools
import json
import pathlib
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
    from microscopiq_tpu.ops.outlier import (
        quantize_mx_outlier_hessian_decisions)
    from microscopiq_tpu.ops.pallas.dequant_matmul import (
        _exp2_i32, _round_up, _scale_fold, dequant_matmul_nb,
        dequant_matmul_nb_reference)

    # ---------------- kernels ----------------
    def _fd_kernel(xt_ref, c_ref, se_ref, seo_ref, ob_ref, out_ref,
                   acc_ref, acc2_ref, *, nk, block_size, budget,
                   out_dtype, fold, mode):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            acc2_ref[:] = jnp.zeros_like(acc2_ref)

        B = block_size
        assert B == 16
        p2 = c_ref[:]                              # (TN//4, TK) int8
        tn4, tk = p2.shape
        tnb = tn4 // 4
        pi = p2.astype(jnp.int32)
        se = se_ref[:].astype(jnp.int32)           # (tnb, tk)
        sc = _exp2_i32(se - fold)                  # (tnb, tk) f32
        sc4 = jnp.broadcast_to(sc[:, None, :], (tnb, 4, tk)
                               ).reshape(tn4, tk).astype(jnp.bfloat16)
        xt = xt_ref[:]                             # (TM, TK) bf16

        # outlier side-band decode (all on (tnb, tk) sixteenth-size)
        seo = seo_ref[:].astype(jnp.int32)
        osc = _exp2_i32(seo - se - 1).astype(jnp.bfloat16)
        slots = []
        for s in range(budget):
            b = ob_ref[s].astype(jnp.int32) & 0xFF
            pos = b >> 4
            e = (b >> 1) & 3
            m = b & 1
            sgn = (b >> 3) & 1
            mag = lax.shift_left(m + 2 * jnp.minimum(e, 1),
                                 jnp.maximum(e - 1, 0))
            val = (mag * (1 - 2 * sgn)).astype(jnp.bfloat16) * osc
            slots.append((pos, val))

        # inlier fields: byte row (b*4+r) field i -> n = b*16 + 4i + r.
        # acc rows are FIELD-MAJOR: row = i*tn4 + b*4 + r.
        for i in range(4):
            if mode in ("out_only", "out_pdot"):
                break
            f = lax.shift_right_arithmetic(
                lax.shift_left(pi, 30 - 2 * i), 30)
            wi = f.astype(jnp.bfloat16) * sc4
            if mode == "in_dot1":
                # skip scale: measures extract+convert+dot alone
                wi = f.astype(jnp.bfloat16)
            if mode == "fd_sc" and budget:
                r4 = lax.broadcasted_iota(jnp.int32, (tn4, tk), 0) % 4
                for pos, val in slots:
                    posq = jnp.broadcast_to(
                        pos[:, None, :], (tnb, 4, tk)).reshape(tn4, tk)
                    valq = jnp.broadcast_to(
                        val[:, None, :], (tnb, 4, tk)).reshape(tn4, tk)
                    hit = (posq >> 2 == i) & ((posq & 3) == r4)
                    wi = wi + jnp.where(hit, valq, jnp.bfloat16(0))
            acc_ref[i * tn4:(i + 1) * tn4] += lax.dot_general(
                wi, xt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        if mode in ("pdot", "pdot3", "out_pdot") and budget:
            # position-major one-hot planes: A[p*tnb + b, k] =
            # sum_s [pos_s[b,k]==p] * val_s[b,k]. All compares run on
            # the SIXTEENTH-size (tnb, tk) side-band arrays (pdot) or a
            # replication-broadcast 3D (16, tnb, tk) (pdot3) — never on
            # expanded full-size tiles — and the MXU does the expansion
            # via one extra dot into a p-major accumulator.
            if mode == "pdot3":
                pp = lax.broadcasted_iota(jnp.int32, (16, tnb, tk), 0)
                A = None
                for pos, val in slots:
                    a = jnp.where(pos[None] == pp, val[None],
                                  jnp.bfloat16(0))
                    A = a if A is None else A + a
                A2 = A.reshape(16 * tnb, tk)
            else:
                rows = []
                for p in range(16):
                    ap = None
                    for pos, val in slots:
                        a = jnp.where(pos == p, val, jnp.bfloat16(0))
                        ap = a if ap is None else ap + a
                    rows.append(ap)
                A2 = jnp.concatenate(rows, axis=0)      # (16*tnb, tk)
            acc2_ref[:] += lax.dot_general(
                A2, xt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif mode == "fd_dot" and budget:
            # one-hot-weighted correction dot, built field-major
            A = None
            ii = lax.broadcasted_iota(jnp.int32, (4, tnb, 4, tk), 0)
            rr = lax.broadcasted_iota(jnp.int32, (4, tnb, 4, tk), 2)
            tgt = 4 * ii + rr
            for pos, val in slots:
                a = jnp.where(pos[None, :, None, :] == tgt,
                              val[None, :, None, :], jnp.bfloat16(0))
                A = a if A is None else A + a
            acc_ref[:] += lax.dot_general(
                A.reshape(tn4 * 4, tk), xt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif mode in ("fd", "out_only") and budget:
            # full-size masked scatter (shipping-kernel style), then one
            # extra dot over just the outlier contribution
            tm = xt.shape[0]
            w2 = jnp.zeros((tn4 * 4, tk), jnp.bfloat16)
            row2 = lax.broadcasted_iota(jnp.int32, (tn4 * 4, tk), 0) % B

            def expand(a):
                return jnp.broadcast_to(
                    a[:, None, :], (tnb, B, tk)).reshape(tn4 * 4, tk)

            for pos, val in slots:
                w2 = w2 + jnp.where(row2 == expand(pos), expand(val),
                                    jnp.bfloat16(0))
            yo = lax.dot_general(w2, xt, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
            # natural (b*16+p) order -> field-major order
            acc_ref[:] += yo.reshape(tnb, 4, 4, tm).transpose(
                2, 0, 1, 3).reshape(tn4 * 4, tm)

        @pl.when(k == nk - 1)
        def _():
            tm = acc_ref.shape[1]
            y = acc_ref[:].reshape(4, tnb, 4, tm).transpose(
                1, 0, 2, 3).reshape(tn4 * 4, tm)
            if mode in ("pdot", "pdot3", "out_pdot"):
                y = y + acc2_ref[:].reshape(16, tnb, tm).transpose(
                    1, 0, 2).reshape(tn4 * 4, tm)
            out_ref[:] = y.astype(out_dtype)

    def fd_matmul(x, w, mode, out_dtype=jnp.float32, tk0=512, tn0=512):
        B = w.block_size
        budget = w.budget
        fold = _scale_fold(w.elem_format)
        lead = x.shape[:-1]
        Np4, K = w.codes.shape
        Np = Np4 * 4
        N = w.orig_n
        x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
        M = x2.shape[0]
        TM = _round_up(max(M, 1), 8)
        TN = min(tn0, Np)
        TK = tk0
        while TK > K and TK > 128:
            TK //= 2
        Mp, Np2, Kp = _round_up(M, TM), _round_up(Np, TN), _round_up(K, TK)
        x2 = jnp.pad(x2, ((0, Mp - M), (0, Kp - K)))
        codes = jnp.pad(w.codes, ((0, (Np2 - Np) // 4), (0, Kp - K)))
        se = jnp.pad(w.scale_exp, ((0, (Np2 - Np) // B), (0, Kp - K)))
        seo = jnp.pad(w.out_scale_exp,
                      ((0, (Np2 - Np) // B), (0, Kp - K)))
        ob = jnp.pad(w.out_byte, ((0, 0), (0, (Np2 - Np) // B),
                                  (0, Kp - K)))
        nk = Kp // TK
        grid = (Np2 // TN, nk)
        tnb = TN // B
        out = pl.pallas_call(
            functools.partial(_fd_kernel, nk=nk, block_size=B,
                              budget=budget, fold=fold,
                              out_dtype=out_dtype, mode=mode),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, TK), lambda i, k: (0, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TN // 4, TK), lambda i, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tnb, TK), lambda i, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tnb, TK), lambda i, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((budget, tnb, TK), lambda i, k: (0, i, k),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TN, TM), lambda i, k: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Np2, Mp), out_dtype),
            scratch_shapes=[pltpu.VMEM((TN, TM), jnp.float32),
                            pltpu.VMEM((TN, TM), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=2 * Mp * Np2 * Kp,
                bytes_accessed=(Np2 * Kp) // 4 + 3 * (Np // B) * Kp
                + Mp * Kp * 2 + Np2 * Mp * 4,
                transcendentals=0),
        )(x2, codes, se, seo, ob)
        return out[:N, :M].T.reshape(lead + (N,))

    # ---------------- setup ----------------
    K, N, M, ITERS = 4096, 4096, 8, 128
    rng = np.random.default_rng(0)
    W = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
    W[rng.random((K, N)) < 0.03] *= 10.0

    print("packing...", flush=True)
    t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        BUDGET = 2
        _, _, dec = quantize_mx_outlier_hessian_decisions(
            jnp.asarray(W.T), 8, 8, "int2", "fp4_e2m1", "max", 2.0, [0],
            16, max_outliers_per_block=BUDGET)
        dec["block_size"] = 16
        pnb = pk.pack_outlier_nb(dec, budget=BUDGET)
    dev = jax.devices()[0]
    pnb = jax.device_put(pnb, dev)
    jax.block_until_ready(pnb)
    print(f"packed+on-device {time.perf_counter() - t0:.1f}s", flush=True)
    Wd = jax.device_put(
        jnp.asarray(np.asarray(
            jax.jit(pk.dequantize_outlier_nb, backend="cpu")(
                jax.device_put(pnb, jax.devices("cpu")[0]))),
            jnp.bfloat16).T, dev)
    x0 = jax.device_put(
        jnp.asarray(rng.standard_normal((M, K)).astype(np.float32)), dev)

    # correctness gate (ablation modes are intentionally wrong: skip)
    ref = np.asarray(dequant_matmul_nb_reference(x0, pnb))
    ABLATIONS = {"in_only", "in_dot1", "out_only", "out_pdot"}
    variants = {
        "cur": lambda x: dequant_matmul_nb(x, pnb),
        "pdot": lambda x: fd_matmul(x, pnb, "pdot"),
        "pdot3": lambda x: fd_matmul(x, pnb, "pdot3"),
        "out_pdot": lambda x: fd_matmul(x, pnb, "out_pdot"),
        "pdot_k1024": lambda x: fd_matmul(x, pnb, "pdot", tk0=1024),
        "pdot3_k1024": lambda x: fd_matmul(x, pnb, "pdot3", tk0=1024),
    }
    ok = {}
    for name, f in list(variants.items()):
        try:
            y = np.asarray(f(x0))
            if name in ABLATIONS:
                continue
            err = float(np.max(np.abs(y - ref))) / (
                float(np.max(np.abs(ref))) + 1e-9)
            ok[name] = err < 2e-2
            print(f"{name}: rel_err {err:.2e} ok={ok[name]} "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            if not ok[name]:
                del variants[name]
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            del variants[name]

    def loop(fn):
        @jax.jit
        def run(x):
            def step(x, _):
                y = fn(x)
                return x + jnp.sum(y, axis=1, keepdims=True) * 1e-30, ()
            x, _ = lax.scan(step, x, None, length=ITERS)
            return jnp.sum(x)
        return run

    variants = {"dense": loop(lambda x: lax.dot_general(
        x.astype(jnp.bfloat16), Wd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)),
        **{k: loop(f) for k, f in variants.items()}}
    for name, f in variants.items():
        float(f(x0))
        print(f"warmed {name} {time.perf_counter() - t0:.1f}s", flush=True)

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from bench_outlier_gemv import _device_us_per_iter

    best = {k: 9e9 for k in variants}
    for _ in range(6):
        for k2, f in variants.items():
            t1 = time.perf_counter()
            float(f(x0))
            best[k2] = min(best[k2], time.perf_counter() - t1)
    devt = {k2: _device_us_per_iter(f, x0, ITERS, k2)
            for k2, f in variants.items()}
    nb_bytes = (pnb.codes.size + pnb.scale_exp.size + pnb.out_byte.size
                + pnb.out_scale_exp.size)
    for k2, t in best.items():
        per = t / ITERS
        d = devt.get(k2)
        print(json.dumps({
            "metric": f"nb GEMV {k2} (K={K}, N={N}, M={M})",
            "value": round(per * 1e6, 1), "unit": "us/iter",
            "extra": {"device_us": d,
                      "vs_dense_device": (round(devt["dense"] / d, 3)
                                          if d and devt.get("dense")
                                          else None),
                      "GBps_device": (round(nb_bytes / d / 1e3, 1)
                                      if d and k2 != "dense" else None)},
        }), flush=True)


if __name__ == "__main__":
    main()
