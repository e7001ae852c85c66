"""Fused quantized-KV flash-decode attention kernel.

SURVEY.md §7 step 2(c): the serving replacement for assembling a dense
bf16 K/V from the quantized cache every step (the reference's simulated
path dequantizes the whole window in ``compress_insert_function``,
``kv_quant/GEARLM/Simulated/compress_function.py:428-516``; our XLA
fallback `QuantizedDecodeCache.update` does the TPU equivalent). Here the
uint8 KIVI-grouped codes stream HBM→VMEM once, are dequantized tile by
tile, and feed an online-softmax flash decode — KV HBM traffic is the
packed bytes (4x less than bf16 at 4-bit codes in uint8 containers), and
the dense K/V never exists in HBM.

Layout contract (kv/cache.py QuantKVState, head-major):
  kq, vq:      (B, KVH, C, gap, hd)  uint8
  k_mn, k_sc:  (B, KVH, C, hd)       f32   per-chunk per-channel (KIVI-K)
  v_mn, v_sc:  (B, KVH, C, gap, Gh)  f32   per-token feature groups
Residual (recent fp window) tokens are handled in XLA (small) and merged
with the kernel's partial softmax state — the standard flash combine.

Each grid step processes CB chunks (a (CB*gap, hd) key tile) so the DMAs
are hundreds of KB, not the 8 KB a single chunk would be — single-chunk
steps were grid-overhead-bound (measured 2.5x slower end-to-end).

The pure-JAX twin is `quant_attention_decode_reference`, differential-
tested in tests/test_quant_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _expand_rows(a: jax.Array, times: int) -> jax.Array:
    """(R, N) -> (R*times, N), each row repeated `times` consecutively
    (sublane broadcast + regroup, free in Mosaic)."""
    r, n = a.shape
    return jnp.broadcast_to(a[:, None, :], (r, times, n)).reshape(
        r * times, n)


def _chunk_kernel(*refs, ncb: int, cb: int, rep: int, gap: int, hd: int,
                  vg: int, bits: int, scale: float, rank: int = 0):
    if rank > 0:
        (nfull_ref, q_ref, kq_ref, kmn_ref, ksc_ref,
         vq_ref, vmn_ref, vsc_ref, kp_ref, kqb_ref, vp_ref, vqb_ref,
         o_ref, m_ref, l_ref, acc_ref, ms_ref, ls_ref) = refs
    else:
        (nfull_ref, q_ref, kq_ref, kmn_ref, ksc_ref,
         vq_ref, vmn_ref, vsc_ref,
         o_ref, m_ref, l_ref, acc_ref, ms_ref, ls_ref) = refs
    per = {2: 4, 4: 2, 8: 1}[bits]

    def block_diag(bases3):
        """(cb, r, gap) per-chunk bases -> (cb*r, cb*gap) block-diagonal
        operand: chunk c's rows live at sublanes [c*r, (c+1)*r) and its
        lanes at [c*gap, (c+1)*gap). Build = one lane-concat tile + one
        iota-mask select; the result feeds a single MXU dot that applies
        EVERY chunk's rank-r correction at once (GEAR-L per chunk,
        compress_function.py:398-426 folded into the flash loop)."""
        flat = bases3.reshape(cb * rank, gap).astype(jnp.float32)
        tiled = jnp.concatenate([flat] * cb, axis=1)     # (cb*r, T)
        rowc = lax.broadcasted_iota(jnp.int32, tiled.shape, 0) // rank
        colc = lax.broadcasted_iota(jnp.int32, tiled.shape, 1) // gap
        return jnp.where(rowc == colc, tiled, 0.0)

    def unpack(codes3):
        """(cb, gap//per, hd) packed uint8 -> (cb*gap, hd) f32 values
        (token-axis shift-extract + sublane concat; no lane ops)."""
        p = codes3.astype(jnp.int32)
        if per > 1:
            mask = (1 << bits) - 1
            fields = [(p >> (bits * i)) & mask for i in range(per)]
            p = jnp.concatenate(fields, axis=1)
        return p.reshape(cb * gap, hd).astype(jnp.float32)

    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        ms_ref[:] = jnp.full_like(ms_ref, NEG_INF)
        ls_ref[:] = jnp.zeros_like(ls_ref)

    # prefetch layout: [nfull_0 .. nfull_{B-1}] — per-slot depths
    # (continuous batching); a shared length is just a constant vector
    nfull = nfull_ref[pl.program_id(0)]

    @pl.when(c * cb < nfull)
    def _():
        T = cb * gap
        q = q_ref[0, 0].astype(jnp.float32)              # (rep, hd)
        # ---- K tile: packed (CB, gap//per, hd) codes -> (T, hd)
        kc = unpack(kq_ref[0, 0])
        ksc = ksc_ref[0, 0, pl.dslice(c * cb, cb), :]    # (CB, hd)
        kmn = kmn_ref[0, 0, pl.dslice(c * cb, cb), :]
        k = kc * _expand_rows(ksc, gap) + _expand_rows(kmn, gap)
        logits = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (rep, T)
        if rank > 0:
            # K low-rank correction: logits += (q @ P^T) @ BD(q_k).
            # P stacks the tile's per-chunk (r, hd) bases on sublanes;
            # BD applies each chunk's coefficients only to its own gap
            # of key slots. Two small MXU dots for the whole tile.
            P = kp_ref[0, 0].reshape(cb * rank, hd).astype(jnp.float32)
            A = lax.dot_general(
                q, P, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (rep, cb*r)
            logits = logits + lax.dot_general(
                A, block_diag(kqb_ref[0]), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        # mask keys whose chunk is not yet folded
        key_chunk = c * cb + lax.broadcasted_iota(jnp.int32, (rep, T),
                                                  1) // gap
        logits = jnp.where(key_chunk < nfull, logits, NEG_INF)

        m_old = ms_ref[:, :1]                            # (rep, 1)
        m_new = jnp.maximum(m_old, jnp.max(logits, axis=1,
                                           keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(logits - m_new)                      # (rep, T)

        # ---- V tile
        vc = unpack(vq_ref[0, 0])
        Gh = hd // vg
        if Gh == 1:
            # per-token V scales arrive FLAT (1, 1, T): lane-native.
            # Fold them into the probability rows instead of the values:
            # p @ (vc*sc + mn) == (p*sc) @ vc + (p@mn) ⊗ 1. The (gap, Gh)
            # layout would put Gh on the lane dim — Mosaic pads lanes to
            # 128, a measured +93 us/layer for a logically 1.6 MB operand.
            sc_row = vsc_ref[0, 0]                       # (1, T)
            mn_row = vmn_ref[0, 0]
            pv = lax.dot_general(p * sc_row, vc, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
            mn_dot = lax.dot_general(p, mn_row,
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            pv = pv + mn_dot                             # (rep,1) bcast
        else:
            # grouped V scales (v_group < hd): the scales arrive as Gh
            # FLAT lane-native rows (1, 1, Gh, T) — sublane-major, so no
            # tiny lane dim anywhere (the old (gap, Gh) layout was
            # lane-padded 64x by Mosaic, +93 us/layer). Per group the
            # Gh==1 fold applies on the group's lane segment:
            #   p @ (vc*sc_g + mn_g) == (p*sc_g) @ vc  (lanes of g)
            #                           + (p @ mn_g) ⊗ 1_g
            # One stacked (Gh*rep, T) x (T, hd) dot computes every
            # group's folded product; lane masks pick each group's
            # segment — sublane concats/slices and lane selects only.
            vs_rows = vsc_ref[0, 0]                      # (Gh, T)
            vm_rows = vmn_ref[0, 0]
            ps = jnp.concatenate(
                [p * vs_rows[gi:gi + 1] for gi in range(Gh)], axis=0)
            pv_all = lax.dot_general(
                ps, vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (Gh*rep, hd)
            lane = lax.broadcasted_iota(jnp.int32, (rep, hd), 1)
            pv = jnp.zeros((rep, hd), jnp.float32)
            for gi in range(Gh):
                mnd = jnp.sum(p * vm_rows[gi:gi + 1], axis=1,
                              keepdims=True)             # (rep, 1)
                seg = pv_all[gi * rep:(gi + 1) * rep] + mnd
                pv = pv + jnp.where(
                    (lane >= gi * vg) & (lane < (gi + 1) * vg), seg, 0.0)
        if rank > 0:
            # V low-rank correction: pv += (p @ BD(q_v)^T) @ P_v.
            # Unfolded chunks contribute nothing (their p is exp(-inf)
            # = 0 and their bases are zero-initialized).
            coef = lax.dot_general(
                p, block_diag(vqb_ref[0]), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (rep, cb*r)
            Pv = vp_ref[0, 0].reshape(cb * rank, hd).astype(jnp.float32)
            pv = pv + lax.dot_general(
                coef, Pv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        ls_ref[:, :1] = ls_ref[:, :1] * alpha + jnp.sum(p, axis=1,
                                                        keepdims=True)
        ms_ref[:, :1] = m_new

    @pl.when(c == ncb - 1)
    def _():
        o_ref[0, 0] = acc_ref[:]
        m_ref[0, 0] = ms_ref[:, :1]
        l_ref[0, 0] = ls_ref[:, :1]


def _chunk_attention(q, kq, kmn, ksc, vq, vmn, vsc, nfull, scale,
                     gap, bits, lowrank=None, interpret=False):
    """Partial flash state over the quantized chunks of one layer.

    q: (B, KVH, rep, hd) bf16; kq/... are ONE LAYER's cache buffers
    ((B, KVH, C, ...)). The caller slices the layer out BEFORE the call:
    passing the full (L, ...) buffers through the custom-call boundary
    pins them as custom-call operands, which blocks XLA from updating
    the loop-carried cache in place — every dynamic_update_slice then
    copies the whole multi-hundred-MB buffer (measured 23 ms/step of
    `copy` on a 12L 8B-arch decode; the per-layer slice costs ~26 MB).
    Returns (o (B,KVH,rep,hd) f32 unnormalized, m, l (B,KVH,rep,1))."""
    B, KVH, rep, hd = q.shape
    C = kq.shape[2]
    rows = gap // {2: 4, 4: 2, 8: 1}[bits]   # packed code rows per chunk
    Gh = vsc.shape[-1]
    vg = hd // Gh
    if Gh == 1:
        # flatten per-token V scales to a lane-native (B, KVH, 1, C*gap)
        # operand (free XLA reshape; the singleton keeps the block's
        # second-minor dim equal to the array's — a Mosaic tiling rule)
        vmn = vmn.reshape(B, KVH, 1, C * gap)
        vsc = vsc.reshape(B, KVH, 1, C * gap)
    else:
        # grouped scales: Gh flat lane-native rows per (b, g) — Gh on
        # SUBLANES, tokens on lanes. The (..., gap, Gh) storage layout
        # would put Gh on the lane dim (64x Mosaic padding); this
        # transpose is a few KB per layer per step.
        vmn = vmn.transpose(0, 1, 4, 2, 3).reshape(B, KVH, Gh, C * gap)
        vsc = vsc.transpose(0, 1, 4, 2, 3).reshape(B, KVH, Gh, C * gap)
    # flat scale blocks need lane sizes divisible by 128 (or the full
    # array dim); one full-width tile satisfies that for any C and
    # keeps VMEM modest (C*gap*hd codes ~400 KB, f32 temps ~2 MB).
    # With low-rank corrections the tile shrinks so the (cb*r, cb*gap)
    # block-diagonal operand stays small (64 KB at cb=8, r=4, gap=64).
    rank = 0 if lowrank is None else lowrank[0].shape[-2]
    cb = C
    if rank > 0:
        # cb*gap must stay lane-tileable: the grouped V-scale block's
        # minor dim is cb*gap, and Mosaic requires it to be a multiple
        # of 128 or the FULL array dim (C*gap). cb=1 at gap=64 (odd C,
        # e.g. C=9 from maxlen 576) violated this — caught by the r5
        # on-device smoke (SMOKE_r05 qattn/b4_gear_r2), invisible to
        # interpret-mode tests.
        cands = [d for d in (8, 4, 2, 1)
                 if C % d == 0 and (d * gap) % 128 == 0]
        cb = cands[0] if cands else C
    ncb = C // cb
    grid = (B, KVH, ncb)
    kernel = functools.partial(
        _chunk_kernel, ncb=ncb, cb=cb, rep=rep, gap=gap, hd=hd, vg=vg,
        bits=bits, scale=scale, rank=rank)

    in_specs = [
        pl.BlockSpec((1, 1, rep, hd), lambda b, g, c, s: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, cb, rows, hd),
                     lambda b, g, c, s: (b, g, c, 0, 0)),
        pl.BlockSpec((1, 1, C, hd),
                     lambda b, g, c, s: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, C, hd),
                     lambda b, g, c, s: (b, g, 0, 0)),
        pl.BlockSpec((1, 1, cb, rows, hd),
                     lambda b, g, c, s: (b, g, c, 0, 0)),
        pl.BlockSpec((1, 1, Gh, cb * gap),
                     lambda b, g, c, s: (b, g, 0, c)),
        pl.BlockSpec((1, 1, Gh, cb * gap),
                     lambda b, g, c, s: (b, g, 0, c)),
    ]
    operands = [q, kq, kmn, ksc, vq, vmn, vsc]
    if rank > 0:
        kp, kqb, vp, vqb = lowrank
        in_specs += [
            pl.BlockSpec((1, 1, cb, rank, hd),
                         lambda b, g, c, s: (b, g, c, 0, 0)),
            pl.BlockSpec((1, cb, rank, gap),
                         lambda b, g, c, s: (b, c, 0, 0)),
            pl.BlockSpec((1, 1, cb, rank, hd),
                         lambda b, g, c, s: (b, g, c, 0, 0)),
            pl.BlockSpec((1, cb, rank, gap),
                         lambda b, g, c, s: (b, c, 0, 0)),
        ]
        operands += [kp, kqb, vp, vqb]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, rep, hd), lambda b, g, c, s: (b, g, 0, 0)),
            pl.BlockSpec((1, 1, rep, 1), lambda b, g, c, s: (b, g, 0, 0)),
            pl.BlockSpec((1, 1, rep, 1), lambda b, g, c, s: (b, g, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((rep, hd), jnp.float32),
            pltpu.VMEM((rep, 1), jnp.float32),
            pltpu.VMEM((rep, 1), jnp.float32),
        ],
    )
    o, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, rep, hd), jnp.float32),
            jax.ShapeDtypeStruct((B, KVH, rep, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, KVH, rep, 1), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.broadcast_to(jnp.asarray(nfull, jnp.int32), (B,)),
      *operands)
    return o, m, l


def _residual_attention(q, res_k, res_v, res_len, scale):
    """Partial flash state over the fp residual window (XLA; small).

    q (B, KVH, rep, hd); res_k/res_v (B, gap, KVH, hd)."""
    B, gap = res_k.shape[:2]
    k = res_k.astype(jnp.float32).transpose(0, 2, 1, 3)  # (B,KVH,gap,hd)
    v = res_v.astype(jnp.float32).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bgrd,bgtd->bgrt", q.astype(jnp.float32),
                        k) * scale
    res_len = jnp.broadcast_to(jnp.asarray(res_len), (B,))
    valid = (jnp.arange(gap)[None, :] <
             res_len[:, None])[:, None, None, :]
    logits = jnp.where(valid, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m) * valid
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bgrt,bgtd->bgrd", p, v)
    return o, m, l


def quant_attention_decode(q, state_full, layer, length, v_group: int,
                           scale: float, interpret: bool = False):
    """Fused decode attention over one layer of a quantized KV cache.

    q: (B, H, hd) current-step queries (S=1).
    state_full: (kq, k_mn, k_sc, vq, v_mn, v_sc, res_k, res_v) FULL
        cache buffers (leading layer axis, QuantKVState layouts).
    layer: which layer to attend over (static or traced int).
    length: total live tokens INCLUDING the current one (the current
        token's K/V must already be in the residual window). Scalar, or
        (B,) per-slot depths for the continuous-batching slot cache.
    Returns (B, H, hd) attention output in q.dtype.
    """
    kq, kmn, ksc, vq, vmn, vsc, res_k, res_v = state_full[:8]
    lowrank_full = state_full[8:12] if len(state_full) >= 12 else None
    L = kq.shape[0]
    B, H, hd = q.shape
    KVH = kq.shape[2]
    rep = H // KVH
    gap = res_k.shape[2]                   # residual rows = streaming gap
    per = gap // kq.shape[4]               # sub-byte packing of chunk codes
    bits = {1: 8, 2: 4, 4: 2}[per]
    qg = q.reshape(B, KVH, rep, hd)

    nfull = length // gap
    res_len = length - nfull * gap

    # one layer's slices only — full buffers must NOT cross the
    # custom-call boundary (see _chunk_attention docstring)
    sl = lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0,
                                                keepdims=False)
    lowrank = (tuple(sl(a) for a in lowrank_full)
               if lowrank_full is not None else None)
    o1, m1, l1 = _chunk_attention(
        qg.astype(jnp.bfloat16), sl(kq), sl(kmn), sl(ksc), sl(vq),
        sl(vmn), sl(vsc), nfull, scale, gap, bits, lowrank=lowrank,
        interpret=interpret)
    res_k_l = sl(res_k)
    res_v_l = sl(res_v)
    o2, m2, l2 = _residual_attention(qg, res_k_l, res_v_l, res_len,
                                     scale)

    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    o = o1 * a1 + o2 * a2
    l = l1 * a1 + l2 * a2
    out = o / jnp.maximum(l, 1e-30)
    return out.reshape(B, H, hd).astype(q.dtype)


def quant_attention_decode_reference(q, state_full, layer, length,
                                     v_group: int, scale: float):
    """Pure-JAX twin: dequantize everything, masked softmax attention."""
    from ...kv.cache import _dequant_k, _dequant_v

    kq, kmn, ksc, vq, vmn, vsc, res_k, res_v = (
        b[layer] for b in state_full[:8])
    B, H, hd = q.shape
    KVH = kq.shape[1]
    rep = H // KVH
    C, gap = kq.shape[2], res_k.shape[1]
    bits = {1: 8, 2: 4, 4: 2}[gap // kq.shape[3]]
    k_chunks = _dequant_k(kq, kmn, ksc, jnp.float32, bits)
    v_chunks = _dequant_v(vq, vmn, vsc, v_group, jnp.float32, bits)
    if len(state_full) >= 12:
        # GEAR-L low-rank error correction (bases per chunk)
        kp, kqb, vp, vqb = (b[layer] for b in state_full[8:12])
        corr = lambda x, p, qb: x + jnp.einsum(
            "bcrg,bkcrd->bkcgd", qb.astype(jnp.float32),
            p.astype(jnp.float32)).astype(x.dtype)
        k_chunks = corr(k_chunks, kp, kqb)
        v_chunks = corr(v_chunks, vp, vqb)
    k_all = jnp.concatenate(
        [k_chunks.reshape(B, KVH, C * gap, hd),
         res_k.astype(jnp.float32).transpose(0, 2, 1, 3)], axis=2)
    v_all = jnp.concatenate(
        [v_chunks.reshape(B, KVH, C * gap, hd),
         res_v.astype(jnp.float32).transpose(0, 2, 1, 3)], axis=2)

    length = jnp.broadcast_to(jnp.asarray(length), (B,))
    nfull = length // gap
    res_len = length - nfull * gap
    chunk_valid = jnp.arange(C * gap)[None, :] < (nfull * gap)[:, None]
    res_valid = jnp.arange(gap)[None, :] < res_len[:, None]
    valid = jnp.concatenate([chunk_valid, res_valid], axis=1)

    qg = q.reshape(B, KVH, rep, hd).astype(jnp.float32)
    logits = jnp.einsum("bgrd,bgtd->bgrt", qg, k_all) * scale
    logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bgrt,bgtd->bgrd", probs, v_all)
    return out.reshape(B, H, hd).astype(q.dtype)
