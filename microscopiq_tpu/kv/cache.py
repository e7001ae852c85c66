"""Static-shape KV caches for jitted decode.

The reference's caches grow by concatenation per step
(``Simulated/cache_utils.py:118-157``) and re-compress the whole window
every ``streaming_gap`` tokens (``modeling_llama_new.py:944-1031``,
``StreamCompressedCache.update`` ``streaming_cache_utils.py:310-379``).
Under XLA that is a re-trace per length, so the TPU design uses
preallocated chunked buffers (SURVEY.md §7 hard-part 5):

* tokens land in a small bf16 **residual** window (the KIVI residual /
  streaming-gap semantics: recent tokens stay full precision),
* when the residual fills (every ``gap`` tokens) it is quantized as one
  chunk into the packed store — K per-channel within the chunk (KIVI's
  channel grouping with group_size = gap), V per-token feature groups,
* attention consumes dequantized chunks + the residual with validity
  masks; every shape is static, so one compiled step serves all lengths.

Caches are plain Python objects wrapping a pytree state; ``update`` is
functional (returns full K/V + mask, collects the new state), and the
driver threads ``cache.state`` through the jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Dense cache
# ---------------------------------------------------------------------------
@flax.struct.dataclass
class DenseKVState:
    k: jax.Array          # (L, B, S_max, KVH, hd)
    v: jax.Array
    length: jax.Array     # () int32
    # per-row left-pad count (B,): slot s of row b holds the token with
    # REAL position s - offset[b]; slots < offset[b] are pads and masked.
    # Zeros = the classic equal-length batch. This is the static-shape
    # analog of HF generate's left-padding + attention_mask handling
    # (kv_quant/evaluation_gsm8k.py:267-277 pads "longest"; positions
    # derive from the mask cumsum).
    offset: jax.Array = None


def init_dense_cache(n_layers, batch, max_len, kv_heads, head_dim,
                     dtype=jnp.bfloat16, offset=None) -> DenseKVState:
    shape = (n_layers, batch, max_len, kv_heads, head_dim)
    if offset is None:
        offset = jnp.zeros((batch,), jnp.int32)
    return DenseKVState(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                        jnp.zeros((), jnp.int32), offset)


class DenseDecodeCache:
    """Full-precision ring cache (the TPU analog of HF DynamicCache)."""

    def __init__(self, state: DenseKVState):
        self.state = state
        self._new_k = state.k
        self._new_v = state.v
        self._new_len = state.length

    def update(self, layer_idx: int, k, v, positions, mask):
        st = self.state
        B, S, KVH, hd = k.shape
        # ONE dynamic_update_slice on the full (L, B, S_max, KVH, hd)
        # buffer: writes only the token slot. The previous layer-slice
        # round trip (slice -> DUS -> .at[].set) read AND wrote the
        # whole 11 MB layer every step — 16 us/layer of pure copies on
        # a 12L 8B decode (profiled).
        self._new_k = jax.lax.dynamic_update_slice(
            self._new_k, k[None].astype(st.k.dtype),
            (layer_idx, 0, st.length, 0, 0))
        self._new_v = jax.lax.dynamic_update_slice(
            self._new_v, v[None].astype(st.v.dtype),
            (layer_idx, 0, st.length, 0, 0))
        kl = self._new_k[layer_idx]
        vl = self._new_v[layer_idx]
        new_len = st.length + S
        self._new_len = new_len

        S_max = st.k.shape[2]
        # real position of key slot s in row b is s - offset[b]; pads
        # (negative real position) never attend
        key_real = (jnp.arange(S_max)[None, :]
                    - _offset_of(st, B)[:, None])        # (B, S_max)
        q_pos = positions                                # (B, S)
        mask = (key_real[:, None, :] <= q_pos[..., None]) & \
               (key_real[:, None, :] >= 0) & \
               (jnp.arange(S_max)[None, None, :] < new_len)
        return kl, vl, mask[:, None, :, :]

    def finalize(self) -> DenseKVState:
        return DenseKVState(self._new_k, self._new_v, self._new_len,
                            self.state.offset)


def _offset_of(st, batch: int) -> jax.Array:
    off = getattr(st, "offset", None)
    if off is None:
        return jnp.zeros((batch,), jnp.int32)
    return off


# ---------------------------------------------------------------------------
# Quantized chunked cache (KIVI / GEAR grouped storage)
# ---------------------------------------------------------------------------
@flax.struct.dataclass
class QuantKVState:
    # chunked stores, head-major so the fused attention kernel streams
    # each (gap, hd) chunk contiguously: (L, B, KVH, C, gap, hd) uint8
    kq: jax.Array
    vq: jax.Array
    # K: per-channel scales within each chunk (L, B, KVH, C, hd)
    k_mn: jax.Array
    k_sc: jax.Array
    # V: per-token feature-group scales (L, B, KVH, C, gap, hd//v_group)
    v_mn: jax.Array
    v_sc: jax.Array
    # residual recent-token window (L, B, gap, KVH, hd)
    res_k: jax.Array
    res_v: jax.Array
    length: jax.Array
    # per-row left-pad count (B,) — see DenseKVState.offset. Pads inside
    # a chunk do pollute that chunk's min/max scales, exactly as the
    # reference's compress functions quantize the padded cache
    # (compress_function.py:8-70 has no padding awareness); attention
    # correctness is preserved by the mask.
    offset: jax.Array = None
    # ---- GEAR extensions (None when disabled) ------------------------
    # Per-chunk rank-r bases of the quantization error (GEAR-L,
    # compress_function.py:398-426 / TrueCompressFunction.py:132-163,
    # applied PER CHUNK so chunks stay immutable / static-shape):
    #   err_chunk (gap, KVH*hd) ~= q @ p^T; p is stored split per head
    #   and pre-transposed to the fused kernel's layout.
    # k_p, v_p: (L, B, KVH, C, r, hd); k_q, v_q: (L, B, C, r, gap)
    k_p: Optional[jax.Array] = None
    k_q: Optional[jax.Array] = None
    v_p: Optional[jax.Array] = None
    v_q: Optional[jax.Array] = None
    # Outlier side-band (GEAR-S, TrueCompressFunction.py:95-119): per
    # chunk per head, the 2*out_k extreme values stored exactly; codes
    # quantize the CLEANED chunk (outliers zeroed). Flat index is into
    # the chunk's (gap*hd) row-major window.
    # k_ov, v_ov: (L, B, KVH, C, 2k) f32; k_oi, v_oi: same, int32
    k_ov: Optional[jax.Array] = None
    k_oi: Optional[jax.Array] = None
    v_ov: Optional[jax.Array] = None
    v_oi: Optional[jax.Array] = None


@dataclasses.dataclass(frozen=True)
class QuantKVConfig:
    bits: int = 4
    gap: int = 64            # streaming gap (chunk quantization cadence)
    # V feature group size; >= head_dim means per-token V scales — the
    # serving default, because grouped scales (Gh>1) put a tiny dim on
    # the Mosaic lane axis and pad 64x (measured +93 us/layer/operand in
    # the fused kernel; see ops/pallas/quant_attention.py)
    v_group: int = 128
    # K channel-group size in TOKENS (KIVI group_size,
    # compress_config.py:63-85): 0 = one group per chunk (== gap, the
    # round-1 coupling). Must divide gap. Smaller groups = finer K scales
    # at 16*Gk/gap extra bytes/token (Gk = gap // k_group).
    k_group: int = 0
    # number of recent tokens ALWAYS kept full-precision beyond the
    # in-progress chunk (KIVI residual_length semantics,
    # modeling_llama_new.py:948-1027): the residual window holds
    # residual_len + gap slots and a chunk quantizes only once its
    # tokens are at least residual_len old. 0 = round-1 behavior.
    residual_len: int = 0
    residual_dtype: jnp.dtype = jnp.bfloat16
    # ---- GEAR knobs (compress_config.py rank/loop/left) ---------------
    # rank > 0 turns on per-chunk low-rank error correction (GEAR-L /
    # GEARL-KIVI, compress_function.py:398-426): every folded chunk also
    # stores rank-r bases of its quantization error over the (gap,
    # KVH*hd) token x feature window. loop = power-iteration steps.
    rank: int = 0
    loop: int = 2
    # out_k > 0 turns on the exact outlier side-band (GEAR-S,
    # TrueCompressFunction.py:95-119): the out_k smallest + out_k
    # largest values of each (chunk, head) window are zeroed before
    # quantization and restored exactly on dequant. Static budget — the
    # TPU analog of the reference's `left` fraction
    # (out_k = left * gap * hd / 2).
    out_k: int = 0
    lr_dtype: jnp.dtype = jnp.bfloat16

    def __post_init__(self):
        if self.k_group:
            assert self.gap % self.k_group == 0,                 "k_group must divide gap"
        assert self.residual_len >= 0
        assert self.rank >= 0 and self.out_k >= 0 and self.loop >= 1

    @property
    def kg(self) -> int:
        """Effective K channel-group size (tokens)."""
        return self.k_group or self.gap

    @property
    def n_k_groups(self) -> int:
        return self.gap // self.kg

    @property
    def res_slots(self) -> int:
        """Residual window size: gap in-progress slots + residual_len
        protected recent tokens."""
        return self.gap + self.residual_len

    def n_full(self, length):
        """Chunks quantized after `length` tokens (scalar or vector)."""
        return jnp.maximum(length - self.residual_len, 0) // self.gap

    @property
    def codes_per_byte(self) -> int:
        """Chunk codes are stored sub-byte-packed along the token axis
        (4-bit: 2/byte, 2-bit: 4/byte) — byte row r of a chunk packs the
        codes of tokens r, r + gap/per, ... Unpacking is `per` logical
        shift-extracts plus one sublane concat, never a lane op (the
        same blockwise-interleave trick as the sb4/sb2 GEMM transports;
        ops/packing.py _subbyte_pack)."""
        return {2: 4, 4: 2, 8: 1}[self.bits]


def _pack_codes(codes: jax.Array, per: int, bits: int) -> jax.Array:
    """(..., gap, hd) uint8 values < 2^bits -> (..., gap//per, hd)."""
    if per == 1:
        return codes
    *lead, gap, hd = codes.shape
    c = codes.reshape(*lead, per, gap // per, hd).astype(jnp.uint8)
    out = c[..., 0, :, :]
    for i in range(1, per):
        out = out | (c[..., i, :, :] << (bits * i))
    return out


def _unpack_codes(packed: jax.Array, per: int, bits: int) -> jax.Array:
    """Inverse of :func:`_pack_codes` -> uint8 code values."""
    if per == 1:
        return packed
    mask = (1 << bits) - 1
    fields = [(packed >> (bits * i)) & mask for i in range(per)]
    return jnp.concatenate(fields, axis=-2)


def init_quant_cache(n_layers, batch, max_len, kv_heads, head_dim,
                     cfg: QuantKVConfig = QuantKVConfig(),
                     offset=None) -> QuantKVState:
    assert max_len % cfg.gap == 0
    C = max_len // cfg.gap
    vg = min(cfg.v_group, head_dim)
    assert head_dim % vg == 0, "v_group must divide head_dim"
    G = head_dim // vg
    Gk = cfg.n_k_groups
    # Gk == 1 keeps the round-1 (C, hd) scale layout the fused kernel
    # consumes; Gk > 1 adds a per-chunk group axis (C, Gk, hd)
    kss = ((n_layers, batch, kv_heads, C, head_dim) if Gk == 1
           else (n_layers, batch, kv_heads, C, Gk, head_dim))
    z = jnp.zeros
    shp = (n_layers, batch, kv_heads, C, cfg.gap // cfg.codes_per_byte,
           head_dim)
    if offset is None:
        offset = jnp.zeros((batch,), jnp.int32)
    gear = {}
    if cfg.rank > 0:
        pshape = (n_layers, batch, kv_heads, C, cfg.rank, head_dim)
        qshape = (n_layers, batch, C, cfg.rank, cfg.gap)
        gear.update(k_p=z(pshape, cfg.lr_dtype), k_q=z(qshape, cfg.lr_dtype),
                    v_p=z(pshape, cfg.lr_dtype), v_q=z(qshape, cfg.lr_dtype))
    if cfg.out_k > 0:
        oshape = (n_layers, batch, kv_heads, C, 2 * cfg.out_k)
        gear.update(k_ov=z(oshape, jnp.float32), k_oi=z(oshape, jnp.int32),
                    v_ov=z(oshape, jnp.float32), v_oi=z(oshape, jnp.int32))
    return QuantKVState(
        kq=z(shp, jnp.uint8),
        vq=z(shp, jnp.uint8),
        k_mn=z(kss, jnp.float32),
        k_sc=z(kss, jnp.float32),
        v_mn=z((n_layers, batch, kv_heads, C, cfg.gap, G), jnp.float32),
        v_sc=z((n_layers, batch, kv_heads, C, cfg.gap, G), jnp.float32),
        res_k=z((n_layers, batch, cfg.res_slots, kv_heads, head_dim),
                cfg.residual_dtype),
        res_v=z((n_layers, batch, cfg.res_slots, kv_heads, head_dim),
                cfg.residual_dtype),
        length=z((), jnp.int32),
        offset=offset,
        **gear,
    )


def _per(bits: int) -> int:
    return {2: 4, 4: 2, 8: 1}[bits]


def _quant_chunk_k(chunk: jax.Array, bits: int, group: int = 0):
    """K chunk (B, KVH, nch, gap, hd): per-channel min/max over token
    sub-groups of ``group`` tokens (KIVI channel grouping,
    compress_function.py:41-70; group == gap -> one group per chunk).
    Codes come back sub-byte-packed along the token axis; scales are
    (..., nch, hd) for one group, else (..., nch, Gk, hd)."""
    x = chunk.astype(jnp.float32)
    B, KVH, nch, gap, hd = x.shape
    g = group or gap
    Gk = gap // g
    xg = x.reshape(B, KVH, nch, Gk, g, hd)
    mn = xg.min(axis=4)
    mx = xg.max(axis=4)
    sc = (mx - mn) / (2 ** bits - 1)
    sc = jnp.where(sc == 0, 1.0, sc)
    codes = jnp.clip(jnp.round((xg - mn[..., None, :]) / sc[..., None, :]),
                     0, 2 ** bits - 1).astype(jnp.uint8).reshape(x.shape)
    if Gk == 1:
        mn, sc = mn[..., 0, :], sc[..., 0, :]
    return _pack_codes(codes, _per(bits), bits), mn, sc


def _quant_chunk_v(chunk: jax.Array, bits: int, v_group: int):
    """V chunk (B, KVH, nch, gap, hd): per-token feature groups (groups
    never straddle heads; v_group clamped to hd). Packed like K."""
    B, KVH, nch, gap, hd = chunk.shape
    vg = min(v_group, hd)
    G = hd // vg
    x = chunk.astype(jnp.float32).reshape(B, KVH, nch, gap, G, vg)
    mn = x.min(-1, keepdims=True)
    mx = x.max(-1, keepdims=True)
    sc = (mx - mn) / (2 ** bits - 1)
    sc = jnp.where(sc == 0, 1.0, sc)
    codes = jnp.clip(jnp.round((x - mn) / sc), 0, 2 ** bits - 1
                     ).astype(jnp.uint8).reshape(chunk.shape)
    return (_pack_codes(codes, _per(bits), bits), mn[..., 0], sc[..., 0])


def _dequant_k(codes, mn, sc, dtype, bits: int = 4):
    """(B, KVH, C, gap//per, hd) packed codes; scales (B, KVH, C, hd) or
    (B, KVH, C, Gk, hd) for sub-chunk K groups."""
    codes = _unpack_codes(codes, _per(bits), bits)
    if mn.ndim == codes.ndim:                  # grouped: (..., C, Gk, hd)
        B, KVH, C, gap, hd = codes.shape
        Gk = mn.shape[-2]
        x = codes.astype(jnp.float32).reshape(B, KVH, C, Gk, gap // Gk, hd)
        x = x * sc[..., None, :] + mn[..., None, :]
        return x.reshape(codes.shape).astype(dtype)
    return (codes.astype(jnp.float32) * sc[..., None, :]
            + mn[..., None, :]).astype(dtype)


def _dequant_v(codes, mn, sc, v_group, dtype, bits: int = 4):
    codes = _unpack_codes(codes, _per(bits), bits)
    B, KVH, C, gap, hd = codes.shape
    vg = min(v_group, hd)
    G = hd // vg
    x = codes.astype(jnp.float32).reshape(B, KVH, C, gap, G, vg)
    x = x * sc[..., None] + mn[..., None]
    return x.reshape(codes.shape).astype(dtype)


# ---------------------------------------------------------------------------
# GEAR chunk codecs: exact outlier side-band + low-rank error bases
# ---------------------------------------------------------------------------
def _extract_outliers(chunk: jax.Array, k_out: int):
    """Zero the k_out smallest + k_out largest values of each
    (batch, head, chunk) window (GEAR-S semantics,
    TrueCompressFunction.py:95-107, with a per-(chunk, head) static
    budget instead of the reference's whole-tensor fraction — the
    static-shape TPU equivalent of ``left = 2*k_out/(gap*hd)``).

    chunk: (B, KVH, nch, gap, hd) f32.
    Returns (cleaned, vals (B, KVH, nch, 2k), idx int32 same shape) —
    idx is flat into the chunk's row-major (gap*hd) window."""
    B, KVH, nch, gap, hd = chunk.shape
    flat = chunk.reshape(B, KVH, nch, gap * hd)
    sval, sidx = jax.lax.top_k(-flat, k_out)
    lval, lidx = jax.lax.top_k(flat, k_out)
    vals = jnp.concatenate([-sval, lval], axis=-1)
    idx = jnp.concatenate([sidx, lidx], axis=-1)
    cleaned = _scatter_chunk_flat(flat, idx, jnp.zeros_like(vals))
    return cleaned.reshape(chunk.shape), vals, idx


def _scatter_chunk_flat(flat: jax.Array, idx: jax.Array, vals: jax.Array
                        ) -> jax.Array:
    """flat (..., N).at[..., idx].set(vals) with batched (..., 2k)
    indices — one vmapped row scatter (2k is small and static)."""
    lead = flat.shape[:-1]
    f2 = flat.reshape(-1, flat.shape[-1])
    i2 = idx.reshape(-1, idx.shape[-1])
    v2 = vals.reshape(-1, vals.shape[-1]).astype(flat.dtype)
    out = jax.vmap(lambda row, i, v: row.at[i].set(v))(f2, i2, v2)
    return out.reshape(lead + flat.shape[-1:])


def _orthonormalize(x: jax.Array) -> jax.Array:
    """Orthonormal basis of the columns of x (..., n, r) — thin QR, as
    in the reference (TrueCompressFunction.py:132-163). Power iteration
    collapses columns toward the top singular vector, so a Gram/Cholesky
    shortcut goes singular; QR handles the rank-deficient case. Runs
    only at chunk-fold time (lax.cond-gated) on (n, r<=8) panels."""
    q, _ = jnp.linalg.qr(x)
    return q


def _lowrank_chunk(err: jax.Array, rank: int, loop: int):
    """Rank-r bases of per-chunk error (B, nch, gap, F) -> (p, q) with
    err ~= q @ p^T (true_poweriteration semantics applied per chunk;
    seedless: the iteration starts from a fixed quasi-random basis so
    decode steps stay deterministic and key-free)."""
    B, nch, gap, F = err.shape
    e = err.astype(jnp.float32)
    # fixed start: F x r slice of a deterministic low-discrepancy matrix
    i = jnp.arange(F, dtype=jnp.float32)[:, None]
    j = jnp.arange(rank, dtype=jnp.float32)[None, :]
    p = jnp.cos(i * (j + 1.0) * 0.61803398875) + 1.1
    p = jnp.broadcast_to(p, (B, nch, F, rank))
    q = jnp.zeros((B, nch, gap, rank), jnp.float32)
    for it in range(loop):
        if it == loop - 1:
            p = _orthonormalize(p)
        q = jnp.einsum("bcgf,bcfr->bcgr", e, p)
        if it == loop - 1:
            q = _orthonormalize(q)
        p = jnp.einsum("bcgf,bcgr->bcfr", e, q)
    return p, q


def _gear_compress_chunk(chunk: jax.Array, codes, mn, sc, dequant_fn,
                         cfg: "QuantKVConfig"):
    """Side-band pieces for a just-quantized chunk: low-rank bases of
    the residual quantization error (storage layouts: p (B, KVH, nch,
    r, hd), q (B, nch, r, gap)). ``chunk`` must already be CLEANED
    (outliers zeroed) — error at outlier positions is zeroed by
    construction because the side-band restores those values exactly."""
    B, KVH, nch, gap, hd = chunk.shape
    deq = dequant_fn(codes, mn, sc)
    err = chunk.astype(jnp.float32) - deq.astype(jnp.float32)
    # (B, KVH, nch, gap, hd) -> (B, nch, gap, KVH*hd): feature index is
    # kvh*hd + d, matching the reference's (H, D) flatten order
    ef = err.transpose(0, 2, 3, 1, 4).reshape(B, nch, gap, KVH * hd)
    p, q = _lowrank_chunk(ef, cfg.rank, cfg.loop)
    # p (B, nch, F, r) -> (B, KVH, nch, r, hd); q -> (B, nch, r, gap)
    ps = p.reshape(B, nch, KVH, hd, cfg.rank).transpose(0, 2, 1, 4, 3)
    qs = q.transpose(0, 1, 3, 2)
    return ps.astype(cfg.lr_dtype), qs.astype(cfg.lr_dtype)


def _apply_gear(deq: jax.Array, p, q, ov, oi, cfg: "QuantKVConfig"
                ) -> jax.Array:
    """Apply the GEAR side-band to dequantized chunks.

    deq: (B, KVH, C, gap, hd); p: (B, KVH, C, r, hd); q: (B, C, r, gap);
    ov/oi: (B, KVH, C, 2k). Low-rank error first (additive), outliers
    last (exact overwrite), mirroring true_gear_decompress
    (TrueCompressFunction.py:190-217)."""
    B, KVH, C, gap, hd = deq.shape
    x = deq.astype(jnp.float32)
    if cfg.rank > 0 and p is not None:
        x = x + jnp.einsum("bcrg,bkcrd->bkcgd", q.astype(jnp.float32),
                           p.astype(jnp.float32))
    if cfg.out_k > 0 and ov is not None:
        flat = x.reshape(B, KVH, C, gap * hd)
        flat = _scatter_chunk_flat(flat, oi, ov)
        x = flat.reshape(deq.shape)
    return x.astype(deq.dtype)


def _compress_chunks(kc: jax.Array, vc: jax.Array, cfg: QuantKVConfig,
                     gate: Optional[jax.Array] = None):
    """Quantize head-major chunks (B, KVH, nch, gap, hd) and build every
    store piece — codes/scales plus, when configured, the GEAR outlier
    side-band and low-rank error bases. Returns {name: array} in storage
    layouts (no leading L axis).

    ``gate``: decode-step fold predicate. The plain KIVI quant is cheap
    enough to run unconditionally (the caller predicates the write), but
    the GEAR side-band math (top_k sort + power iteration + Cholesky)
    is not — with gear on, the whole compute rides a lax.cond so
    non-fold decode steps pay nothing. Operands are one small chunk, so
    the cond carries no big buffers (cf. the module design note)."""
    def compute(ops):
        kc, vc = ops
        out = {}
        kc = kc.astype(jnp.float32)
        vc = vc.astype(jnp.float32)
        if cfg.out_k > 0:
            kc, out["k_ov"], out["k_oi"] = _extract_outliers(kc, cfg.out_k)
            vc, out["v_ov"], out["v_oi"] = _extract_outliers(vc, cfg.out_k)
        kq, kmn, ksc = _quant_chunk_k(kc, cfg.bits, cfg.kg)
        vq, vmn, vsc = _quant_chunk_v(vc, cfg.bits, cfg.v_group)
        out.update(kq=kq, k_mn=kmn, k_sc=ksc, vq=vq, v_mn=vmn, v_sc=vsc)
        if cfg.rank > 0:
            out["k_p"], out["k_q"] = _gear_compress_chunk(
                kc, kq, kmn, ksc,
                lambda c, m, s: _dequant_k(c, m, s, jnp.float32, cfg.bits),
                cfg)
            out["v_p"], out["v_q"] = _gear_compress_chunk(
                vc, vq, vmn, vsc,
                lambda c, m, s: _dequant_v(c, m, s, cfg.v_group,
                                           jnp.float32, cfg.bits), cfg)
        return out

    if gate is None or (cfg.rank == 0 and cfg.out_k == 0):
        return compute((kc, vc))
    shapes = jax.eval_shape(compute, (kc, vc))
    zeros = lambda ops: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    return jax.lax.cond(gate, compute, zeros, (kc, vc))


# chunk-axis position of each store piece in its FULL (L-leading) buffer
_CHUNK_AXIS = {"kq": 3, "k_mn": 3, "k_sc": 3, "vq": 3, "v_mn": 3,
               "v_sc": 3, "k_p": 3, "v_p": 3, "k_ov": 3, "k_oi": 3,
               "v_ov": 3, "v_oi": 3, "k_q": 2, "v_q": 2}

_GEAR_FIELDS = ("k_p", "k_q", "v_p", "v_q", "k_ov", "k_oi", "v_ov",
                "v_oi")


def _store_fields(cfg: QuantKVConfig):
    base = ["kq", "vq", "k_mn", "k_sc", "v_mn", "v_sc", "res_k", "res_v"]
    if cfg.rank > 0:
        base += ["k_p", "k_q", "v_p", "v_q"]
    if cfg.out_k > 0:
        base += ["k_ov", "k_oi", "v_ov", "v_oi"]
    return base


class QuantizedDecodeCache:
    """4/2-bit grouped KV cache with fp residual window."""

    def __init__(self, state: QuantKVState, cfg: QuantKVConfig):
        self.state = state
        self.cfg = cfg
        self._upd = {f: getattr(state, f) for f in _store_fields(cfg)}
        self._new_len = state.length

    # -- internals ---------------------------------------------------------
    def _ingest_prefill(self, layer_idx, k, v):
        st, cfg = self.state, self.cfg
        B, S, KVH, hd = k.shape
        gap = cfg.gap
        # only tokens at least residual_len old may quantize
        nch = max(S - cfg.residual_len, 0) // gap
        if nch > 0:
            # (B, S', KVH, hd) -> head-major chunks (B, KVH, nch, gap, hd)
            kc = k[:, :nch * gap].reshape(B, nch, gap, KVH, hd
                                          ).transpose(0, 3, 1, 2, 4)
            vc = v[:, :nch * gap].reshape(B, nch, gap, KVH, hd
                                          ).transpose(0, 3, 1, 2, 4)
            for name, val in _compress_chunks(kc, vc, cfg).items():
                buf = self._upd[name]
                self._upd[name] = jax.lax.dynamic_update_slice(
                    buf, val[None].astype(buf.dtype),
                    (layer_idx,) + (0,) * (buf.ndim - 1))
        tail = S - nch * gap
        res_k = jnp.zeros_like(st.res_k[layer_idx])
        res_v = jnp.zeros_like(st.res_v[layer_idx])
        if tail > 0:
            res_k = res_k.at[:, :tail].set(
                k[:, nch * gap:].astype(res_k.dtype))
            res_v = res_v.at[:, :tail].set(
                v[:, nch * gap:].astype(res_v.dtype))
        self._upd["res_k"] = self._upd["res_k"].at[layer_idx].set(res_k)
        self._upd["res_v"] = self._upd["res_v"].at[layer_idx].set(res_v)

    def _ingest_decode(self, layer_idx, k, v):
        """Single-token ingest. All writes are SINGLE-SLOT
        dynamic_update_slices on the full (L, ...) buffers — no whole-
        layer read-modify-write, no lax.cond carrying the big buffers
        (either pattern makes XLA copy the entire cache every step;
        measured ~10 ms/step of copies on an 8B 4k-context decode)."""
        st, cfg = self.state, self.cfg
        gap = cfg.gap
        nfull_old = cfg.n_full(st.length)
        slot = st.length - nfull_old * gap        # == length % gap at
        li = layer_idx                            # residual_len == 0
        self._upd["res_k"] = jax.lax.dynamic_update_slice(
            self._upd["res_k"], k[None].astype(st.res_k.dtype),
            (li, 0, slot, 0, 0))
        self._upd["res_v"] = jax.lax.dynamic_update_slice(
            self._upd["res_v"], v[None].astype(st.res_v.dtype),
            (li, 0, slot, 0, 0))

        new_len = st.length + 1
        nfull_new = cfg.n_full(new_len)
        chunk_ready = nfull_new > nfull_old
        chunk_idx = jnp.maximum(nfull_new - 1, 0)

        # quantize the residual window's oldest `gap` slots every step;
        # the write below is predicated so it only lands on fold steps
        rk = self._upd["res_k"][li, :, :gap].transpose(0, 2, 1, 3)[:, :, None]
        rv = self._upd["res_v"][li, :, :gap].transpose(0, 2, 1, 3)[:, :, None]
        pieces = _compress_chunks(rk, rv, cfg, gate=chunk_ready)

        def wr(name, val, chunk_axis):
            buf = self._upd[name]
            val = val[None].astype(buf.dtype)          # lead L dim
            idx = [0] * buf.ndim
            idx[0] = li
            idx[chunk_axis] = chunk_idx
            cur = jax.lax.dynamic_slice(buf, idx, val.shape)
            sel = jnp.where(chunk_ready, val, cur)
            self._upd[name] = jax.lax.dynamic_update_slice(buf, sel, idx)

        for name, val in pieces.items():
            wr(name, val, _CHUNK_AXIS[name])

        if cfg.residual_len > 0:
            # on fold, the residual_len protected tokens (+ the one just
            # written) shift down by gap. Costs one predicated layer-
            # slice rewrite per fold-candidate step; residual_len == 0
            # (the serving default) never takes this path.
            for name in ("res_k", "res_v"):
                buf = self._upd[name]
                lay = buf[li]                          # (B, R, KVH, hd)
                shifted = jnp.concatenate(
                    [lay[:, gap:], jnp.zeros_like(lay[:, :gap])], axis=1)
                sel = jnp.where(chunk_ready, shifted, lay)
                self._upd[name] = buf.at[li].set(sel)

    # -- protocol ----------------------------------------------------------
    def update(self, layer_idx: int, k, v, positions, mask):
        st, cfg = self.state, self.cfg
        B, S, KVH, hd = k.shape
        gap = cfg.gap
        if S > 1:
            self._ingest_prefill(layer_idx, k, v)
        else:
            self._ingest_decode(layer_idx, k, v)
        new_len = st.length + S
        self._new_len = new_len

        # assemble keys/values: dequantized chunks ++ residual
        kq = self._upd["kq"][layer_idx]
        vq = self._upd["vq"][layer_idx]
        C = kq.shape[2]
        k_chunks = _dequant_k(kq, self._upd["k_mn"][layer_idx],
                              self._upd["k_sc"][layer_idx], k.dtype,
                              cfg.bits)
        v_chunks = _dequant_v(vq, self._upd["v_mn"][layer_idx],
                              self._upd["v_sc"][layer_idx], cfg.v_group,
                              k.dtype, cfg.bits)
        if cfg.rank > 0 or cfg.out_k > 0:
            g = lambda n: (self._upd[n][layer_idx]
                           if n in self._upd else None)
            k_chunks = _apply_gear(k_chunks, g("k_p"), g("k_q"),
                                   g("k_ov"), g("k_oi"), cfg)
            v_chunks = _apply_gear(v_chunks, g("v_p"), g("v_q"),
                                   g("v_ov"), g("v_oi"), cfg)
        # (B, KVH, C, gap, hd) -> (B, C*gap, KVH, hd)
        k_chunks = k_chunks.reshape(B, KVH, C * gap, hd).transpose(
            0, 2, 1, 3)
        v_chunks = v_chunks.reshape(B, KVH, C * gap, hd).transpose(
            0, 2, 1, 3)
        k_all = jnp.concatenate(
            [k_chunks, self._upd["res_k"][layer_idx].astype(k.dtype)], 1)
        v_all = jnp.concatenate(
            [v_chunks, self._upd["res_v"][layer_idx].astype(k.dtype)], 1)

        nfull = cfg.n_full(new_len)
        res_len = new_len - nfull * gap
        # slot indices of stored tokens; slot s of row b holds the token
        # with REAL position s - offset[b] (left-padding support)
        chunk_pos = jnp.arange(C * gap)
        chunk_valid = chunk_pos < nfull * gap
        res_pos = nfull * gap + jnp.arange(cfg.res_slots)
        res_valid = jnp.arange(cfg.res_slots) < res_len
        key_slot = jnp.concatenate([chunk_pos, res_pos])
        key_valid = jnp.concatenate([chunk_valid, res_valid])

        key_real = key_slot[None, :] - _offset_of(st, B)[:, None]
        q_pos = positions                                # (B, S)
        m = (key_real[:, None, :] <= q_pos[..., None]) & \
            (key_real[:, None, :] >= 0) & \
            key_valid[None, None, :]
        return k_all, v_all, m[:, None, :, :]

    def ingest_for_fused(self, layer_idx: int, k, v):
        """Decode-step ingest (S=1) for the fused Pallas attention path:
        update residual/chunks, return the FULL state buffers + new
        length. The kernel indexes the layer via a prefetch scalar, so
        no per-layer slice of the cache is ever materialized and the
        dense K/V never exists (see ops/pallas/quant_attention.py).
        With cfg.rank > 0 the tuple grows by the four low-rank basis
        buffers (the kernel folds the correction into logits/output);
        the exact outlier side-band is XLA-path-only."""
        assert self.cfg.n_k_groups == 1 and self.cfg.residual_len == 0,             "fused decode kernel serves the k_group == gap, "             "residual_len == 0 layout; use the XLA path otherwise"
        assert self.cfg.out_k == 0, \
            "fused decode kernel does not scatter the exact outlier " \
            "side-band; use the XLA cache path for GEAR-S configs"
        self._ingest_decode(layer_idx, k, v)
        self._new_len = self.state.length + 1
        names = ("kq", "k_mn", "k_sc", "vq", "v_mn", "v_sc",
                 "res_k", "res_v")
        if self.cfg.rank > 0:
            names += ("k_p", "k_q", "v_p", "v_q")
        full = tuple(self._upd[n] for n in names)
        return full, self._new_len

    def finalize(self) -> QuantKVState:
        return QuantKVState(length=self._new_len,
                            offset=self.state.offset, **self._upd)

    @property
    def compression_ratio(self) -> float:
        cfg = self.cfg
        st = self.state
        KVH, hd = st.res_k.shape[-2:]
        feat = KVH * hd
        bytes_q = (cfg.bits / 8) * feat + \
            8 * feat * cfg.n_k_groups / cfg.gap + 8 * feat / cfg.v_group
        if cfg.rank > 0:
            # per token, K and V each: p (KVH*hd*r / gap) + q (r) elems
            lr_b = jnp.dtype(cfg.lr_dtype).itemsize
            bytes_q += 2 * lr_b * (feat * cfg.rank / cfg.gap + cfg.rank)
        if cfg.out_k > 0:
            # 2k (f32 value + i32 index) per chunk per head, K and V
            bytes_q += 2 * KVH * 2 * cfg.out_k * 8 / cfg.gap
        return (2.0 * feat) / bytes_q


# ---------------------------------------------------------------------------
# Slot-pooled quantized cache (continuous batching x KIVI storage)
# ---------------------------------------------------------------------------
def init_slot_quant_cache(n_layers, n_slots, max_len, kv_heads, head_dim,
                          cfg: QuantKVConfig = QuantKVConfig()
                          ) -> QuantKVState:
    """QuantKVState with a PER-SLOT length vector: each batch slot is an
    independent sequence at its own depth (the continuous-batching
    engine's cache). Shapes are identical to init_quant_cache except
    ``length`` is (n_slots,)."""
    st = init_quant_cache(n_layers, n_slots, max_len, kv_heads, head_dim,
                          cfg)
    return dataclasses.replace(
        st, length=jnp.zeros((n_slots,), jnp.int32))


class SlotQuantizedDecodeCache:
    """Per-slot quantized decode cache (single-token steps).

    Mirrors QuantizedDecodeCache's every-step-quantize/predicated-write
    refold, with per-slot write rows and chunk indices expressed as ONE
    XLA scatter per buffer (advanced-index .at[] with a (B,) index
    vector) — no whole-layer read-modify-write, no lax.cond over big
    buffers (the two patterns that copy the entire cache per step).
    """

    def __init__(self, state: QuantKVState, cfg: QuantKVConfig,
                 active: jax.Array):
        self.state = state
        self.cfg = cfg
        self.active = active                 # (B,) bool
        self._upd = {f: getattr(state, f) for f in _store_fields(cfg)}
        self._new_len = state.length

    def _ingest(self, layer_idx: int, k, v):
        st, cfg = self.state, self.cfg
        B, S, KVH, hd = k.shape
        assert S == 1, "slot cache is decode-only; prefill via " \
                       "SlotQuantPrefillCache"
        gap = cfg.gap
        li = layer_idx
        lengths = st.length                          # (B,)
        b_idx = jnp.arange(B)

        # residual write at each slot's own row
        nfull_old = cfg.n_full(lengths)
        row = lengths - nfull_old * gap
        self._upd["res_k"] = self._upd["res_k"].at[li, b_idx, row].set(
            k[:, 0].astype(st.res_k.dtype))
        self._upd["res_v"] = self._upd["res_v"].at[li, b_idx, row].set(
            v[:, 0].astype(st.res_v.dtype))

        new_len = jnp.where(self.active, lengths + 1, lengths)
        self._new_len = new_len
        nfull_new = cfg.n_full(lengths + 1)
        ready = self.active & (nfull_new > nfull_old)
        cidx = jnp.maximum(nfull_new - 1, 0)

        # quantize every slot's residual window (oldest gap slots) every
        # step; land it only on slots whose window just filled. With
        # GEAR on, the side-band math runs only when ANY slot folds
        # (scalar gate; the per-slot write predication still applies).
        rk = self._upd["res_k"][li, :, :gap].transpose(0, 2, 1, 3)[:, :, None]
        rv = self._upd["res_v"][li, :, :gap].transpose(0, 2, 1, 3)[:, :, None]
        pieces = _compress_chunks(rk, rv, cfg, gate=jnp.any(ready))

        def wr(name, val, chunk_axis):
            buf = self._upd[name]
            val = val[:, :, 0] if chunk_axis == 3 else val[:, 0]
            if chunk_axis == 3:                  # (L, B, KVH, C, ...)
                cur = buf[li, b_idx, :, cidx]    # gather (B, KVH, ...)
            else:                                # (L, B, C, ...) [k_q/v_q]
                cur = buf[li, b_idx, cidx]
            sel = jnp.where(
                ready.reshape((B,) + (1,) * (val.ndim - 1)),
                val.astype(buf.dtype), cur)
            if chunk_axis == 3:
                self._upd[name] = buf.at[li, b_idx, :, cidx].set(sel)
            else:
                self._upd[name] = buf.at[li, b_idx, cidx].set(sel)

        for name, val in pieces.items():
            wr(name, val, _CHUNK_AXIS[name])

        if cfg.residual_len > 0:
            for name in ("res_k", "res_v"):
                buf = self._upd[name]
                lay = buf[li]                          # (B, R, KVH, hd)
                shifted = jnp.concatenate(
                    [lay[:, gap:], jnp.zeros_like(lay[:, :gap])], axis=1)
                sel = jnp.where(
                    ready.reshape(B, 1, 1, 1), shifted, lay)
                self._upd[name] = buf.at[li].set(sel)

    def ingest_for_fused(self, layer_idx: int, k, v):
        """Decode-step ingest for the fused Pallas attention: returns the
        FULL buffers + per-slot new lengths (cf. QuantizedDecodeCache
        .ingest_for_fused; the kernel takes a (B,) length vector)."""
        assert self.cfg.n_k_groups == 1 and self.cfg.residual_len == 0,             "fused decode kernel serves the k_group == gap, "             "residual_len == 0 layout; use the XLA path otherwise"
        assert self.cfg.out_k == 0, \
            "fused decode kernel does not scatter the exact outlier " \
            "side-band; use the XLA cache path for GEAR-S configs"
        self._ingest(layer_idx, k, v)
        names = ("kq", "k_mn", "k_sc", "vq", "v_mn", "v_sc",
                 "res_k", "res_v")
        if self.cfg.rank > 0:
            names += ("k_p", "k_q", "v_p", "v_q")
        full = tuple(self._upd[n] for n in names)
        return full, self._new_len

    def update(self, layer_idx: int, k, v, positions, mask):
        st, cfg = self.state, self.cfg
        B, S, KVH, hd = k.shape
        gap = cfg.gap
        li = layer_idx
        lengths = st.length                          # (B,)
        self._ingest(layer_idx, k, v)

        # assemble dequantized chunks ++ residual, masked per slot
        kq = self._upd["kq"][li]
        vq = self._upd["vq"][li]
        C = kq.shape[2]
        k_chunks = _dequant_k(kq, self._upd["k_mn"][li],
                              self._upd["k_sc"][li], k.dtype, cfg.bits)
        v_chunks = _dequant_v(vq, self._upd["v_mn"][li],
                              self._upd["v_sc"][li], cfg.v_group, k.dtype,
                              cfg.bits)
        if cfg.rank > 0 or cfg.out_k > 0:
            g = lambda n: self._upd[n][li] if n in self._upd else None
            k_chunks = _apply_gear(k_chunks, g("k_p"), g("k_q"),
                                   g("k_ov"), g("k_oi"), cfg)
            v_chunks = _apply_gear(v_chunks, g("v_p"), g("v_q"),
                                   g("v_ov"), g("v_oi"), cfg)
        k_chunks = k_chunks.reshape(B, KVH, C * gap, hd).transpose(
            0, 2, 1, 3)
        v_chunks = v_chunks.reshape(B, KVH, C * gap, hd).transpose(
            0, 2, 1, 3)
        k_all = jnp.concatenate(
            [k_chunks, self._upd["res_k"][li].astype(k.dtype)], 1)
        v_all = jnp.concatenate(
            [v_chunks, self._upd["res_v"][li].astype(k.dtype)], 1)

        nfull = cfg.n_full(lengths)                  # (B,) BEFORE this tok
        res_len = lengths - nfull * gap + 1          # incl. just-written
        R = cfg.res_slots
        chunk_pos = jnp.arange(C * gap)[None, :]     # (1, C*gap)
        chunk_valid = chunk_pos < (nfull * gap)[:, None]
        res_pos = (nfull * gap)[:, None] + jnp.arange(R)[None, :]
        res_valid = jnp.arange(R)[None, :] < res_len[:, None]
        key_pos = jnp.concatenate([chunk_pos.repeat(B, 0), res_pos], 1)
        key_valid = jnp.concatenate([chunk_valid, res_valid], 1)

        q_pos = positions                            # (B, 1)
        m = (key_pos[:, None, :] <= q_pos[..., None]) & \
            key_valid[:, None, :]
        return k_all, v_all, m[:, None, :, :]

    def finalize(self) -> QuantKVState:
        return QuantKVState(length=self._new_len,
                            offset=self.state.offset, **self._upd)


class SlotQuantPrefillCache:
    """Writes one sequence's prompt K/V into slot ``slot``: full chunks
    quantized (predicated on true_len), tail into the residual window."""

    def __init__(self, state: QuantKVState, cfg: QuantKVConfig,
                 slot: jax.Array, true_len: jax.Array):
        self.state = state
        self.cfg = cfg
        self.slot = slot
        self.true_len = true_len
        self._upd = {f: getattr(state, f) for f in _store_fields(cfg)}

    def update(self, layer_idx: int, k, v, positions, mask):
        st, cfg = self.state, self.cfg
        B, S, KVH, hd = k.shape              # B == 1
        gap = cfg.gap
        li = layer_idx
        nch = max(S - cfg.residual_len, 0) // gap
        nfull = cfg.n_full(self.true_len)    # traced: chunks really full

        if nch > 0:
            kc = k[0, :nch * gap].reshape(nch, gap, KVH, hd
                                          ).transpose(2, 0, 1, 3)[None]
            vc = v[0, :nch * gap].reshape(nch, gap, KVH, hd
                                          ).transpose(2, 0, 1, 3)[None]
            pieces = _compress_chunks(kc, vc, cfg)
            cvalid = jnp.arange(nch) < nfull

            def wr(name, val, chunk_axis):
                buf = self._upd[name]
                val = val[0]             # (KVH, nch, ...) or (nch, ...)
                c_idx = jnp.arange(nch)
                if chunk_axis == 3:              # (L, B, KVH, C, ...)
                    cur = buf[li, self.slot, :, c_idx]   # (nch, KVH, ..)
                    val = jnp.moveaxis(val, 0, 1)
                else:                            # (L, B, C, ...) [k_q]
                    cur = buf[li, self.slot, c_idx]      # (nch, ...)
                sel = jnp.where(
                    cvalid.reshape((nch,) + (1,) * (cur.ndim - 1)),
                    val.astype(buf.dtype), cur)
                if chunk_axis == 3:
                    self._upd[name] = buf.at[li, self.slot, :,
                                             c_idx].set(sel)
                else:
                    self._upd[name] = buf.at[li, self.slot,
                                             c_idx].set(sel)

            for name, val in pieces.items():
                wr(name, val, _CHUNK_AXIS[name])

        # tail -> residual rows [0, true_len - nfull*gap); grab an
        # R-sized window starting at nfull*gap (pad to stay in range)
        R = cfg.res_slots
        kp = jnp.pad(k[0], ((0, R), (0, 0), (0, 0)))
        vp = jnp.pad(v[0], ((0, R), (0, 0), (0, 0)))
        tail_k = jax.lax.dynamic_slice(
            kp, (nfull * gap, 0, 0), (R, KVH, hd))
        tail_v = jax.lax.dynamic_slice(
            vp, (nfull * gap, 0, 0), (R, KVH, hd))
        self._upd["res_k"] = jax.lax.dynamic_update_slice(
            self._upd["res_k"],
            tail_k[None, None].astype(st.res_k.dtype), (li, self.slot,
                                                        0, 0, 0))
        self._upd["res_v"] = jax.lax.dynamic_update_slice(
            self._upd["res_v"],
            tail_v[None, None].astype(st.res_v.dtype), (li, self.slot,
                                                        0, 0, 0))

        # prompt attention runs over the raw (pre-quantization) K/V —
        # same as the reference's prefill (quantization applies to the
        # CACHE, the current window attends exactly)
        key_pos = jnp.arange(S)[None, :]
        m = key_pos[:, None, :] <= positions[..., None]
        return k, v, m[:, None, :, :]

    def finalize(self, true_len=None) -> QuantKVState:
        tl = self.true_len if true_len is None else true_len
        return QuantKVState(
            length=self.state.length.at[self.slot].set(tl),
            offset=self.state.offset, **self._upd)
