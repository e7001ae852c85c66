"""GEAR / KIVI KV-cache quantization codecs, pure JAX.

Parity targets:
* Simulated (fake-quant) codecs — ``kv_quant/GEARLM/Simulated/
  compress_function.py``: per-token group asymmetric quant (:8-38),
  per-channel group quant (:41-70), whole-tensor uniform (:73-90),
  dense+sparse outlier (:94-107), GEAR-L (group quant + low-rank error,
  :398-426), GEAR-S (outlier-preserving, :139-309), and the
  ``compress_insert_function`` dispatcher (:428-516) with its
  token-preserving start/locality windows.
* True compression — ``TrueCompression/models/TrueCompressFunction.py``:
  2×4-bit↔uint8 halves packing (:5-48), uniform compress/decompress
  returning (uint8 codes, shape, min, scale) (:51-92), topk outlier
  side-band (:95-119), QR power iteration (:132-163), full GEAR
  compress/decompress (:166-217) and batchwise variants (:220-429).

Note: the reference's simulated low-rank helpers (``fake_poweriteration*``)
are referenced but undefined in its repo (SURVEY.md §4 fidelity gaps); the
semantics here follow its ``true_poweriteration`` and the Halko reference
implementation in ``Simulated/utils.py:7-79``.

Tensors follow the reference layout: (batch, num_heads, seq_len, head_dim).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Simulated (fake-quant) codecs
# ---------------------------------------------------------------------------
def fake_token_group_quant(x: jax.Array, bits: int, group_size: int = 128
                           ) -> jax.Array:
    """Per-token asymmetric group quant (compress_function.py:8-38):
    tokens keep their scales; groups tile the flattened head*dim axis."""
    B, H, S, D = x.shape
    dtype = x.dtype
    xt = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, S, H * D).astype(jnp.float32)
    if (H * D) % group_size != 0:
        raise ValueError("group_size must divide num_heads*head_dim")
    g = xt.reshape(B, S, (H * D) // group_size, group_size)
    mx = g.max(-1, keepdims=True)
    mn = g.min(-1, keepdims=True)
    scale = (mx - mn) / (2 ** bits - 1)
    q = jnp.maximum((g - mn) / scale, 0.0)
    deq = jnp.round(q) * scale + mn
    out = deq.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    return out.astype(dtype)


def fake_channel_group_quant(x: jax.Array, bits: int, group_size: int = 128
                             ) -> jax.Array:
    """Per-channel group quant over groups of `group_size` tokens
    (compress_function.py:41-70). seq_len must divide by group_size."""
    B, H, S, D = x.shape
    dtype = x.dtype
    xt = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, S, H * D).astype(jnp.float32)
    if S % group_size != 0:
        raise ValueError("group_size must divide seq_len")
    g = xt.reshape(B, S // group_size, group_size, H * D)
    mx = g.max(-2, keepdims=True)
    mn = g.min(-2, keepdims=True)
    scale = (mx - mn) / (2 ** bits - 1)
    q = jnp.maximum((g - mn) / scale, 0.0)
    deq = jnp.round(q) * scale + mn
    out = deq.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    return out.astype(dtype)


def fake_uniform_quant(x: jax.Array, bits: int) -> jax.Array:
    """Whole-tensor asymmetric quant (compress_function.py:73-90)."""
    dtype = x.dtype
    flat = x.reshape(-1).astype(jnp.float32)
    mn, mx = flat.min(), flat.max()
    step = (mx - mn) / (2 ** bits - 1)
    deq = jnp.round((flat - mn) / step) * step + mn
    return deq.reshape(x.shape).astype(dtype)


def fake_dense_sparse_quant(x: jax.Array, bits: int, left: float
                            ) -> jax.Array:
    """Uniform quant preserving the `left` fraction of extreme values
    exactly (compress_function.py:94-107)."""
    dtype = x.dtype
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    k = int(n * left / 2)
    if k == 0:
        return fake_uniform_quant(x, bits)
    order = jnp.argsort(flat)
    keep_idx = jnp.concatenate([order[:k], order[-k:]])
    inner = flat[order[k:-k]]
    mn, mx = inner.min(), inner.max()
    step = (mx - mn) / (2 ** bits - 1)
    deq = jnp.round((flat - mn) / step) * step + mn
    deq = deq.at[keep_idx].set(flat[keep_idx])
    return deq.reshape(x.shape).astype(dtype)


def power_iteration_lowrank(err: jax.Array, loop: int, rank: int,
                            key: Optional[jax.Array] = None) -> jax.Array:
    """Rank-`rank` approximation of (B,H,S,D) error via batched power
    iteration with a final QR (the semantics of true_poweriteration,
    TrueCompressFunction.py:132-163, applied in fake mode)."""
    B, H, S, D = err.shape
    e = jnp.transpose(err, (0, 2, 1, 3)).reshape(B, S, H * D).astype(jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(7)
    p = jax.random.uniform(key, (B, H * D, rank), jnp.float32)
    q = None
    for i in range(loop):
        if i == loop - 1:
            p, _ = jnp.linalg.qr(p)
        q = e @ p
        if i == loop - 1:
            q, _ = jnp.linalg.qr(q)
        p = jnp.swapaxes(e, 1, 2) @ q
    approx = q @ jnp.swapaxes(p, 1, 2)
    return approx.reshape(B, S, H, D).transpose(0, 2, 1, 3).astype(err.dtype)


def gearl_token_quant(x, bits, group_size=128, rank=2, loop=3):
    """GEAR-L token variant: group quant + low-rank error correction
    (compress_function.py:398-426 / gearlkivi_tokenQ)."""
    out = fake_token_group_quant(x, bits, group_size)
    err = x.astype(jnp.float32) - out.astype(jnp.float32)
    return (out.astype(jnp.float32) +
            power_iteration_lowrank(err, loop, rank)).astype(x.dtype)


def gearl_channel_quant(x, bits, group_size=128, rank=2, loop=3):
    out = fake_channel_group_quant(x, bits, group_size)
    err = x.astype(jnp.float32) - out.astype(jnp.float32)
    return (out.astype(jnp.float32) +
            power_iteration_lowrank(err, loop, rank)).astype(x.dtype)


def _scatter_last(x, idx, val):
    flat = x.reshape(-1, x.shape[-1])
    out = jax.vmap(lambda row, i, v: row.at[i].set(v))(
        flat, idx.reshape(-1, idx.shape[-1]), val.reshape(-1, val.shape[-1]))
    return out.reshape(x.shape)


def gears_token_quant(x, bits, group_size=128, sparsity=0.02):
    """GEAR-S token variant: extreme values replaced by the mean before
    quantization, restored exactly after (compress_function.py:219-260)."""
    B, H, S, D = x.shape
    k = int(B * H * S * D * sparsity / (B * S) / 2)
    if k == 0:
        return fake_token_group_quant(x, bits, group_size)
    xt = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, S, H * D).astype(jnp.float32)
    sval, sidx = jax.lax.top_k(-xt, k)
    sval = -sval
    lval, lidx = jax.lax.top_k(xt, k)
    mean = jnp.broadcast_to(xt.mean(-1, keepdims=True), xt.shape)
    cleaned = _scatter_last(xt, sidx, jnp.take_along_axis(mean, sidx, -1))
    cleaned = _scatter_last(cleaned, lidx, jnp.take_along_axis(mean, lidx, -1))
    cleaned4 = cleaned.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    q = fake_token_group_quant(cleaned4, bits, group_size)
    qt = jnp.transpose(q, (0, 2, 1, 3)).reshape(B, S, H * D).astype(jnp.float32)
    qt = _scatter_last(qt, sidx, sval)
    qt = _scatter_last(qt, lidx, lval)
    return qt.reshape(B, S, H, D).transpose(0, 2, 1, 3).astype(x.dtype)


def gears_channel_quant(x, bits, group_size=128, sparsity=0.02):
    B, H, S, D = x.shape
    k = int(B * H * S * D * sparsity / (B * S) / 2)
    if k == 0:
        return fake_channel_group_quant(x, bits, group_size)
    xt = jnp.transpose(x, (0, 1, 3, 2)).reshape(B, H * D, S).astype(jnp.float32)
    sval, sidx = jax.lax.top_k(-xt, k)
    sval = -sval
    lval, lidx = jax.lax.top_k(xt, k)
    mean = jnp.broadcast_to(xt.mean(-1, keepdims=True), xt.shape)
    cleaned = _scatter_last(xt, sidx, jnp.take_along_axis(mean, sidx, -1))
    cleaned = _scatter_last(cleaned, lidx, jnp.take_along_axis(mean, lidx, -1))
    cleaned4 = cleaned.reshape(B, H, D, S).transpose(0, 1, 3, 2)
    q = fake_channel_group_quant(cleaned4, bits, group_size)
    qt = jnp.transpose(q, (0, 1, 3, 2)).reshape(B, H * D, S).astype(jnp.float32)
    qt = _scatter_last(qt, sidx, sval)
    qt = _scatter_last(qt, lidx, lval)
    return qt.reshape(B, H, D, S).transpose(0, 1, 3, 2).astype(x.dtype)


def gearsl_token_quant(x, bits, group_size=128, sparsity=0.02, rank=2,
                       loop=3):
    """GEAR (S+L): outlier preservation + group quant + low-rank error
    (gearslkivi_tokenQ_new, compress_function.py:259-265)."""
    out = gears_token_quant(x, bits, group_size, sparsity)
    err = x.astype(jnp.float32) - out.astype(jnp.float32)
    return (out.astype(jnp.float32) +
            power_iteration_lowrank(err, loop, rank)).astype(x.dtype)


def gearsl_channel_quant(x, bits, group_size=128, sparsity=0.02, rank=2,
                         loop=3):
    out = gears_channel_quant(x, bits, group_size, sparsity)
    err = x.astype(jnp.float32) - out.astype(jnp.float32)
    return (out.astype(jnp.float32) +
            power_iteration_lowrank(err, loop, rank)).astype(x.dtype)


def compress_insert(key_states: jax.Array, value_states: jax.Array,
                    config, layer_idx: int
                    ) -> Tuple[jax.Array, jax.Array]:
    """The compress_insert_function dispatcher (compress_function.py:428-516):
    applies the configured codec to the [start, -locality) token window."""
    B, H, S, D = key_states.shape
    method = config.compress_method[layer_idx]
    bits = config.quantize_bit[layer_idx]
    group = config.group_size[layer_idx]
    if config.token_preserving[layer_idx]:
        start = int(config.start_saving[layer_idx] * S)
        loc = int(config.locality_saving[layer_idx] * S)
    else:
        start, loc = 0, -S
    sl = slice(start, -loc if loc > 0 else None)

    def apply(codec, x, *a):
        win = x[:, :, sl, :]
        return x.at[:, :, sl, :].set(codec(win, *a))

    if method == "channelQfixed":
        key_states = apply(fake_channel_group_quant, key_states, bits, S)
        value_states = apply(fake_channel_group_quant, value_states, bits, S)
    elif method == "tokenQfixed":
        key_states = apply(fake_token_group_quant, key_states, bits, H * D)
        value_states = apply(fake_token_group_quant, value_states, bits, H * D)
    elif method == "kcvtQfixed":
        key_states = apply(fake_channel_group_quant, key_states, bits, S)
        value_states = apply(fake_token_group_quant, value_states, bits, H * D)
    elif method == "KIVI":
        key_states = apply(fake_channel_group_quant, key_states, bits, group)
        value_states = apply(fake_token_group_quant, value_states, bits, group)
    elif method == "GEARL-KIVI":
        rank, loop = config.rank[layer_idx], config.loop[layer_idx]
        key_states = apply(gearl_channel_quant, key_states, bits, group,
                           rank, loop)
        value_states = apply(gearl_token_quant, value_states, bits, group,
                             rank, loop)
    elif method == "GEARS-KIVI":
        sp = config.left[layer_idx]
        key_states = apply(gears_channel_quant, key_states, bits, group, sp)
        value_states = apply(gears_token_quant, value_states, bits, group, sp)
    elif method == "Flexgen":
        res = S % group
        sl2 = slice(0, -res if res > 0 else None)
        win = key_states[:, :, sl2, :]
        key_states = key_states.at[:, :, sl2, :].set(
            fake_channel_group_quant(win, bits, group))
        win = value_states[:, :, sl2, :]
        value_states = value_states.at[:, :, sl2, :].set(
            fake_channel_group_quant(win, bits, group))
    elif method is None or method == "None":
        pass
    else:
        raise ValueError(f"unknown compress_method {method}")
    return key_states, value_states


# ---------------------------------------------------------------------------
# True compression (packed storage)
# ---------------------------------------------------------------------------
class CompressedTensor(NamedTuple):
    """Packed buffer + metadata (TrueCompressFunction.py:51-92 tuple)."""
    codes: jax.Array          # uint8 (4-bit: halves-packed)
    shape: tuple
    mn: jax.Array
    scale: jax.Array
    bits: int


def pack_4bit_halves(u8: jax.Array) -> jax.Array:
    """Reference layout (TrueCompressFunction.py:5-15): first half of the
    flat array in the low nibble, second half in the high nibble."""
    n = u8.shape[0]
    half = n // 2
    return (u8[:half] + u8[half:] * 16).astype(jnp.uint8)


def unpack_4bit_halves(packed: jax.Array) -> jax.Array:
    lo = packed % 16
    hi = packed // 16
    return jnp.concatenate([lo, hi], 0)


def true_uniform_compress(x: jax.Array, bits: int) -> CompressedTensor:
    if bits not in (8, 4):
        raise ValueError("quantize_bit should be 8 or 4")
    shape = x.shape
    flat = x.reshape(-1).astype(jnp.float32)
    mn, mx = flat.min(), flat.max()
    scale = (mx - mn) / (2 ** bits - 1)
    q = jnp.round((flat - mn) / scale).astype(jnp.uint8)
    if bits == 4:
        q = pack_4bit_halves(q)
    return CompressedTensor(q, shape, mn, scale, bits)


def true_uniform_decompress(c: CompressedTensor, dtype=jnp.float32
                            ) -> jax.Array:
    q = c.codes
    if c.bits == 4:
        q = unpack_4bit_halves(q)
    return (q.astype(jnp.float32) * c.scale + c.mn).reshape(c.shape).astype(dtype)


class GearCompressed(NamedTuple):
    base: CompressedTensor
    out_values: jax.Array
    out_indices: jax.Array
    p: jax.Array             # (B, H*D, rank)
    q: jax.Array             # (B, S, rank)


def true_outlier_compress(x: jax.Array, bits: int, left: float):
    """(codes, shape, mn, scale, values, indices)
    (TrueCompressFunction.py:95-107)."""
    shape = x.shape
    flat = x.reshape(-1)
    k = int(flat.shape[0] * left / 2)
    sval, sidx = jax.lax.top_k(-flat, k)
    sval = -sval
    lval, lidx = jax.lax.top_k(flat, k)
    vals = jnp.concatenate([sval, lval])
    idxs = jnp.concatenate([sidx, lidx])
    flat = flat.at[idxs].set(0.0)
    base = true_uniform_compress(flat.reshape(shape), bits)
    return base, vals, idxs


def true_outlier_decompress(base: CompressedTensor, vals, idxs,
                            dtype=jnp.float32) -> jax.Array:
    x = true_uniform_decompress(base, dtype).reshape(-1)
    x = x.at[idxs].set(vals.astype(x.dtype))
    return x.reshape(base.shape)


def true_poweriteration(err: jax.Array, loop: int, rank: int,
                        key: Optional[jax.Array] = None
                        ) -> Tuple[jax.Array, jax.Array]:
    """(p, q) bases of the (B,H,S,D) error (TrueCompressFunction.py:132-163)."""
    B, H, S, D = err.shape
    e = jnp.transpose(err, (0, 2, 1, 3)).reshape(B, S, H * D).astype(jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(7)
    p = jax.random.uniform(key, (B, H * D, rank), jnp.float32)
    q = None
    for i in range(loop):
        if i == loop - 1:
            p, _ = jnp.linalg.qr(p)
        q = e @ p
        if i == loop - 1:
            q, _ = jnp.linalg.qr(q)
        p = jnp.swapaxes(e, 1, 2) @ q
    return p.astype(jnp.float16), q.astype(jnp.float16)


def true_gear_compress(x: jax.Array, bits: int, left: float, rank: int,
                       loop: int) -> GearCompressed:
    """Quant + outlier side-band + low-rank quantization-error bases
    (TrueCompressFunction.py:166-188)."""
    shape = x.shape
    flat = x.reshape(-1)
    k = int(flat.shape[0] * left / 2)
    if k > 0:
        sval, sidx = jax.lax.top_k(-flat, k)
        sval = -sval
        lval, lidx = jax.lax.top_k(flat, k)
        vals = jnp.concatenate([sval, lval])
        idxs = jnp.concatenate([sidx, lidx])
        flat = flat.at[idxs].set(0.0)
    else:
        vals = jnp.zeros((0,), x.dtype)
        idxs = jnp.zeros((0,), jnp.int32)
    cleaned = flat.reshape(shape)
    base = true_uniform_compress(cleaned, bits)
    err = (cleaned.astype(jnp.float32) -
           true_uniform_decompress(base).astype(jnp.float32))
    if k > 0:
        err = err.reshape(-1).at[idxs].set(0.0).reshape(shape)
    p, q = true_poweriteration(err, loop, rank)
    return GearCompressed(base, vals, idxs, p, q)


def true_gear_decompress(g: GearCompressed, dtype=jnp.float32) -> jax.Array:
    x = true_uniform_decompress(g.base, jnp.float32).reshape(-1)
    if g.out_values.shape[0] > 0:
        x = x.at[g.out_indices].set(g.out_values.astype(jnp.float32))
    B, H, S, D = g.base.shape
    err = (g.q.astype(jnp.float32) @
           jnp.swapaxes(g.p.astype(jnp.float32), 1, 2))
    err = err.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    return (x.reshape(g.base.shape) + err).astype(dtype)


def true_uniform_compress_batchwise(x: jax.Array, bits: int):
    """Per-batch-element min/scale (TrueCompressFunction.py:220-280)."""
    B = x.shape[0]
    flat = x.reshape(B, -1).astype(jnp.float32)
    mn = flat.min(-1, keepdims=True)
    mx = flat.max(-1, keepdims=True)
    scale = (mx - mn) / (2 ** bits - 1)
    q = jnp.round((flat - mn) / scale).astype(jnp.uint8)
    if bits == 4:
        half = q.shape[1] // 2
        q = (q[:, :half] + q[:, half:] * 16).astype(jnp.uint8)
    return CompressedTensor(q, x.shape, mn, scale, bits)


def true_uniform_decompress_batchwise(c: CompressedTensor,
                                      dtype=jnp.float32) -> jax.Array:
    q = c.codes
    if c.bits == 4:
        q = jnp.concatenate([q % 16, q // 16], 1)
    return (q.astype(jnp.float32) * c.scale + c.mn).reshape(c.shape).astype(dtype)
