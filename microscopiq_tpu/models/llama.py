"""Llama-family model (Llama 2/3, Mistral, Mixtral) in flax linen.

Parity targets: the reference calibrates/evaluates HF Llama-family models
(``llm/llama.py:20-58`` supports llama/mistral/mixtral) and forks HF Llama
for KV compression (``kv_quant/GEARLM/Simulated/modeling_llama_new.py``,
RoPE/GQA at :138-340). This is a from-scratch TPU implementation:
einsum-based GQA attention, RoPE, RMSNorm, SwiGLU MLP, optional MoE
(Mixtral) and sliding-window masking (Mistral).

Quantization modes (selected per call):
* ``mx_specs=None``             — plain bf16/fp32 forward.
* ``mx_specs=...``              — fake-quant MX layers (research parity).
* ``packed params``             — kernels replaced by PackedMX leaves; the
                                  forward uses the fused dequant-GEMM.

The forward supports full-sequence (prefill / perplexity) and single-step
decode with an external KV cache (see microscopiq_tpu.kv).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..ops.packing import PackedMX, PackedMXOutlier, PackedOutlierNB
from ..specs import MxSpecs
from .. import nn as mnn


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    sliding_window: Optional[int] = None       # Mistral
    num_local_experts: int = 0                 # Mixtral (0 = dense)
    num_experts_per_tok: int = 2
    tie_word_embeddings: bool = False
    # model-family knobs (MPT = alibi + ln + gelu; Llama = the defaults).
    # ALiBi rides key-slot indices only (softmax shift-invariance, the HF
    # build_mpt_alibi_tensor trick) so it is exact under left-padding and
    # every KV cache that appends in token order.
    pos_emb: str = "rope"                      # "rope" | "alibi"
    norm_type: str = "rms"                     # "rms" | "ln" (no bias)
    mlp_type: str = "swiglu"                   # "swiglu" | "gelu"
    alibi_bias_max: float = 8.0
    dtype: Any = jnp.float32
    # serving-mode layout: q/k/v and gate/up each merged into one wide
    # projection (one fused dequant-GEMM call instead of three/two —
    # bigger DMAs, fewer kernel launches). Params in this layout come
    # from nn.mapping.fuse_projections; calibration/loading stay unfused.
    fused_projections: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, max_position_embeddings=128)
        base.update(kw)
        return LlamaConfig(**base)

    @staticmethod
    def llama3_8b(**kw) -> "LlamaConfig":
        base = dict(vocab_size=128256, hidden_size=4096,
                    intermediate_size=14336, num_hidden_layers=32,
                    num_attention_heads=32, num_key_value_heads=8,
                    max_position_embeddings=8192, rope_theta=500000.0)
        base.update(kw)
        return LlamaConfig(**base)

    @staticmethod
    def llama2_7b(**kw) -> "LlamaConfig":
        base = dict(vocab_size=32000, hidden_size=4096,
                    intermediate_size=11008, num_hidden_layers=32,
                    num_attention_heads=32, num_key_value_heads=32,
                    max_position_embeddings=4096)
        base.update(kw)
        return LlamaConfig(**base)

    @staticmethod
    def mistral_7b(**kw) -> "LlamaConfig":
        base = dict(vocab_size=32000, hidden_size=4096,
                    intermediate_size=14336, num_hidden_layers=32,
                    num_attention_heads=32, num_key_value_heads=8,
                    max_position_embeddings=4096, sliding_window=4096)
        base.update(kw)
        return LlamaConfig(**base)

    @staticmethod
    def mpt_7b(**kw) -> "LlamaConfig":
        """MPT-7B geometry (HF MptConfig defaults: d_model=4096, n_heads=32,
        n_layers=32, ffn = 4*d, ALiBi, biasless LayerNorm, exact GELU,
        tied embeddings)."""
        base = dict(vocab_size=50432, hidden_size=4096,
                    intermediate_size=16384, num_hidden_layers=32,
                    num_attention_heads=32, num_key_value_heads=32,
                    max_position_embeddings=2048, rms_norm_eps=1e-5,
                    pos_emb="alibi", norm_type="ln", mlp_type="gelu",
                    tie_word_embeddings=True)
        base.update(kw)
        return LlamaConfig(**base)

    @staticmethod
    def tiny_mpt(**kw) -> "LlamaConfig":
        base = dict(vocab_size=256, hidden_size=64, intermediate_size=256,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=4, max_position_embeddings=128,
                    rms_norm_eps=1e-5, pos_emb="alibi", norm_type="ln",
                    mlp_type="gelu", tie_word_embeddings=True)
        base.update(kw)
        return LlamaConfig(**base)


def rope(q, k, positions, head_dim, theta):
    """Rotary embeddings (modeling_llama_new.py:178-240 semantics)."""
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                        dtype=jnp.float32) / head_dim))
    angles = positions[..., None].astype(jnp.float32) * freqs  # (B,S,hd/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]

    def rot(x):
        x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        return jnp.concatenate([x1 * cos - x2 * sin,
                                x2 * cos + x1 * sin], axis=-1).astype(x.dtype)

    return rot(q), rot(k)


def alibi_slopes(num_heads: int, bias_max: float = 8.0) -> jnp.ndarray:
    """Per-head ALiBi slopes, matching HF `build_mpt_alibi_tensor`
    (modeling_mpt.py): geometric over the next power of two, interleave-
    selected when num_heads is not a power of two."""
    import math

    npow = 2 ** math.ceil(math.log2(num_heads))
    base = jnp.arange(1, npow + 1, dtype=jnp.float32) * (bias_max / npow)
    slopes = 1.0 / jnp.exp2(base)
    if npow != num_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[::2]])[:num_heads]
    return slopes


class QLinear(fnn.Module):
    """Linear that dispatches on the parameter's runtime type:
    dense kernel (plain or fake-quant MX) vs PackedMX (fused GEMM)."""

    features: int
    mx_specs: Optional[MxSpecs] = None
    use_bias: bool = False
    dtype: Any = jnp.float32
    use_pallas: bool = True

    @fnn.compact
    def __call__(self, x):
        kernel_init = fnn.initializers.normal(0.02)
        # packed leaves bypass self.param: flax's init-shape check
        # compares the first pytree leaf against (in, features), which
        # only PackedMX's (K, N) codes happen to satisfy
        existing = (self.get_variable("params", "kernel")
                    if self.has_variable("params", "kernel") else None)
        if isinstance(existing, (PackedMX, PackedMXOutlier,
                                 PackedOutlierNB)):
            kernel = existing
        else:
            kernel = self.param("kernel", kernel_init,
                                (x.shape[-1], self.features), self.dtype)
        bias = (self.param("bias", fnn.initializers.zeros,
                           (self.features,), self.dtype)
                if self.use_bias else None)
        # calibration hook: records this linear's input when the caller
        # makes 'intermediates' mutable (the flax analog of the reference's
        # forward-hook Catcher, llm/llama.py:79-95). No-op otherwise.
        self.sow("intermediates", "gptq_input", x,
                 init_fn=lambda: (), reduce_fn=lambda _, v: (v,))
        if isinstance(kernel, (PackedMX, PackedMXOutlier, PackedOutlierNB)):
            from ..ops.pallas import (dequant_matmul,
                                      dequant_matmul_nb,
                                      dequant_matmul_nb_reference,
                                      dequant_matmul_outlier,
                                      dequant_matmul_outlier_reference,
                                      dequant_matmul_reference)
            # Dispatch on token count: at prefill (compute-bound) XLA's
            # dequant-then-dot amortizes the weight convert over many
            # tokens; at decode (bandwidth-bound) the fused kernel streams
            # packed bytes without materializing bf16 weights in HBM.
            ntok = 1
            for d in x.shape[:-1]:
                ntok *= d
            fused = self.use_pallas and ntok < 256
            if isinstance(kernel, PackedMX):
                # dequant_matmul dispatches internally: SAD GEMV at
                # decode, fused in-kernel-decode matmul at prefill
                # (the XLA twin materialized every dense weight: 66 ms
                # for a 6L prefill), XLA fallback otherwise
                f = (dequant_matmul if self.use_pallas
                     else dequant_matmul_reference)
            elif isinstance(kernel, PackedOutlierNB):
                f = (dequant_matmul_nb if fused
                     else dequant_matmul_nb_reference)
            else:
                f = (dequant_matmul_outlier if fused
                     else dequant_matmul_outlier_reference)
            y = f(x, kernel, out_dtype=self.dtype)
        elif self.mx_specs is not None:
            # bias goes THROUGH the MX linear: the reference elemwise-
            # quantizes the bias and re-quantizes the output after the
            # add (number_system/mx/linear.py:48-105)
            return mnn.linear(x, kernel.T, bias, self.mx_specs)
        else:
            y = x @ kernel
        if bias is not None:
            y = y + bias
        return y


class Attention(fnn.Module):
    cfg: LlamaConfig
    mx_specs: Optional[MxSpecs] = None
    use_pallas: bool = True

    @fnn.compact
    def __call__(self, x, positions, mask, cache=None, layer_idx: int = 0):
        cfg = self.cfg
        H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.head_dim)
        B, S, _ = x.shape
        mk = lambda feat, name: QLinear(feat, self.mx_specs, False,
                                        cfg.dtype, self.use_pallas, name=name)
        if cfg.fused_projections:
            qkv = mk((H + 2 * KVH) * hd, "qkv_proj")(x)
            q = qkv[..., :H * hd].reshape(B, S, H, hd)
            k = qkv[..., H * hd:(H + KVH) * hd].reshape(B, S, KVH, hd)
            v = qkv[..., (H + KVH) * hd:].reshape(B, S, KVH, hd)
        else:
            q = mk(H * hd, "q_proj")(x).reshape(B, S, H, hd)
            k = mk(KVH * hd, "k_proj")(x).reshape(B, S, KVH, hd)
            v = mk(KVH * hd, "v_proj")(x).reshape(B, S, KVH, hd)

        if cfg.pos_emb == "rope":
            q, k = rope(q, k, positions, hd, cfg.rope_theta)

        scale = hd ** -0.5
        if cache is not None:
            from ..kv.cache import (QuantizedDecodeCache,
                                    SlotQuantizedDecodeCache)
            if (S == 1 and self.use_pallas and cfg.pos_emb == "rope"
                    and isinstance(cache, (QuantizedDecodeCache,
                                           SlotQuantizedDecodeCache))
                    and hd % 128 == 0 and cache.cfg.gap % 8 == 0
                    and H // KVH <= 8):
                # fused flash-decode over the packed KV cache: codes
                # stream HBM->VMEM once; dense K/V never materializes
                from ..ops.pallas.quant_attention import (
                    quant_attention_decode)
                full, new_len = cache.ingest_for_fused(layer_idx, k, v)
                out = quant_attention_decode(
                    q[:, 0], full, layer_idx, new_len,
                    cache.cfg.v_group, scale)
                out = out.reshape(B, 1, H * hd)
                return mk(cfg.hidden_size, "o_proj")(out)
            k, v, mask = cache.update(layer_idx, k, v, positions, mask)

        L = k.shape[1]
        alibi = None
        if cfg.pos_emb == "alibi":
            # key-index-only bias (HF build_mpt_alibi_tensor semantics):
            # slope_h * (j - (L-1)). Linear in the key slot, so softmax
            # shift-invariance makes it exactly the -slope*distance bias
            # for EVERY query row, under any left-padding or append-order
            # cache. Added in f32 — its magnitude would swamp bf16 logits.
            sl = alibi_slopes(H, cfg.alibi_bias_max)
            alibi = sl[:, None] * (jnp.arange(L, dtype=jnp.float32)
                                   - (L - 1))[None, :]        # (H, L)
        rep = H // k.shape[2]
        if rep > 1:
            # GQA via grouped einsum — never materialize repeated K/V
            # (decode is KV-bandwidth-bound; a jnp.repeat would move
            # rep x the cache bytes per step)
            G = k.shape[2]
            qg = q.reshape(B, S, G, rep, hd)
            logits = jnp.einsum("bqgrd,bkgd->bgrqk", qg, k
                                ).astype(jnp.float32) * scale
            if alibi is not None:
                logits = logits + alibi.reshape(G, rep, 1, L)[None]
            logits = jnp.where(mask[:, :, None], logits,
                               jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(logits, axis=-1)
            if cache is not None and hasattr(cache, "observe"):
                # H2O heavy-hitter score feedback (kv/h2o.py): attention
                # mass per key slot, summed over heads and query rows
                cache.observe(layer_idx, probs.sum(axis=(1, 2, 3)))
            probs = probs.astype(v.dtype)
            out = jnp.einsum("bgrqk,bkgd->bqgrd", probs, v)
            out = out.reshape(B, S, H * hd)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k
                                ).astype(jnp.float32) * scale
            if alibi is not None:
                logits = logits + alibi[None, :, None, :]
            logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(logits, axis=-1)
            if cache is not None and hasattr(cache, "observe"):
                cache.observe(layer_idx, probs.sum(axis=(1, 2)))
            probs = probs.astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v
                             ).reshape(B, S, H * hd)
        return mk(cfg.hidden_size, "o_proj")(out)


class MLP(fnn.Module):
    cfg: LlamaConfig
    mx_specs: Optional[MxSpecs] = None
    use_pallas: bool = True

    @fnn.compact
    def __call__(self, x):
        cfg = self.cfg
        mk = lambda feat, name: QLinear(feat, self.mx_specs, False,
                                        cfg.dtype, self.use_pallas, name=name)
        I = cfg.intermediate_size
        if cfg.mlp_type == "gelu":
            # MPT MptMLP: up -> exact GELU -> down, no gate
            h = jax.nn.gelu(mk(I, "up_proj")(x), approximate=False)
            return mk(cfg.hidden_size, "down_proj")(h)
        if cfg.fused_projections:
            gu = mk(2 * I, "gate_up_proj")(x)
            gate, up = gu[..., :I], gu[..., I:]
        else:
            gate = mk(I, "gate_proj")(x)
            up = mk(I, "up_proj")(x)
        return mk(cfg.hidden_size, "down_proj")(jax.nn.silu(gate) * up)


class MoEBlock(fnn.Module):
    """Mixtral sparse MoE MLP (top-k routing)."""

    cfg: LlamaConfig
    mx_specs: Optional[MxSpecs] = None
    use_pallas: bool = True

    @fnn.compact
    def __call__(self, x):
        cfg = self.cfg
        E, K = cfg.num_local_experts, cfg.num_experts_per_tok
        B, S, D = x.shape
        router = QLinear(E, self.mx_specs, False, cfg.dtype,
                         self.use_pallas, name="gate")(x)  # (B,S,E)
        weights, sel = jax.lax.top_k(router, K)
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1
                                 ).astype(x.dtype)

        # dense-compute-all-experts formulation (efficient for small E on
        # TPU; capacity-based dispatch is a later optimization)
        def expert(i):
            return MLP(cfg, self.mx_specs, self.use_pallas,
                       name=f"experts_{i}")(x)

        outs = jnp.stack([expert(i) for i in range(E)], axis=2)  # (B,S,E,D)
        onehot = jax.nn.one_hot(sel, E, dtype=x.dtype)           # (B,S,K,E)
        combine = jnp.einsum("bske,bsk->bse", onehot, weights)
        return jnp.einsum("bsed,bse->bsd", outs, combine)


def _make_norm(cfg: LlamaConfig, mx_specs, name: str):
    """RMSNorm (Llama) or biasless LayerNorm (MPT norm_1/norm_2/norm_f —
    HF sets `.bias = None` on every MptBlock LayerNorm)."""
    if cfg.norm_type == "ln":
        return mnn.LayerNorm(cfg.hidden_size, cfg.rms_norm_eps,
                             use_bias=False, mx_specs=mx_specs, name=name)
    return mnn.RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                       mx_specs=mx_specs, name=name)


class DecoderLayer(fnn.Module):
    cfg: LlamaConfig
    mx_specs: Optional[MxSpecs] = None
    use_pallas: bool = True

    @fnn.compact
    def __call__(self, x, positions, mask, cache=None, layer_idx: int = 0):
        cfg = self.cfg
        h = _make_norm(cfg, self.mx_specs, "input_layernorm")(x)
        x = x + Attention(cfg, self.mx_specs, self.use_pallas,
                          name="self_attn")(h, positions, mask, cache,
                                            layer_idx)
        h = _make_norm(cfg, self.mx_specs, "post_attention_layernorm")(x)
        if cfg.num_local_experts > 0:
            x = x + MoEBlock(cfg, self.mx_specs, self.use_pallas,
                             name="block_sparse_moe")(h)
        else:
            x = x + MLP(cfg, self.mx_specs, self.use_pallas, name="mlp")(h)
        return x


def causal_mask(S: int, positions, sliding_window: Optional[int] = None):
    """(1, 1, S, S) boolean mask; sliding-window variant for Mistral."""
    qp = positions[:, :, None]          # (B,S,1)
    kp = positions[:, None, :]          # (B,1,S)
    m = kp <= qp
    if sliding_window is not None:
        m = m & (kp > qp - sliding_window)
    return m[:, None, :, :]


class LlamaModel(fnn.Module):
    cfg: LlamaConfig
    mx_specs: Optional[MxSpecs] = None
    use_pallas: bool = True

    @fnn.compact
    def __call__(self, input_ids, positions=None, mask=None, cache=None,
                 inputs_embeds=None, image_feats=None,
                 image_token_mask=None):
        cfg = self.cfg
        B, S = (input_ids.shape if inputs_embeds is None
                else inputs_embeds.shape[:2])
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        if mask is None and cache is None:
            mask = causal_mask(S, positions, cfg.sliding_window)

        embed = self.param("embed_tokens", fnn.initializers.normal(0.02),
                           (cfg.vocab_size, cfg.hidden_size), cfg.dtype)
        if inputs_embeds is None:
            safe_ids = (input_ids if image_token_mask is None
                        else jnp.where(image_token_mask, 0, input_ids))
            x = embed[safe_ids]
        else:
            x = inputs_embeds
        if image_feats is not None:
            from ..vlm.llava import splice_image_features
            x = splice_image_features(x, image_feats, image_token_mask)
        for i in range(cfg.num_hidden_layers):
            x = DecoderLayer(cfg, self.mx_specs, self.use_pallas,
                             name=f"layers_{i}")(x, positions, mask, cache, i)
        x = _make_norm(cfg, self.mx_specs, "norm")(x)
        return x


class LlamaForCausalLM(fnn.Module):
    cfg: LlamaConfig
    mx_specs: Optional[MxSpecs] = None
    use_pallas: bool = True

    @fnn.compact
    def __call__(self, input_ids, positions=None, mask=None, cache=None,
                 inputs_embeds=None, last_only: bool = False,
                 logit_index=None):
        cfg = self.cfg
        x = LlamaModel(cfg, self.mx_specs, self.use_pallas,
                       name="model")(input_ids, positions, mask, cache,
                                     inputs_embeds)
        if last_only:
            # prefill only needs the last position's logits; the full
            # (B, S, vocab) tensor is the dominant HBM cost at long
            # context (8 x 3072 x 128k f32 = 12.6 GB) and the full-S
            # lm_head matmul ~1.1 TFLOP of waste at B=8 x S=128
            x = x[:, -1:]
        elif logit_index is not None:
            # right-padded prefill (serving engine): logits at the last
            # REAL token per row — gather the hidden state BEFORE the
            # lm_head so the vocab matmul runs on one token per row
            idx = jnp.asarray(logit_index)[:, None, None]
            x = jnp.take_along_axis(
                x, jnp.broadcast_to(idx, (x.shape[0], 1, x.shape[-1])),
                axis=1)
        if cfg.tie_word_embeddings:
            embed = self.variables["params"]["model"]["embed_tokens"]
            logits = x @ embed.T
        else:
            logits = QLinear(cfg.vocab_size, None, False, cfg.dtype,
                             self.use_pallas, name="lm_head")(x)
        return logits
