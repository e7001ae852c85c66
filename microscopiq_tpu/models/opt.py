"""OPT model (facebook/opt-*) in flax linen — the CPU-runnable anchor.

Parity target: the reference's OPT driver (``llm/opt.py:13-23`` loads HF
OPTForCausalLM; calibration walks ``model.decoder.layers``). Architecture:
learned positional embeddings with the OPT +2 offset, pre-LayerNorm
decoder blocks, ReLU FFN, final_layer_norm (opt-125m configuration).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..specs import MxSpecs
from .. import nn as mnn
from .llama import QLinear, causal_mask


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    ffn_dim: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 2048
    do_layer_norm_before: bool = True
    tie_word_embeddings: bool = True
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def opt_125m(**kw) -> "OPTConfig":
        return OPTConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "OPTConfig":
        base = dict(vocab_size=256, hidden_size=64, ffn_dim=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    max_position_embeddings=128)
        base.update(kw)
        return OPTConfig(**base)


class OPTAttention(fnn.Module):
    cfg: OPTConfig
    mx_specs: Optional[MxSpecs] = None
    use_pallas: bool = True

    @fnn.compact
    def __call__(self, x, mask, cache=None, layer_idx: int = 0,
                 positions=None):
        cfg = self.cfg
        H, hd = cfg.num_attention_heads, cfg.head_dim
        B, S, _ = x.shape
        mk = lambda name: QLinear(cfg.hidden_size, self.mx_specs, True,
                                  cfg.dtype, self.use_pallas, name=name)
        q = mk("q_proj")(x).reshape(B, S, H, hd)
        k = mk("k_proj")(x).reshape(B, S, H, hd)
        v = mk("v_proj")(x).reshape(B, S, H, hd)
        if cache is not None:
            k, v, mask = cache.update(layer_idx, k, v, positions, mask)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd ** -0.5
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, -1)
        return mk("out_proj")(out)


class OPTLayer(fnn.Module):
    cfg: OPTConfig
    mx_specs: Optional[MxSpecs] = None
    use_pallas: bool = True
    # mx_linear_only replicates the reference's quantize_model swap
    # (utils/quant_model.py:15-71): ONLY nn.Linear becomes MXLinear —
    # LayerNorm / ReLU / attention internals stay dense
    mx_linear_only: bool = False

    @fnn.compact
    def __call__(self, x, mask, cache=None, layer_idx: int = 0,
                 positions=None):
        cfg = self.cfg
        other = None if self.mx_linear_only else self.mx_specs
        ln1 = mnn.LayerNorm(cfg.hidden_size, mx_specs=other,
                            name="self_attn_layer_norm")
        ln2 = mnn.LayerNorm(cfg.hidden_size, mx_specs=other,
                            name="final_layer_norm")
        attn = OPTAttention(cfg, self.mx_specs, self.use_pallas,
                            name="self_attn")
        # HF's OPTDecoderLayer reshapes hidden states to 2D (B*S, H)
        # before fc1/fc2 (modeling_opt.py), so the reference MXLinear's
        # hard-coded axes=[1] lands on the HIDDEN axis there while the
        # 3D attention projections quantize along the SEQUENCE axis.
        # Replicate by clearing a_axes (None = contraction axis -1) for
        # the FFN pair only.
        ffn_specs = (self.mx_specs.replace(a_axes=None)
                     if self.mx_specs is not None
                     and self.mx_specs.get("a_axes") is not None
                     else self.mx_specs)
        fc1 = QLinear(cfg.ffn_dim, ffn_specs, True, cfg.dtype,
                      self.use_pallas, name="fc1")
        fc2 = QLinear(cfg.hidden_size, ffn_specs, True, cfg.dtype,
                      self.use_pallas, name="fc2")

        if cfg.do_layer_norm_before:
            x = x + attn(ln1(x), mask, cache, layer_idx, positions)
            h = ln2(x)
            x = x + fc2(mnn.relu(fc1(h), other))
        else:
            x = ln1(x + attn(x, mask, cache, layer_idx, positions))
            x = ln2(x + fc2(mnn.relu(fc1(x), other)))
        return x


class OPTForCausalLM(fnn.Module):
    cfg: OPTConfig
    mx_specs: Optional[MxSpecs] = None
    use_pallas: bool = True
    mx_linear_only: bool = False

    @fnn.compact
    def __call__(self, input_ids, positions=None, mask=None, cache=None,
                 last_only: bool = False, logit_index=None):
        cfg = self.cfg
        B, S = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        if mask is None and cache is None:
            mask = causal_mask(S, positions)

        embed = self.param("embed_tokens", fnn.initializers.normal(0.02),
                           (cfg.vocab_size, cfg.hidden_size), cfg.dtype)
        # OPT's learned positions are offset by 2 (HF convention)
        pos_embed = self.param("embed_positions",
                               fnn.initializers.normal(0.02),
                               (cfg.max_position_embeddings + 2,
                                cfg.hidden_size), cfg.dtype)
        x = embed[input_ids] + pos_embed[positions + 2]
        for i in range(cfg.num_hidden_layers):
            x = OPTLayer(cfg, self.mx_specs, self.use_pallas,
                         self.mx_linear_only,
                         name=f"layers_{i}")(x, mask, cache, i, positions)
        if cfg.do_layer_norm_before:
            x = mnn.LayerNorm(
                cfg.hidden_size,
                mx_specs=None if self.mx_linear_only else self.mx_specs,
                name="final_layer_norm")(x)
        if last_only:        # prefill: vocab matmul on the last token only
            x = x[:, -1:]
        elif logit_index is not None:
            idx = jnp.asarray(logit_index)[:, None, None]
            x = jnp.take_along_axis(
                x, jnp.broadcast_to(idx, (x.shape[0], 1, x.shape[-1])),
                axis=1)
        if cfg.tie_word_embeddings:
            logits = x @ embed.T
        else:
            logits = QLinear(cfg.vocab_size, None, False, cfg.dtype,
                             self.use_pallas, name="lm_head")(x)
        return logits
