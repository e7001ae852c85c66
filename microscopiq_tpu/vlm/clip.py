"""CLIP ViT vision tower, from-scratch flax linen.

Parity target: the reference wraps HF ``CLIPVisionModel`` in
``vlm/llava/model/multimodal_encoder/clip_encoder.py`` (CLIPVisionTower,
feature select at :38-49 — hidden layer ``select_layer`` (default -2) and
``select_feature='patch'`` which drops the CLS token). This is a TPU-first
implementation: a pre-LN ViT whose blocks are plain einsum/matmul ops so
XLA can tile them onto the MXU; patch embedding is a single conv with
stride = patch size (equivalently a reshaped matmul).

The tower runs in bf16/fp32 and is NOT weight-quantized, matching the
reference where ``llava_sequential`` quantizes only the language-model
decoder layers (``vlm/llava.py:154-264``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List

import flax.linen as fnn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_positions(self) -> int:
        return self.num_patches + 1  # + CLS

    @staticmethod
    def tiny(**kw) -> "CLIPVisionConfig":
        base = dict(hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=4,
                    image_size=16, patch_size=8)
        base.update(kw)
        return CLIPVisionConfig(**base)

    @staticmethod
    def vit_large_336(**kw) -> "CLIPVisionConfig":
        """openai/clip-vit-large-patch14-336 (LLaVA-1.5 default tower)."""
        return CLIPVisionConfig(**kw) if kw else CLIPVisionConfig()


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(fnn.Module):
    cfg: CLIPVisionConfig

    @fnn.compact
    def __call__(self, x):
        cfg = self.cfg
        H = cfg.num_attention_heads
        hd = cfg.hidden_size // H
        dense = lambda name: fnn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                                       name=name)
        B, S, D = x.shape
        q = dense("q_proj")(x).reshape(B, S, H, hd)
        k = dense("k_proj")(x).reshape(B, S, H, hd)
        v = dense("v_proj")(x).reshape(B, S, H, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, S, D)
        return dense("out_proj")(o)


class CLIPMLP(fnn.Module):
    cfg: CLIPVisionConfig

    @fnn.compact
    def __call__(self, x):
        h = fnn.Dense(self.cfg.intermediate_size, dtype=self.cfg.dtype,
                      name="fc1")(x)
        h = quick_gelu(h)
        return fnn.Dense(self.cfg.hidden_size, dtype=self.cfg.dtype,
                         name="fc2")(h)


class CLIPEncoderLayer(fnn.Module):
    cfg: CLIPVisionConfig

    @fnn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = fnn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                          name="layer_norm1")(x)
        x = x + CLIPAttention(cfg, name="self_attn")(h)
        h = fnn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                          name="layer_norm2")(x)
        return x + CLIPMLP(cfg, name="mlp")(h)


class CLIPVisionModel(fnn.Module):
    """Returns all hidden states (list, one per layer + embeddings)."""

    cfg: CLIPVisionConfig

    @fnn.compact
    def __call__(self, pixel_values) -> List[jax.Array]:
        cfg = self.cfg
        B = pixel_values.shape[0]
        # patch embedding: conv stride=patch, no bias (HF CLIP semantics)
        patches = fnn.Conv(cfg.hidden_size,
                           (cfg.patch_size, cfg.patch_size),
                           strides=(cfg.patch_size, cfg.patch_size),
                           use_bias=False, dtype=cfg.dtype,
                           name="patch_embedding")(pixel_values)
        patches = patches.reshape(B, -1, cfg.hidden_size)
        cls = self.param("class_embedding", fnn.initializers.normal(0.02),
                         (cfg.hidden_size,), cfg.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)), patches],
            axis=1)
        pos = self.param("position_embedding",
                         fnn.initializers.normal(0.02),
                         (cfg.num_positions, cfg.hidden_size), cfg.dtype)
        x = x + pos[None]
        x = fnn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                          name="pre_layrnorm")(x)  # (sic) HF name
        hidden_states = [x]
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, name=f"layers_{i}")(x)
            hidden_states.append(x)
        return hidden_states


class CLIPVisionTower(fnn.Module):
    """Feature-select wrapper (clip_encoder.py:38-60 semantics)."""

    cfg: CLIPVisionConfig
    select_layer: int = -2
    select_feature: str = "patch"

    @fnn.compact
    def __call__(self, pixel_values):
        hs = CLIPVisionModel(self.cfg, name="vision_model")(pixel_values)
        feats = hs[self.select_layer]
        if self.select_feature == "patch":
            feats = feats[:, 1:]
        elif self.select_feature != "cls_patch":
            raise ValueError(f"bad select_feature {self.select_feature}")
        return feats


def convert_hf_clip_vision(state_dict, cfg: CLIPVisionConfig,
                           prefix: str = "vision_model.") -> dict:
    """HF CLIPVisionModel state dict → CLIPVisionTower param tree."""
    import numpy as np

    def a(k):
        return jnp.asarray(np.asarray(state_dict[prefix + k]))

    vm = {
        "class_embedding": a("embeddings.class_embedding"),
        "position_embedding": a("embeddings.position_embedding.weight"),
        "patch_embedding": {
            # HF conv (out, in, kh, kw) → flax (kh, kw, in, out)
            "kernel": jnp.transpose(
                a("embeddings.patch_embedding.weight"), (2, 3, 1, 0))},
        "pre_layrnorm": {"scale": a("pre_layrnorm.weight"),
                         "bias": a("pre_layrnorm.bias")},
    }
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}."
        lin = lambda n: {"kernel": jnp.asarray(
                             np.asarray(state_dict[prefix + p + n
                                                   + ".weight"]).T),
                         "bias": a(p + n + ".bias")}
        ln = lambda n: {"scale": a(p + n + ".weight"),
                        "bias": a(p + n + ".bias")}
        vm[f"layers_{i}"] = {
            "self_attn": {n: lin("self_attn." + n)
                          for n in ("q_proj", "k_proj", "v_proj",
                                    "out_proj")},
            "mlp": {"fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2")},
            "layer_norm1": ln("layer_norm1"),
            "layer_norm2": ln("layer_norm2"),
        }
    return {"vision_model": vm}
