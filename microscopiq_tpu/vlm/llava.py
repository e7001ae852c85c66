"""LLaVA-1.5 multimodal model (vision tower + projector + Llama LM).

Parity targets: ``vlm/llava/model/llava_arch.py`` (LlavaMetaModel :29-98,
``prepare_inputs_labels_for_multimodal`` image-token splicing :145-324)
and ``vlm/llava/model/language_model/llava_llama.py``.

TPU-first design difference: the reference splices a VARIABLE number of
image-feature tokens into each sequence at the ``IMAGE_TOKEN_INDEX``
(-200) position, producing ragged batches it then re-pads — dynamic
shapes that XLA cannot compile. Here the host expands the image
placeholder to exactly ``num_patches`` slots up front
(``mm_utils.expand_image_tokens``), so the device-side splice is a
static-shape masked gather:

    slot j of sample b  ←  image_feats[b, (cumsum(mask)-1)[b, j]]

One image per sample (the quantization-eval setting used by the
reference's VQA scripts, ``vlm/scripts/v1_5/eval/vqav2.sh``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..models.llama import LlamaConfig, LlamaModel, QLinear
from ..specs import MxSpecs
from .clip import CLIPVisionConfig, CLIPVisionTower
from .projector import VisionProjector

IMAGE_TOKEN_INDEX = -200  # host-side placeholder (llava/constants.py)


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    text: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    vision: CLIPVisionConfig = dataclasses.field(
        default_factory=CLIPVisionConfig)
    projector_type: str = "mlp2x_gelu"
    vision_select_layer: int = -2
    vision_select_feature: str = "patch"

    @property
    def num_image_tokens(self) -> int:
        n = self.vision.num_patches
        return n if self.vision_select_feature == "patch" else n + 1

    @staticmethod
    def tiny(**kw) -> "LlavaConfig":
        base = dict(text=LlamaConfig.tiny(),
                    vision=CLIPVisionConfig.tiny())
        base.update(kw)
        return LlavaConfig(**base)

    @staticmethod
    def mistral(text_kw: Optional[dict] = None, **kw) -> "LlavaConfig":
        """Mistral-backed LLaVA (llava_mistral.py:1-158): identical
        multimodal arch over the sliding-window Mistral LM — on this
        stack just a text-config swap, since LlamaModel already carries
        Mistral semantics (sliding_window, llm/llama.py:20-58)."""
        text = LlamaConfig.mistral_7b(**(text_kw or {}))
        base = dict(text=text, vision=CLIPVisionConfig())
        base.update(kw)
        return LlavaConfig(**base)

    @staticmethod
    def tiny_mistral(**kw) -> "LlavaConfig":
        base = dict(text=LlamaConfig.tiny(sliding_window=8),
                    vision=CLIPVisionConfig.tiny())
        base.update(kw)
        return LlavaConfig(**base)

    @staticmethod
    def mpt(text_kw: Optional[dict] = None, **kw) -> "LlavaConfig":
        """MPT-backed LLaVA (llava_mpt.py:25-97): the reference wraps
        MptForCausalLM in the same LlavaMetaModel; here the MPT family
        knobs (ALiBi / biasless LayerNorm / GELU, models/llama.py
        mpt_7b) back the identical multimodal arch."""
        text = LlamaConfig.mpt_7b(**(text_kw or {}))
        base = dict(text=text, vision=CLIPVisionConfig())
        base.update(kw)
        return LlavaConfig(**base)

    @staticmethod
    def tiny_mpt(**kw) -> "LlavaConfig":
        base = dict(text=LlamaConfig.tiny_mpt(),
                    vision=CLIPVisionConfig.tiny())
        base.update(kw)
        return LlavaConfig(**base)


def splice_image_features(text_embeds, image_feats, image_token_mask):
    """Static-shape splice: where mask, take next image feature in order.

    text_embeds:      (B, S, D) embeddings of the expanded prompt
    image_feats:      (B, T, D) projected vision features (T = slots)
    image_token_mask: (B, S) bool, True at image slots (T per sample)
    """
    idx = jnp.cumsum(image_token_mask.astype(jnp.int32), axis=1) - 1
    idx = jnp.clip(idx, 0, image_feats.shape[1] - 1)
    gathered = jnp.take_along_axis(
        image_feats, idx[..., None].astype(jnp.int32), axis=1)
    return jnp.where(image_token_mask[..., None], gathered, text_embeds)


class LlavaForCausalLM(fnn.Module):
    cfg: LlavaConfig
    mx_specs: Optional[MxSpecs] = None
    use_pallas: bool = True

    @fnn.compact
    def __call__(self, input_ids, positions=None, mask=None, cache=None,
                 pixel_values=None, image_token_mask=None,
                 inputs_embeds=None, last_only: bool = False,
                 logit_index=None):
        tc = self.cfg.text
        tower = CLIPVisionTower(self.cfg.vision,
                                self.cfg.vision_select_layer,
                                self.cfg.vision_select_feature,
                                name="vision_tower")
        proj = VisionProjector(tc.hidden_size, self.cfg.projector_type,
                               dtype=tc.dtype, name="mm_projector")
        image_feats = None
        if pixel_values is not None:
            if image_token_mask is None:
                raise ValueError("image_token_mask required with "
                                 "pixel_values")
            image_feats = proj(tower(pixel_values)).astype(tc.dtype)
        elif self.is_initializing():
            # bind vision params even on text-only init traces
            dummy = jnp.zeros((1, self.cfg.vision.image_size,
                               self.cfg.vision.image_size, 3), tc.dtype)
            proj(tower(dummy))
        x = LlamaModel(tc, self.mx_specs, self.use_pallas,
                       name="model")(input_ids, positions, mask, cache,
                                     inputs_embeds, image_feats,
                                     image_token_mask)
        if last_only:        # prefill: vocab matmul on the last token only
            x = x[:, -1:]
        elif logit_index is not None:
            idx = jnp.asarray(logit_index)[:, None, None]
            x = jnp.take_along_axis(
                x, jnp.broadcast_to(idx, (x.shape[0], 1, x.shape[-1])),
                axis=1)
        if tc.tie_word_embeddings:     # MPT-backed LLaVA ties lm_head
            embed = self.variables["params"]["model"]["embed_tokens"]
            return x @ embed.T
        logits = QLinear(tc.vocab_size, None, False, tc.dtype,
                         self.use_pallas, name="lm_head")(x)
        return logits


def multimodal_hidden(cfg: LlavaConfig, params, input_ids,
                      image_token_mask, pixel_values,
                      use_pallas: bool = True):
    """Pure function: text-embed + vision-encode + project + splice →
    hidden states entering decoder layer 0 (used by the GPTQ driver,
    mirroring the Catcher capture in vlm/llava.py:170-195)."""
    p = params["params"]
    feats = CLIPVisionTower(cfg.vision, cfg.vision_select_layer,
                            cfg.vision_select_feature).apply(
        {"params": p["vision_tower"]}, pixel_values)
    feats = VisionProjector(cfg.text.hidden_size, cfg.projector_type,
                            dtype=cfg.text.dtype).apply(
        {"params": p["mm_projector"]}, feats)
    embed = p["model"]["embed_tokens"]
    text = embed[jnp.where(image_token_mask, 0, input_ids)]
    return splice_image_features(text, feats.astype(text.dtype),
                                 image_token_mask)


def convert_hf_llava(state_dict, cfg: LlavaConfig,
                     vision_params=None, projector_params=None) -> dict:
    """Full HF LLaVA checkpoint → flax param tree.

    LM weights live under ``model.*`` / ``lm_head.*`` (llama layout) or
    ``transformer.*`` (MPT layout, auto-detected); vision tower under
    ``<base>.vision_tower.vision_tower.vision_model.*``; projector under
    ``<base>.mm_projector.*``. Pass ``vision_params``/``projector_params``
    to graft already-converted flax subtrees instead (e.g. a text-only LM
    checkpoint paired with a separately loaded CLIP tower).
    """
    from ..models.loading import convert_llama, convert_mpt
    from .clip import convert_hf_clip_vision
    from .projector import convert_hf_projector

    lm_sd = {k: v for k, v in state_dict.items()
             if not k.startswith(("model.vision_tower",
                                  "model.mm_projector",
                                  "transformer.vision_tower",
                                  "transformer.mm_projector"))}
    # MPT-backed LLaVA checkpoints use the transformer.blocks.* layout
    # (llava_mpt.py wraps MptForCausalLM whose base is `transformer`)
    is_mpt = any(k.startswith("transformer.blocks.") for k in lm_sd)
    conv = convert_mpt if is_mpt else convert_llama
    params = conv(lm_sd, cfg.text)["params"]
    base = "transformer" if is_mpt else "model"
    params["vision_tower"] = (vision_params if vision_params is not None
                              else convert_hf_clip_vision(
        state_dict, cfg.vision,
        prefix=f"{base}.vision_tower.vision_tower.vision_model."))
    params["mm_projector"] = (projector_params
                              if projector_params is not None
                              else convert_hf_projector(
        state_dict, cfg.projector_type, prefix=f"{base}.mm_projector."))
    return {"params": params}


def pack_llava_lm(params, specs):
    """Pack only the language-model weights to MX; the vision tower and
    projector stay dense (mirrors llava_sequential quantizing only LM
    decoder layers, vlm/llava.py:154-264)."""
    from ..nn import pack_params

    out = dict(params["params"])
    out["model"] = pack_params({"model": out["model"]}, specs)["model"]
    return {"params": out}
