"""LLaVA GPTQ calibration driver.

Parity target: ``vlm/llava.py:154-264`` (``llava_sequential``) — GPTQ is
run over the LANGUAGE-MODEL decoder layers only, with calibration hidden
states produced by the full multimodal embedding path (vision tower +
projector + splice), so the Hessians see image-token statistics. The
vision tower and projector are left unquantized, as in the reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..quant.calibrate import LLAMA_GROUPS, sequential_gptq
from ..quant.quantizer import MXQuantizer
from .llava import LlavaForCausalLM, multimodal_hidden


def llava_sequential(model: LlavaForCausalLM, params,
                     calib_ids: jax.Array,
                     calib_image_masks: jax.Array,
                     calib_pixels: jax.Array,
                     quantizer: Optional[MXQuantizer] = None,
                     mode: str = "mx_prune", blocksize: int = 128,
                     percdamp: float = 0.01, actorder: bool = False,
                     nsamples_batch: int = 4, verbose: bool = True):
    """GPTQ over the LM decoder layers of a LLaVA model.

    calib_ids:        (n, S) expanded prompts (image slots zeroed)
    calib_image_masks:(n, S) bool image-slot masks
    calib_pixels:     (n, H, W, 3) preprocessed images
    """
    from ..models.llama import DecoderLayer, causal_mask

    cfg = model.cfg
    if quantizer is None:
        quantizer = MXQuantizer()
        quantizer.configure(8, 8, "int2", "fp4_e2m1", std_dev=2,
                            axes=[0], block_size=16)

    p = jax.device_get(params["params"])
    p = jax.tree_util.tree_map(jnp.asarray, p)
    n, S = calib_ids.shape
    positions = jnp.arange(S)[None, :]
    mask = causal_mask(S, positions, cfg.text.sliding_window)

    # multimodal embeddings entering decoder layer 0
    embed_fn = jax.jit(lambda prm, ids, im, pix: multimodal_hidden(
        cfg, prm, ids, im, pix))
    hiddens = []
    for s0 in range(0, n, nsamples_batch):
        hiddens.append(embed_fn({"params": p},
                                calib_ids[s0:s0 + nsamples_batch],
                                calib_image_masks[s0:s0 + nsamples_batch],
                                calib_pixels[s0:s0 + nsamples_batch]))
    hidden = jnp.concatenate(hiddens, axis=0)

    tree = p["model"]
    layer_params = [tree[f"layers_{i}"]
                    for i in range(cfg.text.num_hidden_layers)]
    new_layers, _, _ = sequential_gptq(
        DecoderLayer(cfg.text), layer_params, hidden,
        lambda i, x: (positions, mask, None, i), quantizer,
        groups=LLAMA_GROUPS, nsamples_batch=nsamples_batch,
        blocksize=blocksize, percdamp=percdamp, actorder=actorder,
        mode=mode, verbose=verbose)
    for i, lp in enumerate(new_layers):
        tree[f"layers_{i}"] = lp
    return {"params": p}
