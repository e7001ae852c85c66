"""Layer-sequential GPTQ calibration over a whole model.

Parity target: ``llm/llama.py:61-173`` (``llama_sequential``) /
``llm/opt.py:25-128`` (``opt_sequential``): quantize decoder layers one at
a time; within a layer quantize sublayer groups in execution order
(``true_sequential``: [q,k,v] → [o] → [gate,up] → [down],
llama.py:113-119), recapturing inputs after each group so later linears
calibrate against already-quantized predecessors; propagate the hidden
states through the quantized layer before moving on.

Instead of the reference's forward-hook Catcher trick (llama.py:79-95),
the flax layer is applied with ``capture_intermediates`` and each QLinear
sows its input.

The canonical quantizer configuration matches llm/llama.py:130-137:
inlier int2, outlier fp4_e2m1, scale_bits 8/8, block 16, axes=[0],
std_dev 2 — driven here by an MXQuantizer instance.
"""

from __future__ import annotations

import copy
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .gptq import GPTQ
from .quantizer import MXQuantizer


# sublayer groups in execution order (true_sequential)
LLAMA_GROUPS = [
    ["self_attn/q_proj", "self_attn/k_proj", "self_attn/v_proj"],
    ["self_attn/o_proj"],
    ["mlp/gate_proj", "mlp/up_proj"],
    ["mlp/down_proj"],
]
OPT_GROUPS = [
    ["self_attn/q_proj", "self_attn/k_proj", "self_attn/v_proj"],
    ["self_attn/out_proj"],
    ["fc1"],
    ["fc2"],
]


def _get(tree, path: str):
    node = tree
    for k in path.split("/"):
        node = node[k]
    return node


def _set(tree, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = value


def sequential_gptq(
    layer_module,
    layer_params: List[dict],
    hidden: jax.Array,
    layer_extra_inputs: Callable[[int, jax.Array], tuple],
    quantizer: MXQuantizer,
    groups: Sequence[Sequence[str]] = LLAMA_GROUPS,
    nsamples_batch: int = 8,
    blocksize: int = 128,
    percdamp: float = 0.01,
    actorder: bool = False,
    groupsize: int = -1,
    static_groups: bool = False,
    mode: str = "mx_prune",
    verbose: bool = True,
    collect_decisions: bool = False,
) -> List[dict]:
    """Run GPTQ layer by layer.

    layer_module: a flax module for ONE decoder layer whose __call__
        signature is (x, *extra) and whose QLinear submodules sow their
        inputs into the 'intermediates' collection under
        '<path>/gptq_input'.
    layer_params: per-layer 'params' subtrees (mutated copies returned).
    hidden: (nsamples, seqlen, d) hidden states entering layer 0.
    layer_extra_inputs: i, hidden -> extra args (positions, mask, ...).
    """
    n_layers = len(layer_params)
    out_params = []
    out_decisions: List[Dict[str, dict]] = []
    x = hidden

    apply_fn = jax.jit(
        lambda p, h, *extra: layer_module.apply(
            {"params": p}, h, *extra,
            capture_intermediates=lambda mdl, name: name == "gptq_input",
            mutable=["intermediates"]))

    for i in range(n_layers):
        t0 = time.time()
        params_i = jax.tree_util.tree_map(lambda v: v, layer_params[i])
        params_i = jax.device_get(params_i)  # plain nested dict of arrays
        params_i = jax.tree_util.tree_map(jnp.asarray, params_i)
        extra = layer_extra_inputs(i, x)
        dec_i: Dict[str, dict] = {}

        for group in groups:
            present = [p for p in group
                       if _path_exists(params_i, p)]
            if not present:
                continue
            gptqs: Dict[str, GPTQ] = {}
            for p in present:
                kernel = _get(params_i, p)["kernel"]  # (in, out)
                gptqs[p] = GPTQ(kernel.T, mode=mode)  # GPTQ wants (out, in)
                gptqs[p].quantizer = quantizer

            # capture inputs of this group's linears over all samples
            for s0 in range(0, x.shape[0], nsamples_batch):
                xb = x[s0:s0 + nsamples_batch]
                _, inter = apply_fn(params_i, xb, *extra)
                cap = inter["intermediates"]
                for p in present:
                    inp = _get(cap, p)["gptq_input"][0]
                    gptqs[p].add_batch(inp.reshape(-1, inp.shape[-1]))

            for p in present:
                Q, _ = gptqs[p].fasterquant(
                    blocksize=blocksize, percdamp=percdamp,
                    actorder=actorder, groupsize=groupsize,
                    static_groups=static_groups,
                    collect_decisions=collect_decisions)
                _get(params_i, p)["kernel"] = Q.T  # back to (in, out)
                if collect_decisions:
                    dec_i[p] = gptqs[p].decisions
                gptqs[p].free()

        # propagate hidden states through the quantized layer
        outs = []
        for s0 in range(0, x.shape[0], nsamples_batch):
            y, _ = apply_fn(params_i, x[s0:s0 + nsamples_batch], *extra)
            outs.append(y)
        x = jnp.concatenate(outs, axis=0)
        out_params.append(params_i)
        out_decisions.append(dec_i)
        if verbose:
            print(f"layer {i}: {time.time() - t0:.1f}s")
    return out_params, x, out_decisions


def _path_exists(tree, path: str) -> bool:
    node = tree
    for k in path.split("/"):
        if not isinstance(node, dict) or k not in node:
            return False
        node = node[k]
    return True


# ---------------------------------------------------------------------------
# Whole-model drivers (the llama_sequential / opt_sequential analogs)
# ---------------------------------------------------------------------------
def gptq_quantize_model(kind: str, cfg, params, calib_ids: jax.Array,
                        quantizer: Optional[MXQuantizer] = None,
                        mode: str = "mx_prune", blocksize: int = 128,
                        percdamp: float = 0.01, actorder: bool = False,
                        groupsize: int = -1, static_groups: bool = False,
                        nsamples_batch: int = 8, verbose: bool = True,
                        groups: Optional[Sequence[Sequence[str]]] = None,
                        collect_decisions: bool = False):
    """GPTQ-quantize every decoder layer of a Llama/OPT model.

    calib_ids: (nsamples, seqlen) int token crops (reference: nsamples
    random seqlen-2048 crops, data_utils.py:12-205).
    groups: override the sublayer calibration order. Default is the
    model's true_sequential grouping (llm/llama.py:113-119); pass a
    single group with every path to match the reference OPT driver,
    which captures all sublayer inputs in one unquantized pass
    (llm/opt.py:96-105).
    Returns a new params pytree with quantized linear kernels.
    """
    from ..models.llama import DecoderLayer, causal_mask
    from ..models.opt import OPTLayer

    if quantizer is None:
        # canonical config (llm/llama.py:130-137)
        quantizer = MXQuantizer()
        quantizer.configure(8, 8, "int2", "fp4_e2m1", std_dev=2,
                            axes=[0], block_size=16)

    p = jax.device_get(params["params"])
    p = jax.tree_util.tree_map(jnp.asarray, p)
    n, S = calib_ids.shape
    positions = jnp.arange(S)[None, :]  # (1, S), broadcasts over batch
    mask = causal_mask(S, positions,
                       cfg.sliding_window if kind == "llama" else None)
    if kind == "llama":
        tree = p["model"]
        hidden = tree["embed_tokens"][calib_ids]
        layer_module = DecoderLayer(cfg)
        extra_fn = lambda i, x: (positions, mask, None, i)
        groups = groups or LLAMA_GROUPS
    elif kind == "opt":
        tree = p
        hidden = (tree["embed_tokens"][calib_ids] +
                  tree["embed_positions"][positions + 2])
        layer_module = OPTLayer(cfg)
        extra_fn = lambda i, x: (mask, None, i, positions)
        groups = groups or OPT_GROUPS
    else:
        raise ValueError(kind)

    layer_params = [tree[f"layers_{i}"] for i in range(cfg.num_hidden_layers)]
    new_layers, _, layer_decisions = sequential_gptq(
        layer_module, layer_params, hidden, extra_fn, quantizer,
        groups=groups, nsamples_batch=nsamples_batch, blocksize=blocksize,
        percdamp=percdamp, actorder=actorder, groupsize=groupsize,
        static_groups=static_groups, mode=mode, verbose=verbose,
        collect_decisions=collect_decisions)
    for i, lp in enumerate(new_layers):
        tree[f"layers_{i}"] = lp
    if collect_decisions:
        # flat map keyed by the full params path of each kernel leaf, the
        # key scheme pack_params walks (find_linear_params)
        prefix = ("model",) if kind == "llama" else ()
        decisions = {
            prefix + (f"layers_{i}",) + tuple(path.split("/")) + ("kernel",):
                dec
            for i, dec_i in enumerate(layer_decisions)
            for path, dec in dec_i.items()}
        return {"params": p}, decisions
    return {"params": p}
