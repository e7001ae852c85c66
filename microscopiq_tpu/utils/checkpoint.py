"""Checkpoint IO for packed quantized models.

TPU analog of the reference's quantized-checkpoint path
(``opt_pack3``/``load_quant3``, ``llm/opt.py:255-294``): instead of packed
int3 torch state dicts, packed-MX pytrees (codes + scales + outlier
side-bands) are saved with orbax, with the static packing metadata stored
alongside so the tree can be reconstructed without a template.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.packing import PackedMX, PackedMXOutlier, PackedOutlierNB

_PACKED_TYPES = (PackedMX, PackedMXOutlier, PackedOutlierNB)


def _is_packed(x):
    return isinstance(x, _PACKED_TYPES)


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a (possibly packed) pytree: arrays to an .npz, structure +
    static packing metadata to JSON."""
    os.makedirs(path, exist_ok=True)
    arrays = {}
    meta = {"leaves": []}

    flat = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=_is_packed)[0]
    for i, (kpath, leaf) in enumerate(flat):
        keys = [str(getattr(p, "key", getattr(p, "idx", p))) for p in kpath]
        entry = {"path": keys}
        if isinstance(leaf, PackedMX):
            entry["kind"] = "PackedMX"
            entry["static"] = {
                "elem_format": leaf.elem_format,
                "block_size": leaf.block_size,
                "scale_bits": leaf.scale_bits,
                "orig_dim": leaf.orig_dim, "axis": leaf.axis,
                "transport": leaf.transport,
                "transport_mw": leaf.transport_mw,
                "transport_fold": leaf.transport_fold}
            arrays[f"{i}.codes"] = np.asarray(leaf.codes)
            arrays[f"{i}.scale_exp"] = np.asarray(leaf.scale_exp)
        elif isinstance(leaf, PackedMXOutlier):
            entry["kind"] = "PackedMXOutlier"
            entry["static"] = {
                "elem_format": leaf.inlier.elem_format,
                "block_size": leaf.inlier.block_size,
                "scale_bits": leaf.inlier.scale_bits,
                "orig_dim": leaf.inlier.orig_dim,
                "axis": leaf.inlier.axis,
                "outlier_format": leaf.outlier_format,
                "outlier_scale_bits": leaf.outlier_scale_bits}
            arrays[f"{i}.codes"] = np.asarray(leaf.inlier.codes)
            arrays[f"{i}.scale_exp"] = np.asarray(leaf.inlier.scale_exp)
            arrays[f"{i}.out_codes"] = np.asarray(leaf.out_codes)
            arrays[f"{i}.out_pos"] = np.asarray(leaf.out_pos)
            arrays[f"{i}.out_scale_exp"] = np.asarray(leaf.out_scale_exp)
        elif isinstance(leaf, PackedOutlierNB):
            entry["kind"] = "PackedOutlierNB"
            entry["static"] = {
                "elem_format": leaf.elem_format,
                "outlier_format": leaf.outlier_format,
                "block_size": leaf.block_size,
                "orig_n": leaf.orig_n, "orig_k": leaf.orig_k}
            arrays[f"{i}.codes"] = np.asarray(leaf.codes)
            arrays[f"{i}.scale_exp"] = np.asarray(leaf.scale_exp)
            arrays[f"{i}.out_byte"] = np.asarray(leaf.out_byte)
            arrays[f"{i}.out_scale_exp"] = np.asarray(leaf.out_scale_exp)
        else:
            entry["kind"] = "array"
            arrays[f"{i}.a"] = np.asarray(leaf)
        # record dtype names for fp8 containers (npz keeps raw dtypes)
        meta["leaves"].append(entry)

    np.savez(os.path.join(path, "arrays.npz"), **{
        k: (v.view(np.uint8) if v.dtype.name.startswith("float8") else v)
        for k, v in arrays.items()})
    meta["dtypes"] = {k: v.dtype.name for k, v in arrays.items()}
    with open(os.path.join(path, "structure.json"), "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str) -> Any:
    """Load a checkpoint saved by :func:`save_checkpoint` into a nested
    dict pytree with packed leaves reconstructed."""
    import jax.numpy as jnp

    with open(os.path.join(path, "structure.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, "arrays.npz"))

    def arr(key):
        a = data[key]
        dt = meta["dtypes"][key]
        if dt.startswith("float8"):
            return jnp.asarray(a).view(getattr(jnp, dt))
        return jnp.asarray(a)

    root: dict = {}
    for i, entry in enumerate(meta["leaves"]):
        node = root
        for k in entry["path"][:-1]:
            node = node.setdefault(k, {})
        last = entry["path"][-1]
        st = entry.get("static", {})
        if entry["kind"] == "PackedMX":
            node[last] = PackedMX(
                codes=arr(f"{i}.codes"), scale_exp=arr(f"{i}.scale_exp"),
                elem_format=st["elem_format"], block_size=st["block_size"],
                scale_bits=st["scale_bits"], orig_dim=st["orig_dim"],
                axis=st["axis"],
                transport=st.get("transport", "native"),
                transport_mw=st.get("transport_mw", 0),
                transport_fold=st.get("transport_fold", 0))
        elif entry["kind"] == "PackedMXOutlier":
            node[last] = PackedMXOutlier(
                inlier=PackedMX(
                    codes=arr(f"{i}.codes"),
                    scale_exp=arr(f"{i}.scale_exp"),
                    elem_format=st["elem_format"],
                    block_size=st["block_size"],
                    scale_bits=st["scale_bits"],
                    orig_dim=st["orig_dim"], axis=st["axis"]),
                out_codes=arr(f"{i}.out_codes"),
                out_pos=arr(f"{i}.out_pos"),
                out_scale_exp=arr(f"{i}.out_scale_exp"),
                outlier_format=st["outlier_format"],
                outlier_scale_bits=st["outlier_scale_bits"])
        elif entry["kind"] == "PackedOutlierNB":
            node[last] = PackedOutlierNB(
                codes=arr(f"{i}.codes"), scale_exp=arr(f"{i}.scale_exp"),
                out_byte=arr(f"{i}.out_byte"),
                out_scale_exp=arr(f"{i}.out_scale_exp"),
                elem_format=st["elem_format"],
                outlier_format=st["outlier_format"],
                block_size=st["block_size"],
                orig_n=st["orig_n"], orig_k=st["orig_k"])
        else:
            node[last] = arr(f"{i}.a")
    return root


# ---------------------------------------------------------------------------
# Delta checkpoints (parity: vlm/llava/model/{apply_delta,make_delta}.py —
# LLaVA ships weights as deltas over a base LM; same pytree algebra here)
# ---------------------------------------------------------------------------
def _delta_combine(base: Any, other: Any, sign: int) -> Any:
    """Shared walker for make/apply delta (make_delta.py / apply_delta.py
    :1-48 semantics):

    * keys only in `other` (the LLaVA mm_projector / vision tower) pass
      through unchanged,
    * keys only in `base` are kept (apply) — the reference asserts they
      don't exist, but a pruned delta is a superset use case,
    * shape mismatches handle the EXTENDED-VOCAB case: the delta rows
      cover the larger vocab (embed_tokens/lm_head grew by the image
      tokens) and base adds/subtracts into the leading slab only.
    """
    if isinstance(base, dict) or isinstance(other, dict):
        out = {}
        bd = base if isinstance(base, dict) else {}
        od = other if isinstance(other, dict) else {}
        for k in set(bd) | set(od):
            if k not in bd:
                out[k] = od[k]
            elif k not in od:
                out[k] = bd[k]
            else:
                out[k] = _delta_combine(bd[k], od[k], sign)
        return out
    if isinstance(base, _PACKED_TYPES) or isinstance(other, _PACKED_TYPES):
        raise TypeError("delta utilities operate on dense trees; compute "
                        "deltas pre-packing")
    b = jnp.asarray(base)
    o = jnp.asarray(other)
    if b.shape == o.shape:
        return o + sign * b
    # extended-vocab slab (apply_delta.py:29-32): other covers the grown
    # shape; base lands on the leading corner
    assert b.ndim == o.ndim and all(
        bs <= os_ for bs, os_ in zip(b.shape, o.shape)),         f"delta shape {o.shape} smaller than base {b.shape}"
    slab = o[tuple(slice(0, bs) for bs in b.shape)] + sign * b
    return o.at[tuple(slice(0, bs) for bs in b.shape)].set(slab)


def make_delta(base: Any, target: Any) -> Any:
    """delta = target - base (make_delta.py semantics): target-only keys
    (mm_projector, vision tower) are stored verbatim; grown-vocab rows
    keep the target values with base subtracted from the leading slab."""
    return _delta_combine(base, target, -1)


def apply_delta(base: Any, delta: Any) -> Any:
    """target = base + delta (apply_delta.py:1-48 semantics)."""
    return _delta_combine(base, delta, +1)


def consolidate(params: Any, dtype=None) -> Any:
    """Materialize a param tree to host numpy (consolidate.py analog:
    gather a possibly-sharded tree into one plain checkpointable tree)."""
    def conv(x):
        if isinstance(x, _PACKED_TYPES):
            return jax.tree_util.tree_map(conv, x)
        a = np.asarray(jax.device_get(x))
        return a.astype(dtype) if dtype is not None else a

    return jax.tree_util.tree_map(
        conv, params, is_leaf=lambda x: isinstance(x, _PACKED_TYPES))
