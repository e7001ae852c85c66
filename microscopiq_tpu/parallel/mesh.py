"""Device mesh construction and sharding rules.

The reference has no distributed runtime (SURVEY.md §2.11) — its
multi-GPU story is layer pipelining (``llm/opt.py:296-330``) and HF
``device_map="auto"``. The TPU framework supplies the real one: a
``jax.sharding.Mesh`` with axes ``(data, model)`` (``expert`` optional for
MoE), parameter PartitionSpec rules for dense and packed-MX trees, and
pjit-driven collectives over ICI.

Sharding layout (Megatron-style TP over the `model` axis):
* attention q/k/v kernels and MLP gate/up: shard output features,
* attention o and MLP down: shard input features (their contraction
  output needs a psum, which XLA inserts),
* embeddings / lm_head: shard vocab,
* PackedMX leaves shard codes and their per-block scales congruently
  (block axis K is never split across its scale groups since block_size
  divides the per-shard K).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.packing import PackedMX, PackedMXOutlier, PackedOutlierNB


def make_mesh(n_devices: Optional[int] = None,
              data: Optional[int] = None,
              model: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on `model` when
    n <= 8 (single host: TP rides ICI), else square-ish split."""
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    devs = devs[:n]
    if data is None and model is None:
        if n <= 8:
            data, model = 1, n
        else:
            model = 8
            data = n // model
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    assert data * model == n, (data, model, n)
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, ("data", "model"))


# path-regex -> (dense kernel spec, packed codes spec)
# kernels are flax (in, out); packed codes are (K=in, N=out)
_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*(q_proj|k_proj|v_proj|qkv_proj|gate_proj|up_proj|gate_up_proj"
     r"|fc1|gate)/kernel$",
     P(None, "model")),
    (r".*(o_proj|out_proj|down_proj|fc2)/kernel$", P("model", None)),
    (r".*(embed_tokens|embed_positions)$", P(None, None)),
    (r".*lm_head/kernel$", P(None, "model")),
    (r".*(scale|bias)$", P(None)),
)


def _spec_for_path(path: str) -> P:
    for pat, spec in _RULES:
        if re.match(pat, path):
            return spec
    return P()


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def param_shardings(params, mesh: Mesh):
    """PartitionSpec tree for a (possibly packed) param tree."""

    def visit(path, leaf):
        ps = _path_str(path)
        if isinstance(leaf, (PackedMX, PackedMXOutlier, PackedOutlierNB)):
            raise TypeError("packed leaves handled via is_leaf")
        spec = _spec_for_path(ps)
        # guard: don't shard axes that don't divide
        ndim = getattr(leaf, "ndim", 0)
        parts = list(spec) + [None] * (ndim - len(list(spec)))
        fixed = []
        for d, axis in enumerate(parts[:ndim]):
            if axis is not None and leaf.shape[d] % mesh.shape[axis] != 0:
                axis = None
            fixed.append(axis)
        return NamedSharding(mesh, P(*fixed))

    def visit_packed(path, leaf):
        ps = _path_str(path)
        spec = _spec_for_path(ps + "/kernel" if not ps.endswith("kernel")
                              else ps)
        return _packed_sharding(leaf, spec, mesh)

    def dispatch(path, leaf):
        if isinstance(leaf, (PackedMX, PackedMXOutlier, PackedOutlierNB)):
            return visit_packed(path, leaf)
        return visit(path, leaf)

    return jax.tree_util.tree_map_with_path(
        dispatch, params,
        is_leaf=lambda x: isinstance(
            x, (PackedMX, PackedMXOutlier, PackedOutlierNB)))


def _packed_sharding(leaf, kernel_spec: P, mesh: Mesh):
    """Shard a PackedMX(axis=0, (K, N)) congruently with its kernel spec."""
    parts = list(kernel_spec)
    parts += [None] * (2 - len(parts))
    k_ax, n_ax = parts[0], parts[1]

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    if isinstance(leaf, PackedOutlierNB):
        # transposed (N, K) storage: the kernel's N axis is dim 0 of
        # codes/scales and dim 1 of the slot planes. Only shard when the
        # SUB-BYTE row count and the block count divide the axis size.
        def fits(axis, *dims):
            if axis is None:
                return None
            sz = mesh.shape.get(axis, 1)
            return axis if all(d % sz == 0 for d in dims) else None

        n0 = fits(n_ax, leaf.codes.shape[0], leaf.scale_exp.shape[0])
        k1 = fits(k_ax, leaf.codes.shape[1])
        return PackedOutlierNB(
            codes=ns(n0, k1), scale_exp=ns(n0, k1),
            out_byte=ns(None, n0, k1), out_scale_exp=ns(n0, k1),
            elem_format=leaf.elem_format,
            outlier_format=leaf.outlier_format,
            block_size=leaf.block_size, orig_n=leaf.orig_n,
            orig_k=leaf.orig_k)
    if isinstance(leaf, PackedMX):
        import dataclasses as _dc

        # replace() keeps ALL static fields (incl. transport_mw/fold for
        # emi8m) so the sharding tree's treedef matches the param tree's
        if leaf.codes.ndim == 3:     # serving layout (nb, rows, N)
            return _dc.replace(
                leaf, codes=ns(k_ax, None, n_ax),
                scale_exp=ns(k_ax, None, n_ax)
                if leaf.scale_exp.ndim == 3 else ns(k_ax, n_ax))
        return _dc.replace(leaf, codes=ns(k_ax, n_ax),
                           scale_exp=ns(k_ax, n_ax))
    return PackedMXOutlier(
        inlier=PackedMX(
            codes=ns(k_ax, n_ax), scale_exp=ns(k_ax, n_ax),
            elem_format=leaf.inlier.elem_format,
            block_size=leaf.inlier.block_size,
            scale_bits=leaf.inlier.scale_bits,
            orig_dim=leaf.inlier.orig_dim, axis=leaf.inlier.axis),
        out_codes=ns(k_ax, n_ax, None), out_pos=ns(k_ax, n_ax, None),
        out_scale_exp=ns(k_ax, n_ax),
        outlier_format=leaf.outlier_format,
        outlier_scale_bits=leaf.outlier_scale_bits)


def shard_params(params, mesh: Mesh):
    """device_put the tree with the rule-derived shardings."""
    sh = param_shardings(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, sh)


def kv_state_shardings(state, mesh: Mesh):
    """NamedShardings for a KV-cache state (Dense/Quant KVState): batch on
    `data`, kv heads on `model` (the TP layout the sharded attention
    produces), scalars/lengths replicated. Non-dividing axes fall back to
    replicated. Buffers are (L, B, KVH, ...)."""

    def vis(leaf):
        nd = getattr(leaf, "ndim", None)
        if leaf is None or nd is None:
            return None
        spec = [None] * nd
        if nd >= 3:
            if leaf.shape[1] % mesh.shape.get("data", 1) == 0:
                spec[1] = "data"
            if leaf.shape[2] % mesh.shape.get("model", 1) == 0:
                spec[2] = "model"
        elif nd == 1:
            if leaf.shape[0] % mesh.shape.get("data", 1) == 0:
                spec[0] = "data"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(vis, state)


def shard_kv_state(state, mesh: Mesh):
    sh = kv_state_shardings(state, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s) if s is not None else x,
        state, sh)
