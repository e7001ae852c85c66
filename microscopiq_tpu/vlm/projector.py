"""Multimodal projector (vision features → LM embedding space).

Parity target: ``vlm/llava/model/multimodal_projector/builder.py`` —
'linear', 'mlpNx_gelu' (N linear layers with GELU between), 'identity'.
"""

from __future__ import annotations

import re
from typing import Any

import flax.linen as fnn
import jax.numpy as jnp


class VisionProjector(fnn.Module):
    """projector_type ∈ {'linear', 'mlp2x_gelu', ..., 'identity'}."""

    out_features: int
    projector_type: str = "mlp2x_gelu"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x):
        t = self.projector_type
        if t == "identity":
            return x
        if t == "linear":
            return fnn.Dense(self.out_features, dtype=self.dtype,
                             name="layers_0")(x)
        m = re.match(r"^mlp(\d+)x_gelu$", t)
        if not m:
            raise ValueError(f"unknown projector type {t!r}")
        depth = int(m.group(1))
        x = fnn.Dense(self.out_features, dtype=self.dtype,
                      name="layers_0")(x)
        for i in range(1, depth):
            x = fnn.gelu(x, approximate=False)
            x = fnn.Dense(self.out_features, dtype=self.dtype,
                          name=f"layers_{i}")(x)
        return x


def convert_hf_projector(state_dict, projector_type: str = "mlp2x_gelu",
                         prefix: str = "model.mm_projector.") -> dict:
    """HF LLaVA mm_projector weights (0.weight, 2.weight, ...) → flax."""
    import numpy as np

    params = {}
    i_flax = 0
    i_hf = 0
    while f"{prefix}{i_hf}.weight" in state_dict:
        params[f"layers_{i_flax}"] = {
            "kernel": jnp.asarray(
                np.asarray(state_dict[f"{prefix}{i_hf}.weight"]).T),
            "bias": jnp.asarray(
                np.asarray(state_dict[f"{prefix}{i_hf}.bias"]))}
        i_flax += 1
        i_hf += 2  # HF interleaves GELU modules at odd indices
    if not params and projector_type != "identity":
        raise KeyError(f"no projector weights under {prefix}")
    return params
