"""Offline profilers.

Parity targets:
* ``outlier_profiling/profiler.py:9-45`` (``analyze_outliers_olive``) —
  per-layer weight outlier statistics under a k·σ rule and the
  adjacent-outlier adjacency count that motivated the SCOPE NoC design.
* ``format_profiling/quantizer.py:9-25`` — MSE of element-wise
  quantization on synthetic N(mean, std) tensors across formats.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import get_format_params
from ..ops.elemwise import quantize_elemwise
from ..ops.mx import quantize_mx


def analyze_outliers(W: jax.Array, std_dev: float = 2.5,
                     block_size: int = 16) -> Dict[str, float]:
    """Outlier share + adjacency statistics of a weight matrix.

    Returns fraction of outliers, fraction of blocks containing >= 1
    outlier, max outliers per block, and the adjacent-outlier rate (two
    outliers in consecutive positions — the SCOPE NoC's routing case)."""
    W = jnp.asarray(W)
    a = jnp.abs(W)
    mean = a.mean()
    std = a.std()
    mask = (a > mean + std_dev * std).astype(jnp.float32)
    frac = float(mask.mean())

    flat = mask.reshape(-1)
    adj = float((flat[1:] * flat[:-1]).sum() / jnp.maximum(flat.sum(), 1))

    n = (flat.shape[0] // block_size) * block_size
    blocks = flat[:n].reshape(-1, block_size)
    per_block = blocks.sum(1)
    return {
        "outlier_fraction": frac,
        "blocks_with_outliers": float((per_block > 0).mean()),
        "max_outliers_per_block": float(per_block.max()),
        "mean_outliers_per_block": float(per_block.mean()),
        "adjacent_outlier_rate": adj,
    }


def profile_model_outliers(params, std_dev: float = 2.5,
                           block_size: int = 16) -> Dict[str, Dict]:
    """Per-linear-layer outlier stats for a model pytree."""
    from ..nn.mapping import find_linear_params
    out = {}
    for path, w in find_linear_params(params, skip=()).items():
        out["/".join(path)] = analyze_outliers(w, std_dev, block_size)
    return out


def format_mse_profile(formats: Iterable[str] = ("int8", "int4", "fp8_e4m3",
                                                 "fp6_e3m2", "fp6_e2m3",
                                                 "fp4_e2m1"),
                       mean: float = 0.0, std: float = 1.0,
                       n: int = 1 << 16, seed: int = 0,
                       block_size: int = 0, scale_bits: int = 8
                       ) -> Dict[str, float]:
    """MSE of quantizing a synthetic N(mean, std) tensor per format
    (format_profiling/quantizer.py semantics; optional MX block mode)."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray((rng.standard_normal(n) * std + mean).astype(np.float32))
    out = {}
    for fmt in formats:
        if block_size > 0:
            q = quantize_mx(x[None, :], scale_bits, fmt, axes=[-1],
                            block_size=block_size)[0]
        else:
            q = quantize_elemwise(x, fmt, saturate_normals=True)
        out[fmt] = float(jnp.mean((q - x) ** 2))
    return out
