"""Vector quantization (GPTVQ-style) in JAX.

Parity target: ``utils/vq_quant.py`` — kmeans++ initialization
(``kpp_parallel_sampled`` :127), Mahalanobis-ordered init (:163),
Hessian-weighted assignments (``get_assignments`` :12), EM k-means
(``kmeans_vq`` :103), codebook quantization (:185), and the
``VQQuantizer`` with blockwise normalization (:204-389).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_assignments(X: jax.Array, centroids: jax.Array,
                    weights: Optional[jax.Array] = None,
                    chunk: int = 65536) -> jax.Array:
    """Nearest-centroid assignment under (optionally Hessian-weighted)
    squared distance. X: (n, d), centroids: (k, d), weights: (n, d)."""
    if weights is None:
        d2 = (jnp.sum(X * X, 1, keepdims=True)
              - 2 * X @ centroids.T
              + jnp.sum(centroids * centroids, 1)[None, :])
    else:
        # sum_j w_ij (x_ij - c_kj)^2
        d2 = ((weights * X * X).sum(1, keepdims=True)
              - 2 * (weights * X) @ centroids.T
              + weights @ (centroids * centroids).T)
    return jnp.argmin(d2, axis=1)


def kpp_init(X: jax.Array, k: int, key: jax.Array,
             n_candidates: int = 8) -> jax.Array:
    """k-means++ with parallel candidate sampling (kpp_parallel_sampled)."""
    n = X.shape[0]
    key, sub = jax.random.split(key)
    first = jax.random.randint(sub, (), 0, n)
    centroids = jnp.zeros((k, X.shape[1]), X.dtype).at[0].set(X[first])
    d2 = jnp.sum((X - X[first]) ** 2, 1)
    for i in range(1, k):
        key, sub = jax.random.split(key)
        probs = d2 / jnp.maximum(d2.sum(), 1e-12)
        cand = jax.random.choice(sub, n, (n_candidates,), p=probs)
        # pick the candidate that most reduces total distance
        cd2 = jnp.sum((X[None, :, :] - X[cand][:, None, :]) ** 2, -1)
        newd = jnp.minimum(d2[None, :], cd2)
        best = jnp.argmin(newd.sum(1))
        centroids = centroids.at[i].set(X[cand[best]])
        d2 = newd[best]
    return centroids


def mahalanobis_init(X: jax.Array, k: int) -> jax.Array:
    """Mahalanobis-ordered init (vq_quant.py:163): sort points by
    Mahalanobis distance and take k evenly spaced quantiles."""
    mu = X.mean(0)
    Xc = X - mu
    cov = Xc.T @ Xc / X.shape[0] + 1e-6 * jnp.eye(X.shape[1])
    icov = jnp.linalg.inv(cov)
    md = jnp.einsum("nd,de,ne->n", Xc, icov, Xc)
    order = jnp.argsort(md)
    idx = jnp.linspace(0, X.shape[0] - 1, k).astype(jnp.int32)
    return X[order[idx]]


def kmeans_vq(X: jax.Array, k: int, iters: int = 10,
              weights: Optional[jax.Array] = None,
              key: Optional[jax.Array] = None,
              init: str = "kpp") -> Tuple[jax.Array, jax.Array]:
    """EM k-means; returns (centroids, assignments)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if init == "kpp":
        centroids = kpp_init(X, k, key)
    elif init == "mahalanobis":
        centroids = mahalanobis_init(X, k)
    else:
        raise ValueError(init)

    w = weights if weights is not None else jnp.ones_like(X)

    def step(centroids, _):
        assign = get_assignments(X, centroids, weights)
        onehot = jax.nn.one_hot(assign, k, dtype=X.dtype)      # (n, k)
        num = jnp.einsum("nk,nd->kd", onehot, w * X)
        den = jnp.einsum("nk,nd->kd", onehot, w)
        new = jnp.where(den > 0, num / jnp.maximum(den, 1e-12), centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    assign = get_assignments(X, centroids, weights)
    return centroids, assign


@dataclasses.dataclass
class VQQuantizer:
    """Blockwise vector quantizer (vq_quant.py:204-389 semantics):
    weights are grouped into vectors of ``vec_dim`` along the input axis,
    normalized per block, clustered into a 2^(bits·vec_dim)-entry
    codebook, and reconstructed from centroid assignments."""

    vec_dim: int = 2
    bits: int = 3             # bits per dimension
    block_size: int = 0       # columns per codebook block (0 = whole row)
    kmeans_iters: int = 10
    init: str = "kpp"

    def configure(self, bits=None, vec_dim=None, block_size=None,
                  kmeans_iters=None, init=None):
        if bits is not None:
            self.bits = bits
        if vec_dim is not None:
            self.vec_dim = vec_dim
        if block_size is not None:
            self.block_size = block_size
        if kmeans_iters is not None:
            self.kmeans_iters = kmeans_iters
        if init is not None:
            self.init = init

    @property
    def codebook_size(self) -> int:
        return 2 ** (self.bits * self.vec_dim)

    def find_params(self, x, weight=False):
        pass

    def ready(self):
        return True

    def quantize(self, W: jax.Array,
                 hessian_diag: Optional[jax.Array] = None,
                 key: Optional[jax.Array] = None) -> jax.Array:
        """Quantize a (rows, cols) weight matrix; cols % vec_dim == 0."""
        rows, cols = W.shape
        d = self.vec_dim
        assert cols % d == 0
        bs = self.block_size or cols
        assert cols % bs == 0
        out = jnp.zeros_like(W)
        if key is None:
            key = jax.random.PRNGKey(0)
        for b0 in range(0, cols, bs):
            blk = W[:, b0:b0 + bs]
            # blockwise normalization (vq_quant.py:204-260)
            scale = jnp.maximum(jnp.abs(blk).max(), 1e-12)
            X = (blk / scale).reshape(-1, d)
            wts = None
            if hessian_diag is not None:
                hd = hessian_diag[b0:b0 + bs]
                wts = jnp.tile(hd.reshape(-1, d), (rows, 1))
            key, sub = jax.random.split(key)
            centroids, assign = kmeans_vq(
                X, self.codebook_size, self.kmeans_iters, wts, sub,
                self.init)
            q = centroids[assign].reshape(rows, bs) * scale
            out = out.at[:, b0:b0 + bs].set(q)
        return out
