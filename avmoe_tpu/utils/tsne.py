"""t-SNE for expert/feature visualization, accelerator-friendly.

Re-creation of the reference's pure-torch t-SNE (ref: AVMOE/AVE/utils/
mytsne.py:129 TorchTSNE) as a jax implementation: exact pairwise affinities
with binary-search perplexity calibration, KL-gradient descent with momentum
and early exaggeration. Used to reproduce the paper's TSNE_result figures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _cond_probs(dists: np.ndarray, perplexity: float, tol: float = 1e-5,
                max_iter: int = 50) -> np.ndarray:
    """Row-wise binary search for sigmas hitting the target perplexity."""
    n = dists.shape[0]
    target = np.log(perplexity)
    P = np.zeros((n, n))
    for i in range(n):
        lo, hi = -np.inf, np.inf
        beta = 1.0
        di = np.delete(dists[i], i)
        for _ in range(max_iter):
            p = np.exp(-di * beta)
            s = p.sum() + 1e-12
            h = np.log(s) + beta * (di * p).sum() / s
            if abs(h - target) < tol:
                break
            if h > target:
                lo = beta
                beta = beta * 2 if hi == np.inf else (beta + hi) / 2
            else:
                hi = beta
                beta = beta / 2 if lo == -np.inf else (beta + lo) / 2
        row = np.exp(-dists[i] * beta)
        row[i] = 0.0
        P[i] = row / (row.sum() + 1e-12)
    return P


def tsne(
    features: np.ndarray,
    n_components: int = 2,
    perplexity: float = 30.0,
    n_iter: int = 500,
    learning_rate: float = 200.0,
    seed: int = 0,
) -> np.ndarray:
    """(N, D) features -> (N, n_components) embedding."""
    x = np.asarray(features, np.float64)
    x = x - x.mean(0)
    sq = (x * x).sum(1)
    dists = np.maximum(sq[:, None] + sq[None, :] - 2 * x @ x.T, 0.0)
    P = _cond_probs(dists, perplexity)
    P = (P + P.T) / (2 * P.shape[0])
    P = np.maximum(P, 1e-12)

    rng = np.random.RandomState(seed)
    n = x.shape[0]
    Y = rng.randn(n, n_components) * 1e-4
    P_j = jnp.asarray(P)

    @jax.jit
    def kl_grad(y, exaggeration):
        d = jnp.sum(y * y, 1)
        num = 1.0 / (1.0 + d[:, None] + d[None, :] - 2 * y @ y.T)
        num = num * (1.0 - jnp.eye(n))
        Q = jnp.maximum(num / num.sum(), 1e-12)
        PQ = (P_j * exaggeration - Q) * num
        return 4.0 * ((jnp.diag(PQ.sum(1)) - PQ) @ y)

    vel = np.zeros_like(Y)
    for it in range(n_iter):
        exag = 12.0 if it < 100 else 1.0
        momentum = 0.5 if it < 250 else 0.8
        g = np.asarray(kl_grad(jnp.asarray(Y), exag))
        vel = momentum * vel - learning_rate * g
        Y = Y + vel
        Y = Y - Y.mean(0)
    return Y.astype(np.float32)
