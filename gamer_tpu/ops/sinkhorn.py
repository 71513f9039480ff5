"""Sinkhorn balanced assignment (jnp, jit-safe).

Math matches the reference exactly (ref: SeqRec/models/tokenizer/RQVAE/layers.py:85-104
and utils/kmeans.py:25-34): distances are centered/normalized to [-1, 1], Q =
exp(-d/eps) is alternately column- and row-normalized, and the result is scaled
so each sample row sums to 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def center_distance(distances: jnp.ndarray) -> jnp.ndarray:
    """Normalize distances to ~[-1, 1] (ref utils/kmeans.py:25-34)."""
    mx = distances.max()
    mn = distances.min()
    middle = (mx + mn) / 2
    amplitude = mx - middle + 1e-5
    return (distances - middle) / amplitude


def sinkhorn(distances: jnp.ndarray, epsilon: float, iterations: int) -> jnp.ndarray:
    """[B, K] distances -> [B, K] balanced soft-assignment (rows sum to 1).

    Runs in log space: the reference upcasts to float64 because exp(-d/eps)
    overflows float32 for small eps (ref vector_quantizer.py:158); logsumexp
    normalization gives the same fixed point in float32, which keeps the op
    TPU-friendly (no f64 on TPU).
    """
    logQ = (-distances / epsilon).astype(jnp.float32)
    B, K = logQ.shape
    logQ = logQ - jax.scipy.special.logsumexp(logQ)

    def body(_, logQ):
        # per-sample mass 1/B
        logQ = logQ - jax.scipy.special.logsumexp(logQ, axis=1, keepdims=True) - jnp.log(B)
        # per-centroid mass 1/K
        logQ = logQ - jax.scipy.special.logsumexp(logQ, axis=0, keepdims=True) - jnp.log(K)
        return logQ

    logQ = jax.lax.fori_loop(0, iterations, body, logQ)
    return jnp.exp(logQ + jnp.log(B))


def balanced_assign(distances: jnp.ndarray, epsilon: float, iterations: int) -> jnp.ndarray:
    """Hard balanced assignment: argmax of the Sinkhorn plan over centered distances."""
    Q = sinkhorn(center_distance(distances), epsilon, iterations)
    return jnp.argmax(Q, axis=-1)
