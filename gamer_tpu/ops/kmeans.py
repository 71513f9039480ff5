"""K-means (plain + balanced) in JAX.

TPU-native replacement for the reference's host-side sklearn KMeans and the
Cython `k_means_constrained` package (ref: SeqRec/utils/kmeans.py:5-22,
SeqRec/models/tokenizer/RQVAE/layers.py:65-82). Balance constraints are
enforced with Sinkhorn-regularized assignment instead of the exact min/max-size
LP — the behavioral contract (roughly equal cluster sizes for codebook init and
diversity clustering) is preserved while everything stays jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gamer_tpu.ops.sinkhorn import balanced_assign


def _pairwise_sq_dists(x: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    return (
        jnp.sum(x * x, axis=1, keepdims=True)
        + jnp.sum(centers * centers, axis=1)[None, :]
        - 2.0 * x @ centers.T
    )


def _init_centers(x: jnp.ndarray, k: int, rng: jax.Array) -> jnp.ndarray:
    """k-means++ seeding: each center sampled proportional to squared distance
    from the chosen set (matches sklearn's init quality, jit-compatible)."""
    n = x.shape[0]
    first = jax.random.randint(rng, (), 0, n)
    centers0 = jnp.tile(x[first][None], (k, 1))

    def body(i, carry):
        centers, rng = carry
        d = _pairwise_sq_dists(x, centers)  # [N, K]
        # distance to the nearest already-chosen center (j < i)
        mask = jnp.arange(k)[None, :] < i
        dmin = jnp.min(jnp.where(mask, d, jnp.inf), axis=1)
        rng, sub = jax.random.split(rng)
        idx = jax.random.categorical(sub, jnp.log(jnp.clip(dmin, 1e-12)))
        centers = centers.at[i].set(x[idx])
        return centers, rng

    centers, _ = jax.lax.fori_loop(1, k, body, (centers0, rng))
    return centers


def _update_centers(x: jnp.ndarray, labels: jnp.ndarray, k: int, old: jnp.ndarray) -> jnp.ndarray:
    one_hot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # [N, K]
    counts = one_hot.sum(axis=0)  # [K]
    sums = one_hot.T @ x  # [K, D]
    centers = sums / jnp.clip(counts[:, None], 1.0)
    # re-seed empty clusters at the points farthest from their assigned center
    d = _pairwise_sq_dists(x, centers)
    own = jnp.take_along_axis(d, labels[:, None], axis=1)[:, 0]  # [N]
    far_order = jnp.argsort(-own)[:k]  # k farthest points
    reseeded = x[far_order]
    empty = counts == 0
    return jnp.where(empty[:, None], reseeded, jnp.where(counts[:, None] > 0, centers, old))


import functools


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans_impl(x, k: int, iters: int, key):
    centers = _init_centers(x, k, key)

    def body(_, centers):
        labels = jnp.argmin(_pairwise_sq_dists(x, centers), axis=1)
        return _update_centers(x, labels, k, centers)

    centers = jax.lax.fori_loop(0, iters, body, centers)
    labels = jnp.argmin(_pairwise_sq_dists(x, centers), axis=1)
    return centers, labels


def kmeans(x: jnp.ndarray, k: int, iters: int = 10, seed: int = 0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Plain Lloyd k-means (jitted). Returns (centers [K, D], labels [N])."""
    return _kmeans_impl(jnp.asarray(x, jnp.float32), k, iters, jax.random.PRNGKey(seed))


@functools.partial(jax.jit, static_argnames=("k", "iters", "epsilon", "sk_iters"))
def _balanced_impl(x, k: int, iters: int, key, epsilon: float, sk_iters: int):
    centers = _init_centers(x, k, key)

    def body(_, centers):
        labels = balanced_assign(_pairwise_sq_dists(x, centers), epsilon, sk_iters)
        return _update_centers(x, labels, k, centers)

    centers = jax.lax.fori_loop(0, iters, body, centers)
    labels = balanced_assign(_pairwise_sq_dists(x, centers), epsilon, sk_iters)
    return centers, labels


def balanced_kmeans(
    x: jnp.ndarray,
    k: int,
    iters: int = 10,
    seed: int = 0,
    epsilon: float = 0.03,
    sk_iters: int = 50,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Size-balanced k-means: Sinkhorn assignment each Lloyd step (jitted).

    Replaces `constrained_km` (ref utils/kmeans.py:5-22). Returns
    (centers [K, D], labels [N]); cluster sizes concentrate near N/K.
    """
    return _balanced_impl(jnp.asarray(x, jnp.float32), k, iters,
                          jax.random.PRNGKey(seed), epsilon, sk_iters)


def cluster_codebook(codebook: np.ndarray, n_clusters: int = 10, seed: int = 0) -> np.ndarray:
    """Per-epoch diversity clustering of a codebook (ref trainers/RQVAE.py:163-177).
    Host-callable; returns int labels [n_codes]."""
    _, labels = balanced_kmeans(jnp.asarray(codebook), n_clusters, iters=10, seed=seed)
    return np.asarray(labels)
