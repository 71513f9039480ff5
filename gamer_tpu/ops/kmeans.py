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
    """Greedy k-means++ seeding (sklearn's variant): sample 2+log(k) candidate
    centers proportional to squared distance from the chosen set and keep the
    one that most reduces total potential. Matches sklearn's init quality
    (plain single-candidate ++ measured ~10% worse ARI on planted clusters,
    tests/test_rqvae.py golden-parity experiment), jit-compatible."""
    n = x.shape[0]
    trials = 2 + int(np.log(max(k, 2)))
    first = jax.random.randint(rng, (), 0, n)
    centers0 = jnp.tile(x[first][None], (k, 1))
    # running min squared distance to the chosen set
    dmin0 = jnp.sum((x - x[first][None]) ** 2, axis=1)

    def body(i, carry):
        centers, dmin, rng = carry
        rng, sub = jax.random.split(rng)
        cand = jax.random.categorical(
            sub, jnp.log(jnp.clip(dmin, 1e-12)), shape=(trials,))  # [T]
        cx = x[cand]  # [T, D]
        d_cand = (jnp.sum(x * x, 1)[None, :]
                  + jnp.sum(cx * cx, 1)[:, None]
                  - 2.0 * cx @ x.T)  # [T, N]
        d_new = jnp.minimum(dmin[None, :], d_cand)
        pot = jnp.sum(d_new, axis=1)  # [T]
        best = jnp.argmin(pot)
        centers = centers.at[i].set(cx[best])
        return centers, d_new[best], rng

    centers, _, _ = jax.lax.fori_loop(1, k, body, (centers0, dmin0, rng))
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


@functools.partial(jax.jit, static_argnames=("k", "iters", "n_init"))
def _kmeans_impl(x, k: int, iters: int, key, n_init: int = 1):
    def one(key):
        centers = _init_centers(x, k, key)

        def body(_, centers):
            labels = jnp.argmin(_pairwise_sq_dists(x, centers), axis=1)
            return _update_centers(x, labels, k, centers)

        centers = jax.lax.fori_loop(0, iters, body, centers)
        d = _pairwise_sq_dists(x, centers)
        labels = jnp.argmin(d, axis=1)
        inertia = jnp.sum(jnp.min(d, axis=1))
        return centers, labels, inertia

    if n_init == 1:
        centers, labels, _ = one(key)
        return centers, labels
    centers, labels, inertia = jax.lax.map(one, jax.random.split(key, n_init))
    best = jnp.argmin(inertia)
    return centers[best], labels[best]


def kmeans(x: jnp.ndarray, k: int, iters: int = 10, seed: int = 0,
           n_init: int = 1) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Plain Lloyd k-means (jitted), greedy-++ seeded; best of n_init runs by
    inertia. Returns (centers [K, D], labels [N])."""
    return _kmeans_impl(jnp.asarray(x, jnp.float32), k, iters,
                        jax.random.PRNGKey(seed), n_init)


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
