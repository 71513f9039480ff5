"""Bit-compare dropout: uint16 rng compare instead of float32 uniforms.

`jax.random.bernoulli` (inside flax's nn.Dropout) draws float32 uniforms per
element; here the keep-mask is a uint16 bit compare — half the rng-word width
— with the keep probability quantized to 1/65536 (for rate 0.2 the effective
rate is 0.19999695, statistically indistinguishable). Measured on the flagship
step (docs/benchmarks.md "Dropout path"): ~1% faster than nn.Dropout under
threefry keys, parity under rbg keys (XLA fuses the uniform compare either
way); the decisive dropout-cost lever is the rbg key impl (train/loop.py).

Semantics otherwise match nn.Dropout (inverted scaling by 1/keep_prob, rng
stream "dropout"), ref: torch F.dropout in e.g.
SeqRec/models/generative/Qwen3Moe/FFN.py:23-26.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp


def keep_threshold(rate: float, bits: int = 32) -> tuple[int, float]:
    """Quantized drop threshold + exact keep probability for a `bits`-wide
    uniform compare (drop when rng word < threshold).

    Clamped to span-1 so any rate < 1.0 keeps a nonzero keep probability
    (rate=1.0 is handled separately by callers). Single source of truth for
    every uniform-compare dropout in the repo; the Pallas kernel's
    `ops.pallas_attention.keep_fraction` is the same formula (ops must not
    import modules) — equivalence is pinned by tests/test_attention_dropout.py.
    """
    span = 1 << bits
    thresh = min(int(round(rate * span)), span - 1)
    return thresh, (span - thresh) / span


def _keep_mask(rng, shape, n, threshold):
    # two u16 lanes per 32-bit generator word: threefry's sub-32-bit draw
    # runs one full 2x32 hash per ELEMENT and truncates (jax
    # _threefry_random_bits_partitionable), so drawing half as many u32
    # words and bitcasting halves the hash work; under rbg it halves the
    # RngBitGenerator output volume.
    half = (n + 1) // 2
    bits32 = jax.random.bits(rng, (half,), jnp.uint32)
    bits = jax.lax.bitcast_convert_type(bits32, jnp.uint16)
    bits = bits.reshape(-1)[:n].reshape(shape)
    return bits >= jnp.uint16(threshold)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _bit_dropout(x, rng, threshold, keep_prob):
    keep = _keep_mask(rng, x.shape, x.size, threshold)
    scale = jnp.asarray(1.0 / keep_prob, x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


def _bit_dropout_fwd(x, rng, threshold, keep_prob):
    # Residual is the KEY ONLY: the backward regenerates the mask bits
    # instead of autodiff saving a pred[x.shape] mask buffer through the
    # whole backward (round-4 byte inventory: those saved masks were the #2
    # HBM byte class). rng regen under rbg keys is far cheaper than the
    # mask's HBM round-trip.
    return _bit_dropout(x, rng, threshold, keep_prob), (rng, x.shape, x.size)


def _bit_dropout_bwd(threshold, keep_prob, res, g):
    rng, shape, n = res
    keep = _keep_mask(rng, shape, n, threshold)
    scale = jnp.asarray(1.0 / keep_prob, g.dtype)
    dx = jnp.where(keep, g * scale, jnp.zeros((), g.dtype))
    return dx, None


_bit_dropout.defvjp(_bit_dropout_fwd, _bit_dropout_bwd)


class BitDropout(nn.Module):
    rate: float
    rng_collection: str = "dropout"
    impl: str = "bits"  # "bits" (u16 rng-stream compare) | "hash" (fmix32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        rng = self.make_rng(self.rng_collection)
        if self.impl == "hash":
            threshold, keep_prob = keep_threshold(self.rate, bits=32)
            seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max,
                                      jnp.int32).astype(jnp.uint32)
            return _hash_dropout(x, seed, threshold, keep_prob)
        threshold, keep_prob = keep_threshold(self.rate, bits=16)
        return _bit_dropout(x, rng, threshold, keep_prob)


# ---------------------------------------------------------------------------
# Stateless-hash variant ("hash" impl): the keep mask is an fmix32 of the
# element's flat index (same single-mul mixer as the Pallas kernels'
# ops/pallas_attention.dropout_keep_tile, same 32-bit threshold quantization
# via keep_threshold(rate, bits=32)). Unlike the rng-stream variant, the mask
# is a pure elementwise function of (seed, index): XLA fuses the hash into the
# consuming fusion, so no RngBitGenerator output buffer and no pred mask is
# materialized in HBM — the round-5 post-kernel byte inventory showed the
# residual-stream dropout still writing ~12 GB/step (drop0 delta) through the
# rng path. Backward regenerates the mask from the seed (residual = seed).
# ---------------------------------------------------------------------------

import numpy as np

_M1 = np.uint32(0x85EBCA6B)
_M3 = np.uint32(0x9E3779B1)


def _hash_keep_mask(seed, shape, n, threshold):
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    x = idx * _M3 + seed
    x = x ^ (x >> 16)
    x = x * _M1
    x = x ^ (x >> 15)
    return (x >= jnp.uint32(threshold)).reshape(shape)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _hash_dropout(x, seed, threshold, keep_prob):
    keep = _hash_keep_mask(seed, x.shape, x.size, threshold)
    scale = jnp.asarray(1.0 / keep_prob, x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


def _hash_dropout_fwd(x, seed, threshold, keep_prob):
    return _hash_dropout(x, seed, threshold, keep_prob), (seed, x.shape, x.size)


def _hash_dropout_bwd(threshold, keep_prob, res, g):
    seed, shape, n = res
    keep = _hash_keep_mask(seed, shape, n, threshold)
    scale = jnp.asarray(1.0 / keep_prob, g.dtype)
    return jnp.where(keep, g * scale, jnp.zeros((), g.dtype)), None


_hash_dropout.defvjp(_hash_dropout_fwd, _hash_dropout_bwd)
