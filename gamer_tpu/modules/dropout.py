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


class BitDropout(nn.Module):
    rate: float
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        threshold, keep_prob = keep_threshold(self.rate, bits=16)
        rng = self.make_rng(self.rng_collection)
        # two u16 lanes per 32-bit generator word: threefry's sub-32-bit draw
        # runs one full 2x32 hash per ELEMENT and truncates (jax
        # _threefry_random_bits_partitionable), so drawing half as many u32
        # words and bitcasting halves the hash work; under rbg it halves the
        # RngBitGenerator output volume.
        n = x.size
        half = (n + 1) // 2
        bits32 = jax.random.bits(rng, (half,), jnp.uint32)
        bits = jax.lax.bitcast_convert_type(bits32, jnp.uint16)
        bits = bits.reshape(-1)[:n].reshape(x.shape)
        keep = bits >= jnp.uint16(threshold)
        scale = jnp.asarray(1.0 / keep_prob, x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))
