"""BERT-style post-LN transformer encoder for the discriminative models.

Mirrors the reference's shared encoder (ref: SeqRec/modules/layers/transformer.py:
TransformerEncoderLayer/TransformerEncoder — post-norm residual blocks, additive
float mask) and the DotProductPredictionHead (ref :186-215).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gamer_tpu.ops.masks import NEG_INF


def _act(name: str) -> Callable:
    return {"gelu": nn.gelu, "relu": nn.relu, "silu": nn.silu, "swish": nn.silu,
            "tanh": jnp.tanh}[name]


class MultiHeadAttention(nn.Module):
    d_model: int
    n_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, allowed: jnp.ndarray, deterministic: bool = True,
                 kv: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        H = self.n_heads
        dk = self.d_model // H
        src = x if kv is None else kv
        b, s, _ = x.shape
        q = nn.Dense(self.d_model, name="q")(x).reshape(b, s, H, dk)
        k = nn.Dense(self.d_model, name="k")(src).reshape(b, src.shape[1], H, dk)
        v = nn.Dense(self.d_model, name="v")(src).reshape(b, src.shape[1], H, dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(dk)
        scores = scores + jnp.where(allowed, 0.0, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v).reshape(b, s, self.d_model)
        return nn.Dense(self.d_model, name="o")(out)


class TransformerEncoderLayer(nn.Module):
    d_model: int
    n_heads: int
    d_ff: int
    dropout: float = 0.0
    activation: str = "gelu"
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray, allowed: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        a = MultiHeadAttention(self.d_model, self.n_heads, self.dropout,
                               name="attn")(x, allowed, deterministic)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="ln1")(
            x + nn.Dropout(self.dropout, deterministic=deterministic)(a))
        f = nn.Dense(self.d_ff, name="ff1")(x)
        f = _act(self.activation)(f)
        f = nn.Dropout(self.dropout, deterministic=deterministic)(f)
        f = nn.Dense(self.d_model, name="ff2")(f)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="ln2")(
            x + nn.Dropout(self.dropout, deterministic=deterministic)(f))
        return x


class TransformerEncoder(nn.Module):
    n_layers: int
    d_model: int
    n_heads: int
    d_ff: int
    dropout: float = 0.0
    activation: str = "gelu"
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray, allowed: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.n_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.n_heads, self.d_ff, self.dropout,
                self.activation, self.layer_norm_eps, name=f"layer_{i}")(
                x, allowed, deterministic)
        return x


def attention_allowed(item_seq: jnp.ndarray, bidirectional: bool = False) -> jnp.ndarray:
    """[B, L] padded item ids (0 = pad) -> [B, 1, L, L] boolean allowed mask
    (ref seq_model.py:50-62)."""
    B, L = item_seq.shape
    key_ok = (item_seq != 0)[:, None, None, :]
    key_ok = jnp.broadcast_to(key_ok, (B, 1, L, L))
    if bidirectional:
        return key_ok
    i = jnp.arange(L)
    return key_ok & (i[:, None] >= i[None, :])[None, None]
