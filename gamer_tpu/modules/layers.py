"""Core neural building blocks (flax.linen): RMSNorm, RoPE, GQA attention.

TPU-native re-design of the compute primitives the reference inherits from
HF transformers + CUDA SDPA (ref: SeqRec/models/generative/Qwen3Multi/model.py:25-150).
Attention takes a *boolean allowed* mask (built by gamer_tpu/ops/masks.py
predicates inside jit) instead of a materialized additive float mask, and
threads KV caches functionally (explicit state in/out) so the decode loop can
live inside `lax.scan`/`lax.while_loop`.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gamer_tpu.ops.masks import NEG_INF


class RMSNorm(nn.Module):
    """Root-mean-square layer norm (as Qwen3RMSNorm)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        # variance/rsqrt in fp32 for stability, but multiply in the input dtype:
        # promoting x to fp32 here doubles HBM traffic on an activation-sized
        # tensor at every norm site (3+ per layer), and the train step is
        # bandwidth-bound (docs/benchmarks.md).
        y = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return y * scale.astype(x.dtype)


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float = 1e6) -> tuple[jnp.ndarray, jnp.ndarray]:
    """positions [B, S] -> (cos, sin) each [B, S, head_dim] (NeoX half-rotation layout)."""
    half = head_dim // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions.astype(jnp.float32)[..., None] * freqs  # [B, S, half]
    cos = jnp.concatenate([jnp.cos(angles), jnp.cos(angles)], axis=-1)
    sin = jnp.concatenate([jnp.sin(angles), jnp.sin(angles)], axis=-1)
    return cos, sin


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, S, H, D]; cos/sin [B, S, D] (angles computed fp32, applied in
    x.dtype — a fp32 multiply here materializes [B,S,H,D] fp32 per layer)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos.astype(x.dtype)[:, :, None, :]
    sin = sin.astype(x.dtype)[:, :, None, :]
    return x * cos + rotated * sin


def attend(
    q: jnp.ndarray,  # [B, Sq, H, D]
    k: jnp.ndarray,  # [B, Sk, Hkv, D]
    v: jnp.ndarray,  # [B, Sk, Hkv, D]
    allowed: jnp.ndarray,  # [B or 1, 1, Sq, Sk] bool
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Masked GQA attention core. fp32 softmax for stability; MXU matmuls.
    dropout_rate > 0 (training): dropout on the attention probs, matching the
    reference's SDPA attention_dropout (ref Qwen3Multi/model.py:139)."""
    groups = q.shape[2] // k.shape[2]
    b, sq, h, d = q.shape
    sk, hkv = k.shape[1], k.shape[2]
    qg = q.reshape(b, sq, hkv, groups, d)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32) * scale
    bias = jnp.where(allowed[:, :, None], 0.0, NEG_INF)  # [B,1,1,Sq,Sk]
    scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    # no-key rows output ZERO (not the softmax's uniform-over-everything):
    # the same contract as every Pallas kernel generation, so S<=1024 and
    # streaming/XL lengths compute the same function (parity.md #13)
    probs = jnp.where(jnp.any(allowed[:, :, None], axis=-1, keepdims=True),
                      probs, 0.0)
    if dropout_rate > 0.0:
        assert dropout_rng is not None
        from gamer_tpu.modules.dropout import keep_threshold

        thresh, keep_p = keep_threshold(dropout_rate)
        keep = jax.random.bits(dropout_rng, probs.shape, jnp.uint32) >= jnp.uint32(thresh)
        probs = jnp.where(keep, probs / keep_p, 0.0)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.reshape(b, sq, h, d).astype(q.dtype)


def attend_shared_prompt(
    q: jnp.ndarray,  # [B*K, 1, H, D] one decode token per beam
    kp: jnp.ndarray,  # [B, S, Hkv, D] prompt keys, SHARED across beams
    vp: jnp.ndarray,  # [B, S, Hkv, D]
    kg: Optional[jnp.ndarray],  # [B*K, T, Hkv, D] generated keys (T static), or None
    vg: Optional[jnp.ndarray],
    prompt_allowed: jnp.ndarray,  # [B, S] bool (beam-invariant decode row)
    scale: float,
) -> jnp.ndarray:
    """Decode-step attention with a beam-shared prompt KV cache.

    Beam-search decode rows are beam-invariant over the prompt (ops/masks.py:
    self rows = padding mask, cross rows = frozen last-prompt row), so the
    prompt KV never needs tiling to [B*K]: scores against it are computed once
    per example with the beam axis folded into the query. Generated keys (<= L
    per beam) stay per-beam. Cuts decode HBM reads of prompt KV by num_beams x
    versus the tiled-cache layout (ref HF generate tiles everything,
    transformers generation/utils.py _expand_inputs_for_generation).
    All generated columns are allowed (causal is enforced by the caller passing
    only the first T written positions).
    """
    BK, _, H, D = q.shape
    B, S, Hkv, _ = kp.shape
    K = BK // B
    G = H // Hkv
    qb = q.reshape(B, K, Hkv, G, D)
    sp = jnp.einsum("bkhgd,bshd->bkhgs", qb, kp,
                    preferred_element_type=jnp.float32) * scale
    sp = sp + jnp.where(prompt_allowed[:, None, None, None, :], 0.0, NEG_INF)
    sp = sp.reshape(BK, Hkv, G, S)
    if kg is not None and kg.shape[1] > 0:
        qg = q[:, 0].reshape(BK, Hkv, G, D)
        sg = jnp.einsum("nhgd,nthd->nhgt", qg, kg,
                        preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(jnp.concatenate([sp, sg], axis=-1), axis=-1)
        pp, pg = probs[..., :S], probs[..., S:]
        out = jnp.einsum("bkhgs,bshd->bkhgd", pp.reshape(B, K, Hkv, G, S),
                         vp.astype(pp.dtype), preferred_element_type=jnp.float32)
        out = out.reshape(BK, Hkv, G, D) + jnp.einsum(
            "nhgt,nthd->nhgd", pg, vg.astype(pg.dtype),
            preferred_element_type=jnp.float32)
    else:
        pp = jax.nn.softmax(sp, axis=-1)
        # cross stream with a fully-masked frozen row (min-action target
        # behavior): zero, matching the train-path contract (parity.md #13)
        has_key = prompt_allowed.any(-1).reshape(B, 1, 1, 1, 1)
        pp = jnp.where(has_key, pp.reshape(B, K, Hkv, G, S), 0.0)
        out = jnp.einsum("bkhgs,bshd->bkhgd", pp,
                         vp.astype(pp.dtype),
                         preferred_element_type=jnp.float32).reshape(BK, Hkv, G, D)
    return out.reshape(BK, 1, H, D).astype(q.dtype)


def pallas_attention_ok(S: int) -> bool:
    """Every S has a kernel generation: S <= MONO_MAX uses the monolithic
    kernel (full S x S score tile in VMEM); up to STREAM_MAX the streaming
    kernels keep full-row k/v in VMEM; beyond that the XL kernels grid over
    key blocks with scratch-carried online softmax — S is unbounded
    (ops/pallas_attention.py)."""
    return True


class GQAAttention(nn.Module):
    """Qwen3-style grouped-query attention with per-head q/k RMS norm.

    With `is_cross=True` this is the GAMER behavior cross-attention
    (ref: Qwen3Multi/model.py:60-95,146-149): per-action behavior embeddings of
    width head_dim are added to q/k/v before norm/rope, and the output is gated
    by silu(gating(x)).

    `mask_kind` + `streams` select the fused Pallas kernel
    (ops/pallas_attention.py) on the train path (no KV cache): the mask is then
    evaluated inside the kernel instead of materializing `allowed`.
    """

    num_heads: int
    num_kv_heads: int
    head_dim: int
    rope_theta: float = 1e6
    rms_eps: float = 1e-6
    attention_bias: bool = False
    is_cross: bool = False
    num_behavior: int = 0
    dtype: Any = jnp.float32
    attention_impl: str = "jnp"  # "jnp" | "pallas" | "pallas_interpret"
    # attention-prob dropout rate (training only; ref SDPA attention_dropout)
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, S, D]
        positions: jnp.ndarray,  # [B, S] rope positions
        allowed: jnp.ndarray,  # [B or 1, 1, S, Sk] bool
        action_index: Optional[jnp.ndarray] = None,  # [B, S] (cross only)
        kv_cache: Optional[dict] = None,  # {"k": [B, K, Hkv, D], "v": ...}
        cache_index: Optional[jnp.ndarray] = None,  # scalar write offset
        mask_kind: Optional[str] = None,
        streams: Optional[dict] = None,
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, Optional[dict]]:
        b, s, d_model = x.shape
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=self.attention_bias, dtype=self.dtype, name=name)
        q = dense(self.num_heads * self.head_dim, "q_proj")(x).reshape(b, s, self.num_heads, self.head_dim)
        k = dense(self.num_kv_heads * self.head_dim, "k_proj")(x).reshape(b, s, self.num_kv_heads, self.head_dim)
        v = dense(self.num_kv_heads * self.head_dim, "v_proj")(x).reshape(b, s, self.num_kv_heads, self.head_dim)

        if self.is_cross:
            assert action_index is not None
            emb = lambda h, name: nn.Embed(
                self.num_behavior + 1, h * self.head_dim, dtype=self.dtype, name=name)
            q = q + emb(self.num_heads, "q_behavior_embedding")(action_index).reshape(
                b, s, self.num_heads, self.head_dim)
            k = k + emb(self.num_kv_heads, "k_behavior_embedding")(action_index).reshape(
                b, s, self.num_kv_heads, self.head_dim)
            v = v + emb(self.num_kv_heads, "v_behavior_embedding")(action_index).reshape(
                b, s, self.num_kv_heads, self.head_dim)

        q = RMSNorm(self.rms_eps, name="q_norm")(q)
        k = RMSNorm(self.rms_eps, name="k_norm")(k)
        cos, sin = rope_cos_sin(positions, self.head_dim, self.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if kv_cache is not None and "k_prompt" in kv_cache:
            # Beam-decode path: prompt KV shared [B, S], generated KV per-beam.
            # `allowed` is the beam-invariant prompt row [B, 1, 1, S] (or [B, S]);
            # `cache_index` must be a static int (the unrolled decode step).
            prompt_allowed = allowed if allowed.ndim == 2 else allowed[:, 0, 0, :]
            if "k" in kv_cache:  # self stream: write, then read [0, idx]
                assert isinstance(cache_index, int)
                k_all = jax.lax.dynamic_update_slice(
                    kv_cache["k"], k.astype(kv_cache["k"].dtype), (0, cache_index, 0, 0))
                v_all = jax.lax.dynamic_update_slice(
                    kv_cache["v"], v.astype(kv_cache["v"].dtype), (0, cache_index, 0, 0))
                new_cache = {**kv_cache, "k": k_all, "v": v_all}
                kg, vg = k_all[:, :cache_index + 1], v_all[:, :cache_index + 1]
            else:  # cross stream: generated keys are never attended (masks.py)
                new_cache = kv_cache
                kg = vg = None
            out = attend_shared_prompt(
                q, kv_cache["k_prompt"], kv_cache["v_prompt"], kg, vg,
                prompt_allowed, self.head_dim ** -0.5)
            out = out.reshape(b, s, self.num_heads * self.head_dim)
            out = dense(d_model, "o_proj")(out)
            if self.is_cross:
                gate = dense(d_model, "gating")(x)
                out = out * jax.nn.silu(gate)
            return out, new_cache

        new_cache = None
        if kv_cache is not None:
            assert cache_index is not None
            k_all = jax.lax.dynamic_update_slice(kv_cache["k"], k.astype(kv_cache["k"].dtype), (0, cache_index, 0, 0))
            v_all = jax.lax.dynamic_update_slice(kv_cache["v"], v.astype(kv_cache["v"].dtype), (0, cache_index, 0, 0))
            new_cache = {"k": k_all, "v": v_all}
            k, v = k_all, v_all

        use_pallas = (
            self.attention_impl.startswith("pallas")
            and kv_cache is None
            and mask_kind is not None
            and streams is not None
            and pallas_attention_ok(s)
        )
        attn_drop = 0.0 if deterministic else self.dropout_rate
        if use_pallas:
            from gamer_tpu.ops.pallas_attention import fused_mask_attention

            seed = (jax.random.randint(self.make_rng("dropout"), (), 0,
                                       jnp.iinfo(jnp.int32).max, jnp.int32)
                    if attn_drop > 0.0 else jnp.int32(0))
            # flat head-contiguous layout: reshape is a bitcast, no transposes
            out = fused_mask_attention(
                q.reshape(b, s, self.num_heads * self.head_dim),
                k.reshape(b, s, self.num_kv_heads * self.head_dim),
                v.reshape(b, s, self.num_kv_heads * self.head_dim),
                streams["attention_mask"], streams["session_ids"],
                streams["actions"], streams["block_ids"], seed,
                self.num_heads, mask_kind, self.attention_impl == "pallas_interpret",
                attn_drop,
            )
        else:
            out = attend(q, k, v, allowed, self.head_dim ** -0.5,
                         dropout_rate=attn_drop,
                         dropout_rng=(self.make_rng("dropout")
                                      if attn_drop > 0.0 else None))
        out = out.reshape(b, s, self.num_heads * self.head_dim)
        out = dense(d_model, "o_proj")(out)
        if self.is_cross:
            gate = dense(d_model, "gating")(x)
            out = out * jax.nn.silu(gate)
        return out, new_cache

    @staticmethod
    def init_cache(batch: int, max_len: int, num_kv_heads: int, head_dim: int, dtype=jnp.float32) -> dict:
        return {
            "k": jnp.zeros((batch, max_len, num_kv_heads, head_dim), dtype),
            "v": jnp.zeros((batch, max_len, num_kv_heads, head_dim), dtype),
        }
