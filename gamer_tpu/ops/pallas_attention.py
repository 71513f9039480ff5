"""Pallas TPU kernel: fused attention with the GAMER mask family.

The reference materializes [B, 1, S, S] float masks on the host and hands them
to CUDA SDPA (ref: SeqRec/models/generative/Qwen3Multi/model.py:573-741). The
jnp fallback (modules/layers.attend) already builds masks lazily inside jit,
but XLA still writes the [B, h, S, S] score tensor to HBM. This kernel keeps
scores in VMEM: each program computes one query tile against the full key
range, evaluates the mask predicate from the integer streams *inside* the
kernel, and writes only the [BQ, D] output tile — HBM traffic drops from
O(S^2) to O(S·D) per head.

Supported mask kinds (see ops/masks.py for semantics):
  self:  "causal" | "session"        cross: "multi" | "session_multi"

Layout: q [B, H, S, D], k/v [B, Hkv, S, D] (GQA: program h reads kv head
h // (H // Hkv)). Whole-K tiles are held in VMEM, so S is bounded by VMEM
(~2k at D=64 fp32) — ample for GAMER sequences (max_his_len 100 -> S ~ 512).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _mask_tile(kind: str, qpos, kpos, q_sid, k_sid, q_act, k_act, q_blk, k_blk, k_ok):
    """Boolean allowed tile [BQ, S] from per-token streams."""
    causal = qpos[:, None] >= kpos[None, :]
    if kind == "causal":
        allowed = causal
    elif kind == "session":
        same_block = (q_blk[:, None] == k_blk[None, :]) & (q_blk[:, None] >= 0)
        allowed = (same_block & causal) | (k_sid[None, :] < q_sid[:, None])
    elif kind == "multi":
        allowed = causal & (k_act[None, :] < q_act[:, None])
    elif kind == "session_multi":
        allowed = (k_sid[None, :] < q_sid[:, None]) & (k_act[None, :] < q_act[:, None])
    else:
        raise ValueError(kind)
    return allowed & (k_ok[None, :] == 1)


def _attention_kernel(q_ref, k_ref, v_ref, attn_ref, sid_ref, act_ref, blk_ref,
                      qsid_ref, qact_ref, qblk_ref,
                      out_ref, *, kind: str, scale: float, block_q: int):
    iq = pl.program_id(2)
    q = q_ref[0, 0]  # [BQ, D]
    k = k_ref[0, 0]  # [S, D]
    v = v_ref[0, 0]  # [S, D]
    S = k.shape[0]

    qpos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)[:, 0]
    kpos = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)[:, 0]
    k_ok = attn_ref[0, 0]
    sid = sid_ref[0, 0]
    act = act_ref[0, 0]
    blk = blk_ref[0, 0]
    q_sid = qsid_ref[0, 0]
    q_act = qact_ref[0, 0]
    q_blk = qblk_ref[0, 0]

    allowed = _mask_tile(kind, qpos, kpos, q_sid, sid, q_act, act, q_blk, blk, k_ok)

    scores = jnp.dot(q.astype(jnp.float32), k.astype(jnp.float32).T,
                     preferred_element_type=jnp.float32) * scale
    scores = jnp.where(allowed, scores, NEG)
    # fully-masked rows (e.g. pad queries) -> uniform probs over junk; their
    # outputs are never consumed, but keep them finite
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    out = jnp.dot(probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kind", "block_q", "interpret"))
def fused_mask_attention(
    q: jnp.ndarray,  # [B, H, S, D]
    k: jnp.ndarray,  # [B, Hkv, S, D]
    v: jnp.ndarray,  # [B, Hkv, S, D]
    attention_mask: jnp.ndarray,  # [B, S] int32
    session_ids: jnp.ndarray,  # [B, S] int32
    actions: jnp.ndarray,  # [B, S] int32
    block_ids: jnp.ndarray,  # [B, S] int32 (item-block index, -1 at pads)
    kind: str = "causal",
    block_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, S, D = q.shape
    Hkv = k.shape[1]
    G = H // Hkv
    block_q = min(block_q, S)
    assert S % block_q == 0, f"S={S} must be a multiple of block_q={block_q}"
    grid = (B, H, S // block_q)
    scale = D ** -0.5

    kernel = functools.partial(_attention_kernel, kind=kind, scale=scale,
                               block_q=block_q)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, iq: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, iq: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, iq: (b, h // G, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, h, iq: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, h, iq: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, h, iq: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, h, iq: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, iq: (b, 0, iq)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, iq: (b, 0, iq)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, iq: (b, 0, iq)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, iq: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        interpret=interpret,
    )(q, k, v,
      attention_mask.astype(jnp.int32)[:, None, :],
      session_ids.astype(jnp.int32)[:, None, :],
      actions.astype(jnp.int32)[:, None, :],
      block_ids.astype(jnp.int32)[:, None, :],
      session_ids.astype(jnp.int32)[:, None, :],
      actions.astype(jnp.int32)[:, None, :],
      block_ids.astype(jnp.int32)[:, None, :])
