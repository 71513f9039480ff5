"""Pallas TPU kernels: fused attention with the GAMER mask family (+ custom VJP).

The reference materializes [B, 1, S, S] float masks on the host and hands them
to CUDA SDPA (ref: SeqRec/models/generative/Qwen3Multi/model.py:573-741). The
jnp fallback (modules/layers.attend) builds masks lazily inside jit, but XLA
still writes [B, h, S, S] score tensors to HBM. These kernels keep scores in
VMEM: each program handles one (batch, head) — at GAMER scale (S <= ~1024,
D = 64) the full S x S score tile fits on-chip — evaluates the mask predicate
from the integer streams inside the kernel, and writes only O(S*D) per head.

A custom VJP provides the backward pass (jax cannot autodiff through
pallas_call): the backward kernel recomputes the masked softmax and emits
dq / dk / dv, accumulating dk/dv over the GQA query-head group so no atomics
are needed (grid over kv heads).

Supported mask kinds (semantics in ops/masks.py):
  self:  "causal" | "session"        cross: "multi" | "session_multi"
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _mask_tile(kind: str, qpos, kpos, q_sid, k_sid, q_act, k_act, q_blk, k_blk, k_ok):
    """Boolean allowed tile [Sq, Sk] from per-token streams."""
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


def _streams_from_refs(attn_ref, sid_ref, act_ref, blk_ref, S):
    pos = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)[:, 0]
    return pos, attn_ref[0, 0], sid_ref[0, 0], act_ref[0, 0], blk_ref[0, 0]


def _masked_probs(kind, q, k, scale, pos, k_ok, sid, act, blk):
    allowed = _mask_tile(kind, pos, pos, sid, sid, act, act, blk, blk, k_ok)
    scores = jnp.dot(q.astype(jnp.float32), k.astype(jnp.float32).T,
                     preferred_element_type=jnp.float32) * scale
    scores = jnp.where(allowed, scores, NEG)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)


def _fwd_kernel(q_ref, k_ref, v_ref, attn_ref, sid_ref, act_ref, blk_ref,
                out_ref, *, kind: str, scale: float):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    S = k.shape[0]
    pos, k_ok, sid, act, blk = _streams_from_refs(attn_ref, sid_ref, act_ref, blk_ref, S)
    probs = _masked_probs(kind, q, k, scale, pos, k_ok, sid, act, blk)
    out_ref[0, 0] = jnp.dot(probs.astype(v.dtype), v,
                            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, dout_ref, attn_ref, sid_ref, act_ref, blk_ref,
                dq_ref, dk_ref, dv_ref, *, kind: str, scale: float, groups: int):
    """One program per (batch, kv head): loops over the GQA query-head group,
    recomputes probs and emits gradients (flash-attention backward math)."""
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    S = k.shape[0]
    pos, k_ok, sid, act, blk = _streams_from_refs(attn_ref, sid_ref, act_ref, blk_ref, S)

    dk_acc = jnp.zeros_like(k)
    dv_acc = jnp.zeros_like(v)
    for g in range(groups):
        q = q_ref[0, g].astype(jnp.float32)
        dout = dout_ref[0, g].astype(jnp.float32)
        P = _masked_probs(kind, q, k, scale, pos, k_ok, sid, act, blk)  # [S, S]
        dP = jnp.dot(dout, v.T, preferred_element_type=jnp.float32)
        Drow = jnp.sum(dout * jnp.dot(P, v, preferred_element_type=jnp.float32),
                       axis=-1, keepdims=True)
        dS = P * (dP - Drow)  # [S, S]
        dq_ref[0, g] = (jnp.dot(dS, k, preferred_element_type=jnp.float32)
                        * scale).astype(dq_ref.dtype)
        dk_acc += jnp.dot(dS.T, q, preferred_element_type=jnp.float32) * scale
        dv_acc += jnp.dot(P.T, dout, preferred_element_type=jnp.float32)
    dk_ref[0, 0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc.astype(dv_ref.dtype)


def _stream_args(attention_mask, session_ids, actions, block_ids):
    return (attention_mask.astype(jnp.int32)[:, None, :],
            session_ids.astype(jnp.int32)[:, None, :],
            actions.astype(jnp.int32)[:, None, :],
            block_ids.astype(jnp.int32)[:, None, :])


def _head_spec(S, D):
    return pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0))


def _kv_spec(S, D, G):
    return pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h // G, 0, 0))


def _stream_spec(S):
    return pl.BlockSpec((1, 1, S), lambda b, h: (b, 0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_mask_attention(q, k, v, attention_mask, session_ids, actions, block_ids,
                         kind: str = "causal", interpret: bool = False):
    """q [B, H, S, D], k/v [B, Hkv, S, D] -> out [B, H, S, D].

    Mask evaluated inside the kernel from the integer streams (all [B, S])."""
    return _forward(q, k, v, attention_mask, session_ids, actions, block_ids,
                    kind, interpret)


def _forward(q, k, v, attention_mask, session_ids, actions, block_ids, kind,
             interpret):
    B, H, S, D = q.shape
    G = H // k.shape[1]
    kernel = functools.partial(_fwd_kernel, kind=kind, scale=D ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[_head_spec(S, D), _kv_spec(S, D, G), _kv_spec(S, D, G),
                  _stream_spec(S), _stream_spec(S), _stream_spec(S), _stream_spec(S)],
        out_specs=_head_spec(S, D),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        interpret=interpret,
    )(q, k, v, *_stream_args(attention_mask, session_ids, actions, block_ids))


def _fwd_rule(q, k, v, attention_mask, session_ids, actions, block_ids, kind,
              interpret):
    out = _forward(q, k, v, attention_mask, session_ids, actions, block_ids,
                   kind, interpret)
    return out, (q, k, v, attention_mask, session_ids, actions, block_ids)


def _bwd_rule(kind, interpret, residuals, dout):
    q, k, v, attention_mask, session_ids, actions, block_ids = residuals
    B, H, S, D = q.shape
    Hkv = k.shape[1]
    G = H // Hkv
    kernel = functools.partial(_bwd_kernel, kind=kind, scale=D ** -0.5, groups=G)
    group_q = pl.BlockSpec((1, G, S, D), lambda b, h: (b, h, 0, 0))
    kv = pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0))
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, Hkv),
        in_specs=[group_q, kv, kv, group_q,
                  _stream_spec(S), _stream_spec(S), _stream_spec(S), _stream_spec(S)],
        out_specs=(group_q, kv, kv),
        out_shape=(jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
                   jax.ShapeDtypeStruct((B, Hkv, S, D), k.dtype),
                   jax.ShapeDtypeStruct((B, Hkv, S, D), v.dtype)),
        interpret=interpret,
    )(q, k, v, dout,
      *_stream_args(attention_mask, session_ids, actions, block_ids))
    return dq, dk, dv, None, None, None, None


fused_mask_attention.defvjp(_fwd_rule, _bwd_rule)
