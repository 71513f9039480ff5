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


def _masked_probs(kind, q, k, scale, pos, k_ok, sid, act, blk, rows=None):
    """rows=(r0, r1) restricts the query side to a row chunk (flash-style
    blocked backward); streams are always full-length key-side vectors."""
    if rows is None:
        qpos, qsid, qact, qblk = pos, sid, act, blk
    else:
        r0, r1 = rows
        qpos, qsid, qact, qblk = pos[r0:r1], sid[r0:r1], act[r0:r1], blk[r0:r1]
    allowed = _mask_tile(kind, qpos, pos, qsid, sid, qact, act, qblk, blk, k_ok)
    # operands in their native dtype (bf16 on the train path): the MXU
    # accumulates in fp32 via preferred_element_type, and skipping the f32
    # casts avoids [S,D] fp32 copies in VMEM
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    scores = jnp.where(allowed, scores, NEG)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)


def _fwd_kernel(q_ref, k_ref, v_ref, attn_ref, sid_ref, act_ref, blk_ref,
                out_ref, *, kind: str, scale: float, num_heads: int):
    """One program per batch element; heads are static column slices of the
    projection-native [S, H*D] block (one HBM pass, no transposes)."""
    S, HD = q_ref.shape[1], q_ref.shape[2]
    D = HD // num_heads
    G = num_heads // (k_ref.shape[2] // D)
    pos, k_ok, sid, act, blk = _streams_from_refs(attn_ref, sid_ref, act_ref, blk_ref, S)
    for h in range(num_heads):
        q = q_ref[0, :, h * D:(h + 1) * D]
        kc = (h // G) * D
        k = k_ref[0, :, kc:kc + D]
        v = v_ref[0, :, kc:kc + D]
        probs = _masked_probs(kind, q, k, scale, pos, k_ok, sid, act, blk)
        out_ref[0, :, h * D:(h + 1) * D] = jnp.dot(
            probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, dout_ref, attn_ref, sid_ref, act_ref, blk_ref,
                dq_ref, dk_ref, dv_ref, *, kind: str, scale: float,
                num_heads: int, groups: int):
    """One program per batch element: loops kv heads x their GQA query group,
    recomputes probs and emits gradients (flash-attention backward math)."""
    S = k_ref.shape[1]
    D = k_ref.shape[2] // (num_heads // groups)
    pos, k_ok, sid, act, blk = _streams_from_refs(attn_ref, sid_ref, act_ref, blk_ref, S)

    # Operands stay in the input dtype (bf16 in training) — the MXU takes them
    # natively with fp32 accumulation via preferred_element_type. Only P/dP are
    # fp32 [S,S]; dS is rounded to the input dtype immediately so at most two
    # fp32 [S,S] tensors are ever live (S=1024 OOMs VMEM otherwise).
    dt = q_ref.dtype
    # query rows are processed in chunks so only [C, S] score-sized fp32
    # temporaries live in VMEM at once — whole-row backward OOMs at S ~ 1024
    CHUNK = 512
    for hk in range(num_heads // groups):
        k = k_ref[0, :, hk * D:(hk + 1) * D]
        v = v_ref[0, :, hk * D:(hk + 1) * D]
        dk_acc = jnp.zeros((S, D), jnp.float32)
        dv_acc = jnp.zeros((S, D), jnp.float32)
        for g in range(groups):
            col = (hk * groups + g) * D
            for r0 in range(0, S, CHUNK):
                r1 = min(S, r0 + CHUNK)
                q = q_ref[0, r0:r1, col:col + D]
                dout = dout_ref[0, r0:r1, col:col + D]
                P = _masked_probs(kind, q, k, scale, pos, k_ok, sid, act, blk,
                                  rows=(r0, r1))  # [C, S] f32
                Pd = P.astype(dt)
                # all uses of P precede dS so its buffer can be reclaimed
                dv_acc += jnp.dot(Pd.T, dout, preferred_element_type=jnp.float32)
                Drow = jnp.sum(dout.astype(jnp.float32)
                               * jnp.dot(Pd, v, preferred_element_type=jnp.float32),
                               axis=-1, keepdims=True)
                dP = jnp.dot(dout, v.T, preferred_element_type=jnp.float32)
                dS = (P * (dP - Drow)).astype(dt)  # P and dP die here
                dq_ref[0, r0:r1, col:col + D] = (
                    jnp.dot(dS, k, preferred_element_type=jnp.float32) * scale
                ).astype(dq_ref.dtype)
                dk_acc += jnp.dot(dS.T, q, preferred_element_type=jnp.float32) * scale
        dk_ref[0, :, hk * D:(hk + 1) * D] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, hk * D:(hk + 1) * D] = dv_acc.astype(dv_ref.dtype)


def _stream_args(attention_mask, session_ids, actions, block_ids):
    return (attention_mask.astype(jnp.int32)[:, None, :],
            session_ids.astype(jnp.int32)[:, None, :],
            actions.astype(jnp.int32)[:, None, :],
            block_ids.astype(jnp.int32)[:, None, :])


def _stream_spec(S):
    return pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_mask_attention(q, k, v, attention_mask, session_ids, actions, block_ids,
                         num_heads: int, kind: str = "causal",
                         interpret: bool = False):
    """q [B, S, H*D] (projection-native layout, head h = columns [h*D,(h+1)*D)),
    k/v [B, S, Hkv*D] -> out [B, S, H*D].

    Taking the flat head-contiguous layout lets the BlockSpec index map slice
    one head per program as contiguous lanes — no [B,H,S,D] transpose copies on
    either side of the kernel. Masks are evaluated inside the kernel from the
    integer streams (all [B, S])."""
    return _forward(q, k, v, attention_mask, session_ids, actions, block_ids,
                    num_heads, kind, interpret)


def _forward(q, k, v, attention_mask, session_ids, actions, block_ids,
             num_heads, kind, interpret):
    B, S, HD = q.shape
    D = HD // num_heads
    kernel = functools.partial(_fwd_kernel, kind=kind, scale=D ** -0.5,
                               num_heads=num_heads)
    full = lambda width: pl.BlockSpec((1, S, width), lambda b: (b, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[full(HD), full(k.shape[2]), full(v.shape[2]),
                  _stream_spec(S), _stream_spec(S), _stream_spec(S), _stream_spec(S)],
        out_specs=full(HD),
        out_shape=jax.ShapeDtypeStruct((B, S, HD), q.dtype),
        interpret=interpret,
    )(q, k, v, *_stream_args(attention_mask, session_ids, actions, block_ids))


def _fwd_rule(q, k, v, attention_mask, session_ids, actions, block_ids,
              num_heads, kind, interpret):
    out = _forward(q, k, v, attention_mask, session_ids, actions, block_ids,
                   num_heads, kind, interpret)
    return out, (q, k, v, attention_mask, session_ids, actions, block_ids)


def _bwd_rule(num_heads, kind, interpret, residuals, dout):
    q, k, v, attention_mask, session_ids, actions, block_ids = residuals
    B, S, HD = q.shape
    D = HD // num_heads
    Hkv = k.shape[2] // D
    G = num_heads // Hkv
    kernel = functools.partial(_bwd_kernel, kind=kind, scale=D ** -0.5,
                               num_heads=num_heads, groups=G)
    full = lambda width: pl.BlockSpec((1, S, width), lambda b: (b, 0, 0))
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[full(HD), full(Hkv * D), full(Hkv * D), full(HD),
                  _stream_spec(S), _stream_spec(S), _stream_spec(S), _stream_spec(S)],
        out_specs=(full(HD), full(Hkv * D), full(Hkv * D)),
        out_shape=(jax.ShapeDtypeStruct((B, S, HD), q.dtype),
                   jax.ShapeDtypeStruct((B, S, Hkv * D), k.dtype),
                   jax.ShapeDtypeStruct((B, S, Hkv * D), v.dtype)),
        interpret=interpret,
    )(q, k, v, dout,
      *_stream_args(attention_mask, session_ids, actions, block_ids))
    return dq, dk, dv, None, None, None, None


fused_mask_attention.defvjp(_fwd_rule, _bwd_rule)
