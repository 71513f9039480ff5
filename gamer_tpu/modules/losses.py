"""Loss functions.

`causal_lm_loss` mirrors the reference's temperature-scaled causal-LM CE
(ref: SeqRec/models/generative/Qwen3Multi/model.py:897-925 — every generative
model divides logits by `temperature` before ForCausalLMLoss; scripts pass 0.7,
ref scripts/train_SMB_decoder.sh:131-139). BPR / full-softmax CE serve the
discriminative family (ref: SeqRec/modules/loss/BPR.py:5,
SeqRec/modules/model_base/seq_model.py:64-82).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_LABEL = -100


def causal_lm_loss_with_denom(
    logits: jnp.ndarray,  # [B, S, V]
    labels: jnp.ndarray,  # [B, S] with IGNORE_LABEL masked
    temperature: float = 1.0,
    row_valid: jnp.ndarray | None = None,  # [B] 0/1 (batch-padding rows)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Next-token CE plus the valid-target count it averaged over.

    The denom lets callers recover a *global token mean* across batches (the
    reference's per-token CE average under the HF Trainer) instead of a mean
    of batch means — batches with more valid targets must weigh more.
    """
    logits = logits[:, :-1, :]  # stay in the model compute dtype (bf16)
    targets = labels[:, 1:]
    valid = targets != IGNORE_LABEL
    if row_valid is not None:
        valid = valid & (row_valid[:, None] == 1)
    safe_targets = jnp.where(valid, targets, 0)
    # nll = logsumexp - target_logit (same math as -log_softmax[target]).
    # Each [B, S] reduction converts to fp32 ON THE FLY inside its own fused
    # loop: giving the fp32 view a single consumer keeps XLA from
    # materializing a full [B, S, V] fp32 copy of the logits in HBM (round-4
    # byte inventory: that copy was the largest single fwd buffer, 202 MB at
    # micro 64). A fp32 cast of bf16 matmul outputs adds no information, so
    # this is bit-equivalent precision-wise to casting first.
    inv_t = jnp.float32(1.0 / temperature)
    m = jnp.max(logits, axis=-1).astype(jnp.float32) * inv_t  # [B, S]
    tgt = jnp.take_along_axis(
        logits, safe_targets[..., None], axis=-1)[..., 0].astype(jnp.float32) * inv_t
    s = jnp.sum(jnp.exp(logits.astype(jnp.float32) * inv_t - m[..., None]),
                axis=-1)  # convert+exp fuse into the reduce; exp(≤0) ≤ 1
    nll = jnp.where(valid, m + jnp.log(s) - tgt, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return nll.sum() / denom, denom


def fused_causal_lm_loss_with_denom(
    hidden: jnp.ndarray,  # [B, S, D] post-final-norm hidden states
    table: jnp.ndarray,  # [V, D] tied lm-head table (compute dtype)
    labels: jnp.ndarray,  # [B, S] with IGNORE_LABEL masked
    temperature: float = 1.0,
    row_valid: jnp.ndarray | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """causal_lm_loss_with_denom computed by the fused tied-head CE kernel
    (ops/pallas_ce.py): the [B, S, V] logits never exist in HBM. Same
    shift/mask/temperature/denom semantics; f32 tile math (>= the jnp path's
    precision, tolerance-pinned by tests/test_pallas_ce.py)."""
    from gamer_tpu.ops.pallas_ce import TM, fused_ce_rows

    x = hidden[:, :-1, :]
    targets = labels[:, 1:]
    valid = targets != IGNORE_LABEL
    if row_valid is not None:
        valid = valid & (row_valid[:, None] == 1)
    safe = jnp.where(valid, targets, 0)
    B, S1, D = x.shape
    n = B * S1
    npad = -(-n // TM) * TM
    h = x.reshape(n, D)
    t = safe.reshape(n).astype(jnp.int32)
    v = valid.reshape(n).astype(jnp.int32)
    if npad != n:
        h = jnp.pad(h, ((0, npad - n), (0, 0)))
        t = jnp.pad(t, (0, npad - n))
        v = jnp.pad(v, (0, npad - n))
    vsize = table.shape[0]
    vp = -(-vsize // 128) * 128
    tab = jnp.pad(table, ((0, vp - vsize), (0, 0))) if vp != vsize else table
    nll = fused_ce_rows(h, tab, t.reshape(-1, 1, TM), v.reshape(-1, 1, TM),
                        vsize, float(1.0 / temperature), interpret)
    denom = jnp.maximum(valid.sum(), 1)
    return nll.sum() / denom, denom


def causal_lm_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 1.0,
    row_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Next-token CE: logits[t] predicts labels[t+1]; mean over valid targets."""
    return causal_lm_loss_with_denom(logits, labels, temperature, row_valid)[0]


def sequence_ce_loss(
    logits: jnp.ndarray,  # [B, V] scores over candidates/items
    targets: jnp.ndarray,  # [B] int
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    if valid is not None:
        nll = jnp.where(valid, nll, 0.0)
        return nll.sum() / jnp.maximum(valid.sum(), 1)
    return nll.mean()


def bpr_loss(pos_scores: jnp.ndarray, neg_scores: jnp.ndarray, valid: jnp.ndarray | None = None,
             gamma: float = 1e-10) -> jnp.ndarray:
    """-log sigmoid(pos - neg) (ref BPR.py:5-16)."""
    loss = -jnp.log(gamma + jax.nn.sigmoid(pos_scores - neg_scores))
    if valid is not None:
        loss = jnp.where(valid, loss, 0.0)
        return loss.sum() / jnp.maximum(valid.sum(), 1)
    return loss.mean()


def info_nce(
    anchors: jnp.ndarray,  # [B, D]
    positives: jnp.ndarray,  # [B, D]
    temperature: float = 1.0,
    normalize: bool = True,
) -> jnp.ndarray:
    """In-batch InfoNCE: anchor i's positive is positives[i], negatives are the
    rest of the batch (RQ-VAE CF-alignment & diversity losses,
    ref SeqRec/models/tokenizer/RQVAE/model.py:105-148)."""
    if normalize:
        anchors = anchors / (jnp.linalg.norm(anchors, axis=-1, keepdims=True) + 1e-8)
        positives = positives / (jnp.linalg.norm(positives, axis=-1, keepdims=True) + 1e-8)
    sims = anchors @ positives.T / temperature
    labels = jnp.arange(anchors.shape[0])
    return sequence_ce_loss(sims, labels)
