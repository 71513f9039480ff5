"""The GAMER attention-mask family as cheap boolean predicates.

The reference materializes [B, 1, S, S] float32 masks on the host per forward
(ref: SeqRec/models/generative/Qwen3Multi/model.py:573-741,
Qwen3Session/model.py:28-80, Qwen3SessionMulti/model.py:556-674). Here each
mask is a pure function of per-token integer streams (positions, session_ids,
actions, attention_mask) evaluated inside jit — XLA fuses the comparisons into
the attention softmax, and the Pallas flash-attention kernel evaluates the same
predicates per tile without ever writing an S×S buffer to HBM.

Allowed-predicate semantics (i = query index, j = key index):

  self masks
    "causal"        j <= i                                    (Qwen3, Qwen3Moe, Qwen3Multi self)
    "session"       (same item block AND j <= i) OR session[j] < session[i]
                                                              (Qwen3Session* self; ref Qwen3Session/model.py:19-26,41-55)
    "action_same"   j <= i AND action[j] == action[i]         (defined by the reference, unused in its forwards)

  cross masks
    "multi"         j <= i AND action[j] < action[i]          (Qwen3Multi cross; ref Qwen3Multi/model.py:587-604)
    "session_multi" session[j] < session[i] AND action[j] < action[i]
                                                              (Qwen3SessionMulti cross; ref Qwen3SessionMulti/model.py:556-614)

Padding composes as: allowed &= attention_mask[j].

Decode semantics follow the reference exactly: after the prompt prefill,
generated-token rows use plain causal for the self mask
(ref Qwen3Multi/model.py:717-727) and, for the cross mask, the frozen last
prompt row with generated keys disallowed (ref Qwen3Multi/model.py:605-617).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

SELF_KINDS = ("causal", "session", "action_same")
CROSS_KINDS = ("multi", "session_multi")

NEG_INF = -1e9  # large-negative bias; fp32-safe and bf16-safe after downcast


def _iota(n: int) -> jnp.ndarray:
    return lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)


def causal_allowed(seq_len: int) -> jnp.ndarray:
    """[S, S] bool: j <= i."""
    i = _iota(seq_len)
    return i[:, None] >= i[None, :]


def block_causal_allowed(block_ids: jnp.ndarray) -> jnp.ndarray:
    """block_ids [B, S] (item-block index per token, -1 for pads) ->
    [B, S, S] bool: same item block AND j <= i."""
    s = block_ids.shape[-1]
    i = _iota(s)
    same = (block_ids[:, :, None] == block_ids[:, None, :]) & (block_ids[:, :, None] >= 0)
    return same & (i[:, None] >= i[None, :])[None]


def _lt(v: jnp.ndarray) -> jnp.ndarray:
    """[B, S] -> [B, S, S] bool: v[j] < v[i]."""
    return v[:, None, :] < v[:, :, None]


def _eq(v: jnp.ndarray) -> jnp.ndarray:
    return v[:, None, :] == v[:, :, None]


def self_mask(
    kind: str,
    seq_len: int,
    attention_mask: jnp.ndarray | None = None,
    session_ids: jnp.ndarray | None = None,
    actions: jnp.ndarray | None = None,
    block_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B, 1, S, S] (or [1, 1, S, S] for pure-causal, broadcastable) bool.

    `block_ids` are per-token item-block indices (rel_position // num_positions,
    -1 for pads) — computed from *relative* positions so left-padded rows stay
    aligned (the reference indexes its precomputed in_item_mask by absolute
    padded position, which mis-aligns short prompts in a padded batch).
    """
    if kind == "causal":
        allowed = causal_allowed(seq_len)[None, None]
    elif kind == "session":
        assert session_ids is not None and block_ids is not None
        base = block_causal_allowed(block_ids)
        allowed = (base | _lt(session_ids))[:, None]
    elif kind == "action_same":
        assert actions is not None
        allowed = (causal_allowed(seq_len)[None] & _eq(actions))[:, None]
    else:
        raise ValueError(f"unknown self mask kind {kind!r}")
    if attention_mask is not None:
        allowed = allowed & (attention_mask[:, None, None, :] == 1)
    return allowed


def cross_mask(
    kind: str,
    seq_len: int,
    attention_mask: jnp.ndarray | None = None,
    session_ids: jnp.ndarray | None = None,
    actions: jnp.ndarray | None = None,
) -> jnp.ndarray:
    assert actions is not None
    if kind == "multi":
        allowed = (causal_allowed(seq_len)[None] & _lt(actions))[:, None]
    elif kind == "session_multi":
        assert session_ids is not None
        allowed = (_lt(session_ids) & _lt(actions))[:, None]
    else:
        raise ValueError(f"unknown cross mask kind {kind!r}")
    if attention_mask is not None:
        allowed = allowed & (attention_mask[:, None, None, :] == 1)
    return allowed


def decode_self_row(
    kv_len: int,
    step_index: jnp.ndarray,
    attention_mask: jnp.ndarray,
) -> jnp.ndarray:
    """[B, 1, 1, K] bool row for one generated token in the self stream.

    Reference decode rows are plain causal over the cache + padding
    (ref Qwen3Multi/model.py:717-727): key j allowed iff j <= step_index.
    `step_index` is the absolute position of the current token in the cache.
    """
    j = _iota(kv_len)
    allowed = (j[None, :] <= step_index[:, None]) & (attention_mask == 1)
    return allowed[:, None, None, :]


def decode_cross_row(
    prompt_row: jnp.ndarray,
    kv_len: int,
    prompt_len: int,
) -> jnp.ndarray:
    """[B, 1, 1, K] bool row for one generated token in the cross stream.

    Generated tokens reuse the last prompt token's cross row and never attend
    to other generated tokens (ref Qwen3Multi/model.py:605-617: the saved row
    is extended with min_dtype for each new key).
    `prompt_row`: [B, P] allowed-row of the last prompt token.
    """
    b = prompt_row.shape[0]
    pad = jnp.zeros((b, kv_len - prompt_row.shape[1]), dtype=bool)
    return jnp.concatenate([prompt_row, pad], axis=1)[:, None, None, :]


def mask_bias(allowed: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Boolean allowed -> additive bias (0 where allowed, NEG_INF where not)."""
    return jnp.where(allowed, jnp.array(0.0, dtype), jnp.array(NEG_INF, dtype))
