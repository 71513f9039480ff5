"""Deterministic token routing: (position, behavior, action) index streams.

Re-implements the reference's stateful `Qwen3MultiDecoderRouter`
(ref: SeqRec/models/generative/Qwen3Multi/router.py:74-201) as pure, shape-static
functions of the token ids. The reference caches input ids across decode steps
because HF streams one token at a time; here the decode loop carries the index
streams as explicit scan state, so no module state exists.

Layout assumption: sequences are item blocks of `num_positions` tokens
([<behavior>, code_1..code_L] when behavior tokens are explicit), starting at
`offset` within the padded buffer. For training (right padding) offset == 0,
matching the reference exactly. For left-padded decode the reference routes by
*absolute* padded position — which mis-assigns experts whenever prompts in a
batch differ in length by a non-multiple of the block size; we instead route
relative to each row's first real token (per-row offset), which reproduces the
training-time distribution. Deliberate fix, noted for parity review.

Index semantics (ref router.py:77-80):
  position_index: (rel_pos % P) + 1 for real tokens, 0 for pad/eos
  behavior_index: behavior-embedding id (1-based) of the token's block,
                  0 at the behavior-token positions themselves and at pad/eos
  action_index:   same, but NOT zeroed at behavior-token positions
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from gamer_tpu.data.vocab import EOS_ID, PAD_ID


def rel_positions(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, S] 0/1 mask -> per-token relative position among real tokens
    (-1 at pads). Works for both right- and left-padded layouts."""
    rel = jnp.cumsum(attention_mask, axis=-1) - 1
    return jnp.where(attention_mask == 1, rel, -1).astype(jnp.int32)


def route_tokens(
    input_ids: jnp.ndarray,  # [B, S]
    rel: jnp.ndarray,  # [B, S] relative positions (rel_positions), -1 at pads
    num_positions: int,
    behavior_base: int,
    num_behavior: int,
    pad_id: int = PAD_ID,
    eos_id: int = EOS_ID,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (position_index, behavior_index, action_index), each [B, S]."""
    B, S = input_ids.shape
    P = num_positions
    t = lax.broadcasted_iota(jnp.int32, (B, S), 1)
    special = (input_ids == pad_id) | (input_ids == eos_id) | (rel < 0)

    position_index = (rel % P) + 1
    position_index = jnp.where(special, 0, position_index)

    is_block_start = (rel % P) == 0
    # behavior-embedding id of each *token* = id of its block's behavior token.
    # Block start absolute index = t - (rel % P).
    start_idx = jnp.clip(t - (rel % P), 0, S - 1)
    block_start_token = jnp.take_along_axis(input_ids, start_idx, axis=1)
    raw = block_start_token - behavior_base + 1
    # clamp non-behavior block starts to 0 (the reference would index OOB here)
    beh_id = jnp.where((raw >= 1) & (raw <= num_behavior), raw, 0)

    action_index = jnp.where(special, 0, beh_id)
    behavior_index = jnp.where(special | is_block_start, 0, beh_id)
    return position_index, behavior_index, action_index


def route_decode_step(
    step_token: jnp.ndarray,  # [B] token about to be processed (ignored for position)
    rel_pos: jnp.ndarray,  # [B] relative position of this token in its sequence
    block_behavior_id: jnp.ndarray,  # [B] behavior-embedding id (1-based) of the generated block
    num_positions: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Routing for one generated token during decode.

    The generated block's behavior token was appended to the prompt, so every
    generated code token routes to (rel % P) + 1 with that block's behavior id.
    """
    position_index = (rel_pos % num_positions) + 1
    is_block_start = (rel_pos % num_positions) == 0
    behavior_index = jnp.where(is_block_start, 0, block_behavior_id)
    return position_index, behavior_index, block_behavior_id


def moe_action_expert_index(
    position_index: jnp.ndarray,
    action_index: jnp.ndarray,
    num_experts: int,
) -> jnp.ndarray:
    """Qwen3MoeAction expert id: experts per (behavior x digit position)
    (ref: SeqRec/models/generative/Qwen3MoeAction/FFN.py:42-45):
    expert = (num_experts - 1) * (action_index - 1) + position_index,
    negatives (pad/eos rows with action_index 0) clamped to expert 0.
    Total expert count = (num_experts - 1) * num_behavior + 1 (ref :21)."""
    idx = (num_experts - 1) * (action_index - 1) + position_index
    return jnp.maximum(idx, 0)
