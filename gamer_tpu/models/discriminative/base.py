"""Discriminative base: configs, loss dispatch and scoring heads.

TPU-native analog of the reference SeqModel base
(ref: SeqRec/modules/model_base/seq_model.py:8-119): models are flax modules
returning a sequence representation [B, H] (or per-candidate logits for
BERT4Rec-style heads); CE-over-full-table / BPR losses and
full/sample-sort/item_range scoring live here as pure functions.

Batch contract (ref SMB_dis_dataset.py:318-338): item ids are +1 shifted so 0
is the padding index; `seq_len` counts real events.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gamer_tpu.core.config import Config, config_field
from gamer_tpu.core.registry import Registry
from gamer_tpu.modules.losses import bpr_loss, sequence_ce_loss

DIS_MODELS = Registry("discriminative model")


class DisModelConfig(Config):
    n_layers: int = 2
    n_heads: int = 2
    hidden_size: int = 64
    inner_size: int = 256
    dropout_prob: float = 0.5
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    loss_type: str = "CE"  # or BPR
    # BERT4Rec
    mask_ratio: float = 0.2
    ft_ratio: float = 0.5
    # GRU4Rec
    embedding_size: int = 64
    # MBHT (ref config/dis-models/MBHT/config.json)
    enable_hg: bool = True
    enable_ms: bool = True
    hyper_len: int = 6
    scales: list = config_field([5, 4, 20])
    # MBSTR (ref MBSTR/config.py)
    num_buckets: int = 32
    max_distance: int = 40
    behavior_head: bool = True
    behavior_attention: bool = True
    behavior_moe: bool = True
    behavior_position_bias: bool = True
    n_shared_experts: int = 3
    n_specific_experts: int = 1
    # shared geometry
    n_behaviors: int = 3
    n_users: int = 0


def gather_last(output: jnp.ndarray, seq_len: jnp.ndarray) -> jnp.ndarray:
    """[B, L, H], [B] -> [B, H] at position seq_len-1 (ref seq_model.py:44-48)."""
    idx = jnp.clip(seq_len - 1, 0, output.shape[1] - 1)
    return jnp.take_along_axis(output, idx[:, None, None], axis=1)[:, 0]


def dis_calculate_loss(model, variables, batch: dict, rng: jax.Array,
                       loss_type: str, n_items: int) -> jnp.ndarray:
    """CE over the full item table or BPR with one sampled negative
    (ref seq_model.py:64-82). Models may expose their own `calculate_loss`
    method (BERT4Rec masking) — this is the default path."""
    seq_out, item_table = model.apply(
        variables, batch["inputs"], batch["seq_len"], batch,
        deterministic=False, rngs={"dropout": rng},
        method=type(model).encode_with_table)
    valid = batch.get("row_valid")
    if loss_type == "BPR":
        pos = item_table[batch["target"]]
        neg = item_table[batch["neg_item"]]
        return bpr_loss((seq_out * pos).sum(-1), (seq_out * neg).sum(-1),
                        valid == 1 if valid is not None else None)
    logits = seq_out @ item_table.T
    return sequence_ce_loss(logits, batch["target"],
                            valid == 1 if valid is not None else None)


def full_sort_scores(seq_out: jnp.ndarray, item_table: jnp.ndarray,
                     item_range: tuple[int, int] | None = None,
                     n_items: int | None = None) -> jnp.ndarray:
    """[B, H] x [n_items+1, H] -> [B, n_items+1] (ref seq_model.py:104-119).
    With item_range, scores outside the window are -inf."""
    scores = seq_out @ item_table.T
    if item_range is not None:
        idx = jnp.arange(item_table.shape[0])
        in_range = (idx >= item_range[0]) & (idx < item_range[1])
        scores = jnp.where(in_range[None, :], scores, -jnp.inf)
    return scores


def sample_sort_scores(seq_out: jnp.ndarray, item_table: jnp.ndarray,
                       candidates: jnp.ndarray) -> jnp.ndarray:
    """[B, H], [B, C] candidate ids -> [B, C] (ref seq_model.py:93-102)."""
    emb = item_table[candidates]  # [B, C, H]
    return jnp.einsum("bch,bh->bc", emb, seq_out)


def normal_init(stddev: float):
    return jax.nn.initializers.normal(stddev)
