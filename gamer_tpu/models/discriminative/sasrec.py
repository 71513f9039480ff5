"""SASRec: self-attentive sequential recommendation.

ref: SeqRec/models/discriminative/SASRec/model.py:69-87 — item + learned
position embedding, LayerNorm + dropout, causal transformer encoder, last-state
representation scored against the item table.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gamer_tpu.models.discriminative.base import DIS_MODELS, DisModelConfig, gather_last, normal_init
from gamer_tpu.modules.transformer import TransformerEncoder, attention_allowed


@DIS_MODELS.register("SASRec")
class SASRec(nn.Module):
    cfg: DisModelConfig
    n_items: int
    max_his_len: int

    @nn.compact
    def encode_with_table(self, item_seq: jnp.ndarray, seq_len: jnp.ndarray,
                          batch: dict | None = None, deterministic: bool = True):
        cfg = self.cfg
        init = normal_init(cfg.initializer_range)
        item_emb = nn.Embed(self.n_items + 1, cfg.hidden_size,
                            embedding_init=init, name="item_embedding")
        pos_emb = nn.Embed(self.max_his_len, cfg.hidden_size,
                           embedding_init=init, name="position_embedding")
        B, L = item_seq.shape
        x = item_emb(item_seq) + pos_emb(jnp.arange(L))[None]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="input_ln")(x)
        x = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(x)
        allowed = attention_allowed(item_seq, bidirectional=False)
        x = TransformerEncoder(cfg.n_layers, cfg.hidden_size, cfg.n_heads,
                               cfg.inner_size, cfg.dropout_prob, cfg.hidden_act,
                               cfg.layer_norm_eps, name="encoder")(
            x, allowed, deterministic)
        return gather_last(x, seq_len), item_emb.embedding

    def __call__(self, item_seq, seq_len, batch=None, deterministic=True):
        return self.encode_with_table(item_seq, seq_len, batch, deterministic)[0]
