"""GRU4Rec: RNN sequential recommendation.

ref: SeqRec/models/discriminative/GRU4Rec/model.py:52-59 — embedding dropout,
multi-layer GRU, dense projection back to embedding size, last-state scoring.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gamer_tpu.models.discriminative.base import DIS_MODELS, DisModelConfig, gather_last


@DIS_MODELS.register("GRU4Rec")
class GRU4Rec(nn.Module):
    cfg: DisModelConfig
    n_items: int
    max_his_len: int = 0

    @nn.compact
    def encode_with_table(self, item_seq: jnp.ndarray, seq_len: jnp.ndarray,
                          batch: dict | None = None, deterministic: bool = True):
        cfg = self.cfg
        item_emb = nn.Embed(self.n_items + 1, cfg.embedding_size,
                            embedding_init=nn.initializers.xavier_normal(),
                            name="item_embedding")
        x = item_emb(item_seq)
        x = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(x)
        for i in range(cfg.n_layers):
            feats = cfg.hidden_size
            x = nn.RNN(nn.GRUCell(feats,
                                  kernel_init=nn.initializers.xavier_uniform(),
                                  recurrent_kernel_init=nn.initializers.xavier_uniform()),
                       name=f"gru_{i}")(x)
        x = nn.Dense(cfg.embedding_size, name="dense")(x)
        return gather_last(x, seq_len), item_emb.embedding

    def __call__(self, item_seq, seq_len, batch=None, deterministic=True):
        return self.encode_with_table(item_seq, seq_len, batch, deterministic)[0]
