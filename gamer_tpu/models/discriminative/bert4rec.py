"""BERT4Rec: bidirectional masked-item sequential recommendation.

ref: SeqRec/models/discriminative/BERT4Rec/model.py — mask token = n_items+1,
mixed MLM/fine-tune masking controlled by ft_ratio (:70-86), output
FFN+GELU+LN and a DotProductPredictionHead with bias over n_items+1
(:51-59, transformer.py:186-215). Eval places the mask token at the last
position and scores candidates there.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gamer_tpu.models.discriminative.base import DIS_MODELS, DisModelConfig, normal_init
from gamer_tpu.modules.losses import sequence_ce_loss
from gamer_tpu.modules.transformer import TransformerEncoder, attention_allowed


@DIS_MODELS.register("BERT4Rec")
class BERT4Rec(nn.Module):
    cfg: DisModelConfig
    n_items: int
    max_his_len: int

    @property
    def mask_token(self) -> int:
        return self.n_items + 1

    @nn.compact
    def hidden_states(self, item_seq: jnp.ndarray, deterministic: bool = True):
        """[B, L] -> ([B, L, H] head-projected states, item table [n+2, H], bias)."""
        cfg = self.cfg
        init = normal_init(cfg.initializer_range)
        item_emb = nn.Embed(self.n_items + 2, cfg.hidden_size,
                            embedding_init=init, name="item_embedding")
        pos_emb = nn.Embed(self.max_his_len, cfg.hidden_size,
                           embedding_init=init, name="position_embedding")
        B, L = item_seq.shape
        x = item_emb(item_seq) + pos_emb(jnp.arange(L) % self.max_his_len)[None]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="input_ln")(x)
        x = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(x)
        allowed = attention_allowed(item_seq, bidirectional=True)
        x = TransformerEncoder(cfg.n_layers, cfg.hidden_size, cfg.n_heads,
                               cfg.inner_size, cfg.dropout_prob, cfg.hidden_act,
                               cfg.layer_norm_eps, name="encoder")(
            x, allowed, deterministic)
        x = nn.Dense(cfg.hidden_size, name="output_ffn")(x)
        x = nn.gelu(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="output_ln")(x)
        # prediction head projection + bias (DotProductPredictionHead)
        x = nn.relu(nn.Dense(cfg.hidden_size, name="head_out")(x))
        bias = self.param("head_bias", nn.initializers.zeros, (self.n_items + 1,))
        return x, item_emb.embedding, bias

    def calculate_loss(self, item_seq: jnp.ndarray, seq_len: jnp.ndarray,
                       rng: jax.Array, row_valid=None) -> jnp.ndarray:
        """Masked training (ref :70-86,126-132): per-batch-row coin decides
        fine-tune (mask last position) vs MLM (random mask_ratio positions)."""
        cfg = self.cfg
        B, L = item_seq.shape
        r_batch, r_mask = jax.random.split(rng)
        ft_rows = jax.random.uniform(r_batch, (B, 1)) < cfg.ft_ratio
        last_pos = jax.nn.one_hot(jnp.clip(seq_len, 0, L - 1), L, dtype=bool)
        mlm_mask = (jax.random.uniform(r_mask, (B, L)) < cfg.mask_ratio) & (item_seq != 0) & (~ft_rows)
        mask = mlm_mask | (last_pos & ft_rows)
        labels = item_seq * mask
        masked_seq = jnp.where(mask, self.mask_token, item_seq)
        states, table, bias = self.hidden_states(masked_seq, deterministic=False)
        logits = states @ table[: self.n_items + 1].T + bias[None, None, :]
        flat_logits = logits.reshape(-1, self.n_items + 1)
        flat_labels = labels.reshape(-1)
        valid = flat_labels != 0
        if row_valid is not None:
            valid = valid & jnp.repeat(row_valid == 1, L)
        return sequence_ce_loss(flat_logits, flat_labels, valid)

    def predict_scores(self, item_seq: jnp.ndarray, seq_len: jnp.ndarray,
                       item_range=None) -> jnp.ndarray:
        """Full-sort scores at the last (mask) position. The eval dataset has
        already appended the mask slot (ref SMB_dis_dataset.py:438-440)."""
        states, table, bias = self.hidden_states(item_seq, deterministic=True)
        idx = jnp.clip(seq_len - 1, 0, item_seq.shape[1] - 1)
        last = jnp.take_along_axis(states, idx[:, None, None], axis=1)[:, 0]
        scores = last @ table[: self.n_items + 1].T + bias[None, :]
        if item_range is not None:
            ids = jnp.arange(self.n_items + 1)
            scores = jnp.where(((ids >= item_range[0]) & (ids < item_range[1]))[None],
                               scores, -jnp.inf)
        return scores

    def __call__(self, item_seq, seq_len, batch=None, deterministic=True):
        states, table, bias = self.hidden_states(item_seq, deterministic)
        idx = jnp.clip(seq_len - 1, 0, item_seq.shape[1] - 1)
        return jnp.take_along_axis(states, idx[:, None, None], axis=1)[:, 0]
