"""MBSTR: multi-behavior sequential transformer (behavior-aware attention).

ref: SeqRec/models/discriminative/MBSTR/model.py + modules/layers/mbs_transformer.py —
per-behavior Q/K/V tensors selected by one-hot (ref :162-210), behavior-pair
attention mixing W1/W2 with softmax(alpha) (ref :196-242), per-behavior-pair
T5-style relative position bias (ref :10-72,130-158), behavior-MoE FFN
(ref :252-293), and a CGC prediction head (shared + behavior-specific experts,
gated; ref :331-409). Masked-item training like BERT4Rec (mask_ratio, ref
model.py:97-105); eval scores the appended mask slot.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gamer_tpu.models.discriminative.base import DIS_MODELS, DisModelConfig, normal_init
from gamer_tpu.modules.losses import sequence_ce_loss
from gamer_tpu.modules.transformer import _act, attention_allowed
from gamer_tpu.ops.masks import NEG_INF


def behavior_pair_matrix(type_seq: jnp.ndarray, n_behaviors: int) -> jnp.ndarray:
    """[B, L] behavior ids (0 = pad) -> [B, L, L] pair class in [0, b*b+1)
    (ref mbs_transformer.py:306-308)."""
    t = type_seq
    pair = (t[:, :, None] - 1) * n_behaviors + t[:, None, :]
    nonzero = (t[:, :, None] * t[:, None, :]) != 0
    return jnp.where(nonzero, pair, 0)


def rel_pos_bucket(qlen: int, klen: int, num_buckets: int, max_distance: int) -> jnp.ndarray:
    q = jnp.arange(qlen)
    k = jnp.arange(klen)
    rel = k[None, :] - q[:, None]
    n = -rel
    half = num_buckets // 2
    ret = (n < 0).astype(jnp.int32) * half
    n = jnp.abs(n)
    max_exact = half // 2
    large = max_exact + (
        jnp.log(jnp.maximum(n, 1) / max_exact) / jnp.log(max_distance / max_exact)
        * (half - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, half - 1)
    return ret + jnp.where(n < max_exact, n, large)


class MBSAttention(nn.Module):
    cfg: DisModelConfig

    @nn.compact
    def __call__(self, x, allowed, type_seq, deterministic=True):
        cfg = self.cfg
        b = cfg.n_behaviors
        h = cfg.n_heads
        H = cfg.hidden_size
        d = H // h
        C = b * b + 1
        init = normal_init(cfg.initializer_range)
        pair = behavior_pair_matrix(type_seq, b)  # [B, L, L]
        one_hot_t = jax.nn.one_hot(type_seq, b + 1)  # [B, L, b+1]

        if cfg.behavior_attention and b > 1:
            Wq = self.param("query", init, (b + 1, H, h, d))
            Wk = self.param("key", init, (b + 1, H, h, d))
            Wv = self.param("value", init, (b + 1, H, h, d))
            q = jnp.einsum("BLH,bHhd,BLb->BhLd", x, Wq, one_hot_t)
            k = jnp.einsum("BLH,bHhd,BLb->BhLd", x, Wk, one_hot_t)
            v = jnp.einsum("BLH,bHhd,BLb->BhLd", x, Wv, one_hot_t)
            W1 = self.param("W1", init, (b, h, d, d))
            a1 = self.param("alpha1", init, (C, b, h))
            W2 = self.param("W2", init, (b, h, d, d))
            a2 = self.param("alpha2", init, (C, b, h))
            W1_ = jnp.einsum("bhmn,Cbh->Chmn", W1, jax.nn.softmax(a1, axis=1))
            scores_all = jnp.einsum("BhQm,Chmn,BhKn->BhQKC", q, W1_, k)
            sel = jax.nn.one_hot(pair, C)  # [B, L, L, C]
            scores = jnp.einsum("BhQKC,BQKC->BhQK", scores_all, sel)
        else:
            q = nn.Dense(H, name="q")(x).reshape(*x.shape[:2], h, d).transpose(0, 2, 1, 3)
            k = nn.Dense(H, name="k")(x).reshape(*x.shape[:2], h, d).transpose(0, 2, 1, 3)
            v = nn.Dense(H, name="v")(x).reshape(*x.shape[:2], h, d).transpose(0, 2, 1, 3)
            scores = jnp.einsum("BhQd,BhKd->BhQK", q, k)

        scores = scores / jnp.sqrt(d)
        if cfg.behavior_position_bias:
            L = x.shape[1]
            bucket = rel_pos_bucket(L, L, cfg.num_buckets, cfg.max_distance)
            table = self.param("rel_bias", init, (C, cfg.num_buckets, h))
            bias_all = table[:, bucket]  # [C, L, L, h]
            sel = jax.nn.one_hot(pair, C)  # [B, L, L, C]
            bias = jnp.einsum("CQKh,BQKC->BhQK", bias_all, sel)
            scores = scores + bias
        scores = scores + jnp.where(allowed, 0.0, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(probs)

        if cfg.behavior_attention and b > 1:
            W2_ = jnp.einsum("bhmn,Cbh->Chmn", W2, jax.nn.softmax(a2, axis=1))
            sel = jax.nn.one_hot(pair, C)
            # context = probs * onehot(pair) * W2 * v (ref :227-242)
            kv = jnp.einsum("Chnm,BhKn->CBhKm", W2_, v)
            ctx = jnp.einsum("BhQK,BQKC,CBhKm->BhQm", probs, sel, kv)
        else:
            ctx = jnp.einsum("BhQK,BhKd->BhQd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(*x.shape)
        out = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(ctx)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln")(out + x)


class MBSLayer(nn.Module):
    cfg: DisModelConfig

    @nn.compact
    def __call__(self, x, allowed, type_seq, deterministic=True):
        cfg = self.cfg
        x = MBSAttention(cfg, name="attn")(x, allowed, type_seq, deterministic)
        # behavior-MoE FFN (ref :252-293): per-behavior expert + one-hot select
        if cfg.behavior_moe and cfg.n_behaviors > 1:
            outs = [jnp.zeros_like(x)]
            for i in range(cfg.n_behaviors):
                f = nn.Dense(cfg.inner_size, name=f"ffn_{i}_1")(x)
                f = _act(cfg.hidden_act)(f)
                f = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(f)
                f = nn.Dense(cfg.hidden_size, name=f"ffn_{i}_2")(f)
                outs.append(f)
            sel = jax.nn.one_hot(type_seq, cfg.n_behaviors + 1)
            f = jnp.einsum("bBLH,BLb->BLH", jnp.stack(outs, 0), sel)
            f = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(f)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ffn_ln")(f + x)
        else:
            f = nn.Dense(cfg.inner_size, name="ffn_1")(x)
            f = _act(cfg.hidden_act)(f)
            f = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(f)
            f = nn.Dense(cfg.hidden_size, name="ffn_2")(f)
            f = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(f)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ffn_ln")(f + x)
        return x


class CGCHead(nn.Module):
    """CGC prediction head (ref mbs_transformer.py:331-409). states [N, H]."""

    cfg: DisModelConfig
    n_items: int

    @nn.compact
    def __call__(self, states, type_seq, table):
        cfg = self.cfg
        if not cfg.behavior_head:
            out = nn.relu(nn.Dense(cfg.hidden_size, name="head_out")(states))
            bias = self.param("head_bias", nn.initializers.zeros, (self.n_items + 1,))
            return out @ table[: self.n_items + 1].T + bias[None]
        init = normal_init(cfg.initializer_range)
        b = cfg.n_behaviors
        nE = cfg.n_shared_experts + cfg.n_specific_experts
        shared = [nn.Dense(cfg.hidden_size, name=f"shared_{i}")(states)
                  for i in range(cfg.n_shared_experts)]
        specific = [nn.Dense(cfg.hidden_size, name=f"spec_{i}")(states)
                    for i in range(b * cfg.n_specific_experts)]
        w_gates = self.param("w_gates", init, (b, cfg.hidden_size, nE))
        gates = jax.nn.softmax(jnp.einsum("NH,bHE->bNE", states, w_gates), axis=-1)
        per_beh = []
        for i in range(b):
            experts = jnp.stack(shared + specific[i * cfg.n_specific_experts:
                                                  (i + 1) * cfg.n_specific_experts])  # [E, N, H]
            per_beh.append(jnp.einsum("ENH,NE->NH", experts, gates[i]))
        outputs = jnp.stack([jnp.zeros_like(states)] + per_beh)  # [b+1, N, H]
        sel = jax.nn.one_hot(type_seq, b + 1)
        mixed = jnp.einsum("bNH,Nb->NH", outputs, sel)
        out = states + nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="head_ln")(mixed)
        return out @ table[: self.n_items + 1].T


@DIS_MODELS.register("MBSTR")
class MBSTR(nn.Module):
    cfg: DisModelConfig
    n_items: int
    max_his_len: int

    @property
    def mask_token(self) -> int:
        return self.n_items + 1

    def setup(self):
        self.head = CGCHead(self.cfg, self.n_items)

    @nn.compact
    def hidden_states(self, item_seq, type_seq, deterministic=True):
        cfg = self.cfg
        init = normal_init(cfg.initializer_range)
        item_emb = nn.Embed(self.n_items + 2, cfg.hidden_size,
                            embedding_init=init, name="item_embedding")
        x = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(item_emb(item_seq))
        allowed = attention_allowed(item_seq, bidirectional=True)
        for i in range(cfg.n_layers):
            x = MBSLayer(cfg, name=f"layer_{i}")(x, allowed, type_seq, deterministic)
        return x, item_emb.embedding

    def calculate_loss(self, item_seq, type_seq, rng, row_valid=None):
        cfg = self.cfg
        B, L = item_seq.shape
        mask = (jax.random.uniform(rng, (B, L)) < cfg.mask_ratio) & (item_seq != 0)
        labels = item_seq * mask
        masked_seq = jnp.where(mask, self.mask_token, item_seq)
        states, table = self.hidden_states(masked_seq, type_seq, deterministic=False)
        logits = self.head(states.reshape(B * L, -1), type_seq.reshape(B * L), table)
        flat_labels = labels.reshape(-1)
        valid = flat_labels != 0
        if row_valid is not None:
            valid = valid & jnp.repeat(row_valid == 1, L)
        return sequence_ce_loss(logits, flat_labels, valid)

    def predict_scores(self, item_seq, type_seq, seq_len, item_range=None):
        """Score the appended mask slot (position seq_len-1)."""
        states, table = self.hidden_states(item_seq, type_seq, deterministic=True)
        idx = jnp.clip(seq_len - 1, 0, item_seq.shape[1] - 1)
        last = jnp.take_along_axis(states, idx[:, None, None], axis=1)[:, 0]
        last_type = jnp.take_along_axis(type_seq, idx[:, None], axis=1)[:, 0]
        scores = self.head(last, last_type, table)
        if item_range is not None:
            ids = jnp.arange(self.n_items + 1)
            scores = jnp.where(((ids >= item_range[0]) & (ids < item_range[1]))[None],
                               scores, -jnp.inf)
        return scores

    def __call__(self, item_seq, type_seq, deterministic=True):
        return self.hidden_states(item_seq, type_seq, deterministic)[0]
