"""MBHT: multi-behavior hypergraph-enhanced transformer (KDD'22).

ref: SeqRec/models/discriminative/MBHT/model.py + modules/layers/
{multi_scale_transformer.py, HGNN.py} — multi-scale attention (Linformer-style
linear attention over the full sequence + plain attention over mean-pooled
scales, fused by a length-wise linear layer, ref multi_scale_transformer.py:80-145),
plus a hypergraph branch: gated item embeddings, top-k item-similarity
hyperedges and same-item multi-behavior hyperedges -> 2-layer HGNN convolution,
masked-position sliding-window readout, attention-weighted fusion with the
transformer output (ref model.py:260-345,443-506).

TPU redesign: the reference builds a ragged block-diagonal hypergraph on the
host per batch (ref model.py:443-506). Here the incidence matrix is built with
STATIC shapes inside jit — position-indexed hyperedges [L, 2L]: the first L
edges carry top-k similarity weights + self-loops, the second L carry the
same-item (multi-behavior) connections — and normalized exactly like HGNN
(G = Dv^-1 H De^-1 H^T). Masked-item training with the last-position target
appended (ref model.py:171-244).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gamer_tpu.models.discriminative.base import DIS_MODELS, DisModelConfig, normal_init
from gamer_tpu.modules.losses import sequence_ce_loss
from gamer_tpu.modules.transformer import MultiHeadAttention, _act

SW_BEFORE, SW_FOLLOW = 10, 6  # sliding-window readout (ref model.py:224-226)


class LinearAttention(nn.Module):
    """Linformer-style attention: E/F project the length dim (ref :10-77)."""

    d_model: int
    n_heads: int
    linear_size: int
    max_len: int
    dropout: float
    eps: float

    @nn.compact
    def __call__(self, x, pad_ok, deterministic=True):
        h, d = self.n_heads, self.d_model // self.n_heads
        B, L, _ = x.shape
        heads = lambda y: y.reshape(B, L, h, d).transpose(0, 2, 1, 3)
        q = heads(nn.Dense(self.d_model, name="W_Q")(x))
        k = heads(nn.Dense(self.d_model, name="W_K")(x))
        v = heads(nn.Dense(self.d_model, name="W_V")(x))
        m = pad_ok[:, None, :, None]  # [B, 1, L, 1]
        k = k * m
        v = v * m
        # project length: [B, h, L, d] -> [B, h, linear, d]
        v = nn.Dense(self.linear_size, name="E")(v.transpose(0, 1, 3, 2)).transpose(0, 1, 3, 2)
        k = nn.Dense(self.linear_size, name="F")(k.transpose(0, 1, 3, 2)).transpose(0, 1, 3, 2)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(B, L, -1)
        out = nn.Dense(self.d_model, name="dense")(ctx)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return nn.LayerNorm(epsilon=self.eps, name="ln")(out + x)


class MultiScaleLayer(nn.Module):
    cfg: DisModelConfig
    max_len: int

    @nn.compact
    def __call__(self, x, pad_ok, deterministic=True):
        cfg = self.cfg
        B, L, H = x.shape
        lin_size, s1, s2 = cfg.scales
        assert L % s1 == 0 and L % s2 == 0, "max_len must divide the scales"
        outs = [LinearAttention(cfg.hidden_size, cfg.n_heads, lin_size, self.max_len,
                                cfg.dropout_prob, cfg.layer_norm_eps, name="attn1")(
            x, pad_ok, deterministic)]
        attn2 = MultiHeadAttention(cfg.hidden_size, cfg.n_heads, cfg.dropout_prob,
                                   name="attn2")
        for s, name in ((s1, "p1"), (s2, "p2")):
            pooled = x.reshape(B, s, L // s, H).mean(axis=1)  # interleaved pooling (ref :115-119)
            allow = jnp.ones((1, 1, L // s, L // s), bool)
            outs.append(attn2(pooled, allow, deterministic))
        cat = jnp.concatenate(outs, axis=1)  # [B, L + L/s1 + L/s2, H]
        fused = nn.Dense(self.max_len, name="out_fc")(cat.transpose(0, 2, 1)).transpose(0, 2, 1)
        # FeedForward with residual + LN (ref transformer.FeedForward)
        f = nn.Dense(cfg.inner_size, name="ff1")(fused)
        f = _act(cfg.hidden_act)(f)
        f = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(f)
        f = nn.Dense(cfg.hidden_size, name="ff2")(f)
        f = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(f)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ff_ln")(f + fused)


class HypergraphBranch(nn.Module):
    """Static-shape hypergraph branch (see module docstring)."""

    cfg: DisModelConfig
    mask_token: int

    @nn.compact
    def __call__(self, item_seq, item_emb, mask_positions, deterministic=True):
        cfg = self.cfg
        B, L, H = item_emb.shape
        gating_w = self.param("gating_weight", normal_init(cfg.initializer_range), (H, H))
        gating_b = self.param("gating_bias", normal_init(cfg.initializer_range), (1, H))
        w1 = self.param("metric_w1", normal_init(cfg.initializer_range), (1, H))
        w2 = self.param("metric_w2", normal_init(cfg.initializer_range), (1, H))
        x_raw = item_emb * jax.nn.sigmoid(item_emb @ gating_w + gating_b)
        x_m = (w1 * x_raw + w2 * x_raw) / 2
        norm = x_m / (jnp.linalg.norm(x_m, axis=-1, keepdims=True) + 1e-12)
        sim = jnp.einsum("bld,bmd->blm", norm, norm)
        sim = jnp.where(sim < 0, 0.01, sim)

        real = item_seq != 0  # [B, L]
        pair_ok = real[:, :, None] & real[:, None, :]
        # top-k similarity hyperedges (position-indexed; ref build_Gs_unique)
        k = min(cfg.hyper_len, L)
        sim_masked = jnp.where(pair_ok, sim, -jnp.inf)
        thresh = jnp.sort(sim_masked, axis=-1)[:, :, -k][..., None]  # kth largest
        H1 = jnp.where((sim_masked >= thresh) & pair_ok, sim, 0.0)
        eye = jnp.eye(L)[None]
        H1 = jnp.where(eye > 0, jnp.where(real[:, :, None], 1.0, 0.0), H1)  # self-loop
        # same-item multi-behavior hyperedges
        same = (item_seq[:, :, None] == item_seq[:, None, :]) & pair_ok
        multi = same.sum(-1) > 1  # item occurs more than once
        H2 = jnp.where(same & multi[:, None, :], 1.0, 0.0)
        Hmat = jnp.concatenate([H1, H2], axis=-1)  # [B, L, 2L]
        DV = Hmat.sum(-1)
        DE = Hmat.sum(-2)
        invDV = jnp.where(DV > 0, 1.0 / DV, 0.0)
        invDE = jnp.where(DE > 0, 1.0 / DE, 0.0)
        G = jnp.einsum("bl,ble,be,bme->blm", invDV, Hmat, invDE, Hmat)

        # HGNN: two convs, averaged (ref HGNN.py:27-39)
        hg1w = self.param("hgc1_w", normal_init(0.02), (H, H))
        hg1b = self.param("hgc1_b", normal_init(0.02), (H,))
        hg2w = self.param("hgc2_w", normal_init(0.02), (H, H))
        hg2b = self.param("hgc2_b", normal_init(0.02), (H,))
        drop = lambda y: nn.Dropout(0.2, deterministic=deterministic)(y)
        x1 = drop(jnp.einsum("blm,bmd->bld", G, x_raw @ hg1w + hg1b))
        x2 = drop(jnp.einsum("blm,bmd->bld", G, x1 @ hg2w + hg2b))
        hg = (x1 + x2) / 2

        # masked-position sliding-window readout (ref model.py:303-326)
        pos = jnp.arange(L)
        win = (pos[None, :] >= jnp.maximum(pos[:, None] - SW_BEFORE, 0)) & \
              (pos[None, :] < pos[:, None] + SW_FOLLOW) & (pos[None, :] != pos[:, None])
        win_b = win[None] & real[:, None, :]  # [B, L, L] readout window per position
        w_sum = win_b.sum(-1, keepdims=True)
        readout = jnp.einsum("blm,bmd->bld", win_b / jnp.maximum(w_sum, 1), hg)
        hg = jnp.where(mask_positions[..., None], readout, hg)
        return hg


@DIS_MODELS.register("MBHT")
class MBHT(nn.Module):
    cfg: DisModelConfig
    n_items: int
    max_his_len: int  # INCLUDING the appended target/mask slot
    n_behaviors: int = 3

    @property
    def mask_token(self) -> int:
        return self.n_items + 1

    @nn.compact
    def hidden_states(self, item_seq, type_seq, deterministic=True):
        cfg = self.cfg
        L = self.max_his_len
        assert item_seq.shape[1] == L, f"MBHT expects fixed length {L}"
        init = normal_init(cfg.initializer_range)
        item_embedding = nn.Embed(self.n_items + 2, cfg.hidden_size,
                                  embedding_init=init, name="item_embedding")
        type_embedding = nn.Embed(self.n_behaviors + 1, cfg.hidden_size,
                                  embedding_init=init, name="type_embedding")
        pos_embedding = nn.Embed(L, cfg.hidden_size, embedding_init=init,
                                 name="position_embedding")
        item_emb = item_embedding(item_seq)
        x = item_emb + type_embedding(type_seq) + pos_embedding(jnp.arange(L))[None]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="input_ln")(x)
        x = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(x)
        pad_ok = (item_seq != 0).astype(x.dtype)
        if cfg.enable_ms:
            for i in range(cfg.n_layers):
                x = MultiScaleLayer(cfg, L, name=f"layer_{i}")(x, pad_ok, deterministic)
        else:
            from gamer_tpu.modules.transformer import TransformerEncoder, attention_allowed
            allowed = attention_allowed(item_seq, bidirectional=True)
            x = TransformerEncoder(cfg.n_layers, cfg.hidden_size, cfg.n_heads,
                                   cfg.inner_size, cfg.dropout_prob, cfg.hidden_act,
                                   cfg.layer_norm_eps, name="encoder")(x, allowed, deterministic)
        if cfg.enable_hg:
            mask_positions = item_seq == self.mask_token
            hg = HypergraphBranch(self.cfg, self.mask_token, name="hypergraph")(
                item_seq, item_emb, mask_positions, deterministic)
            attn_w = self.param("attn_weights", init, (cfg.hidden_size, cfg.hidden_size))
            attn = self.param("attn", init, (1, cfg.hidden_size))
            mixed = jnp.stack([x, hg], axis=0)  # [2, B, L, H]
            weights = (jnp.einsum("sbld,de->sble", mixed, attn_w) * attn).sum(-1)
            score = jax.nn.softmax(weights, axis=0)[..., None]
            x = (mixed * score).sum(0)
        return x, item_embedding.embedding

    # ---- training / eval ---------------------------------------------------

    def calculate_loss(self, item_seq, type_seq, target, target_behavior, seq_len,
                       rng, row_valid=None):
        """Append target at position seq_len, mask random + the target slot
        (ref reconstruct_train_data, model.py:171-244)."""
        cfg = self.cfg
        B, L = item_seq.shape
        pos = jnp.arange(L)[None]
        at_target = pos == jnp.clip(seq_len, 0, L - 1)[:, None]
        seq = jnp.where(at_target, target[:, None], item_seq)
        types = jnp.where(at_target, target_behavior[:, None], type_seq)
        rand_mask = (jax.random.uniform(rng, (B, L)) < cfg.mask_ratio) & (seq != 0)
        mask = rand_mask | at_target
        labels = seq * mask
        masked_seq = jnp.where(mask, self.mask_token, seq)
        masked_types = jnp.where(mask, 0, types)
        states, table = self.hidden_states(masked_seq, masked_types, deterministic=False)
        logits = states.reshape(B * L, -1) @ table.T  # incl. mask token col (ref :399-402)
        flat_labels = labels.reshape(-1)
        valid = flat_labels != 0
        if row_valid is not None:
            valid = valid & jnp.repeat(row_valid == 1, L)
        return sequence_ce_loss(logits, flat_labels, valid)

    def predict_scores(self, item_seq, type_seq, seq_len, item_range=None):
        """Mask slot already appended by the eval builder; score it."""
        states, table = self.hidden_states(item_seq, type_seq, deterministic=True)
        idx = jnp.clip(seq_len - 1, 0, item_seq.shape[1] - 1)
        last = jnp.take_along_axis(states, idx[:, None, None], axis=1)[:, 0]
        scores = last @ table[: self.n_items + 1].T
        if item_range is not None:
            ids = jnp.arange(self.n_items + 1)
            scores = jnp.where(((ids >= item_range[0]) & (ids < item_range[1]))[None],
                               scores, -jnp.inf)
        return scores

    def __call__(self, item_seq, type_seq, deterministic=True):
        return self.hidden_states(item_seq, type_seq, deterministic)[0]
