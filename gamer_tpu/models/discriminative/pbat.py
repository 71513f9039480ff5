"""PBAT: personalized behavior-aware transformer with Gaussian embeddings.

ref: SeqRec/models/discriminative/PBAT/model.py + modules/layers/pbat.py —
(mean, cov) Gaussian embeddings for items/behaviors/users/positions/behavior
relations; SAGP/TriSAGP Gaussian products (ref pbat.py:10-28); Wasserstein-
distance attention (ref :31-44,131-223); behavior-specific FFN (ref :226-252);
Wasserstein prediction head sharing the item Gaussian embeddings (ref :293-334);
personalized user-behavior relation weights (ref model.py:132-168). Masked-item
training; eval scores the appended mask slot.

Note: the reference head returns +W2 distance as the logit in both training and
eval, so the model consistently learns the flipped sign — reproduced as-is.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gamer_tpu.models.discriminative.base import DIS_MODELS, DisModelConfig
from gamer_tpu.modules.losses import sequence_ce_loss
from gamer_tpu.ops.masks import NEG_INF


# Covariance channels come from elu(x)+1, which UNDERFLOWS TO EXACTLY 0 in
# f32 for x <~ -17 (1 - (1 - exp(x)) rounds to 0). A 1e-24 floor keeps the
# FORWARD finite but the backward of m/c is -m/c^2 ~ 1e48 -> inf, and clip's
# zero cotangent then produces inf*0 = NaN — PBAT trained to gnorm=NaN on the
# very first step (round-3 mini quality run). The floor must keep 1/c^2
# representable in f32.
_COV_FLOOR = 1e-6


def sagp(m1, m2, c1, c2):
    c1 = jnp.clip(c1, _COV_FLOOR)
    c2 = jnp.clip(c2, _COV_FLOOR)
    mean = (c1 * m2 + c2 * m1) / (c1 + c2)
    cov = 2 * (c1 * c2) / (c1 + c2)
    return mean, cov


def tri_sagp(m1, m2, m3, c1, c2, c3):
    # reciprocal form: every intermediate (r <= 1/_COV_FLOOR, r^2 in backward)
    # stays representable; the 1/(1/c1+1/c2+1/c3) form squares reciprocals of
    # the raw covariances in its VJP and overflows
    r1 = 1.0 / jnp.clip(c1, _COV_FLOOR)
    r2 = 1.0 / jnp.clip(c2, _COV_FLOOR)
    r3 = 1.0 / jnp.clip(c3, _COV_FLOOR)
    denom = r1 + r2 + r3
    cov = 1.0 / denom
    mean = (m1 * r1 + m2 * r2 + m3 * r3) / denom
    return mean, cov


def w2_distance(m1, c1, m2, c2):
    """2-Wasserstein^2 between diagonal Gaussians over the last (feature) dim
    (ref pbat.py:31-45); broadcasts leading dims."""
    mean_part = jnp.sum((m1 - m2) ** 2, axis=-1)
    cov_part = jnp.sum(
        (jnp.sqrt(jnp.clip(c1, _COV_FLOOR)) - jnp.sqrt(jnp.clip(c2, _COV_FLOOR))) ** 2,
        axis=-1)
    return mean_part + cov_part


class SimpleEmbedding(nn.Module):
    """Embed -> LN -> dropout -> ELU (ref pbat.py:48-61)."""

    vocab: int
    dim: int
    dropout: float
    eps: float = 1e-12

    def setup(self):
        self.emb = nn.Embed(self.vocab, self.dim)
        self.ln = nn.LayerNorm(epsilon=self.eps)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, ids, deterministic=True):
        x = self.ln(self.emb(ids))
        x = self.drop(x, deterministic=deterministic)
        return nn.elu(x)

    @property
    def table(self):
        return self.emb.embedding


class FBAttention(nn.Module):
    """Fused behavior-aware Wasserstein attention (ref pbat.py:64-223)."""

    cfg: DisModelConfig

    @nn.compact
    def __call__(self, xm, xc, allowed, type_seq, tm, tc, rel_m, rel_c,
                 pos_m, pos_c, deterministic=True):
        cfg = self.cfg
        h = cfg.n_heads
        H = cfg.hidden_size
        d = H // h
        B, L, _ = xm.shape
        heads = lambda y: y.reshape(B, L, h, d).transpose(0, 2, 1, 3)

        def qkv(src, name):
            return (heads(nn.Dense(H, name=f"{name}_q")(src)),
                    heads(nn.Dense(H, name=f"{name}_k")(src)),
                    heads(nn.Dense(H, name=f"{name}_v")(src)))

        qxm, kxm, vxm = qkv(xm, "xm")
        qxc, kxc, vxc = qkv(xc, "xc")
        qbm, kbm, vbm = qkv(tm, "bm")
        qbc, kbc, vbc = qkv(tc, "bc")
        q1, k1, v1 = qxm + qbm, kxm + kbm, vxm + vbm
        q2 = nn.elu(qxc + qbc) + 1
        k2 = nn.elu(kxc + kbc) + 1
        v2 = nn.elu(vxc + vbc) + 1

        # per-(i, j) behavior relation Gaussians: rel_* [B, b+1, b+1, H]
        rel_sel_m = rel_m[jnp.arange(B)[:, None, None], type_seq[:, :, None],
                          type_seq[:, None, :]]  # [B, L, L, H]
        rel_sel_c = rel_c[jnp.arange(B)[:, None, None], type_seq[:, :, None],
                          type_seq[:, None, :]]
        rel_h_m = rel_sel_m.reshape(B, L, L, h, d).transpose(0, 3, 1, 2, 4)  # [B,h,L,L,d]
        rel_h_c = rel_sel_c.reshape(B, L, L, h, d).transpose(0, 3, 1, 2, 4)
        pos_h_m = heads(pos_m)
        pos_h_c = heads(pos_c)

        fQm, fQc = tri_sagp(q1[:, :, :, None], nn.Dense(d, name="Wq1")(rel_h_m),
                            nn.Dense(d, name="Wq2")(pos_h_m)[:, :, :, None],
                            q2[:, :, :, None], rel_h_c, pos_h_c[:, :, :, None])
        fKm, fKc = tri_sagp(k1[:, :, :, None], nn.Dense(d, name="Wk1")(rel_h_m),
                            nn.Dense(d, name="Wk2")(pos_h_m)[:, :, :, None],
                            k2[:, :, :, None], rel_h_c, pos_h_c[:, :, :, None])
        scores = -w2_distance(fQm, fQc, fKm, fKc) / jnp.sqrt(d)  # [B, h, L, L]
        scores = scores + jnp.where(allowed, 0.0, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(probs)
        ctx_m = jnp.einsum("BhQK,BhKd->BhQd", probs, v1).transpose(0, 2, 1, 3).reshape(B, L, H)
        ctx_c = jnp.einsum("BhQK,BhKd->BhQd", probs, v2).transpose(0, 2, 1, 3).reshape(B, L, H)
        drop = lambda y: nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(y)
        ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="out_ln")
        hm = ln(drop(nn.Dense(H, name="mean_dense")(ctx_m)) + xm)
        hc = ln(drop(nn.Dense(H, name="cov_dense")(ctx_c)) + xc)
        return hm, hc


class BehaviorFFN(nn.Module):
    """Behavior-specific FFN bank (ref pbat.py:226-252): per-behavior expert,
    one-hot selected; expert 0 (padding) contributes zeros. The reference runs
    the SAME bank on mean and cov streams — one module instance, called twice."""

    cfg: DisModelConfig

    @nn.compact
    def __call__(self, x, type_seq, deterministic=True):
        cfg = self.cfg
        outs = [jnp.zeros_like(x)]
        for i in range(cfg.n_behaviors):
            f = nn.Dense(cfg.inner_size, name=f"ffn_{i}_1")(x)
            f = nn.elu(f)
            f = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(f)
            f = nn.Dense(cfg.hidden_size, name=f"ffn_{i}_2")(f)
            f = nn.Dropout(cfg.dropout_prob, deterministic=deterministic)(f)
            f = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"ffn_{i}_ln")(f + x)
            outs.append(f)
        sel = jax.nn.one_hot(type_seq, cfg.n_behaviors + 1)
        return jnp.einsum("bBLH,BLb->BLH", jnp.stack(outs, 0), sel)


class PBATLayer(nn.Module):
    cfg: DisModelConfig

    @nn.compact
    def __call__(self, xm, xc, allowed, type_seq, tm, tc, rel_m, rel_c,
                 pos_m, pos_c, deterministic=True):
        cfg = self.cfg
        xm, xc = FBAttention(cfg, name="attn")(
            xm, xc, allowed, type_seq, tm, tc, rel_m, rel_c, pos_m, pos_c, deterministic)
        ffn = BehaviorFFN(cfg, name="ffn")
        xm = ffn(xm, type_seq, deterministic)
        xc = nn.elu(ffn(xc, type_seq, deterministic)) + 1
        return xm, xc


@DIS_MODELS.register("PBAT")
class PBAT(nn.Module):
    cfg: DisModelConfig
    n_items: int
    max_his_len: int
    n_users: int = 1

    @property
    def mask_token(self) -> int:
        return self.n_items + 1

    def setup(self):
        cfg = self.cfg
        H = cfg.hidden_size
        b = cfg.n_behaviors
        mk = lambda vocab: SimpleEmbedding(vocab, H, cfg.dropout_prob, cfg.layer_norm_eps)
        self.item_m = mk(self.n_items + 2)
        self.item_c = mk(self.n_items + 2)
        self.type_m = mk(b + 1)
        self.type_c = mk(b + 1)
        self.user_m = mk(self.n_users + 1)
        self.user_c = mk(self.n_users + 1)
        self.rel_m_emb = mk(b * b + 1)
        self.rel_c_emb = mk(b * b + 1)
        self.pos_m = nn.Embed(self.max_his_len + 1, H)
        self.pos_c = nn.Embed(self.max_his_len + 1, H)
        self.Wub = nn.Dense(H)
        self.WPub = nn.Dense(H)
        self.layers = [PBATLayer(cfg, name=f"layer_{i}") for i in range(cfg.n_layers)]
        self.head_out_m = nn.Dense(H)
        self.head_out_c = nn.Dense(H)

    def hidden_states(self, item_seq, type_seq, user_ids, deterministic=True):
        cfg = self.cfg
        b = cfg.n_behaviors
        H = cfg.hidden_size
        B, L = item_seq.shape
        xm = self.item_m(item_seq, deterministic)
        xc = self.item_c(item_seq, deterministic) + 1
        tm = self.type_m(type_seq, deterministic)
        tc = self.type_c(type_seq, deterministic) + 1
        um = self.user_m(user_ids, deterministic)
        uc = self.user_c(user_ids, deterministic) + 1
        pos_ids = jnp.arange(L) % (self.max_his_len + 1)
        pm = jnp.broadcast_to(self.pos_m(pos_ids)[None], (B, L, H))
        pc = jnp.broadcast_to(self.pos_c(pos_ids)[None], (B, L, H)) + 1

        all_beh = jnp.arange(b + 1)
        bm = jnp.broadcast_to(self.type_m(all_beh, deterministic)[None], (B, b + 1, H))
        bc = nn.elu(jnp.broadcast_to(self.type_c(all_beh, deterministic)[None],
                                     (B, b + 1, H))) + 1

        P_ub_m, P_ub_c = sagp(um[:, None], self.Wub(bm), uc[:, None], bc)  # [B, b+1, H]
        weight_ub = -w2_distance(P_ub_m[:, :, None], P_ub_c[:, :, None],
                                 P_ub_m[:, None, :], P_ub_c[:, None, :])  # [B, b+1, b+1]

        # personalized relation tensors (ref model.py:146-168)
        rel_base_m = self.rel_m_emb(jnp.arange(b * b + 1), deterministic)  # [b*b+1, H]
        rel_base_c = self.rel_c_emb(jnp.arange(b * b + 1), deterministic)
        pair_idx = (jnp.arange(b)[:, None] * b + jnp.arange(b)[None, :]) + 1  # [b, b]
        w_inner = weight_ub[:, 1:, 1:]  # [B, b, b]
        rel_m = jnp.zeros((B, b + 1, b + 1, H))
        rel_c = jnp.ones((B, b + 1, b + 1, H))
        rel_m = rel_m.at[:, 1:, 1:].set(w_inner[..., None] * rel_base_m[pair_idx][None])
        rel_c = rel_c.at[:, 1:, 1:].set(w_inner[..., None] * rel_base_c[pair_idx][None])
        rel_c = nn.elu(rel_c) + 1

        key_ok = (item_seq != 0)[:, None, None, :]
        allowed = jnp.broadcast_to(key_ok, (B, 1, L, L))
        for layer in self.layers:
            xm, xc = layer(xm, xc, allowed, type_seq, tm, tc, rel_m, rel_c,
                           pm, pc, deterministic)

        # final personalized fusion (ref model.py:180-194)
        sel_m = P_ub_m[jnp.arange(B)[:, None], type_seq]  # [B, L, H]
        sel_c = P_ub_c[jnp.arange(B)[:, None], type_seq]
        xm, xc = sagp(xm, self.WPub(sel_m), xc, sel_c)
        return xm, xc

    def head_logits(self, hm, hc):
        """Wasserstein head over the item Gaussian tables (ref pbat.py:293-334)."""
        hm = nn.elu(self.head_out_m(hm))
        hc = nn.elu(self.head_out_c(hc))
        emb_m = self.item_m.table[: self.n_items + 1]
        emb_c = nn.elu(self.item_c.table[: self.n_items + 1]) + 1
        return w2_distance(hm[:, None], hc[:, None], emb_m[None], emb_c[None])

    def calculate_loss(self, item_seq, type_seq, user_ids, rng, row_valid=None):
        cfg = self.cfg
        B, L = item_seq.shape
        mask = (jax.random.uniform(rng, (B, L)) < cfg.mask_ratio) & (item_seq != 0)
        labels = item_seq * mask
        masked_seq = jnp.where(mask, self.mask_token, item_seq)
        hm, hc = self.hidden_states(masked_seq, type_seq, user_ids, deterministic=False)
        logits = self.head_logits(hm.reshape(B * L, -1), hc.reshape(B * L, -1))
        flat_labels = labels.reshape(-1)
        valid = flat_labels != 0
        if row_valid is not None:
            valid = valid & jnp.repeat(row_valid == 1, L)
        return sequence_ce_loss(logits, flat_labels, valid)

    def predict_scores(self, item_seq, type_seq, user_ids, seq_len, item_range=None):
        hm, hc = self.hidden_states(item_seq, type_seq, user_ids, deterministic=True)
        idx = jnp.clip(seq_len - 1, 0, item_seq.shape[1] - 1)
        last_m = jnp.take_along_axis(hm, idx[:, None, None], axis=1)[:, 0]
        last_c = jnp.take_along_axis(hc, idx[:, None, None], axis=1)[:, 0]
        scores = self.head_logits(last_m, last_c)
        if item_range is not None:
            ids = jnp.arange(self.n_items + 1)
            scores = jnp.where(((ids >= item_range[0]) & (ids < item_range[1]))[None],
                               scores, -jnp.inf)
        return scores

    def __call__(self, item_seq, type_seq, user_ids, deterministic=True):
        return self.hidden_states(item_seq, type_seq, user_ids, deterministic)[0]
