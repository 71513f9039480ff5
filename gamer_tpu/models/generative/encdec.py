"""Encoder-decoder generative family: TIGER (T5) and PBATransformer (Switch-MoE).

One parametric seq2seq architecture covering both reference models:
 * TIGER — stock T5 over semantic IDs with temperature-scaled CE
   (ref: SeqRec/models/generative/TIGER/model.py, config/s2s-models/TIGER)
 * PBATransformer — T5 skeleton + deterministic position-routed sparse FFN
   with optional behavior injection and shared half-output expert
   (ref: SeqRec/models/generative/PBATransformer/{model,FFN,router,block}.py)

T5 semantics preserved: RMS layer norm, unscaled attention with bucketed
relative-position bias held by the first layer of each stack, pre-norm residual
blocks, tied embedding with d_model**-0.5 logit scaling. Routing reuses
gamer_tpu/modules/moe.py; the PBA routers' cyclic position pattern
(ref PBATransformer/router.py:51-61,187-197) is computed by ops/router.py
from token positions.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gamer_tpu.core.config import Config, config_field
from gamer_tpu.modules.layers import RMSNorm
from gamer_tpu.modules.moe import PositionRoutedMLP
from gamer_tpu.ops.masks import NEG_INF


class EncDecConfig(Config):
    vocab_size: int = 32128
    d_model: int = 128
    d_kv: int = 64
    d_ff: int = 1024
    num_layers: int = 4
    num_decoder_layers: int = 4
    num_heads: int = 6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    dense_act_fn: str = "relu"
    temperature: float = 1.0
    tie_word_embeddings: bool = True
    decoder_start_token_id: int = 0
    # PBATransformer switches (empty lists => plain T5 / TIGER)
    sparse_layers_encoder: list = config_field([])
    sparse_layers_decoder: list = config_field([])
    behavior_injection_encoder: list = config_field([])
    behavior_injection_decoder: list = config_field([])
    shared_expert: bool = False
    num_positions: int = 5
    num_experts: int = 6
    num_behavior: int = 0
    behavior_embedding_dim: int = 64
    behavior_base: int = 14
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


def rel_bucket(rel: jnp.ndarray, bidirectional: bool, num_buckets: int,
               max_distance: int) -> jnp.ndarray:
    """T5 relative-position bucketing (memory_pos - query_pos)."""
    ret = jnp.zeros_like(rel)
    n = -rel
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, n, large)


class T5Attention(nn.Module):
    cfg: EncDecConfig
    has_rel_bias: bool = False
    bidirectional: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, Sq, D] queries
        kv: Optional[jnp.ndarray] = None,  # [B, Sk, D] keys/values (cross); None = self
        allowed: jnp.ndarray | None = None,  # [B or 1, 1, Sq, Sk] bool
        pos_bias: Optional[jnp.ndarray] = None,  # [1, H, Sq, Sk] precomputed
        q_positions: Optional[jnp.ndarray] = None,  # [Sq] absolute positions
        k_positions: Optional[jnp.ndarray] = None,
        kv_cache: Optional[dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
        shared_kv: Optional[dict] = None,  # beam-shared projected k/v [B, Sk, H, dk]
        emit_kv: bool = False,  # also return projected k/v (to build shared_kv)
        deterministic: bool = True,
    ):
        cfg = self.cfg
        H, dk = cfg.num_heads, cfg.d_kv
        inner = H * dk
        # T5 drops the 1/sqrt(dk) softmax scale and compensates with
        # factor-scaled init (HF T5PreTrainedModel._init_weights): q ~
        # N(0, (d_model*d_kv)^-1/2), k/v ~ N(0, d_model^-1/2), o ~
        # N(0, (H*d_kv)^-1/2). With a generic fan-in init the q projection
        # is ~8x too large, attention scores at init have std ~8, the
        # softmax saturates, and (cross-)attention never receives gradient —
        # the decoder then converges to the unconditional target marginal
        # (diagnosed on the round-4 flagship TIGER arm: trained logits were
        # history-invariant and beam eval landed at popularity level).
        t5_init = {
            "q": nn.initializers.normal(stddev=(cfg.d_model * dk) ** -0.5),
            "k": nn.initializers.normal(stddev=cfg.d_model ** -0.5),
            "v": nn.initializers.normal(stddev=cfg.d_model ** -0.5),
            "o": nn.initializers.normal(stddev=(H * dk) ** -0.5),
        }
        dense = lambda f, name: nn.Dense(f, use_bias=False, dtype=cfg.jax_dtype,
                                         kernel_init=t5_init[name], name=name)
        b, sq, _ = x.shape
        q = dense(inner, "q")(x).reshape(b, sq, H, dk)

        if shared_kv is not None:
            # Beam-decode cross-attention: encoder k/v were projected ONCE at
            # prefill and stay [B, Sk] — fold the beam axis out of the query
            # instead of tiling encoder state (T5 has no softmax scale).
            B = shared_kv["k"].shape[0]
            K_beams = b // B
            qb = q.reshape(B, K_beams, H, dk)  # sq == 1
            scores = jnp.einsum("bkhd,bshd->bkhs", qb, shared_kv["k"],
                                preferred_element_type=jnp.float32)
            if allowed is not None:  # [B, 1, 1, Sk] beam-invariant
                scores = scores + jnp.where(allowed[:, 0], 0.0, NEG_INF)[:, None]
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bkhs,bshd->bkhd", probs.astype(shared_kv["v"].dtype),
                             shared_kv["v"])
            out = dense(cfg.d_model, "o")(out.reshape(b, sq, inner))
            return out, pos_bias, None

        src = x if kv is None else kv
        k = dense(inner, "k")(src).reshape(b, src.shape[1], H, dk)
        v = dense(inner, "v")(src).reshape(b, src.shape[1], H, dk)

        new_cache = None
        if kv_cache is not None:
            assert cache_index is not None
            k_all = jax.lax.dynamic_update_slice(kv_cache["k"], k.astype(kv_cache["k"].dtype),
                                                 (0, cache_index, 0, 0))
            v_all = jax.lax.dynamic_update_slice(kv_cache["v"], v.astype(kv_cache["v"].dtype),
                                                 (0, cache_index, 0, 0))
            new_cache = {"k": k_all, "v": v_all}
            k, v = k_all, v_all

        sk = k.shape[1]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)  # T5: no 1/sqrt(d)
        if self.has_rel_bias and pos_bias is None:
            qp = q_positions if q_positions is not None else jnp.arange(sq)
            kp = k_positions if k_positions is not None else jnp.arange(sk)
            rel = qp[:, None] - kp[None, :]  # query - key; bucket fn negates
            buckets = rel_bucket(rel, self.bidirectional,
                                 cfg.relative_attention_num_buckets,
                                 cfg.relative_attention_max_distance)
            table = nn.Embed(cfg.relative_attention_num_buckets, H,
                             embedding_init=nn.initializers.normal(
                                 stddev=cfg.d_model ** -0.5),
                             dtype=cfg.jax_dtype, name="rel_bias")(buckets)
            pos_bias = jnp.transpose(table, (2, 0, 1))[None]  # [1, H, Sq, Sk]
        if pos_bias is not None:
            scores = scores + pos_bias
        if allowed is not None:
            scores = scores + jnp.where(allowed, 0.0, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        if not deterministic and cfg.dropout_rate > 0.0:
            # dropout on attention probs (HF T5Attention does the same with
            # config.dropout_rate during training)
            from gamer_tpu.modules.dropout import keep_threshold

            thresh, keep_p = keep_threshold(cfg.dropout_rate)
            bits = jax.random.bits(self.make_rng("dropout"), probs.shape, jnp.uint32)
            probs = jnp.where(bits >= jnp.uint32(thresh), probs / keep_p, 0.0)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        out = dense(cfg.d_model, "o")(out.reshape(b, sq, inner))
        if emit_kv:
            new_cache = {"k": k, "v": v}
        return out, pos_bias, new_cache


class EncDecModel(nn.Module):
    cfg: EncDecConfig

    def _mlp(self, i: int, decoder: bool) -> PositionRoutedMLP:
        cfg = self.cfg
        sparse = i in (cfg.sparse_layers_decoder if decoder else cfg.sparse_layers_encoder)
        inject = i in (cfg.behavior_injection_decoder if decoder else cfg.behavior_injection_encoder)
        return PositionRoutedMLP(
            d_model=cfg.d_model, d_ff=cfg.d_ff, num_experts=cfg.num_experts,
            is_sparse=sparse, mlp_type="t5", hidden_act=cfg.dense_act_fn,
            behavior_injection=inject, num_behavior=cfg.num_behavior,
            behavior_dim=cfg.behavior_embedding_dim, dropout_rate=cfg.dropout_rate,
            shared_expert=cfg.shared_expert, dtype=cfg.jax_dtype,
            name=f"{'decoder' if decoder else 'encoder'}_{i}/mlp")

    @nn.compact
    def __call__(
        self,
        encoder_input_ids: Optional[jnp.ndarray] = None,  # [B, Se]
        encoder_attention_mask: Optional[jnp.ndarray] = None,
        decoder_input_ids: jnp.ndarray = None,  # [B, Sd]
        decoder_attention_mask: Optional[jnp.ndarray] = None,
        enc_position_index: Optional[jnp.ndarray] = None,
        enc_behavior_index: Optional[jnp.ndarray] = None,
        dec_position_index: Optional[jnp.ndarray] = None,
        dec_behavior_index: Optional[jnp.ndarray] = None,
        encoder_hidden: Optional[jnp.ndarray] = None,  # precomputed (decode)
        deterministic: bool = True,
        caches: Optional[list] = None,  # decoder self-attn caches per layer
        cache_index: Optional[jnp.ndarray] = None,
        dec_positions: Optional[jnp.ndarray] = None,  # [Sd] absolute positions (decode)
        logits_last_only: bool = False,
        cross_kv: Optional[list] = None,  # per-layer beam-shared cross k/v (decode)
        emit_cross_kv: bool = False,  # prefill: return projected cross k/v per layer
    ) -> dict:
        cfg = self.cfg
        # HF T5 shared embedding init is N(0, 1) — the tied head's
        # d_model^-0.5 logit scale assumes O(1)-std embeddings
        embed = nn.Embed(cfg.vocab_size, cfg.d_model,
                         embedding_init=nn.initializers.normal(stddev=1.0),
                         dtype=cfg.jax_dtype, name="shared")
        drop = lambda y: nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(y)

        # ---------------- encoder ----------------
        if encoder_hidden is None and cross_kv is None:
            assert encoder_input_ids is not None
            h = drop(embed(encoder_input_ids))
            enc_allowed = None
            if encoder_attention_mask is not None:
                enc_allowed = (encoder_attention_mask[:, None, None, :] == 1)
            bias = None
            for i in range(cfg.num_layers):
                r = h
                hn = RMSNorm(cfg.layer_norm_epsilon, name=f"encoder_{i}/ln1")(h)
                a, bias, _ = T5Attention(cfg, has_rel_bias=(i == 0), bidirectional=True,
                                         name=f"encoder_{i}/self_attn")(
                    hn, allowed=enc_allowed, pos_bias=bias,
                    deterministic=deterministic)
                h = r + drop(a)
                r = h
                hn = RMSNorm(cfg.layer_norm_epsilon, name=f"encoder_{i}/ln2")(h)
                m = self._mlp(i, decoder=False)(
                    hn, enc_position_index, enc_behavior_index,
                    route_mode="onehot", num_positions=cfg.num_positions,
                    deterministic=deterministic)
                h = r + drop(m)
            encoder_hidden = RMSNorm(cfg.layer_norm_epsilon, name="encoder_norm")(h)
            encoder_hidden = drop(encoder_hidden)

        # ---------------- decoder ----------------
        b, sd = decoder_input_ids.shape
        h = drop(embed(decoder_input_ids))
        # self mask: causal (+ padding). With caches, queries are the current
        # slice and keys the whole cache (cache_index offsets the causality).
        if caches is not None:
            k_len = caches[0]["self"]["k"].shape[1]
            qpos = (dec_positions if dec_positions is not None
                    else cache_index + jnp.arange(sd))
            kpos = jnp.arange(k_len)
            self_allowed = (kpos[None, :] <= qpos[:, None])[None, None]
        else:
            k_len = sd
            qpos = jnp.arange(sd)
            kpos = qpos
            self_allowed = (kpos[None, :] <= qpos[:, None])[None, None]
        if decoder_attention_mask is not None and caches is None:
            self_allowed = self_allowed & (decoder_attention_mask[:, None, None, :] == 1)
        cross_allowed = None
        if encoder_attention_mask is not None:
            cross_allowed = (encoder_attention_mask[:, None, None, :] == 1)

        bias = None
        new_caches = [] if caches is not None else None
        for i in range(cfg.num_decoder_layers):
            r = h
            hn = RMSNorm(cfg.layer_norm_epsilon, name=f"decoder_{i}/ln1")(h)
            a, bias, self_cache = T5Attention(cfg, has_rel_bias=(i == 0), bidirectional=False,
                                              name=f"decoder_{i}/self_attn")(
                hn, allowed=self_allowed, pos_bias=bias,
                q_positions=qpos, k_positions=kpos,
                kv_cache=None if caches is None else caches[i]["self"],
                cache_index=cache_index, deterministic=deterministic)
            h = r + drop(a)
            r = h
            hn = RMSNorm(cfg.layer_norm_epsilon, name=f"decoder_{i}/ln2")(h)
            a, _, ckv = T5Attention(cfg, has_rel_bias=False,
                                    name=f"decoder_{i}/cross_attn")(
                hn, kv=encoder_hidden, allowed=cross_allowed,
                shared_kv=None if cross_kv is None else cross_kv[i],
                emit_kv=emit_cross_kv, deterministic=deterministic)
            h = r + drop(a)
            r = h
            hn = RMSNorm(cfg.layer_norm_epsilon, name=f"decoder_{i}/ln3")(h)
            m = self._mlp(i, decoder=True)(
                hn, dec_position_index, dec_behavior_index,
                route_mode="onehot", num_positions=cfg.num_positions,
                deterministic=deterministic)
            h = r + drop(m)
            if new_caches is not None:
                entry = {"self": self_cache}
                if emit_cross_kv:
                    entry["cross"] = ckv
                new_caches.append(entry)
        h = RMSNorm(cfg.layer_norm_epsilon, name="decoder_norm")(h)
        h = drop(h)
        if logits_last_only:
            h = h[:, -1:, :]
        if cfg.tie_word_embeddings:
            logits = embed.attend(h * (cfg.d_model ** -0.5))
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=cfg.jax_dtype,
                              kernel_init=nn.initializers.normal(
                                  stddev=cfg.d_model ** -0.5),
                              name="lm_head")(h)
        return {"logits": logits, "encoder_hidden": encoder_hidden,
                "caches": new_caches}


def shift_right(labels: jnp.ndarray, start_token: int, pad_id: int = 0,
                ignore_label: int = -100) -> jnp.ndarray:
    """T5 decoder-input construction: [start, labels[:-1]] with -100 -> pad."""
    shifted = jnp.concatenate(
        [jnp.full((labels.shape[0], 1), start_token, labels.dtype), labels[:, :-1]],
        axis=1)
    return jnp.where(shifted == ignore_label, pad_id, shifted)


PBA_PRESET = dict(
    d_model=256, d_ff=512, num_layers=4, num_decoder_layers=4, num_heads=6,
    shared_expert=False,
)


def build_encdec_config(backbone: str, **overrides: Any) -> EncDecConfig:
    base: dict[str, Any] = {}
    if backbone == "PBATransformer":
        base.update(PBA_PRESET)
        n_layers = overrides.get("num_layers", base["num_layers"])
        base.setdefault("sparse_layers_encoder", list(range(n_layers)))
        base.setdefault("sparse_layers_decoder", list(range(n_layers)))
    elif backbone != "TIGER":
        raise ValueError(f"unknown enc-dec backbone {backbone!r}")
    base.update(overrides)
    cfg = EncDecConfig.from_dict(base)
    cfg.extra["backbone"] = backbone
    return cfg
