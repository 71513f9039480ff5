"""The Qwen3 generative decoder family as ONE parametric architecture.

The reference implements seven near-identical decoder-only models as separate
~1000-line files (ref: SeqRec/models/generative/{Qwen3, Qwen3Session, Qwen3Moe,
Qwen3MoeAction, Qwen3SessionMoe, Qwen3Multi, Qwen3SessionMulti}). Every variant
is a combination of five orthogonal switches, so here there is one model and a
preset table:

  self_mask_kind            "causal" | "session"       (ops/masks.py)
  cross_attention_layers    [] or layer ids — behavior cross-attention with
                            gating + per-action qkv embeddings (Qwen3Multi)
  sparse_layers             [] or layer ids — position-routed MoE (modules/moe.py)
  behavior_injection_layers [] or layer ids — behavior embedding concatenated
                            into the FFN input
  rope_on_extended_session  RoPE positions = extended_session_ids (Session family)
  moe_action                expert id also indexed by behavior (MoeAction)

The model is a pure transformer: masks / routing / rope positions are computed
by `prepare_train_inputs` (train) or the decode driver (gamer_tpu/decode/beam.py)
and passed in, which keeps the module usable under jit/scan with explicit KV
caches for both attention streams (ref dual caches: Qwen3Multi/model.py:784-786).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from gamer_tpu.core.config import Config, config_field
from gamer_tpu.modules.dropout import BitDropout
from gamer_tpu.modules.layers import GQAAttention, RMSNorm, rope_cos_sin
from gamer_tpu.modules.moe import PositionRoutedMLP
from gamer_tpu.ops import masks as mask_ops
from gamer_tpu.ops import router as router_ops


class QwenFamilyConfig(Config):
    # core transformer (defaults = the flagship GAMER scale,
    # ref config/s2s-models/Qwen3Multi/config.json)
    vocab_size: int = 14
    hidden_size: int = 256
    num_hidden_layers: int = 8
    num_attention_heads: int = 6
    num_key_value_heads: int = 3
    head_dim: int = 64
    intermediate_size: int = 512
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    dropout_rate: float = 0.2
    # dropout on attention probs (ref config attention_dropout=0.2, applied
    # inside SDPA during training, Qwen3Multi/model.py:139); -1 = follow
    # dropout_rate, matching the reference config where both are 0.2
    attention_dropout: float = -1.0
    attention_bias: bool = False
    hidden_act: str = "silu"
    tie_word_embeddings: bool = True
    temperature: float = 1.0
    # family switches
    self_mask_kind: str = "causal"
    cross_mask_kind: str = "multi"
    cross_attention_layers: list = config_field([])
    sparse_layers: list = config_field([])
    behavior_injection_layers: list = config_field([])
    moe_action: bool = False
    rope_on_extended_session: bool = False
    mlp_type: str = "qwen3"
    # token geometry (set at task-build time from the dataset)
    num_positions: int = 5  # tokens per item block (sole_item_len + behavior token)
    num_experts: int = 6  # normally num_positions + 1
    num_behavior: int = 3
    behavior_embedding_dim: int = 64
    behavior_base: int = 14  # first behavior-token id in the vocab
    model_max_length: int = 1024
    dtype: str = "float32"
    attention_impl: str = "jnp"  # "jnp" | "pallas" | "pallas_interpret" (train path)
    # fused MoE-FFN kernel on the periodic train path (ops/pallas_moe.py):
    # "auto" = pallas on TPU, jnp elsewhere; decode/onehot paths and
    # model-parallel meshes (no pallas partitioning rule) fall back to jnp.
    # Ratified as the shipped default by the round-5 on-chip sandwich A/B:
    # 1019 vs 940 seq/s/chip (+8.4%), scripts/bench_moe_ab.py.
    moe_impl: str = "auto"
    # fused tied-head CE kernel (ops/pallas_ce.py): "auto" = pallas on TPU
    # when tie_word_embeddings and hidden_size is lane-aligned; losses then
    # never materialize [B,S,V] logits. "jnp" = the logits + fp32-view path.
    # Ratified round 5: 1060/1060 vs 1092/1092 seq/s/chip sandwich (+3.0%).
    ce_impl: str = "auto"
    # residual-stream dropout mask source: "bits" (u16 rng-stream compare) or
    # "hash" (stateless fmix32 of the flat index — no RngBitGenerator/pred
    # buffers in HBM; see modules/dropout.py). Hash ratified round 5:
    # 1015/1015 vs 1060/1063 seq/s/chip same-session sandwich (+4.6%).
    dropout_impl: str = "hash"
    # embed-table row count, >= vocab_size (0 = vocab_size). Padded so the
    # vocab table row-shards evenly on the mesh model axis and tiles the MXU
    # lane dim; padded rows are never looked up and never produce logits.
    padded_vocab_size: int = 0
    # remat ("gradient checkpointing") over the layer stack: recompute layer
    # activations in backward instead of storing them (ref plumbs HF
    # gradient_checkpointing, train_SMB_decoder.py:412, Qwen3Multi/model.py:363-374)
    remat: bool = False
    # what the backward may keep instead of recomputing:
    #   "full" — recompute everything (max memory savings, old behavior)
    #   "attn" — save the attention outputs (the S^2-cost kernels are the
    #            expensive recompute; norms/MoE/dropout re-run cheaply) —
    #            O(B*S*H*D) extra memory per attention, no kernel re-run
    #   "dots" — save every matmul result without batch dims (least recompute)
    remat_policy: str = "attn"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    @property
    def attn_dropout_rate(self) -> float:
        return self.dropout_rate if self.attention_dropout < 0 else self.attention_dropout

    @property
    def total_experts(self) -> int:
        # MoeAction: experts per (behavior x position) (ref Qwen3MoeAction/FFN.py:21)
        if self.moe_action:
            return (self.num_experts - 1) * self.num_behavior + 1
        return self.num_experts


def _preset(**kw) -> dict:
    return kw


# Family presets — the switch settings reproducing each reference model.
# `sparse`/`injection`/`cross` entries of "all"/"half_lo"/"half_hi" are resolved
# against num_hidden_layers at build time (build_config below).
QWEN_FAMILY_PRESETS: dict[str, dict] = {
    "Qwen3": _preset(),
    "Qwen3Session": _preset(self_mask_kind="session", rope_on_extended_session=True),
    "Qwen3Moe": _preset(sparse="all", injection="all"),
    "Qwen3MoeAction": _preset(sparse="all", injection="all", moe_action=True),
    "Qwen3SessionMoe": _preset(self_mask_kind="session", rope_on_extended_session=True,
                               sparse="all", injection="all"),
    "Qwen3Multi": _preset(sparse="all", injection="half_lo", cross="half_hi",
                          cross_mask_kind="multi"),
    "Qwen3SessionMulti": _preset(self_mask_kind="session", rope_on_extended_session=True,
                                 sparse="all", injection="half_lo", cross="half_hi",
                                 cross_mask_kind="session_multi"),
}


def build_config(backbone: str, **overrides: Any) -> QwenFamilyConfig:
    """Resolve a preset name + overrides into a concrete config."""
    preset = dict(QWEN_FAMILY_PRESETS[backbone])
    n_layers = overrides.get("num_hidden_layers", QwenFamilyConfig.num_hidden_layers)
    ranges = {
        "all": list(range(n_layers)),
        "half_lo": list(range(n_layers // 2)),
        "half_hi": list(range(n_layers // 2, n_layers)),
        "none": [],
    }
    for key, field in (("sparse", "sparse_layers"), ("injection", "behavior_injection_layers"),
                       ("cross", "cross_attention_layers")):
        if key in preset:
            preset[field] = ranges[preset.pop(key)]
    preset.update(overrides)
    cfg = QwenFamilyConfig.from_dict(preset)
    cfg.extra["backbone"] = backbone
    return cfg


class QwenFamilyModel(nn.Module):
    cfg: QwenFamilyConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # [B, S]
        rope_positions: jnp.ndarray,  # [B, S]
        self_allowed: jnp.ndarray,  # [B or 1, 1, S, K] bool
        cross_allowed: Optional[jnp.ndarray] = None,  # [B, 1, S, K] bool
        position_index: Optional[jnp.ndarray] = None,  # [B, S]
        behavior_index: Optional[jnp.ndarray] = None,
        action_index: Optional[jnp.ndarray] = None,
        expert_index: Optional[jnp.ndarray] = None,  # MoeAction routing
        deterministic: bool = True,
        route_mode: str = "periodic",
        caches: Optional[dict] = None,  # {"self": [L dicts], "cross": [L dicts|None]}
        cache_index: Optional[jnp.ndarray] = None,
        logits_last_only: bool = False,
        return_hidden: bool = False,  # skip the lm head (fused-CE loss path)
        streams: Optional[dict] = None,  # pallas path: integer mask streams
    ) -> dict:
        cfg = self.cfg
        dtype = cfg.jax_dtype
        n_rows = cfg.padded_vocab_size or cfg.vocab_size
        embed = nn.Embed(n_rows, cfg.hidden_size, dtype=dtype, name="embed_tokens")
        x = embed(input_ids)

        new_caches = {"self": [], "cross": []} if caches is not None else None
        use_remat = cfg.remat and caches is None  # decode never remats

        for i in range(cfg.num_hidden_layers):
            layer_caches = None
            if caches is not None:
                layer_caches = {"self": caches["self"][i], "cross": caches["cross"][i]}

            def layer_body(mdl, x, rope_positions, self_allowed, cross_allowed,
                           position_index, behavior_index, action_index,
                           expert_index, streams, layer_caches, _i=i):
                return mdl._layer(
                    _i, x, rope_positions, self_allowed, cross_allowed,
                    position_index, behavior_index, action_index, expert_index,
                    streams, layer_caches, cache_index, deterministic, route_mode)

            if use_remat:
                # recompute layer activations in backward (trades FLOPs for
                # HBM; enables S>=2048 / large-batch training). The policy
                # controls the trade — see QwenFamilyConfig.remat_policy.
                policy = {
                    "full": None,
                    "attn": jax.checkpoint_policies.save_only_these_names(
                        "attn_out"),
                    "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                }[cfg.remat_policy]
                layer_body = nn.remat(layer_body, policy=policy)
            x, new_self_cache, new_cross_cache = layer_body(
                self, x, rope_positions, self_allowed, cross_allowed,
                position_index, behavior_index, action_index, expert_index,
                streams, layer_caches)
            if new_caches is not None:
                new_caches["self"].append(new_self_cache)
                new_caches["cross"].append(new_cross_cache)
        x = RMSNorm(cfg.rms_norm_eps, name="norm")(x)
        if return_hidden:
            return {"hidden": x, "caches": new_caches}
        if logits_last_only:
            x = x[:, -1:, :]
        if cfg.tie_word_embeddings:
            # slice the (possibly padded) table back to the real vocab BEFORE
            # the matmul — logits stay exactly [B, S, vocab_size], so losses
            # and decode need no padded-id masking
            table = embed.embedding[:cfg.vocab_size].astype(x.dtype)
            logits = jnp.einsum("bsd,vd->bsv", x, table)
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=cfg.jax_dtype,
                              name="lm_head")(x)
        return {"logits": logits, "caches": new_caches}

    def _layer(self, i, x, rope_positions, self_allowed, cross_allowed,
               position_index, behavior_index, action_index, expert_index,
               streams, layer_caches, cache_index, deterministic, route_mode):
        """One decoder layer: self-attn, optional behavior cross-attn, MLP.

        Kept as a separate method so `__call__` can lift it through nn.remat
        (gradient checkpointing) without changing parameter names."""
        cfg = self.cfg
        dtype = cfg.jax_dtype
        is_cross = i in cfg.cross_attention_layers
        is_sparse = i in cfg.sparse_layers
        is_injection = i in cfg.behavior_injection_layers
        drop = lambda y: BitDropout(cfg.dropout_rate, impl=cfg.dropout_impl)(
            y, deterministic=deterministic)

        residual = x
        h = RMSNorm(cfg.rms_norm_eps, name=f"layers_{i}/input_layernorm")(x)
        attn_out, new_self_cache = GQAAttention(
            num_heads=cfg.num_attention_heads,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            rope_theta=cfg.rope_theta,
            rms_eps=cfg.rms_norm_eps,
            attention_bias=cfg.attention_bias,
            dtype=dtype,
            attention_impl=cfg.attention_impl,
            dropout_rate=cfg.attn_dropout_rate,
            name=f"layers_{i}/self_attn",
        )(h, rope_positions, self_allowed,
          kv_cache=None if layer_caches is None else layer_caches["self"],
          cache_index=cache_index,
          mask_kind=cfg.self_mask_kind, streams=streams,
          deterministic=deterministic)
        # named for remat_policy="attn": the S^2-cost kernel output is saved
        # in backward instead of re-run (jax.checkpoint_policies)
        attn_out = checkpoint_name(attn_out, "attn_out")
        x = residual + drop(attn_out)

        new_cross_cache = None
        if is_cross:
            residual = x
            h = RMSNorm(cfg.rms_norm_eps, name=f"layers_{i}/post_self_attention_layernorm")(x)
            cross_out, new_cross_cache = GQAAttention(
                num_heads=cfg.num_attention_heads,
                num_kv_heads=cfg.num_key_value_heads,
                head_dim=cfg.head_dim,
                rope_theta=cfg.rope_theta,
                rms_eps=cfg.rms_norm_eps,
                attention_bias=cfg.attention_bias,
                is_cross=True,
                num_behavior=cfg.num_behavior,
                dtype=dtype,
                attention_impl=cfg.attention_impl,
                dropout_rate=cfg.attn_dropout_rate,
                name=f"layers_{i}/cross_attn",
            )(h, rope_positions, cross_allowed, action_index=action_index,
              kv_cache=None if layer_caches is None else layer_caches["cross"],
              cache_index=cache_index,
              mask_kind=cfg.cross_mask_kind, streams=streams,
              deterministic=deterministic)
            cross_out = checkpoint_name(cross_out, "attn_out")
            x = residual + drop(cross_out)

        residual = x
        h = RMSNorm(cfg.rms_norm_eps, name=f"layers_{i}/post_cross_attention_layernorm")(x)
        mlp_out = PositionRoutedMLP(
            d_model=cfg.hidden_size,
            d_ff=cfg.intermediate_size,
            num_experts=cfg.total_experts,
            is_sparse=is_sparse,
            mlp_type=cfg.mlp_type,
            hidden_act=cfg.hidden_act,
            behavior_injection=is_injection,
            num_behavior=cfg.num_behavior,
            behavior_dim=cfg.behavior_embedding_dim,
            dropout_rate=cfg.dropout_rate,
            dtype=dtype,
            impl=cfg.moe_impl,
            name=f"layers_{i}/mlp",
        )(h, position_index, behavior_index,
          expert_index=expert_index if cfg.moe_action else None,
          route_mode=route_mode,
          num_positions=cfg.num_positions,
          deterministic=deterministic)
        x = residual + drop(mlp_out)
        return x, new_self_cache, new_cross_cache


def prepare_train_inputs(cfg: QwenFamilyConfig, batch: dict) -> dict:
    """Masks + routing + rope positions for a (right-padded) training batch.

    Mirrors the mask/router assembly in the reference forward
    (ref Qwen3Multi/model.py:796-814) but as pure jnp on batch streams.
    """
    input_ids = batch["input_ids"]
    attn = batch["attention_mask"]
    B, S = input_ids.shape
    rel = router_ops.rel_positions(attn)
    block_ids = jnp.where(rel >= 0, rel // cfg.num_positions, -1)

    import jax

    from gamer_tpu.modules.layers import pallas_attention_ok

    streams = None
    self_allowed = cross_allowed = None
    zeros = jnp.zeros_like(attn)
    # compiled pallas needs the TPU backend (a TPU-trained checkpoint may be
    # evaluated on CPU); interpret mode works anywhere
    impl_ok = (cfg.attention_impl == "pallas_interpret"
               or (cfg.attention_impl == "pallas" and jax.default_backend() == "tpu"))
    if impl_ok and pallas_attention_ok(S):
        # masks are evaluated inside the fused kernel from these streams
        streams = dict(attention_mask=attn,
                       session_ids=batch.get("session_ids", zeros),
                       actions=batch.get("actions", zeros),
                       block_ids=block_ids)
    else:
        self_allowed = mask_ops.self_mask(
            cfg.self_mask_kind, S, attention_mask=attn,
            session_ids=batch.get("session_ids"), actions=batch.get("actions"),
            block_ids=block_ids)
        if cfg.cross_attention_layers:
            cross_allowed = mask_ops.cross_mask(
                cfg.cross_mask_kind, S, attention_mask=attn,
                session_ids=batch.get("session_ids"), actions=batch.get("actions"))

    pos_idx, beh_idx, act_idx = router_ops.route_tokens(
        input_ids, rel, cfg.num_positions, cfg.behavior_base, cfg.num_behavior)
    expert_index = None
    if cfg.moe_action:
        expert_index = router_ops.moe_action_expert_index(pos_idx, act_idx, cfg.num_experts)

    if cfg.rope_on_extended_session:
        rope_positions = batch["extended_session_ids"]
    else:
        rope_positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))

    return dict(
        input_ids=input_ids,
        rope_positions=rope_positions,
        self_allowed=self_allowed,
        cross_allowed=cross_allowed,
        position_index=pos_idx,
        behavior_index=beh_idx,
        action_index=act_idx,
        expert_index=expert_index,
        streams=streams,
    )
