"""On-device trie-constrained beam search for fixed-length semantic IDs.

Replaces HF `generate(num_beams=20, prefix_allowed_tokens_fn=...)` — which
calls a Python trie callback per beam per token from the host
(ref: SeqRec/tasks/test_SMB_decoder.py:122-195) — with a fully jitted loop:

  prefill(prompt)  -> last-position logits + KV caches for both streams
  L decode steps   -> per-level logits sliced to the level's contiguous token
                      range, masked by the LeveledTrie tables, renormalized
                      (log_softmax over allowed, matching HF's
                      PrefixConstrainedLogitsProcessor + log_softmax order),
                      top-K beam transition, cache reorder by parent beam

Because semantic-ID levels own contiguous vocab ranges, each step scores only
[K, level_size] instead of [K, vocab] — and the trie lookup is an array gather.
Decode masks follow the reference semantics exactly (see ops/masks.py:
generated self rows are causal; generated cross rows reuse the last prompt row).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gamer_tpu.decode.trie import LeveledTrie
from gamer_tpu.models.generative.encdec import EncDecModel
from gamer_tpu.models.generative.qwen_family import QwenFamilyConfig, QwenFamilyModel
from gamer_tpu.ops import masks as mask_ops
from gamer_tpu.ops import router as router_ops

NEG = -1e30


@dataclass(frozen=True)
class BeamSearchConfig:
    num_beams: int = 20
    # "auto" = bfloat16 on TPU (halves decode HBM — the 31k beams/s config,
    # docs/benchmarks.md), float32 elsewhere; parity pinned by
    # tests/test_decode_parity_flagship.py bf16-cache cases.
    cache_dtype: str = "auto"


def resolve_cache_dtype(name: str):
    """Same shape as the --dtype auto rule (tasks/train_smb_decoder.py)."""
    if name == "auto":
        name = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def _tile_beams(tree, num_beams: int):
    """[B, ...] -> [B*num_beams, ...] by repeating each row."""
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, num_beams, axis=0), tree)


def prepare_prefill(cfg: QwenFamilyConfig, batch: dict,
                    behavior_emb_id: jnp.ndarray | int):
    """Model inputs for the prompt forward, plus decode-time constants.

    Caches cover the PROMPT only ([B, S]); generated-token KV lives in small
    per-beam side caches (see `constrained_beam_search`), because decode mask
    rows are beam-invariant over the prompt (ops/masks.py decode_*_row)."""
    input_ids = batch["input_ids"]
    attn = batch["attention_mask"]
    B, S = input_ids.shape
    rel = router_ops.rel_positions(attn)
    block_ids = jnp.where(rel >= 0, rel // cfg.num_positions, -1)

    self_allowed = mask_ops.self_mask(
        cfg.self_mask_kind, S, attention_mask=attn,
        session_ids=batch.get("session_ids"), actions=batch.get("actions"),
        block_ids=block_ids)
    self_allowed = jnp.broadcast_to(self_allowed, (B, 1, S, S))
    cross_allowed = None
    cross_row = None
    if cfg.cross_attention_layers:
        cross_allowed = mask_ops.cross_mask(
            cfg.cross_mask_kind, S, attention_mask=attn,
            session_ids=batch.get("session_ids"), actions=batch.get("actions"))
        cross_row = cross_allowed[:, 0, -1, :]  # last prompt token's row [B, S]

    pos_idx, beh_idx, act_idx = router_ops.route_tokens(
        input_ids, rel, cfg.num_positions, cfg.behavior_base, cfg.num_behavior)
    expert_index = None
    if cfg.moe_action:
        expert_index = router_ops.moe_action_expert_index(pos_idx, act_idx, cfg.num_experts)

    if cfg.rope_on_extended_session:
        rope_positions = batch["extended_session_ids"]
        max_esid = batch["extended_session_ids"].max(axis=-1)  # [B]
    else:
        rope_positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        max_esid = None

    inputs = dict(
        input_ids=input_ids,
        rope_positions=rope_positions,
        self_allowed=self_allowed,
        cross_allowed=cross_allowed,
        position_index=pos_idx,
        behavior_index=beh_idx,
        action_index=act_idx,
        expert_index=expert_index,
    )
    consts = dict(cross_row=cross_row, max_esid=max_esid, prompt_attn=attn)
    return inputs, consts


def init_caches(cfg: QwenFamilyConfig, batch_size: int, k_total: int, dtype) -> dict:
    shape = (batch_size, k_total, cfg.num_key_value_heads, cfg.head_dim)
    mk = lambda: {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    return {
        "self": [mk() for _ in range(cfg.num_hidden_layers)],
        "cross": [mk() if i in cfg.cross_attention_layers else None
                  for i in range(cfg.num_hidden_layers)],
    }


def constrained_beam_search(
    model: QwenFamilyModel,
    params,
    batch: dict,
    trie: LeveledTrie,
    behavior_emb_id,
    search_cfg: BeamSearchConfig = BeamSearchConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (codes [B, num_beams, L] 0-based per-level codes sorted by
    score desc, scores [B, num_beams] sum of log-probs).

    `behavior_emb_id` may be an int, a per-example [B] array, or None.
    None means trie level 0 decodes the *behavior token* itself
    (test_MB_decoder BEHAVIOR_ITEM mode, ref test_MB_decoder.py:121-127):
    the per-beam behavior embedding id is then derived from the decoded
    level-0 code (behavior tokens are a contiguous vocab range, so
    emb_id = code + 1) and reordered with the beams."""
    cfg = model.cfg
    L = trie.num_levels
    K = search_cfg.num_beams
    B, S = batch["input_ids"].shape
    cache_dtype = resolve_cache_dtype(search_cfg.cache_dtype)

    allowed_tables = [jnp.asarray(a) for a in trie.allowed]
    child_tables = [jnp.asarray(c) for c in trie.child]

    derive_behavior = behavior_emb_id is None
    inputs, consts = prepare_prefill(cfg, batch, 0 if derive_behavior else behavior_emb_id)
    caches = init_caches(cfg, B, S, cache_dtype)
    out = model.apply(params, **inputs, caches=caches, cache_index=jnp.int32(0),
                      logits_last_only=True, route_mode="onehot")
    caches = out["caches"]
    logits0 = out["logits"][:, 0, :]  # [B, V]

    # ---- step 0: level-0 tokens from the trie root -------------------------
    base0, size0 = trie.level_token_base[0], trie.level_sizes[0]
    lvl_logits = logits0[:, base0:base0 + size0]
    root_allowed = allowed_tables[0][0]  # [size0]
    logp = jax.nn.log_softmax(jnp.where(root_allowed[None, :], lvl_logits, NEG), axis=-1)
    logp = jnp.where(root_allowed[None, :], logp, NEG)
    k0 = min(K, size0)
    scores, codes0 = jax.lax.top_k(logp, k0)  # [B, k0]
    if k0 < K:  # more beams than level-0 codes: pad with dead beams
        scores = jnp.pad(scores, ((0, 0), (0, K - k0)), constant_values=NEG)
        codes0 = jnp.pad(codes0, ((0, 0), (0, K - k0)))
    nodes = child_tables[0][0, codes0]  # [B, K]
    gen_codes = codes0[:, :, None]  # [B, K, 1]

    # Prompt KV stays [B, S] and is SHARED across beams; only generated-token
    # KV (at most L-1 positions ever attended) is per-beam. num_beams x less
    # decode HBM traffic than tiling the whole cache.
    Tg = max(L - 1, 1)
    gen_shape = (B * K, Tg, cfg.num_key_value_heads, cfg.head_dim)
    caches = {
        "self": [dict(k_prompt=c["k"], v_prompt=c["v"],
                      k=jnp.zeros(gen_shape, cache_dtype),
                      v=jnp.zeros(gen_shape, cache_dtype))
                 for c in caches["self"]],
        "cross": [None if c is None else dict(k_prompt=c["k"], v_prompt=c["v"])
                  for c in caches["cross"]],
    }
    # beam-invariant decode mask rows (see ops/masks.py decode_*_row)
    prompt_self_row = (consts["prompt_attn"] == 1)[:, None, None, :]  # [B,1,1,S]
    cross_row = None
    if consts["cross_row"] is not None:
        cross_row = consts["cross_row"][:, None, None, :]
    max_esid_t = None
    if consts["max_esid"] is not None:
        max_esid_t = jnp.repeat(consts["max_esid"], K, axis=0)
    prompt_len_t = jnp.repeat(batch["prompt_len"].astype(jnp.int32), K, axis=0)

    if derive_behavior:
        beh_bk = (codes0 + 1).astype(jnp.int32)  # [B, K] from decoded behavior tokens
    elif jnp.ndim(jnp.asarray(behavior_emb_id)) == 1:
        beh_bk = jnp.tile(jnp.asarray(behavior_emb_id, jnp.int32)[:, None], (1, K))
    else:
        beh_bk = jnp.full((B, K), behavior_emb_id, jnp.int32)

    for step in range(1, L):
        # token processed now = code chosen at level step-1
        prev_codes = gen_codes[:, :, step - 1].reshape(B * K)
        tok = (prev_codes + trie.level_token_base[step - 1]).astype(jnp.int32)[:, None]
        # relative position of this token = prompt_len + step - 1
        rel_g = prompt_len_t + step - 1
        pos_index = ((rel_g % cfg.num_positions) + 1)[:, None]
        if cfg.rope_on_extended_session:
            rope_pos = (max_esid_t + step)[:, None]
        else:
            rope_pos = jnp.full((B * K, 1), S + step - 1, jnp.int32)
        beh = beh_bk.reshape(B * K, 1)
        expert_index = None
        if cfg.moe_action:
            expert_index = router_ops.moe_action_expert_index(pos_index, beh, cfg.num_experts)

        out = model.apply(
            params,
            input_ids=tok,
            rope_positions=rope_pos,
            self_allowed=prompt_self_row,
            cross_allowed=cross_row,
            position_index=pos_index,
            behavior_index=beh,
            action_index=beh,
            expert_index=expert_index,
            route_mode="onehot",
            caches=caches,
            cache_index=step - 1,  # static gen-cache write index
        )
        caches = out["caches"]
        logits = out["logits"][:, 0, :]  # [B*K, V]

        base, size = trie.level_token_base[step], trie.level_sizes[step]
        lvl_logits = logits[:, base:base + size]
        node_safe = jnp.maximum(nodes.reshape(B * K), 0)
        allowed = allowed_tables[step][node_safe]  # [B*K, size]
        allowed = allowed & (nodes.reshape(B * K) >= 0)[:, None]
        logp = jax.nn.log_softmax(jnp.where(allowed, lvl_logits, NEG), axis=-1)
        logp = jnp.where(allowed, logp, NEG)

        total = scores[:, :, None] + logp.reshape(B, K, size)  # [B, K, size]
        flat = total.reshape(B, K * size)
        scores, idx = jax.lax.top_k(flat, K)  # [B, K]
        parent = idx // size  # [B, K]
        code = idx % size

        # reorder beam state by parent
        gather = lambda x: jnp.take_along_axis(x, parent, axis=1)
        gen_codes = jnp.take_along_axis(gen_codes, parent[:, :, None], axis=1)
        gen_codes = jnp.concatenate([gen_codes, code[:, :, None]], axis=2)
        nodes = child_tables[step][
            jnp.maximum(gather(nodes).reshape(B * K), 0), code.reshape(B * K)
        ].reshape(B, K)
        beh_bk = gather(beh_bk)

        # Reorder per-beam generated KV by parent beam. The shared prompt KV
        # never moves; cross caches hold no per-beam state at all (generated
        # cross rows read prompt columns only, ops/masks.py decode_cross_row).
        flat_parent = (jnp.arange(B)[:, None] * K + parent).reshape(B * K)
        caches = {
            "self": [{**c, "k": c["k"][flat_parent], "v": c["v"][flat_parent]}
                     for c in caches["self"]],
            "cross": caches["cross"],
        }

    return gen_codes, scores


def constrained_beam_search_encdec(
    model: EncDecModel,
    params,
    batch: dict,  # encoder input_ids/attention_mask (+ optional routing)
    trie: LeveledTrie,
    decoder_prefix: np.ndarray,  # [P0] tokens fed before the first item level
    search_cfg: BeamSearchConfig = BeamSearchConfig(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Beam search for the enc-dec family (TIGER/PBATransformer).

    `decoder_prefix` is [decoder_start(, behavior_token)] — the reference seeds
    generation the same way (ref test_SMB_decoder.py:188-195 decoder_input_ids).
    Returns (codes [B, K, L], scores [B, K]).
    """
    cfg = model.cfg
    L = trie.num_levels
    K = search_cfg.num_beams
    B = batch["input_ids"].shape[0]
    decoder_prefix = jnp.asarray(decoder_prefix, jnp.int32)
    per_row_prefix = decoder_prefix.ndim == 2  # [B, P0] (per-example behavior)
    P0 = decoder_prefix.shape[-1]
    cache_len = P0 + L
    cache_dtype = resolve_cache_dtype(search_cfg.cache_dtype)

    allowed_tables = [jnp.asarray(a) for a in trie.allowed]
    child_tables = [jnp.asarray(c) for c in trie.child]

    def dec_routing(positions: jnp.ndarray, prefix_tokens: jnp.ndarray):
        """Routing for decoder tokens by absolute decoder position
        (matches the PBA decoder router's pre-generated pattern,
        ref PBATransformer/router.py:187-197)."""
        P = cfg.num_positions
        pos_index = (positions % P) + 1
        # behavior index: block-start token of block 0 is decoder_start (-> 0);
        # with a behavior token at position 1 it is NOT a block start, so the
        # reference maps these tokens through the raw block-start value -> 0.
        beh_index = jnp.zeros_like(pos_index)
        return pos_index, beh_index

    # ---- prefill: encoder + decoder prefix --------------------------------
    caches = [{"self": {"k": jnp.zeros((B, cache_len, cfg.num_heads, cfg.d_kv), cache_dtype),
                        "v": jnp.zeros((B, cache_len, cfg.num_heads, cfg.d_kv), cache_dtype)}}
              for _ in range(cfg.num_decoder_layers)]
    prefix = (decoder_prefix if per_row_prefix
              else jnp.tile(decoder_prefix[None], (B, 1)))
    pos0 = jnp.arange(P0)
    pidx, bidx = dec_routing(pos0, prefix)
    # encoder routing (the PBATransformer encoder is position-routed sparse)
    enc_rel = router_ops.rel_positions(batch["attention_mask"])
    enc_pos, enc_beh, _ = router_ops.route_tokens(
        batch["input_ids"], enc_rel, cfg.num_positions, cfg.behavior_base,
        cfg.num_behavior)
    out = model.apply(
        params,
        encoder_input_ids=batch["input_ids"],
        encoder_attention_mask=batch["attention_mask"],
        decoder_input_ids=prefix,
        enc_position_index=enc_pos,
        enc_behavior_index=enc_beh,
        dec_position_index=jnp.tile(pidx[None], (B, 1)),
        dec_behavior_index=jnp.tile(bidx[None], (B, 1)),
        caches=caches, cache_index=jnp.int32(0), dec_positions=pos0,
        logits_last_only=True, emit_cross_kv=True)
    # cross k/v of the encoder states are projected once here and stay
    # beam-SHARED [B, Senc]; only the (tiny) decoder self cache is per-beam
    cross_kv = [c["cross"] for c in out["caches"]]
    caches = [{"self": c["self"]} for c in out["caches"]]
    logits0 = out["logits"][:, 0, :]

    base0, size0 = trie.level_token_base[0], trie.level_sizes[0]
    lvl_logits = logits0[:, base0:base0 + size0]
    root_allowed = allowed_tables[0][0]
    logp = jax.nn.log_softmax(jnp.where(root_allowed[None, :], lvl_logits, NEG), axis=-1)
    logp = jnp.where(root_allowed[None, :], logp, NEG)
    k0 = min(K, size0)
    scores, codes0 = jax.lax.top_k(logp, k0)
    if k0 < K:
        scores = jnp.pad(scores, ((0, 0), (0, K - k0)), constant_values=NEG)
        codes0 = jnp.pad(codes0, ((0, 0), (0, K - k0)))
    nodes = child_tables[0][0, codes0]
    gen_codes = codes0[:, :, None]

    caches = [jax.tree_util.tree_map(lambda x: jnp.repeat(x, K, axis=0), c) for c in caches]

    for step in range(1, L):
        prev = gen_codes[:, :, step - 1].reshape(B * K)
        tok = (prev + trie.level_token_base[step - 1]).astype(jnp.int32)[:, None]
        dpos = P0 + step - 1
        pidx, bidx = dec_routing(jnp.array([dpos]), tok)
        out = model.apply(
            params,
            cross_kv=cross_kv,
            encoder_attention_mask=batch["attention_mask"],
            decoder_input_ids=tok,
            dec_position_index=jnp.tile(pidx[None], (B * K, 1)),
            dec_behavior_index=jnp.tile(bidx[None], (B * K, 1)),
            caches=caches, cache_index=jnp.int32(dpos),
            dec_positions=jnp.array([dpos]),
            logits_last_only=True)
        caches = out["caches"]
        logits = out["logits"][:, 0, :]

        base, size = trie.level_token_base[step], trie.level_sizes[step]
        lvl_logits = logits[:, base:base + size]
        node_safe = jnp.maximum(nodes.reshape(B * K), 0)
        allowed = allowed_tables[step][node_safe]
        allowed = allowed & (nodes.reshape(B * K) >= 0)[:, None]
        logp = jax.nn.log_softmax(jnp.where(allowed, lvl_logits, NEG), axis=-1)
        logp = jnp.where(allowed, logp, NEG)

        total = scores[:, :, None] + logp.reshape(B, K, size)
        flat = total.reshape(B, K * size)
        scores, idx = jax.lax.top_k(flat, K)
        parent = idx // size
        code = idx % size
        gen_codes = jnp.take_along_axis(gen_codes, parent[:, :, None], axis=1)
        gen_codes = jnp.concatenate([gen_codes, code[:, :, None]], axis=2)
        gather = lambda x: jnp.take_along_axis(x, parent, axis=1)
        nodes = child_tables[step][
            jnp.maximum(gather(nodes).reshape(B * K), 0), code.reshape(B * K)
        ].reshape(B, K)
        # decoder-prefix positions [0, P0) are beam-invariant; move only the
        # generated slice (see the decoder-only variant above)
        flat_parent = (jnp.arange(B)[:, None] * K + parent).reshape(B * K)

        def move(x):
            gen = jax.lax.dynamic_slice_in_dim(x, P0, step, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(x, gen[flat_parent], P0, axis=1)

        caches = [jax.tree_util.tree_map(move, c) for c in caches]

    return gen_codes, scores


def make_beam_search_fn(model, trie: LeveledTrie,
                        search_cfg: BeamSearchConfig = BeamSearchConfig()):
    """Jit the WHOLE search once per (model, trie, config): one device dispatch
    per batch instead of per-op eager execution. `behavior_emb_id` stays a
    traced argument so per-behavior eval reuses the same executable."""
    import jax as _jax

    def fn(params, batch, behavior_emb_id):
        return constrained_beam_search(model, params, batch, trie,
                                       behavior_emb_id, search_cfg)

    return _jax.jit(fn)


def make_beam_search_encdec_fn(model, trie: LeveledTrie, decoder_prefix_len: int,
                               search_cfg: BeamSearchConfig = BeamSearchConfig()):
    """Jitted enc-dec search; the decoder prefix is traced (per-behavior token)."""
    import jax as _jax

    def fn(params, batch, decoder_prefix):
        return constrained_beam_search_encdec(model, params, batch, trie,
                                              decoder_prefix, search_cfg)

    return _jax.jit(fn)
