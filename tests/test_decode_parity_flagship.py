"""Flagship decode parity: Qwen3Multi / Qwen3SessionMulti beam scores must
equal a teacher-forced full forward whose generated-token mask rows are built
the REFERENCE way (ref: SeqRec/models/generative/Qwen3Multi/model.py:573-741,
Qwen3SessionMulti/model.py:556-674):

  - generated self rows: plain causal over [prompt ; generated] + padding
    (ref Qwen3Multi/model.py:717-727), even when the train-time self mask is
    the session mask,
  - generated cross rows: the FROZEN last-prompt-token row, generated keys
    disallowed (ref Qwen3Multi/model.py:605-617),
  - prompt rows: the train-time predicate over the prompt only.

This pins down the trickiest flagship decode state: dual KV caches (shared
prompt + per-beam generated), frozen cross rows, per-action cross qkv
embeddings across the prefill/decode boundary, extended-session RoPE
increments, and left-padded mixed-length batches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamer_tpu.data.vocab import PAD_ID, SemanticVocab
from gamer_tpu.decode.beam import BeamSearchConfig, constrained_beam_search
from gamer_tpu.decode.trie import LeveledTrie
from gamer_tpu.models.generative.qwen_family import QwenFamilyModel, build_config
from gamer_tpu.ops import masks as mask_ops
from gamer_tpu.ops import router as router_ops


def _build_prompt_batch(vocab, token_rows, rng):
    """Two left-padded rows of different lengths with mixed behaviors/sessions.

    Row 0: 3 item blocks (click, buy, click) + trailing 'buy' behavior token.
    Row 1: 2 item blocks (buy, click) + trailing 'buy' behavior token.
    Sessions repeat across two blocks in row 0 so the session self-mask is
    non-trivial; actions mix 1/2 so the 'multi' cross mask is non-trivial.
    """
    P = vocab.num_levels + 1  # item block = behavior token + L code tokens
    N = len(token_rows)
    plans = [
        (["click", "buy", "click"], [0, 0, 1]),
        (["buy", "click"], [0, 1]),
    ]
    B = len(plans)
    S = max(len(b) for b, _ in plans) * P + 1
    ids = np.full((B, S), PAD_ID, np.int32)
    attn = np.zeros((B, S), np.int32)
    sessions = np.zeros((B, S), np.int32)
    actions = np.zeros((B, S), np.int32)
    esid = np.zeros((B, S), np.int32)
    prompt_lens = []
    for b, (behaviors, sess) in enumerate(plans):
        toks, stoks, atoks = [], [], []
        for beh_name, s_id in zip(behaviors, sess):
            item = rng.integers(0, N)
            toks += [vocab.behavior_token(beh_name), *token_rows[item]]
            stoks += [s_id] * P
            atoks += [vocab.behavior_token(beh_name) - vocab.behavior_base + 1] * P
        toks.append(vocab.behavior_token("buy"))  # target behavior
        stoks.append(max(sess) + 1)
        atoks.append(vocab.behavior_token("buy") - vocab.behavior_base + 1)
        L0 = len(toks)
        ids[b, S - L0:] = toks
        attn[b, S - L0:] = 1
        sessions[b, S - L0:] = stoks
        actions[b, S - L0:] = atoks
        esid[b, S - L0:] = np.arange(L0)
        prompt_lens.append(L0)
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(attn),
        "session_ids": jnp.asarray(sessions),
        "actions": jnp.asarray(actions),
        "extended_session_ids": jnp.asarray(esid),
        "prompt_len": jnp.asarray(prompt_lens, jnp.int32),
    }, S


def _reference_full_forward_score(model, params, cfg, vocab, trie, token_rows,
                                  codes, batch, S, b, cand_i):
    """Teacher-forced log-prob of candidate `cand_i` for row `b`, with the
    extended-sequence masks assembled the reference decode way."""
    L = trie.num_levels
    ids = np.asarray(batch["input_ids"])
    attn = np.asarray(batch["attention_mask"])
    sessions = np.asarray(batch["session_ids"])
    actions = np.asarray(batch["actions"])
    esid = np.asarray(batch["extended_session_ids"])
    E = S + L

    ext_ids = np.full(E, PAD_ID, np.int32)
    ext_attn = np.zeros(E, np.int32)
    ext_ids[:S], ext_attn[:S] = ids[b], attn[b]
    ext_ids[S:] = token_rows[cand_i]
    ext_attn[S:] = 1

    ext_ids_j = jnp.asarray(ext_ids[None])
    ext_attn_j = jnp.asarray(ext_attn[None])

    # ---- prompt-rows masks: the train predicates over the PROMPT only ------
    pb = {k: jnp.asarray(v[b][None]) for k, v in
          dict(input_ids=ids, attention_mask=attn, session_ids=sessions,
               actions=actions).items()}
    rel_p = router_ops.rel_positions(pb["attention_mask"])
    block_ids_p = jnp.where(rel_p >= 0, rel_p // cfg.num_positions, -1)
    self_prompt = mask_ops.self_mask(
        cfg.self_mask_kind, S, attention_mask=pb["attention_mask"],
        session_ids=pb["session_ids"], actions=pb["actions"],
        block_ids=block_ids_p)
    self_prompt = np.asarray(jnp.broadcast_to(self_prompt, (1, 1, S, S)))[0, 0]
    cross_prompt = np.asarray(mask_ops.cross_mask(
        cfg.cross_mask_kind, S, attention_mask=pb["attention_mask"],
        session_ids=pb["session_ids"], actions=pb["actions"]))[0, 0]

    # ---- extended masks, reference decode semantics ------------------------
    ext_self = np.zeros((E, E), bool)
    ext_self[:S, :S] = self_prompt
    for i in range(S, E):  # generated rows: plain causal + padding
        ext_self[i, :i + 1] = ext_attn[:i + 1] == 1
    ext_cross = np.zeros((E, E), bool)
    ext_cross[:S, :S] = cross_prompt
    ext_cross[S:, :S] = cross_prompt[S - 1]  # frozen last prompt row
    # generated keys stay disallowed in the cross stream (ref :605-617)

    # ---- routing / rope over the extended sequence -------------------------
    rel = router_ops.rel_positions(ext_attn_j)
    pos_idx, beh_idx, act_idx = router_ops.route_tokens(
        ext_ids_j, rel, cfg.num_positions, cfg.behavior_base, cfg.num_behavior)
    if cfg.rope_on_extended_session:
        ext_esid = np.zeros(E, np.int32)
        ext_esid[:S] = esid[b]
        ext_esid[S:] = esid[b].max() + 1 + np.arange(L)
        rope = jnp.asarray(ext_esid[None])
    else:
        rope = jnp.arange(E, dtype=jnp.int32)[None]

    out = model.apply(
        params,
        input_ids=ext_ids_j,
        rope_positions=rope,
        self_allowed=jnp.asarray(ext_self[None, None]),
        cross_allowed=jnp.asarray(ext_cross[None, None]),
        position_index=pos_idx,
        behavior_index=beh_idx,
        action_index=act_idx,
        route_mode="onehot",
    )
    logits = np.asarray(out["logits"][0], np.float64)
    score = 0.0
    for lvl in range(L):
        pos = S - 1 + lvl  # logits position predicting token S+lvl
        base = vocab.code_token(lvl, 0)
        size = vocab.level_sizes[lvl]
        lvl_logits = logits[pos, base:base + size]
        allowed = trie.lookup_prefix(list(codes[cand_i][:lvl]))
        masked = np.where(allowed, lvl_logits, -1e30)
        logp = masked - np.log(np.exp(masked - masked.max()).sum()) - masked.max()
        score += logp[codes[cand_i][lvl]]
    return score


def test_bf16_caches_match_fp32_beam_search():
    """The shipped TPU default (cache_dtype=auto -> bfloat16) must reproduce
    the fp32-cache beam search: identical decoded codes, scores within bf16
    rounding (atol 5e-2 on sum-of-log-probs at this tiny geometry)."""
    vocab = SemanticVocab([5, 5, 5], behaviors=["click", "buy"])
    cfg = build_config(
        "Qwen3Multi", vocab_size=vocab.vocab_size, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, intermediate_size=48, dropout_rate=0.0, num_positions=4,
        num_experts=5, num_behavior=2, behavior_embedding_dim=8,
        behavior_base=vocab.behavior_base, model_max_length=128)
    model = QwenFamilyModel(cfg)
    rng = np.random.default_rng(7)
    codes = np.unique(rng.integers(0, 5, (10, 3)), axis=0)
    token_rows = vocab.encode_codes(codes)
    trie = LeveledTrie.from_token_rows(token_rows, vocab)
    batch, _ = _build_prompt_batch(vocab, token_rows, rng)
    from gamer_tpu.decode.beam import prepare_prefill

    inputs, _ = prepare_prefill(cfg, batch, 0)
    params = model.init(jax.random.PRNGKey(0), **inputs, route_mode="onehot")
    target_beh_id = vocab.behavior_token("buy") - vocab.behavior_base + 1

    out = {}
    for cd in ("float32", "bfloat16"):
        out[cd] = constrained_beam_search(
            model, params, batch, trie, behavior_emb_id=target_beh_id,
            search_cfg=BeamSearchConfig(num_beams=5, cache_dtype=cd))
    np.testing.assert_array_equal(np.asarray(out["float32"][0]),
                                  np.asarray(out["bfloat16"][0]))
    np.testing.assert_allclose(np.asarray(out["float32"][1]),
                               np.asarray(out["bfloat16"][1]), atol=5e-2)


@pytest.mark.parametrize("backbone", ["Qwen3Multi", "Qwen3SessionMulti"])
def test_flagship_beam_scores_equal_reference_full_forward(backbone):
    vocab = SemanticVocab([5, 5, 5], behaviors=["click", "buy"])
    cfg = build_config(
        backbone, vocab_size=vocab.vocab_size, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, intermediate_size=48, dropout_rate=0.0, num_positions=4,
        num_experts=5, num_behavior=2, behavior_embedding_dim=8,
        behavior_base=vocab.behavior_base, model_max_length=128)
    assert cfg.cross_attention_layers, "flagship preset must have cross layers"
    model = QwenFamilyModel(cfg)

    rng = np.random.default_rng(7)
    codes = np.unique(rng.integers(0, 5, (10, 3)), axis=0)
    token_rows = vocab.encode_codes(codes)
    trie = LeveledTrie.from_token_rows(token_rows, vocab)
    N = len(codes)

    batch, S = _build_prompt_batch(vocab, token_rows, rng)
    from gamer_tpu.decode.beam import prepare_prefill

    inputs, _ = prepare_prefill(cfg, batch, 0)
    params = model.init(jax.random.PRNGKey(0),
                        **{k: v for k, v in inputs.items()},
                        route_mode="onehot")

    target_beh_id = vocab.behavior_token("buy") - vocab.behavior_base + 1
    beam_codes, beam_scores = constrained_beam_search(
        model, params, batch, trie, behavior_emb_id=target_beh_id,
        search_cfg=BeamSearchConfig(num_beams=N))
    beam_codes = np.asarray(beam_codes)
    beam_scores = np.asarray(beam_scores)

    B = batch["input_ids"].shape[0]
    for b in range(B):
        ref = {
            tuple(codes[c].tolist()): _reference_full_forward_score(
                model, params, cfg, vocab, trie, token_rows, codes, batch,
                S, b, c)
            for c in range(N)
        }
        for k in range(N):
            seq = tuple(beam_codes[b, k].tolist())
            np.testing.assert_allclose(
                beam_scores[b, k], ref[seq], rtol=1e-3, atol=1e-3,
                err_msg=f"{backbone} row {b} beam {k} {seq}")
