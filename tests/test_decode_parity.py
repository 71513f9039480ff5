"""Beam-search scores must equal teacher-forced forward scores (causal model).

For the pure-causal backbone the decode-time masks (causal + padding) are the
same predicate as the train-time mask, so prefill + incremental decode with KV
caches must reproduce the full-forward logits exactly. This pins down cache
writes, rope positions, and routing across the prefill/decode boundary.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gamer_tpu.data.vocab import PAD_ID, SemanticVocab
from gamer_tpu.decode.beam import BeamSearchConfig, constrained_beam_search
from gamer_tpu.decode.trie import LeveledTrie
from gamer_tpu.models.generative.qwen_family import (
    QwenFamilyModel, build_config, prepare_train_inputs)


def test_beam_scores_equal_teacher_forcing():
    vocab = SemanticVocab([5, 5, 5], behaviors=["click", "buy"])
    cfg = build_config(
        "Qwen3", vocab_size=vocab.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=48, dropout_rate=0.0, num_positions=4,
        num_experts=5, num_behavior=2, behavior_embedding_dim=8,
        behavior_base=vocab.behavior_base, model_max_length=128)
    model = QwenFamilyModel(cfg)
    rng = np.random.default_rng(3)
    codes = np.unique(rng.integers(0, 5, (12, 3)), axis=0)
    token_rows = vocab.encode_codes(codes)
    trie = LeveledTrie.from_token_rows(token_rows, vocab)
    N = len(codes)

    # two prompts of different lengths (left-padded) + appended behavior token
    B, P = 2, 4
    S = 2 * P + 1
    ids = np.full((B, S), PAD_ID, np.int32)
    attn = np.zeros((B, S), np.int32)
    prompts = []
    for b, blocks in enumerate([2, 1]):
        toks = []
        for _ in range(blocks):
            item = rng.integers(0, N)
            toks += [vocab.behavior_token("click"), *token_rows[item]]
        toks.append(vocab.behavior_token("buy"))
        prompts.append(toks)
        ids[b, S - len(toks):] = toks
        attn[b, S - len(toks):] = 1
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(attn),
        "session_ids": jnp.zeros((B, S), jnp.int32),
        "actions": jnp.ones((B, S), jnp.int32),
        "extended_session_ids": jnp.zeros((B, S), jnp.int32),
        "prompt_len": jnp.asarray([len(p) for p in prompts], jnp.int32),
    }
    init_in = prepare_train_inputs(cfg, batch)
    params = model.init(jax.random.PRNGKey(0), **init_in, route_mode="onehot")

    beam_codes, beam_scores = constrained_beam_search(
        model, params, batch, trie, behavior_emb_id=2,
        search_cfg=BeamSearchConfig(num_beams=N))
    beam_codes = np.asarray(beam_codes)
    beam_scores = np.asarray(beam_scores)

    # teacher forcing: full forward over [prompt ; candidate], same layout
    L = trie.num_levels
    for b in range(B):
        ref = {}
        for cand_i in range(N):
            full = np.full(S + L, PAD_ID, np.int32)
            fattn = np.zeros(S + L, np.int32)
            full[:S] = ids[b]
            fattn[:S] = attn[b]
            full[S:] = token_rows[cand_i]
            fattn[S:] = 1
            fb = {
                "input_ids": jnp.asarray(full[None]),
                "attention_mask": jnp.asarray(fattn[None]),
                "session_ids": jnp.zeros((1, S + L), jnp.int32),
                "actions": jnp.ones((1, S + L), jnp.int32),
                "extended_session_ids": jnp.zeros((1, S + L), jnp.int32),
            }
            out = model.apply(params, **prepare_train_inputs(cfg, fb),
                              route_mode="onehot")
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
            ref[tuple(codes[cand_i].tolist())] = score
        for k in range(N):
            seq = tuple(beam_codes[b, k].tolist())
            np.testing.assert_allclose(beam_scores[b, k], ref[seq],
                                       rtol=5e-4, atol=5e-4)
