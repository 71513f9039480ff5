"""Trie compilation and constrained beam-search tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamer_tpu.data.vocab import SemanticVocab
from gamer_tpu.decode.beam import BeamSearchConfig, constrained_beam_search
from gamer_tpu.decode.trie import LeveledTrie
from gamer_tpu.models.generative.qwen_family import QwenFamilyModel, build_config, prepare_train_inputs


class TestLeveledTrie:
    def test_tables_match_bruteforce(self):
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 4, (30, 3))
        codes = np.unique(codes, axis=0)
        trie = LeveledTrie.build(codes, [4, 4, 4], [10, 14, 18])
        # root level
        want0 = np.zeros(4, dtype=bool)
        want0[np.unique(codes[:, 0])] = True
        np.testing.assert_array_equal(trie.lookup_prefix([]), want0)
        # every prefix
        for row in codes[:10]:
            a1 = trie.lookup_prefix([row[0]])
            want1 = np.zeros(4, dtype=bool)
            want1[np.unique(codes[codes[:, 0] == row[0], 1])] = True
            np.testing.assert_array_equal(a1, want1)
            a2 = trie.lookup_prefix([row[0], row[1]])
            m = (codes[:, 0] == row[0]) & (codes[:, 1] == row[1])
            want2 = np.zeros(4, dtype=bool)
            want2[np.unique(codes[m, 2])] = True
            np.testing.assert_array_equal(a2, want2)

    def test_invalid_prefix_empty(self):
        codes = np.array([[0, 1], [2, 3]])
        trie = LeveledTrie.build(codes, [4, 4], [0, 4])
        assert trie.lookup_prefix([1]).sum() == 0

    def test_duplicate_rows_collapse(self):
        codes = np.array([[1, 1], [1, 1], [0, 2]])
        trie = LeveledTrie.build(codes, [4, 4], [0, 4])
        # two leaves only
        assert len(trie.leaf_candidate) == 2
        assert (trie.leaf_candidate >= 0).all()


@pytest.fixture(scope="module")
def decode_setup():
    vocab = SemanticVocab([6, 6, 6], behaviors=["click", "buy"])
    cfg = build_config(
        "Qwen3Multi",
        vocab_size=vocab.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=48, dropout_rate=0.0,
        num_positions=4, num_experts=5, num_behavior=2, behavior_embedding_dim=8,
        behavior_base=vocab.behavior_base, model_max_length=128,
    )
    model = QwenFamilyModel(cfg)
    rng = np.random.default_rng(0)
    n_items = 25
    codes = np.unique(rng.integers(0, 6, (n_items, 3)), axis=0)
    token_rows = vocab.encode_codes(codes)
    trie = LeveledTrie.from_token_rows(token_rows, vocab)

    # decode batch: 2 prompts of 2 item blocks + appended behavior token
    B, blocks, P = 2, 2, 4
    S = blocks * P + 1
    ids = np.zeros((B, S), dtype=np.int32)
    for b in range(B):
        for blk in range(blocks):
            item = rng.integers(0, len(codes))
            ids[b, blk * P] = vocab.behavior_token("click")
            ids[b, blk * P + 1: blk * P + 4] = token_rows[item]
    ids[:, -1] = vocab.behavior_token("buy")
    batch = {
        "input_ids": jnp.array(ids),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "session_ids": jnp.array(np.repeat([[0, 1]], 1, 0).repeat(B, 0).repeat(P, 1)
                                 .reshape(B, blocks * P))
        if False else jnp.array(np.concatenate(
            [np.repeat(np.arange(blocks), P)[None].repeat(B, 0),
             np.full((B, 1), blocks)], axis=1)),
        "actions": jnp.array(np.concatenate(
            [np.ones((B, blocks * P), np.int32), np.full((B, 1), 2, np.int32)], axis=1)),
        "extended_session_ids": jnp.array(np.arange(S)[None].repeat(B, 0)),
        "prompt_len": jnp.full((B,), S, jnp.int32),
    }
    inputs_shape = prepare_train_inputs(cfg, {**batch})
    params = model.init(jax.random.PRNGKey(0), **inputs_shape, route_mode="onehot")
    beh_id = vocab.behavior_token("buy") - vocab.behavior_base + 1
    return dict(vocab=vocab, cfg=cfg, model=model, params=params, trie=trie,
                batch=batch, codes=codes, beh_id=beh_id)


class TestBeamSearch:
    def test_returns_valid_candidates_sorted(self, decode_setup):
        d = decode_setup
        out_codes, scores = constrained_beam_search(
            d["model"], d["params"], d["batch"], d["trie"], d["beh_id"],
            BeamSearchConfig(num_beams=5))
        out_codes = np.asarray(out_codes)
        scores = np.asarray(scores)
        cand = {tuple(r) for r in d["codes"].tolist()}
        B, K, L = out_codes.shape
        assert (np.diff(scores, axis=1) <= 1e-5).all(), "scores must be descending"
        for b in range(B):
            for k in range(K):
                if scores[b, k] > -1e29:
                    assert tuple(out_codes[b, k].tolist()) in cand

    def test_exhaustive_beams_recover_all_candidates(self, decode_setup):
        d = decode_setup
        N = len(d["codes"])
        out_codes, scores = constrained_beam_search(
            d["model"], d["params"], d["batch"], d["trie"], d["beh_id"],
            BeamSearchConfig(num_beams=N))
        out_codes = np.asarray(out_codes)
        scores = np.asarray(scores)
        cand = {tuple(r) for r in d["codes"].tolist()}
        for b in range(out_codes.shape[0]):
            valid = scores[b] > -1e29
            got = {tuple(r) for r in out_codes[b][valid].tolist()}
            assert got == cand, "K=N beam search must enumerate every candidate"
            # renormalized per-level probabilities: total prob over candidates == 1
            np.testing.assert_allclose(np.exp(scores[b][valid]).sum(), 1.0, rtol=1e-3)

    def test_topk_consistent_with_exhaustive(self, decode_setup):
        """Scores for a sequence must not depend on beam width (validates the
        per-step cache reordering), and the best beam must match exhaustive
        search's best. (Beam search may legitimately miss lower-ranked
        sequences whose prefixes fell out of the beam.)"""
        d = decode_setup
        N = len(d["codes"])
        full_codes, full_scores = constrained_beam_search(
            d["model"], d["params"], d["batch"], d["trie"], d["beh_id"],
            BeamSearchConfig(num_beams=N))
        top_codes, top_scores = constrained_beam_search(
            d["model"], d["params"], d["batch"], d["trie"], d["beh_id"],
            BeamSearchConfig(num_beams=3))
        full_scores = np.asarray(full_scores)
        top_scores = np.asarray(top_scores)
        for b in range(full_scores.shape[0]):
            exhaustive = {tuple(c.tolist()): s for c, s in
                          zip(np.asarray(full_codes)[b], full_scores[b])}
            np.testing.assert_array_equal(
                np.asarray(top_codes)[b, 0], np.asarray(full_codes)[b, 0])
            for k in range(3):
                seq = tuple(np.asarray(top_codes)[b, k].tolist())
                np.testing.assert_allclose(top_scores[b, k], exhaustive[seq],
                                           rtol=1e-4, atol=1e-5)


class TestCompileOnce:
    def test_search_executable_shared_across_behaviors(self, decode_setup):
        """The per-eval compile-once invariant (docs/parity.md): behavior
        ids/tokens are traced args, so evaluating different behaviors through
        one make_beam_search_fn handle must hit a single jit executable.
        Regression guard for accidentally baking behavior into static config
        (which would recompile per behavior and blow up TPU eval wall time,
        ref loops whole eval passes per behavior, test_SMB_decoder.py:362-380).
        """
        from gamer_tpu.decode.beam import make_beam_search_fn

        d = decode_setup
        search = make_beam_search_fn(d["model"], d["trie"],
                                     BeamSearchConfig(num_beams=4))
        B = int(d["batch"]["input_ids"].shape[0])
        for beh in (1, 2):  # two behaviors, two distinct traced values
            batch = dict(d["batch"])
            ids = np.asarray(batch["input_ids"]).copy()
            ids[:, -1] = d["vocab"].behavior_base + beh - 1
            batch["input_ids"] = jnp.asarray(ids)
            codes, scores = search(d["params"], batch,
                                   jnp.full((B,), beh, jnp.int32))
            assert np.asarray(codes).shape[0] == B
        assert search._cache_size() == 1, (
            f"beam search recompiled: {search._cache_size()} executables "
            "for 2 behaviors (behavior must stay a traced arg)")
