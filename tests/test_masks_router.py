"""Mask-family and router tests, checked against straight ports of the
reference's torch mask semantics (SURVEY.md section 2.6 / Qwen3Multi model)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gamer_tpu.ops import masks as M
from gamer_tpu.ops import router as R
from gamer_tpu.data.vocab import EOS_ID, PAD_ID


def np_reference_self_session(session_ids, block_ids):
    """allowed = (same block AND j<=i) OR session[j] < session[i]
    (ref Qwen3Session/model.py:41-55)."""
    B, S = session_ids.shape
    out = np.zeros((B, S, S), dtype=bool)
    for b in range(B):
        for i in range(S):
            for j in range(S):
                same_block = block_ids[b, i] == block_ids[b, j] and block_ids[b, i] >= 0
                out[b, i, j] = (same_block and j <= i) or session_ids[b, j] < session_ids[b, i]
    return out


def np_reference_cross_multi(actions):
    """allowed = j <= i AND action[j] < action[i] (ref Qwen3Multi/model.py:587-604)."""
    B, S = actions.shape
    out = np.zeros((B, S, S), dtype=bool)
    for b in range(B):
        for i in range(S):
            for j in range(S):
                out[b, i, j] = j <= i and actions[b, j] < actions[b, i]
    return out


def np_reference_cross_session_multi(session_ids, actions):
    """allowed = session[j] < session[i] AND action[j] < action[i]
    (ref Qwen3SessionMulti/model.py:556-614)."""
    B, S = actions.shape
    out = np.zeros((B, S, S), dtype=bool)
    for b in range(B):
        for i in range(S):
            for j in range(S):
                out[b, i, j] = session_ids[b, j] < session_ids[b, i] and actions[b, j] < actions[b, i]
    return out


class TestMasks:
    def setup_method(self, _):
        rng = np.random.default_rng(0)
        self.B, self.S, self.P = 3, 12, 3
        self.attn = np.ones((self.B, self.S), dtype=np.int32)
        self.attn[0, :4] = 0  # left padding row
        rel = np.cumsum(self.attn, 1) - 1
        self.rel = np.where(self.attn == 1, rel, -1)
        self.block_ids = np.where(self.rel >= 0, self.rel // self.P, -1)
        self.sessions = np.sort(rng.integers(0, 4, (self.B, self.S)), axis=1)
        self.actions = rng.integers(1, 4, (self.B, self.S))

    def test_causal(self):
        allowed = M.self_mask("causal", self.S, attention_mask=jnp.array(self.attn))
        got = np.asarray(allowed)[:, 0]
        i = np.arange(self.S)
        want = (i[:, None] >= i[None, :])[None] & (self.attn[:, None, :] == 1)
        np.testing.assert_array_equal(got, want)

    def test_session_self(self):
        allowed = M.self_mask("session", self.S, attention_mask=jnp.array(self.attn),
                              session_ids=jnp.array(self.sessions),
                              block_ids=jnp.array(self.block_ids))
        want = np_reference_self_session(self.sessions, self.block_ids)
        want &= self.attn[:, None, :] == 1
        np.testing.assert_array_equal(np.asarray(allowed)[:, 0], want)

    def test_cross_multi(self):
        allowed = M.cross_mask("multi", self.S, attention_mask=jnp.array(self.attn),
                               actions=jnp.array(self.actions))
        want = np_reference_cross_multi(self.actions) & (self.attn[:, None, :] == 1)
        np.testing.assert_array_equal(np.asarray(allowed)[:, 0], want)

    def test_cross_session_multi(self):
        allowed = M.cross_mask("session_multi", self.S, attention_mask=jnp.array(self.attn),
                               session_ids=jnp.array(self.sessions),
                               actions=jnp.array(self.actions))
        want = np_reference_cross_session_multi(self.sessions, self.actions)
        want &= self.attn[:, None, :] == 1
        np.testing.assert_array_equal(np.asarray(allowed)[:, 0], want)

    def test_decode_rows(self):
        kv = 10
        attn = np.ones((2, kv), dtype=np.int32)
        attn[0, 8:] = 0
        row = M.decode_self_row(kv, jnp.array([7, 5]), jnp.array(attn))
        got = np.asarray(row)[:, 0, 0]
        assert got[0].tolist() == [True] * 8 + [False] * 2
        assert got[1].tolist() == [True] * 6 + [False] * 4
        prow = np.array([[True, False, True], [False, True, True]])
        crow = M.decode_cross_row(jnp.array(prow), 5, 3)
        assert np.asarray(crow)[:, 0, 0].tolist() == [[True, False, True, False, False],
                                                      [False, True, True, False, False]]


class TestRouter:
    def test_route_tokens_aligned(self):
        # layout: [<behavior>, c1, c2] x 3 blocks, behavior_base=14, 2 behaviors
        P, base = 3, 14
        ids = np.array([[14, 30, 40, 15, 31, 41, 14, 32, 42]], dtype=np.int32)
        attn = np.ones_like(ids)
        rel = R.rel_positions(jnp.array(attn))
        pos, beh, act = R.route_tokens(jnp.array(ids), rel, P, base, 2)
        assert np.asarray(pos)[0].tolist() == [1, 2, 3, 1, 2, 3, 1, 2, 3]
        # behavior emb ids: block behaviors are 14->1, 15->2, 14->1
        assert np.asarray(act)[0].tolist() == [1, 1, 1, 2, 2, 2, 1, 1, 1]
        # behavior_index zeroed at block starts
        assert np.asarray(beh)[0].tolist() == [0, 1, 1, 0, 2, 2, 0, 1, 1]

    def test_route_tokens_left_padded(self):
        P, base = 3, 14
        ids = np.array([[PAD_ID, PAD_ID, 14, 30, 40, 15, 31, 41]], dtype=np.int32)
        attn = (ids != PAD_ID).astype(np.int32)
        rel = R.rel_positions(jnp.array(attn))
        pos, beh, act = R.route_tokens(jnp.array(ids), rel, P, base, 2)
        # pads route to 0; real tokens route by RELATIVE position (block-aligned)
        assert np.asarray(pos)[0].tolist() == [0, 0, 1, 2, 3, 1, 2, 3]
        assert np.asarray(act)[0].tolist() == [0, 0, 1, 1, 1, 2, 2, 2]

    def test_route_pad_eos(self):
        P, base = 2, 14
        ids = np.array([[14, 30, EOS_ID, PAD_ID]], dtype=np.int32)
        attn = np.array([[1, 1, 1, 0]], dtype=np.int32)
        rel = R.rel_positions(jnp.array(attn))
        pos, beh, act = R.route_tokens(jnp.array(ids), rel, P, base, 2)
        assert np.asarray(pos)[0].tolist() == [1, 2, 0, 0]

    def test_moe_action_index(self):
        pos = jnp.array([[1, 2, 3, 0]])
        act = jnp.array([[2, 2, 2, 0]])
        idx = R.moe_action_expert_index(pos, act, num_experts=4)
        # (4-1)*(2-1) + pos = 3 + pos ; pad -> max(0-3+0,0)=0
        assert np.asarray(idx)[0].tolist() == [4, 5, 6, 0]
