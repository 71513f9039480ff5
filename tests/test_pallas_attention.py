"""Pallas fused mask-family attention vs the jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamer_tpu.modules.layers import attend
from gamer_tpu.ops import masks as M
from gamer_tpu.ops.pallas_attention import fused_mask_attention


def make_inputs(B=2, H=4, Hkv=2, S=128, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    attn = np.ones((B, S), np.int32)
    attn[0, :7] = 0  # left padding
    sessions = np.sort(rng.integers(0, 5, (B, S)), axis=1)
    actions = rng.integers(1, 4, (B, S)).astype(np.int32)
    rel = np.cumsum(attn, 1) - 1
    block_ids = np.where(attn == 1, rel // 4, -1)
    return q, k, v, jnp.asarray(attn), jnp.asarray(sessions), jnp.asarray(actions), jnp.asarray(block_ids)


def jnp_reference(q, k, v, attn, sessions, actions, block_ids, kind):
    B, H, S, D = q.shape
    if kind in ("causal", "session"):
        allowed = M.self_mask(kind, S, attention_mask=attn, session_ids=sessions,
                              actions=actions, block_ids=block_ids)
    else:
        allowed = M.cross_mask(kind, S, attention_mask=attn, session_ids=sessions,
                               actions=actions)
    allowed = jnp.broadcast_to(allowed, (B, 1, S, S))
    qb = q.transpose(0, 2, 1, 3)  # [B, S, H, D]
    kb = k.transpose(0, 2, 1, 3)
    vb = v.transpose(0, 2, 1, 3)
    out = attend(qb, kb, vb, allowed, D ** -0.5)
    return out.transpose(0, 2, 1, 3)


def flat(x):
    """[B, H, S, D] -> the kernel's projection-native [B, S, H*D] layout."""
    B, H, S, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * D)


def unflat(x, H):
    B, S, HD = x.shape
    return x.reshape(B, S, H, HD // H).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("kind", ["causal", "session", "multi", "session_multi"])
def test_fused_matches_reference(kind):
    q, k, v, attn, sessions, actions, block_ids = make_inputs()
    H = q.shape[1]
    got = unflat(fused_mask_attention(flat(q), flat(k), flat(v), attn, sessions,
                                      actions, block_ids, 0, H, kind, True), H)
    want = jnp_reference(q, k, v, attn, sessions, actions, block_ids, kind)
    # compare only rows with at least one allowed key (pad/fully-masked query
    # rows produce unconsumed junk in both implementations)
    if kind in ("causal", "session"):
        allowed = M.self_mask(kind, q.shape[2], attention_mask=attn,
                              session_ids=sessions, actions=actions,
                              block_ids=block_ids)
    else:
        allowed = M.cross_mask(kind, q.shape[2], attention_mask=attn,
                               session_ids=sessions, actions=actions)
    has_key = np.asarray(jnp.broadcast_to(allowed, (q.shape[0], 1, q.shape[2], q.shape[2]))).any(-1)[:, 0]
    got = np.asarray(got)
    want = np.asarray(want)
    for b in range(q.shape[0]):
        rows = has_key[b]
        np.testing.assert_allclose(got[b][:, rows], want[b][:, rows],
                                   rtol=2e-5, atol=2e-5)


def test_gqa_head_mapping():
    """kv head h//G must be used: alter one kv head, only its group changes."""
    q, k, v, attn, sessions, actions, block_ids = make_inputs()
    H = q.shape[1]
    out1 = unflat(fused_mask_attention(flat(q), flat(k), flat(v), attn, sessions,
                                       actions, block_ids, 0, H, "causal", True), H)
    k2 = k.at[:, 1].set(k[:, 1] + 1.0)
    out2 = unflat(fused_mask_attention(flat(q), flat(k2), flat(v), attn, sessions,
                                       actions, block_ids, 0, H, "causal", True), H)
    diff = np.abs(np.asarray(out1) - np.asarray(out2)).sum(axis=(0, 2, 3))
    assert diff[0] == 0 and diff[1] == 0  # group 0 (heads 0,1) unchanged
    assert diff[2] > 0 and diff[3] > 0  # group 1 (heads 2,3) changed


def test_nokey_rows_zero_all_generations():
    """Fully-masked rows output exactly zero in the jnp path and every
    kernel generation (parity.md divergence #12b). 'multi' cross mask with
    all actions equal -> every row is no-key."""
    import unittest.mock as mock

    import gamer_tpu.ops.pallas_attention as PA

    S = 96
    q, k, v, attn, sessions, actions, block_ids = make_inputs(S=S)
    actions = jnp.ones_like(actions)  # k_act < q_act is false everywhere
    H = q.shape[1]

    want = jnp_reference(q, k, v, attn, sessions, actions, block_ids, "multi")
    np.testing.assert_array_equal(np.asarray(want), 0.0)

    gens = {"mono": dict(MONO_MAX=256, STREAM_MAX=256),
            "stream": dict(MONO_MAX=32, STREAM_MAX=256, _QC=32, _KC=32,
                           _QC_DKV=32),
            "xl": dict(MONO_MAX=32, STREAM_MAX=64, _QC=32, _KC=32,
                       _QC_DKV=32)}
    for name, patch in gens.items():
        with mock.patch.multiple(PA, **patch):
            out = PA.fused_mask_attention(flat(q), flat(k), flat(v), attn,
                                          sessions, actions, block_ids, 0,
                                          H, "multi", True)
            np.testing.assert_array_equal(np.asarray(out), 0.0, err_msg=name)
            g = jax.grad(lambda qf: jnp.sum(PA.fused_mask_attention(
                qf, flat(k), flat(v), attn, sessions, actions, block_ids,
                0, H, "multi", True)))(flat(q))
            np.testing.assert_array_equal(np.asarray(g), 0.0,
                                          err_msg=f"{name} grad")
