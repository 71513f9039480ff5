"""Streaming (flash) attention path vs the jnp reference — forward + VJP.

The streaming kernels (ops/pallas_attention.py, S > MONO_MAX) grid over query
chunks with an online softmax and a saved logsumexp, and split the backward
into dq / dkv kernels. Chunk sizes are shrunk here (monkeypatched module
constants) so the path triggers at interpret-mode-friendly lengths, including
a sequence length that is NOT a chunk multiple (exercises the padding wrapper).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gamer_tpu.ops.pallas_attention as PA
from tests.test_pallas_attention import (flat, jnp_reference, make_inputs,
                                         unflat)


@pytest.fixture()
def small_chunks(monkeypatch):
    monkeypatch.setattr(PA, "MONO_MAX", 64)
    monkeypatch.setattr(PA, "_QC", 64)
    monkeypatch.setattr(PA, "_KC", 64)
    monkeypatch.setattr(PA, "_QC_DKV", 32)


@pytest.mark.parametrize("kind", ["causal", "session", "multi", "session_multi"])
@pytest.mark.parametrize("S", [256, 224])  # 224: not a chunk multiple
def test_streaming_forward_matches_reference(small_chunks, kind, S):
    q, k, v, attn, sessions, actions, block_ids = make_inputs(S=S)
    H = q.shape[1]
    got = unflat(PA.fused_mask_attention(flat(q), flat(k), flat(v), attn,
                                         sessions, actions, block_ids, 0,
                                         H, kind, True), H)
    want = jnp_reference(q, k, v, attn, sessions, actions, block_ids, kind)
    from gamer_tpu.ops import masks as M

    if kind in ("causal", "session"):
        allowed = M.self_mask(kind, S, attention_mask=attn, session_ids=sessions,
                              actions=actions, block_ids=block_ids)
    else:
        allowed = M.cross_mask(kind, S, attention_mask=attn, session_ids=sessions,
                               actions=actions)
    has_key = np.asarray(jnp.broadcast_to(
        allowed, (q.shape[0], 1, S, S))).any(-1)[:, 0]
    got, want = np.asarray(got), np.asarray(want)
    for b in range(q.shape[0]):
        rows = has_key[b]
        np.testing.assert_allclose(got[b][:, rows], want[b][:, rows],
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kind", ["causal", "session", "multi", "session_multi"])
def test_streaming_gradients_match_reference(small_chunks, kind):
    S = 224  # not a chunk multiple: padded-row gradients must not leak
    q, k, v, attn, sessions, actions, block_ids = make_inputs(S=S)
    H = q.shape[1]
    from gamer_tpu.ops import masks as M

    if kind in ("causal", "session"):
        allowed = M.self_mask(kind, S, attention_mask=attn, session_ids=sessions,
                              actions=actions, block_ids=block_ids)
    else:
        allowed = M.cross_mask(kind, S, attention_mask=attn, session_ids=sessions,
                               actions=actions)
    has_key = jnp.broadcast_to(allowed, (q.shape[0], 1, S, S)).any(-1)[:, 0]
    # weight rows with at least one allowed key (junk rows differ by impl)
    w = has_key[:, :, None].astype(jnp.float32)

    def loss_stream(qf, kf, vf):
        out = PA.fused_mask_attention(qf, kf, vf, attn, sessions, actions,
                                      block_ids, 0, H, kind, True)
        return jnp.sum(jnp.sin(out) * w)

    def loss_ref(qf, kf, vf):
        out = flat(jnp_reference(unflat(qf, H), unflat(kf, 2), unflat(vf, 2),
                                 attn, sessions, actions, block_ids, kind))
        return jnp.sum(jnp.sin(out) * w)

    args = (flat(q), flat(k), flat(v))
    g_s = jax.grad(loss_stream, argnums=(0, 1, 2))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for name, a, b in zip("qkv", g_s, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)
