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


# ---------------------------------------------------------------------------
# XL generation (S > STREAM_MAX): key axis on the grid, online-softmax state
# in VMEM scratch, k/v as pipeline tiles — S unbounded. Shrunk thresholds
# trigger the XL dispatch at interpret-friendly lengths.
# ---------------------------------------------------------------------------


@pytest.fixture()
def xl_chunks(monkeypatch):
    monkeypatch.setattr(PA, "MONO_MAX", 32)
    monkeypatch.setattr(PA, "STREAM_MAX", 64)
    monkeypatch.setattr(PA, "_QC", 64)
    monkeypatch.setattr(PA, "_KC", 64)
    monkeypatch.setattr(PA, "_QC_DKV", 32)


@pytest.mark.parametrize("kind", ["causal", "session", "multi", "session_multi"])
@pytest.mark.parametrize("S", [256, 224])  # 224: not a chunk multiple
def test_xl_forward_matches_reference(xl_chunks, kind, S):
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


@pytest.mark.parametrize("kind", ["causal", "session_multi"])
def test_xl_gradients_match_reference(xl_chunks, kind):
    S = 224
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
    w = has_key[:, :, None].astype(jnp.float32)

    def loss_xl(qf, kf, vf):
        out = PA.fused_mask_attention(qf, kf, vf, attn, sessions, actions,
                                      block_ids, 0, H, kind, True)
        return jnp.sum(jnp.sin(out) * w)

    def loss_ref(qf, kf, vf):
        out = flat(jnp_reference(unflat(qf, H), unflat(kf, 2), unflat(vf, 2),
                                 attn, sessions, actions, block_ids, kind))
        return jnp.sum(jnp.sin(out) * w)

    args = (flat(q), flat(k), flat(v))
    g_s = jax.grad(loss_xl, argnums=(0, 1, 2))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for name, a, b in zip("qkv", g_s, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_xl_dropout_consistent_fwd_bwd(xl_chunks):
    """XL dropout path: same hash mask across fwd/dq/dkv; keep-fraction
    scaling preserved. Checked against the mono kernel on identical inputs
    and seed (both draw the identical absolute-coordinate mask)."""
    S, RATE, SEED = 128, 0.3, 77
    q, k, v, attn, sessions, actions, block_ids = make_inputs(S=S)
    H = q.shape[1]
    args = (flat(q), flat(k), flat(v))
    from gamer_tpu.ops import masks as M

    allowed = M.self_mask("causal", S, attention_mask=attn,
                          session_ids=sessions, actions=actions,
                          block_ids=block_ids)
    has_key = jnp.broadcast_to(allowed, (q.shape[0], 1, S, S)).any(-1)[:, 0]
    w = has_key[:, :, None].astype(jnp.float32)  # junk rows differ by impl

    def run(mono):
        import unittest.mock as mock
        ctx = (mock.patch.multiple(PA, MONO_MAX=256, STREAM_MAX=256) if mono
               else mock.patch.multiple(PA, MONO_MAX=32, STREAM_MAX=64))
        with ctx:
            def loss(qf, kf, vf):
                out = PA.fused_mask_attention(qf, kf, vf, attn, sessions,
                                              actions, block_ids, SEED, H,
                                              "causal", True, RATE)
                return jnp.sum(jnp.sin(out) * w)

            val = loss(*args)
            grads = jax.grad(loss, argnums=(0, 1, 2))(*args)
        return val, grads

    v_xl, g_xl = run(mono=False)
    v_mono, g_mono = run(mono=True)
    np.testing.assert_allclose(float(v_xl), float(v_mono), rtol=1e-4)
    for name, a, b in zip("qkv", g_xl, g_mono):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=name)
