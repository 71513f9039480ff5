"""Attention-prob dropout: kernel paths vs explicit-mask jnp reference.

The reference applies attention_dropout inside SDPA during training
(ref Qwen3Multi/model.py:139); our kernels apply the same dropout with a
stateless hash mask (ops/pallas_attention.dropout_keep_tile) that is
reproducible OUTSIDE the kernel — so the reference here applies the IDENTICAL
mask explicitly and outputs/gradients must match, not just statistically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gamer_tpu.ops.pallas_attention as PA
from tests.test_pallas_attention import flat, make_inputs, unflat
from gamer_tpu.ops import masks as M

RATE = 0.3
SEED = 1234


def _keepmask(B, H, S, seed=SEED, rate=RATE):
    """The exact keep mask the kernels draw, computed outside the kernel."""
    return np.stack([
        np.stack([np.asarray(PA.dropout_keep_tile(seed, b * H + h, 0, 0,
                                                  (S, S), rate))
                  for h in range(H)]) for b in range(B)])  # [B, H, S, S]


def _reference_dropped(q, k, v, attn, sessions, actions, block_ids, kind,
                       seed=SEED, rate=RATE):
    """jnp attention with the kernel's exact mask applied explicitly."""
    B, H, S, D = q.shape
    if kind in ("causal", "session"):
        allowed = M.self_mask(kind, S, attention_mask=attn, session_ids=sessions,
                              actions=actions, block_ids=block_ids)
    else:
        allowed = M.cross_mask(kind, S, attention_mask=attn, session_ids=sessions,
                               actions=actions)
    allowed = jnp.broadcast_to(allowed, (B, 1, S, S))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q,
                        jnp.repeat(k, H // k.shape[1], axis=1),
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    scores = jnp.where(allowed, scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1)
    keep = jnp.asarray(_keepmask(B, H, S, seed, rate))
    probs = jnp.where(keep, probs / PA.keep_fraction(rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype),
                      jnp.repeat(v, H // v.shape[1], axis=1),
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _valid_rows(attn, sessions, actions, block_ids, kind, S, B):
    if kind in ("causal", "session"):
        allowed = M.self_mask(kind, S, attention_mask=attn, session_ids=sessions,
                              actions=actions, block_ids=block_ids)
    else:
        allowed = M.cross_mask(kind, S, attention_mask=attn, session_ids=sessions,
                               actions=actions)
    return np.asarray(jnp.broadcast_to(allowed, (B, 1, S, S))).any(-1)[:, 0]


@pytest.mark.parametrize("kind", ["causal", "session", "multi", "session_multi"])
def test_mono_dropout_matches_explicit_mask(kind):
    q, k, v, attn, sessions, actions, block_ids = make_inputs()
    B, H, S, D = q.shape
    got = unflat(PA.fused_mask_attention(
        flat(q), flat(k), flat(v), attn, sessions, actions, block_ids,
        SEED, H, kind, True, RATE), H)
    want = _reference_dropped(q, k, v, attn, sessions, actions, block_ids, kind)
    rows = _valid_rows(attn, sessions, actions, block_ids, kind, S, B)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(got)[b][:, rows[b]],
                                   np.asarray(want)[b][:, rows[b]],
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kind", ["causal", "session_multi"])
def test_mono_dropout_gradients_match(kind):
    q, k, v, attn, sessions, actions, block_ids = make_inputs()
    B, H, S, D = q.shape
    rows = _valid_rows(attn, sessions, actions, block_ids, kind, S, B)
    w = jnp.asarray(rows)[:, :, None].astype(jnp.float32)

    def loss_kernel(qf, kf, vf):
        out = PA.fused_mask_attention(qf, kf, vf, attn, sessions, actions,
                                      block_ids, SEED, H, kind, True, RATE)
        return jnp.sum(jnp.sin(out) * w)

    def loss_ref(qf, kf, vf):
        out = flat(_reference_dropped(unflat(qf, H), unflat(kf, 2),
                                      unflat(vf, 2), attn, sessions, actions,
                                      block_ids, kind))
        return jnp.sum(jnp.sin(out) * w)

    args = (flat(q), flat(k), flat(v))
    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for name, a, b in zip("qkv", g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


@pytest.mark.parametrize("kind", ["causal", "session_multi"])
def test_streaming_dropout_matches_explicit_mask(kind, monkeypatch):
    monkeypatch.setattr(PA, "MONO_MAX", 64)
    monkeypatch.setattr(PA, "_QC", 64)
    monkeypatch.setattr(PA, "_KC", 64)
    monkeypatch.setattr(PA, "_QC_DKV", 32)
    S = 192
    q, k, v, attn, sessions, actions, block_ids = make_inputs(S=S)
    B, H, _, D = q.shape
    rows = _valid_rows(attn, sessions, actions, block_ids, kind, S, B)
    w = jnp.asarray(rows)[:, :, None].astype(jnp.float32)

    got = unflat(PA.fused_mask_attention(
        flat(q), flat(k), flat(v), attn, sessions, actions, block_ids,
        SEED, H, kind, True, RATE), H)
    want = _reference_dropped(q, k, v, attn, sessions, actions, block_ids, kind)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(got)[b][:, rows[b]],
                                   np.asarray(want)[b][:, rows[b]],
                                   rtol=3e-5, atol=3e-5)

    def loss_kernel(qf, kf, vf):
        out = PA.fused_mask_attention(qf, kf, vf, attn, sessions, actions,
                                      block_ids, SEED, H, kind, True, RATE)
        return jnp.sum(jnp.sin(out) * w)

    def loss_ref(qf, kf, vf):
        out = flat(_reference_dropped(unflat(qf, H), unflat(kf, 2),
                                      unflat(vf, 2), attn, sessions, actions,
                                      block_ids, kind))
        return jnp.sum(jnp.sin(out) * w)

    args = (flat(q), flat(k), flat(v))
    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for name, a, b in zip("qkv", g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


def test_hash_mask_statistics():
    keep = np.asarray(PA.dropout_keep_tile(7, 3, 0, 0, (512, 512), 0.2))
    assert abs(keep.mean() - 0.8) < 0.01
    # different seeds/heads decorrelate
    keep2 = np.asarray(PA.dropout_keep_tile(8, 3, 0, 0, (512, 512), 0.2))
    assert 0.6 < (keep == keep2).mean() < 0.75  # ~0.68 expected for indep


def test_model_attention_dropout_smoke():
    """Qwen3Multi with attention_dropout on: finite loss/grads, seed matters,
    deterministic path ignores it."""
    from gamer_tpu.models.generative.qwen_family import (
        QwenFamilyModel, build_config, prepare_train_inputs)
    from gamer_tpu.modules.losses import causal_lm_loss

    cfg = build_config(
        "Qwen3Multi", vocab_size=32, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, head_dim=8,
        intermediate_size=24, dropout_rate=0.0, attention_dropout=0.3,
        num_positions=4, num_experts=5, num_behavior=2,
        behavior_embedding_dim=8, behavior_base=14, model_max_length=64)
    assert cfg.attn_dropout_rate == 0.3
    model = QwenFamilyModel(cfg)
    rng = np.random.default_rng(0)
    B, S = 2, 16
    batch = {"input_ids": jnp.asarray(rng.integers(16, 32, (B, S)), jnp.int32),
             "attention_mask": jnp.ones((B, S), jnp.int32),
             "session_ids": jnp.zeros((B, S), jnp.int32),
             "actions": jnp.ones((B, S), jnp.int32),
             "extended_session_ids": jnp.zeros((B, S), jnp.int32),
             "labels": jnp.asarray(rng.integers(16, 32, (B, S)), jnp.int32)}
    inputs = prepare_train_inputs(cfg, batch)
    params = model.init(jax.random.PRNGKey(0), **inputs)

    def loss(p, key):
        out = model.apply(p, **inputs, deterministic=False,
                          rngs={"dropout": key})
        return causal_lm_loss(out["logits"], batch["labels"], 1.0)

    l1, g = jax.value_and_grad(loss)(params, jax.random.key(1, impl="unsafe_rbg"))
    l2 = loss(params, jax.random.key(2, impl="unsafe_rbg"))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) != float(l2)  # different dropout keys -> different loss
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
    # deterministic: no rng needed, reproducible
    out_a = model.apply(params, **inputs)["logits"]
    out_b = model.apply(params, **inputs)["logits"]
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_bit_dropout_packed_lanes():
    """BitDropout draws two u16 lanes per 32-bit generator word (odd element
    counts exercise the tail slice): rate statistics, inverted scaling, and
    deterministic-path identity must hold."""
    from gamer_tpu.modules.dropout import BitDropout

    m = BitDropout(0.2)
    x = jnp.ones((64, 257), jnp.float32)  # odd size -> tail slice path
    y = np.asarray(m.apply({}, x, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(0)}))
    assert abs((y == 0).mean() - 0.2) < 0.01
    # keep prob quantized to 1/65536 -> scale within 1e-4 of 1/0.8
    np.testing.assert_allclose(np.unique(y[y != 0]), 1 / 0.8, rtol=1e-4)
    yd = np.asarray(m.apply({}, x, deterministic=True,
                            rngs={"dropout": jax.random.PRNGKey(0)}))
    np.testing.assert_array_equal(yd, np.asarray(x))
    # adjacent elements come from the same 32-bit word -> must still be
    # independent Bernoullis (the two lanes of one word are distinct bits)
    big = np.asarray(m.apply({}, jnp.ones((1, 1 << 16), jnp.float32),
                             deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(1)})) == 0
    even, odd = big[0, ::2], big[0, 1::2]
    corr = np.corrcoef(even, odd)[0, 1]
    assert abs(corr) < 0.02, f"lane correlation {corr}"


def test_keep_threshold_single_source():
    """modules.dropout.keep_threshold is the quantization used by every
    uniform-compare dropout; the Pallas kernel's keep_fraction (ops must not
    import modules) must stay numerically identical, and the clamp must keep
    keep_prob > 0 for any rate < 1.0 (rate=1.0 is special-cased by callers)."""
    from gamer_tpu.modules.dropout import BitDropout, keep_threshold

    for rate in [0.0, 0.1, 0.2, 0.5, 0.999, 0.9999999, 1.0 - 2**-40]:
        # attention-prob dropout draws one u32 Bernoulli per hash word (the
        # packed-u16 layout was a measured on-chip regression — see
        # dropout_keep_tile's docstring)
        assert PA.keep_fraction(rate) == keep_threshold(rate, 32)[1]
        for bits in (16, 32):
            t, p = keep_threshold(rate, bits)
            assert 0 <= t < (1 << bits)
            assert p > 0.0
    # the overflow band below 1.0 must not crash BitDropout (div by keep_prob)
    m = BitDropout(1.0 - 2**-40)
    y = m.apply({}, jnp.ones((4, 8)), deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(0)})
    assert np.isfinite(np.asarray(y)).all()


def test_bit_dropout_custom_vjp_bit_identical():
    """BitDropout's backward regenerates the keep mask from the rng key
    (custom VJP, residual = key only — no pred mask saved to HBM); gradients
    must be BIT-identical to autodiff of the same where(keep, x*scale, 0)
    formulation."""
    from gamer_tpu.modules.dropout import _bit_dropout, _keep_mask, keep_threshold

    key = jax.random.key(7, impl="unsafe_rbg")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 33, 65)),
                    jnp.bfloat16)
    thr, kp = keep_threshold(0.2, bits=16)

    def autodiff_form(x):
        keep = _keep_mask(key, x.shape, x.size, thr)
        scale = jnp.asarray(1.0 / kp, x.dtype)
        y = jnp.where(keep, x * scale, jnp.zeros((), x.dtype))
        return (y.astype(jnp.float32) ** 2).sum()

    def custom_form(x):
        return (_bit_dropout(x, key, thr, kp).astype(jnp.float32) ** 2).sum()

    vo, go = jax.value_and_grad(autodiff_form)(x)
    vn, gn = jax.value_and_grad(custom_form)(x)
    assert float(vo) == float(vn)
    np.testing.assert_array_equal(np.asarray(go), np.asarray(gn))


def test_hash_bitdropout_statistics_and_vjp_consistency():
    """The "hash" BitDropout impl: exact keep fraction statistics, fwd/bwd
    identical masks (regenerated from the seed, nothing saved), inverted
    scaling parity with the rng-stream impl's contract."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gamer_tpu.modules.dropout import BitDropout, keep_threshold

    rate = 0.2
    x = jnp.ones((64, 257), jnp.float32)
    mod = BitDropout(rate, impl="hash")
    y = mod.apply({}, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(3)})
    y = np.asarray(y)
    _, keep_prob = keep_threshold(rate, bits=32)
    kept = y != 0.0
    assert abs(kept.mean() - keep_prob) < 0.02
    np.testing.assert_allclose(y[kept], 1.0 / keep_prob, rtol=1e-6)

    # bwd mask == fwd mask: grad of sum(dropout(x)) is scale exactly where
    # the forward kept the element
    g = jax.grad(lambda v: float(0) + jnp.sum(mod.apply(
        {}, v, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3)})))(x)
    g = np.asarray(g)
    np.testing.assert_array_equal(g != 0.0, kept)
    np.testing.assert_allclose(g[kept], 1.0 / keep_prob, rtol=1e-6)
