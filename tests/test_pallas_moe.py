"""Parity tests for the fused MoE-FFN Pallas kernel (interpret mode, CPU).

Reference is the straight jnp formulation of the periodic MoE math
(modules/moe.py periodic_out — itself pinned against the reference semantics
by test_moe tests). The dropout path reproduces the kernel's stateless
coordinate-hash mask outside the kernel, so fwd/bwd parity is exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamer_tpu.ops.pallas_attention import dropout_keep_tile, keep_fraction
from gamer_tpu.ops.pallas_moe import TM, fused_moe_ffn

P, T, D, F, NB = 3, 2 * TM, 128, 128, 4


def _mk(seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    xp = jnp.asarray(rng.randn(P, T, D) * 0.5, dtype)
    wgu = jnp.asarray(rng.randn(P, D, 2 * F) / np.sqrt(D), dtype)
    wd = jnp.asarray(rng.randn(P, F, D) / np.sqrt(F), dtype)
    btab = jnp.asarray(rng.randn(P, NB, 2 * F) * 0.1, dtype)
    beh = jnp.asarray(rng.randint(0, NB, (P, T)), jnp.int32)
    return xp, wgu, wd, btab, beh


def _ref(xp, wgu, wd, btab, beh, rate=0.0, seed=0, use_bias=False):
    gu = jnp.einsum("ptd,pdf->ptf", xp.astype(jnp.float32),
                    wgu.astype(jnp.float32))
    if use_bias:
        oh = jax.nn.one_hot(beh, NB, dtype=jnp.float32)
        gu = gu + jnp.einsum("ptn,pnf->ptf", oh, btab.astype(jnp.float32))
    h = jax.nn.silu(gu[..., :F]) * gu[..., F:]
    if rate > 0.0:
        keeps = [dropout_keep_tile(seed, p, i * TM, 0, (TM, F), rate)
                 for p in range(P) for i in range(T // TM)]
        keep = jnp.stack(keeps).reshape(P, T, F)
        h = jnp.where(keep, h * (1.0 / keep_fraction(rate)), 0.0)
    return jnp.einsum("ptf,pfd->ptd", h, wd.astype(jnp.float32))


def _beh_tiles(beh):
    return beh.reshape(P, T // TM, TM)


@pytest.mark.parametrize("use_bias", [False, True])
def test_fused_moe_forward_parity(use_bias):
    xp, wgu, wd, btab, beh = _mk()
    out = fused_moe_ffn(xp, wgu, wd, btab, _beh_tiles(beh), 0,
                        "silu", 0.0, use_bias, True)
    ref = _ref(xp, wgu, wd, btab, beh, use_bias=use_bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("use_bias", [False, True])
def test_fused_moe_grad_parity(use_bias):
    xp, wgu, wd, btab, beh = _mk(1)
    cot = jnp.asarray(np.random.RandomState(9).randn(P, T, D), jnp.float32)

    def loss_k(args):
        x, g, d, b = args
        return jnp.sum(fused_moe_ffn(x, g, d, b, _beh_tiles(beh), 0,
                                     "silu", 0.0, use_bias, True) * cot)

    def loss_r(args):
        x, g, d, b = args
        return jnp.sum(_ref(x, g, d, b, beh, use_bias=use_bias) * cot)

    gk = jax.grad(loss_k)((xp, wgu, wd, btab))
    gr = jax.grad(loss_r)((xp, wgu, wd, btab))
    for a, b, name in zip(gk, gr, ["dx", "dwgu", "dwd", "dbtab"]):
        if name == "dbtab" and not use_bias:
            np.testing.assert_allclose(np.asarray(a), 0.0)
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_fused_moe_dropout_fwd_bwd_mask_consistency():
    """The hash mask is identical in fwd and bwd (regenerated, not saved),
    and matches the same hash computed outside the kernel."""
    rate, seed = 0.2, 1234
    xp, wgu, wd, btab, beh = _mk(2)
    out = fused_moe_ffn(xp, wgu, wd, btab, _beh_tiles(beh), seed,
                        "silu", rate, True, True)
    ref = _ref(xp, wgu, wd, btab, beh, rate=rate, seed=seed, use_bias=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    cot = jnp.ones((P, T, D), jnp.float32)
    gk = jax.grad(lambda x: jnp.sum(
        fused_moe_ffn(x, wgu, wd, btab, _beh_tiles(beh), seed,
                      "silu", rate, True, True) * cot))(xp)
    gr = jax.grad(lambda x: jnp.sum(
        _ref(x, wgu, wd, btab, beh, rate=rate, seed=seed,
             use_bias=True) * cot))(xp)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=2e-4, atol=2e-4)


def test_fused_moe_keep_fraction_statistics():
    rate, seed = 0.2, 7
    keep = np.asarray(dropout_keep_tile(seed, 0, 0, 0, (1024, 512), rate))
    frac = keep.mean()
    assert abs(frac - keep_fraction(rate)) < 0.01


def test_model_level_fused_matches_jnp():
    """Full Qwen3Multi train path (injection layers + MoE all layers) with
    moe_impl=pallas_interpret must match the jnp periodic path: logits and
    grads (dropout 0; the dropout streams intentionally differ)."""
    from test_qwen_family import make_batch, tiny_config

    from gamer_tpu.models.generative.qwen_family import (
        QwenFamilyModel, prepare_train_inputs)
    from gamer_tpu.modules.losses import causal_lm_loss

    dims = dict(hidden_size=128, intermediate_size=128,
                num_attention_heads=4, num_key_value_heads=2, head_dim=32,
                behavior_embedding_dim=16, behavior_injection_layers=[0])
    cfg_j = tiny_config("Qwen3Multi", **dims, moe_impl="jnp")
    cfg_p = tiny_config("Qwen3Multi", **dims, moe_impl="pallas_interpret")
    assert cfg_p.behavior_injection_layers, "test must cover the bias path"
    rng = np.random.default_rng(5)
    batch = make_batch(rng, cfg_j)
    inputs = prepare_train_inputs(cfg_j, batch)
    params = QwenFamilyModel(cfg_j).init(jax.random.PRNGKey(0), **inputs)

    def loss(cfg):
        def f(p):
            o = QwenFamilyModel(cfg).apply(p, **inputs,
                                           route_mode="periodic")
            return causal_lm_loss(o["logits"], batch["labels"],
                                  temperature=1.0)
        return f

    lj, gj = jax.value_and_grad(loss(cfg_j))(params)
    lp, gp = jax.value_and_grad(loss(cfg_p))(params)
    np.testing.assert_allclose(float(lp), float(lj), rtol=2e-5)
    flat_j = jax.tree_util.tree_leaves_with_path(gj)
    flat_p = jax.tree_util.tree_leaves(gp)
    for (path, a), b in zip(flat_j, flat_p):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-4, atol=3e-4,
            err_msg=jax.tree_util.keystr(path))
