"""Forward-pass, MoE-path-parity and gradient tests for the Qwen family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamer_tpu.models.generative.qwen_family import (
    QwenFamilyModel, build_config, prepare_train_inputs)
from gamer_tpu.modules.losses import causal_lm_loss
from gamer_tpu.modules.moe import PositionRoutedMLP


def tiny_config(backbone: str, **kw):
    defaults = dict(
        vocab_size=64, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, intermediate_size=48, dropout_rate=0.0,
        num_positions=3, num_experts=4, num_behavior=2, behavior_embedding_dim=8,
        behavior_base=14, model_max_length=64, behavior_injection_layers=[],
    )
    defaults.update(kw)
    return build_config(backbone, **defaults)


def make_batch(rng, cfg, B=2, blocks=4):
    P = cfg.num_positions
    S = blocks * P
    # behavior token at block starts, code tokens elsewhere
    ids = rng.integers(16, cfg.vocab_size, (B, S)).astype(np.int32)
    ids[:, ::P] = rng.integers(14, 14 + cfg.num_behavior, (B, blocks))
    sessions = np.repeat(rng.integers(0, 3, (B, blocks)), P, axis=1)
    sessions.sort(axis=1)
    actions = np.repeat(rng.integers(1, 4, (B, blocks)), P, axis=1)
    esid = np.arange(S, dtype=np.int32)[None].repeat(B, 0)
    labels = ids.astype(np.int32)
    return {
        "input_ids": jnp.array(ids),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "session_ids": jnp.array(sessions),
        "actions": jnp.array(actions),
        "extended_session_ids": jnp.array(esid),
        "labels": jnp.array(labels),
    }


BACKBONES = ["Qwen3", "Qwen3Session", "Qwen3Moe", "Qwen3MoeAction",
             "Qwen3SessionMoe", "Qwen3Multi", "Qwen3SessionMulti"]


@pytest.mark.parametrize("backbone", BACKBONES)
def test_forward_and_loss(backbone):
    rng = np.random.default_rng(0)
    cfg = tiny_config(backbone)
    batch = make_batch(rng, cfg)
    model = QwenFamilyModel(cfg)
    inputs = prepare_train_inputs(cfg, batch)
    params = model.init(jax.random.PRNGKey(0), **inputs)
    out = model.apply(params, **inputs)
    B, S = batch["input_ids"].shape
    assert out["logits"].shape == (B, S, cfg.vocab_size)
    loss = causal_lm_loss(out["logits"], batch["labels"], temperature=0.7)
    assert np.isfinite(float(loss))
    # gradients flow to every parameter
    def loss_fn(p):
        o = model.apply(p, **inputs)
        return causal_lm_loss(o["logits"], batch["labels"], temperature=0.7)
    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


def test_moe_periodic_equals_onehot():
    """The periodic fast path must match exact one-hot routing on aligned batches."""
    cfg = tiny_config("Qwen3Moe")
    rng = np.random.default_rng(1)
    batch = make_batch(rng, cfg)
    model = QwenFamilyModel(cfg)
    inputs = prepare_train_inputs(cfg, batch)
    params = model.init(jax.random.PRNGKey(0), **inputs)
    out_p = model.apply(params, **{**inputs}, route_mode="periodic")
    out_o = model.apply(params, **{**inputs}, route_mode="onehot")
    np.testing.assert_allclose(np.asarray(out_p["logits"]), np.asarray(out_o["logits"]),
                               rtol=2e-5, atol=2e-5)


def test_moe_module_routing_correctness():
    """Sparse routing must apply the right expert per token (vs manual compute)."""
    mlp = PositionRoutedMLP(d_model=8, d_ff=16, num_experts=3, is_sparse=True,
                            mlp_type="qwen3", dropout_rate=0.0)
    x = jnp.array(np.random.default_rng(0).normal(size=(1, 4, 8)), jnp.float32)
    pos = jnp.array([[1, 2, 1, 0]])
    params = mlp.init(jax.random.PRNGKey(0), x, pos)
    out = mlp.apply(params, x, pos, route_mode="onehot")
    p = params["params"]
    for t in range(4):
        e = int(pos[0, t])
        xe = np.asarray(x[0, t])
        g = np.asarray(p["experts_gate"])[e]
        u = np.asarray(p["experts_up"])[e]
        d = np.asarray(p["experts_down"])[e]
        want = (jax.nn.silu(xe @ g) * (xe @ u)) @ d
        np.testing.assert_allclose(np.asarray(out[0, t]), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_cross_attention_changes_with_actions():
    """Qwen3Multi cross mask depends on action levels: permuting them changes logits."""
    cfg = tiny_config("Qwen3Multi")
    rng = np.random.default_rng(2)
    batch = make_batch(rng, cfg)
    model = QwenFamilyModel(cfg)
    inputs = prepare_train_inputs(cfg, batch)
    params = model.init(jax.random.PRNGKey(0), **inputs)
    out1 = model.apply(params, **inputs)
    batch2 = dict(batch)
    actions = np.asarray(batch["actions"]).copy()
    actions[:, :cfg.num_positions] = 9  # raise first block's level -> mask flips
    batch2["actions"] = jnp.array(actions)
    inputs2 = prepare_train_inputs(cfg, batch2)
    out2 = model.apply(params, **inputs2)
    assert not np.allclose(np.asarray(out1["logits"]), np.asarray(out2["logits"]))


def test_session_mask_blocks_same_session_other_items():
    """Under the session mask a query must not see other items in its own session."""
    cfg = tiny_config("Qwen3Session")
    rng = np.random.default_rng(3)
    batch = make_batch(rng, cfg)
    # all blocks in ONE session -> only intra-block attention possible
    B, S = batch["input_ids"].shape
    batch["session_ids"] = jnp.zeros((B, S), jnp.int32)
    model = QwenFamilyModel(cfg)
    inputs = prepare_train_inputs(cfg, batch)
    params = model.init(jax.random.PRNGKey(0), **inputs)
    out1 = model.apply(params, **inputs)["logits"]
    # perturb the FIRST block's tokens; outputs of later blocks must be unchanged
    ids2 = np.asarray(batch["input_ids"]).copy()
    ids2[:, 1] = 17 if ids2[0, 1] != 17 else 18
    batch2 = {**batch, "input_ids": jnp.array(ids2)}
    inputs2 = prepare_train_inputs(cfg, batch2)
    out2 = model.apply(params, **inputs2)["logits"]
    P = cfg.num_positions
    np.testing.assert_allclose(np.asarray(out1[:, P:]), np.asarray(out2[:, P:]),
                               rtol=1e-5, atol=1e-5)


def test_causal_masking_is_causal():
    cfg = tiny_config("Qwen3")
    rng = np.random.default_rng(4)
    batch = make_batch(rng, cfg)
    model = QwenFamilyModel(cfg)
    inputs = prepare_train_inputs(cfg, batch)
    params = model.init(jax.random.PRNGKey(0), **inputs)
    out1 = model.apply(params, **inputs)["logits"]
    ids2 = np.asarray(batch["input_ids"]).copy()
    ids2[:, -1] = (ids2[:, -1] % 16) + 16  # change last token
    inputs2 = prepare_train_inputs(cfg, {**batch, "input_ids": jnp.array(ids2)})
    out2 = model.apply(params, **inputs2)["logits"]
    np.testing.assert_allclose(np.asarray(out1[:, :-1]), np.asarray(out2[:, :-1]),
                               rtol=1e-5, atol=1e-5)
