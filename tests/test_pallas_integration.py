"""Model-level parity: pallas-interpret attention vs jnp attention."""

import jax
import numpy as np
import pytest

from gamer_tpu.models.generative.qwen_family import (
    QwenFamilyModel, build_config, prepare_train_inputs)
from tests.test_qwen_family import make_batch, tiny_config


def test_pallas_gradients_match_jnp():
    """Autodiff through the fused kernel must match the jnp path (train step)."""
    from gamer_tpu.modules.losses import causal_lm_loss

    cfg_j = tiny_config("Qwen3Multi", head_dim=16, num_attention_heads=4,
                        num_key_value_heads=2)
    cfg_p = cfg_j.replace(attention_impl="pallas_interpret")
    rng = np.random.default_rng(1)
    batch = make_batch(rng, cfg_j, B=2, blocks=8)
    model_j = QwenFamilyModel(cfg_j)
    model_p = QwenFamilyModel(cfg_p)
    inputs_j = prepare_train_inputs(cfg_j, batch)
    inputs_p = prepare_train_inputs(cfg_p, batch)
    params = model_j.init(jax.random.PRNGKey(0), **inputs_j)

    def loss(model, inputs):
        def f(p):
            out = model.apply(p, **inputs)
            return causal_lm_loss(out["logits"], batch["labels"], 0.7)
        return f

    g_j = jax.grad(loss(model_j, inputs_j))(params)
    g_p = jax.grad(loss(model_p, inputs_p))(params)
    leaves_j = jax.tree_util.tree_leaves(g_j)
    leaves_p = jax.tree_util.tree_leaves(g_p)
    for a, b in zip(leaves_j, leaves_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("backbone", ["Qwen3Multi", "Qwen3SessionMulti"])
def test_pallas_attention_matches_jnp(backbone):
    cfg_j = tiny_config(backbone, head_dim=16, num_attention_heads=4,
                        num_key_value_heads=2)
    cfg_p = cfg_j.replace(attention_impl="pallas_interpret")
    rng = np.random.default_rng(0)
    batch = make_batch(rng, cfg_j, B=2, blocks=8)  # S = 24, block_q = 24? -> needs div by 8
    model_j = QwenFamilyModel(cfg_j)
    model_p = QwenFamilyModel(cfg_p)
    inputs_j = prepare_train_inputs(cfg_j, batch)
    inputs_p = prepare_train_inputs(cfg_p, batch)
    assert inputs_p["streams"] is not None, "pallas path should engage"
    params = model_j.init(jax.random.PRNGKey(0), **inputs_j)
    out_j = model_j.apply(params, **inputs_j)["logits"]
    out_p = model_p.apply(params, **inputs_p)["logits"]
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_j),
                               rtol=2e-4, atol=2e-4)


def test_xl_path_model_gradients_match_jnp(monkeypatch):
    """Model-level XL dispatch (S > STREAM_MAX, thresholds shrunk): the
    grid-over-keys kernels must match the jnp path through a full train-step
    grad, including the non-chunk-multiple padding wrapper."""
    import gamer_tpu.ops.pallas_attention as PA
    from gamer_tpu.modules.losses import causal_lm_loss

    monkeypatch.setattr(PA, "MONO_MAX", 32)
    monkeypatch.setattr(PA, "STREAM_MAX", 64)
    monkeypatch.setattr(PA, "_QC", 64)
    monkeypatch.setattr(PA, "_KC", 64)
    monkeypatch.setattr(PA, "_QC_DKV", 32)

    cfg_j = tiny_config("Qwen3Multi", head_dim=16, num_attention_heads=4,
                        num_key_value_heads=2)
    cfg_p = cfg_j.replace(attention_impl="pallas_interpret")
    rng = np.random.default_rng(5)
    batch = make_batch(rng, cfg_j, B=2, blocks=30)  # S=90 > STREAM_MAX=64
    assert batch["input_ids"].shape[1] > 64
    model_j = QwenFamilyModel(cfg_j)
    model_p = QwenFamilyModel(cfg_p)
    inputs_j = prepare_train_inputs(cfg_j, batch)
    inputs_p = prepare_train_inputs(cfg_p, batch)
    assert inputs_p["streams"] is not None, "pallas path should engage"
    params = model_j.init(jax.random.PRNGKey(0), **inputs_j)

    def loss(model, inputs):
        def f(p):
            out = model.apply(p, **inputs)
            return causal_lm_loss(out["logits"], batch["labels"], 0.7)
        return f

    g_j = jax.grad(loss(model_j, inputs_j))(params)
    g_p = jax.grad(loss(model_p, inputs_p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_j),
                    jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)
