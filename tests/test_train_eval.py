"""Trainer eval semantics: dropout-free eval loss, global token-mean weighting,
remat parity, MoeAction fast path, padded vocab.

These guard the behavioral fixes from the round-1 review: early stopping and
best-checkpoint selection must be driven by a deterministic eval loss that is
a *global token mean* (invariant to batch re-chunking), matching the reference
which evals under model.eval() with HF's per-token CE average
(ref: SeqRec/tasks/train_SMB_decoder.py:395-444).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamer_tpu.models.generative.qwen_family import (
    QwenFamilyModel, build_config, prepare_train_inputs)
from gamer_tpu.tasks.train_smb_decoder import make_loss_fn
from gamer_tpu.train.loop import Trainer, TrainLoopConfig
from gamer_tpu.train.state import OptimizerConfig

from tests.test_qwen_family import make_batch, tiny_config


def _chunk(batch, size):
    B = batch["input_ids"].shape[0]
    for i in range(0, B, size):
        yield {k: v[i:i + size] for k, v in batch.items()}


def _make_trainer(model, cfg, params, **loop_kw):
    return Trainer(
        loss_fn=make_loss_fn(model, cfg),
        eval_loss_fn=make_loss_fn(model, cfg, deterministic=True),
        params=params,
        opt_cfg=OptimizerConfig(total_steps=10),
        loop_cfg=TrainLoopConfig(epochs=1, seed=0, save_checkpoints=False, **loop_kw),
    )


def test_eval_loss_deterministic_and_rechunk_invariant():
    cfg = tiny_config("Qwen3Multi", dropout_rate=0.5)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, cfg, B=8, blocks=4)
    # vary labels/valid-counts per row so re-chunk weighting actually matters
    labels = np.asarray(batch["labels"]).copy()
    labels[0, : 2 * cfg.num_positions] = -100
    labels[3, : 3 * cfg.num_positions] = -100
    batch["labels"] = jnp.array(labels)
    model = QwenFamilyModel(cfg)
    inputs = prepare_train_inputs(cfg, batch)
    params = model.init(jax.random.PRNGKey(0), **inputs)

    trainer = _make_trainer(model, cfg, params)
    # dropout rng must not affect eval loss
    l1 = trainer.evaluate(_chunk(batch, 4))
    trainer.base_rng = jax.random.PRNGKey(123)
    trainer._eval_step = trainer._build_eval_step()
    l2 = trainer.evaluate(_chunk(batch, 4))
    assert l1 == l2

    # re-chunking must not change the global token mean
    l_whole = trainer.evaluate(_chunk(batch, 8))
    l_small = trainer.evaluate(_chunk(batch, 2))
    np.testing.assert_allclose(l_whole, l_small, rtol=1e-6)
    np.testing.assert_allclose(l1, l_whole, rtol=1e-6)

    # and it must differ from the training (dropout-on) loss at this rate
    train_loss, _ = jax.jit(trainer.loss_fn)(params, batch, jax.random.PRNGKey(7))
    assert abs(float(train_loss) - l_whole) > 1e-4


def test_moe_action_periodic_equals_onehot():
    """MoeAction factorized periodic path == exact one-hot routing.

    Uses fully-valid blocks: on pad/eos blocks the periodic path outputs
    zero while onehot routes through expert 0 — a documented, loss-invariant
    divergence (pad labels ignored, pad keys masked; modules/moe.py).
    """
    cfg = tiny_config("Qwen3MoeAction")
    rng = np.random.default_rng(1)
    batch = make_batch(rng, cfg, B=3, blocks=4)
    model = QwenFamilyModel(cfg)
    inputs = prepare_train_inputs(cfg, batch)
    params = model.init(jax.random.PRNGKey(0), **inputs)
    out_p = model.apply(params, **inputs, route_mode="periodic")
    out_o = model.apply(params, **inputs, route_mode="onehot")
    np.testing.assert_allclose(np.asarray(out_p["logits"]),
                               np.asarray(out_o["logits"]), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("policy", ["full", "attn", "dots"])
def test_remat_matches_baseline_loss_and_grads(policy):
    """cfg.remat must not change values — only the backward's memory schedule.
    All remat policies (full recompute / save-attention-outputs / save-dots)
    must produce the same grads as the no-remat baseline."""
    cfg = tiny_config("Qwen3Multi")
    rng = np.random.default_rng(2)
    batch = make_batch(rng, cfg)
    inputs_cfg = prepare_train_inputs(cfg, batch)
    model = QwenFamilyModel(cfg)
    params = model.init(jax.random.PRNGKey(0), **inputs_cfg)

    cfg_r = cfg.replace(remat=True, remat_policy=policy)
    model_r = QwenFamilyModel(cfg_r)

    def loss(m, c, p):
        out = m.apply(p, **prepare_train_inputs(c, batch))
        return jnp.mean(out["logits"].astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(model, cfg, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(model_r, cfg_r, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_padded_vocab_logits_match_unpadded():
    """Padding the embed table must not change logits (padded rows unused)."""
    cfg = tiny_config("Qwen3")
    rng = np.random.default_rng(3)
    batch = make_batch(rng, cfg)
    inputs = prepare_train_inputs(cfg, batch)
    model = QwenFamilyModel(cfg)
    params = model.init(jax.random.PRNGKey(0), **inputs)

    cfg_p = cfg.replace(padded_vocab_size=128)
    model_p = QwenFamilyModel(cfg_p)
    params_p = model_p.init(jax.random.PRNGKey(0), **inputs)
    # graft the unpadded table into the padded one
    pp = jax.tree_util.tree_map(lambda x: x, params_p)
    emb = np.array(pp["params"]["embed_tokens"]["embedding"])
    emb[: cfg.vocab_size] = np.asarray(params["params"]["embed_tokens"]["embedding"])
    pp["params"]["embed_tokens"]["embedding"] = jnp.array(emb)
    for k in params["params"]:
        if k != "embed_tokens":
            pp["params"][k] = params["params"][k]

    out = model.apply(params, **inputs)["logits"]
    out_p = model_p.apply(pp, **inputs)["logits"]
    assert out_p.shape == out.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_p), rtol=1e-6, atol=1e-6)


def test_optimizer_families_step_and_converge():
    """--optim / --learner parity (ref SMBRec.py:46-76): every family must
    produce finite descent on a quadratic; unknown names fall back to adam."""
    import optax

    from gamer_tpu.train.state import make_optimizer

    target = jnp.asarray(np.random.default_rng(0).normal(size=(8,)).astype(np.float32))

    def loss(w):
        return jnp.sum((w - target) ** 2)

    for name in ["adamw", "adamw_torch", "adam", "sgd", "adagrad", "rmsprop",
                 "bogus"]:
        tx = make_optimizer(OptimizerConfig(
            optim=name, learning_rate=0.05, lr_scheduler_type="constant",
            warmup_ratio=0.0, max_grad_norm=0.0, total_steps=100))
        w = jnp.zeros((8,))
        opt_state = tx.init(w)
        l0 = float(loss(w))
        for _ in range(50):
            g = jax.grad(loss)(w)
            updates, opt_state = tx.update(g, opt_state, w)
            w = optax.apply_updates(w, updates)
        l1 = float(loss(w))
        assert np.isfinite(l1) and l1 < l0, (name, l0, l1)


def test_weight_decay_skips_batch_stats():
    """BatchNorm running stats (RQVAE --bn) must never be weight-decayed."""
    import optax

    from gamer_tpu.train.state import make_optimizer

    variables = {"params": {"w": jnp.ones((4,))},
                 "batch_stats": {"mean": jnp.ones((4,))}}
    tx = make_optimizer(OptimizerConfig(
        optim="adamw", learning_rate=0.1, weight_decay=0.5,
        lr_scheduler_type="constant", warmup_ratio=0.0, max_grad_norm=0.0,
        total_steps=10))
    opt_state = tx.init(variables)
    zero_g = jax.tree_util.tree_map(jnp.zeros_like, variables)
    updates, _ = tx.update(zero_g, opt_state, variables)
    new = optax.apply_updates(variables, updates)
    # zero grads: params["w"] moves only by decay, batch_stats must not move
    assert float(jnp.abs(new["params"]["w"] - 1.0).max()) > 1e-4
    np.testing.assert_array_equal(np.asarray(new["batch_stats"]["mean"]),
                                  np.ones(4))


def test_steps_eval_strategy_mid_epoch():
    """--save_and_eval_strategy steps: eval fires every N update steps
    mid-epoch and drives early stopping (ref train_SMB_decoder.py:409-421)."""
    cfg = tiny_config("Qwen3")
    model = QwenFamilyModel(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, cfg, B=8)
    inputs = prepare_train_inputs(cfg, batch)
    params = {"params": model.init(jax.random.PRNGKey(0), **inputs)["params"]}

    trainer = _make_trainer(model, cfg, params,
                            eval_strategy="steps", eval_every_steps=2)
    result = trainer.fit(lambda epoch: _chunk(batch, 2),
                         lambda: _chunk(batch, 4))
    # 4 micro-batches of 2 rows, accum=1 -> evals at update steps 2 and 4
    assert len(result["history"]) == 2
    assert [h["step"] for h in result["history"]] == [2, 4]


def test_resolve_hf_train_args_batch_spec():
    from gamer_tpu.tasks.base import resolve_hf_train_args

    # ref pair defines the global batch
    r = resolve_hf_train_args(
        {"per_device_batch_size": 8, "gradient_accumulation_steps": 4},
        batch_size=999)
    assert (r["micro"], r["accum"], r["batch_size"]) == (8, 4, 32)
    # our pair derives accumulation
    r = resolve_hf_train_args({}, batch_size=64, micro_batch_size=16)
    assert (r["micro"], r["accum"], r["batch_size"]) == (16, 4, 64)
    # bf16 switch wins over auto
    r = resolve_hf_train_args({"bf16": True}, batch_size=8)
    assert r["dtype"] == "bfloat16"
    # defaults unchanged
    r = resolve_hf_train_args({}, batch_size=8)
    assert (r["micro"], r["accum"], r["dtype"]) == (8, 1, "auto")
    assert r["loop_kwargs"]["eval_strategy"] == "epoch"


def test_schedule_horizon_counts_optimizer_updates():
    """The LR-schedule horizon is OPTIMIZER UPDATES, not micro-steps: with
    gradient accumulation k, optax.MultiSteps advances the inner schedule once
    per k micro-steps (HF Trainer semantics). A micro-step horizon would
    stretch warmup and truncate the cosine by k (the round-2 flagship recipe
    is micro 64 x accum 16 — a 16x distortion)."""
    import optax

    from gamer_tpu.train.state import (OptimizerConfig, make_optimizer,
                                       schedule_horizon)

    assert schedule_horizon(60000, 64, 16, 30) == (60000 // 1024) * 30
    assert schedule_horizon(100, 8, 1, 5) == (100 // 8) * 5
    assert schedule_horizon(4, 8, 2, 3) == 3  # floor clamp

    # pin the optax behavior the formula depends on: schedule consumed once
    # per accumulation cycle
    k = 4
    tx = optax.MultiSteps(make_optimizer(OptimizerConfig(total_steps=10)), k)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    for _ in range(2 * k):
        _, state = tx.update({"w": jnp.ones((3,))}, state, params)
    assert int(state.gradient_step) == 2


def test_steps_strategy_eval_cadence_anchored_after_resume(tmp_path):
    """Steps-strategy evals fire at absolute optimizer-update counts across
    --resume_from_checkpoint (advisor round-2: micro_steps_total restarted at
    0 on every fit(), shifting the post-resume cadence)."""
    cfg = tiny_config("Qwen3")
    rng = np.random.default_rng(4)
    batch = make_batch(rng, cfg, B=4, blocks=2)
    model = QwenFamilyModel(cfg)
    inputs = prepare_train_inputs(cfg, batch)
    params = model.init(jax.random.PRNGKey(0), **inputs)

    def batches(_epoch=None):
        for _ in range(5):  # 5 micro-steps per epoch
            yield batch

    def trainer(resume):
        # fresh buffers per Trainer: the jitted train step donates its state
        fresh = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), params)
        return Trainer(
            loss_fn=make_loss_fn(model, cfg),
            eval_loss_fn=make_loss_fn(model, cfg, deterministic=True),
            params=fresh,
            opt_cfg=OptimizerConfig(total_steps=40),
            loop_cfg=TrainLoopConfig(
                epochs=2, seed=0, eval_strategy="steps", eval_every_steps=4,
                patience=0, resume=resume),
            output_dir=str(tmp_path))

    # uninterrupted: 10 micro-steps -> evals at absolute steps 4 and 8
    t0 = trainer(resume=False)
    hist = t0.fit(batches, eval_batches=lambda: batches())["history"]
    steps_uninterrupted = [h["step"] for h in hist]
    assert steps_uninterrupted == [4, 8]

    # interrupted after epoch 0 (5 micro-steps, one eval at 4), then resumed:
    # the resumed run must eval at absolute step 8 — not at 5 + 4 = 9
    t1 = trainer(resume=False)
    t1.cfg.epochs = 1
    h1 = t1.fit(batches, eval_batches=lambda: batches())["history"]
    assert [h["step"] for h in h1] == [4]
    t2 = trainer(resume=True)
    h2 = t2.fit(batches, eval_batches=lambda: batches())["history"]
    assert [h["step"] for h in h2] == [8], h2


def test_auto_remat_selector_pinned_geometries():
    """Auto remat (VERDICT r3 #7): off where round-3 on-chip runs measured a
    fit (remat off is ~40% faster when it fits), attn where the estimate
    exceeds the budget. Pinned so a selector regression can't silently flip
    the flagship quality-run config."""
    from __graft_entry__ import _flagship_config
    from gamer_tpu.train.memory import count_params, select_remat

    cfg = _flagship_config().replace(dtype="bfloat16")
    hbm = 16e9  # v5e
    # flagship recipe: fits with >2x headroom -> off
    assert select_remat(cfg, 64, 505, hbm)[0] is False
    # S=2045 B=64: measured fit, remat off 217k tok/s vs attn 154k -> off
    assert select_remat(cfg, 64, 2048, hbm)[0] is False
    # XL long-context at full micro: far over budget -> attn remat
    over, policy, est = select_remat(cfg, 64, 8192, hbm)
    assert over is True and policy == "attn"
    assert est["total"] > 0.7 * hbm

    # the analytic parameter count must track the real model (within 10%)
    tcfg = tiny_config("Qwen3Multi")
    model = QwenFamilyModel(tcfg)
    batch = make_batch(np.random.default_rng(0), tcfg, 2, 3)
    variables = model.init(jax.random.PRNGKey(0),
                           **prepare_train_inputs(tcfg, batch))
    real = sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(variables["params"]))
    approx = count_params(tcfg)
    assert abs(approx - real) / real < 0.10, (approx, real)


def test_auto_remat_never_triggers_on_cpu():
    """The CPU/virtual-device test environment reports no TPU backend; the
    selector must leave remat off regardless of geometry."""
    from __graft_entry__ import _flagship_config
    from gamer_tpu.train.memory import auto_remat_overrides

    cfg = _flagship_config().replace(dtype="bfloat16")
    assert auto_remat_overrides(cfg, 1024, 8192) == {}


def test_causal_lm_loss_matches_full_f32_log_softmax():
    """The byte-lean CE (bf16 logits, per-reduction on-the-fly fp32 views —
    no materialized f32[B,S,V]) must match a full-f32 log_softmax reference
    exactly: an fp32 cast of bf16 inputs adds no information, so the two
    formulations are the same function."""
    from gamer_tpu.modules.losses import IGNORE_LABEL, causal_lm_loss_with_denom

    rng = np.random.default_rng(0)
    B, S, V = 4, 12, 37
    logits = jnp.asarray(rng.normal(0, 4, (B, S, V)), dtype=jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, V, (B, S)))
    labels = labels.at[:, :3].set(IGNORE_LABEL)
    loss, denom = causal_lm_loss_with_denom(logits, labels, temperature=0.7)

    lf = logits[:, :-1].astype(jnp.float32) / 0.7
    t = labels[:, 1:]
    valid = t != IGNORE_LABEL
    logp = jax.nn.log_softmax(lf, axis=-1)
    nll = -jnp.take_along_axis(
        logp, jnp.where(valid, t, 0)[..., None], axis=-1)[..., 0]
    ref = jnp.where(valid, nll, 0).sum() / valid.sum()
    assert int(denom) == int(valid.sum())
    np.testing.assert_allclose(float(loss), float(ref), rtol=0, atol=1e-5)
