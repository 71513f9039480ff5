#!/usr/bin/env python
"""A/B: flagship train-step throughput with the REAL training config
(dropout 0.2) vs the dropout-0 bench config, and threefry vs rbg dropout keys.

Slope-fit timing (see bench.py / CLAUDE.md): the axon tunnel fakes
block_until_ready, so time two step counts each ended by a host transfer and
fit the per-step cost. Run on the real TPU chip:

    python scripts/bench_dropout_ab.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 64
BLOCKS = 101
WARMUP = 3
STEPS_LO = 5
STEPS_HI = 50


def probe():
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256))
    v = float(np.asarray(jnp.dot(x, x).sum()))
    print(f"probe ok: {v:.0f} on {jax.devices()}", flush=True)


def bench_config(tag, dropout_rate, rng_impl, batch=BATCH):
    import jax
    import optax

    from __graft_entry__ import _flagship_config, _make_batch
    from gamer_tpu.models.generative.qwen_family import (
        QwenFamilyModel, prepare_train_inputs)
    from gamer_tpu.modules.losses import causal_lm_loss
    from gamer_tpu.train.state import OptimizerConfig, make_optimizer

    cfg = _flagship_config()
    cfg = cfg.replace(dtype="bfloat16", dropout_rate=dropout_rate,
                      attention_impl="pallas")
    model = QwenFamilyModel(cfg)
    rng = np.random.default_rng(0)
    n_seq = batch
    batch = _make_batch(cfg, n_seq, BLOCKS, rng)
    deterministic = dropout_rate == 0.0
    base_key = (None if deterministic
                else jax.random.key(0, impl=rng_impl))

    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), **prepare_train_inputs(cfg, batch)))()
    tx = make_optimizer(OptimizerConfig(total_steps=10_000))
    opt_state = tx.init(variables)

    @jax.jit
    def train_step(variables, opt_state, batch, step):
        def loss_fn(v):
            inputs = prepare_train_inputs(cfg, batch)
            rngs = (None if deterministic else
                    {"dropout": jax.random.fold_in(base_key, step)})
            out = model.apply(v, **inputs, route_mode="periodic",
                              deterministic=deterministic, rngs=rngs)
            return causal_lm_loss(out["logits"], batch["labels"], cfg.temperature)

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, loss

    step_no = 0

    def run(n):
        nonlocal variables, opt_state, step_no
        t0 = time.perf_counter()
        for _ in range(n):
            variables, opt_state, loss = train_step(
                variables, opt_state, batch, step_no)
            step_no += 1
        float(np.asarray(loss))
        return time.perf_counter() - t0

    for _ in range(WARMUP):
        run(1)

    def window(n):
        return min(run(n) for _ in range(2))

    t_lo, t_hi = window(STEPS_LO), window(STEPS_HI)
    per_step = (t_hi - t_lo) / (STEPS_HI - STEPS_LO)
    seqs = n_seq / per_step
    print(f"{tag}: {per_step * 1e3:.1f} ms/step, {seqs:.0f} seq/s/chip", flush=True)
    return seqs


def main():
    probe()
    results = {}
    results["dropout0"] = bench_config("dropout 0.0 (bench config)", 0.0, None)
    results["dropout02_threefry"] = bench_config(
        "dropout 0.2, threefry keys", 0.2, "threefry2x32")
    results["dropout02_rbg"] = bench_config(
        "dropout 0.2, unsafe_rbg keys", 0.2, "unsafe_rbg")
    results["dropout02_rbg_b128"] = bench_config(
        "dropout 0.2, unsafe_rbg keys, micro-batch 128", 0.2, "unsafe_rbg",
        batch=128)
    results["dropout02_rbg_b256"] = bench_config(
        "dropout 0.2, unsafe_rbg keys, micro-batch 256", 0.2, "unsafe_rbg",
        batch=256)
    print(results)


if __name__ == "__main__":
    main()
