#!/usr/bin/env python
"""Attempt a jax.profiler device trace of the flagship step at micro 64 and
256 (VERDICT r3 #6: name the op behind the micro-batch falloff).

The axon tunnel backend may not support device-side tracing; this script is
a bounded attempt — on failure it logs and exits 0 so the perf rail
continues. Traces land in runs/perf_r4/trace_b{64,256}/ for offline parsing
(xplane protos).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_trace.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BLOCKS = 101
OUT = "runs/perf_r4"


def run(batch):
    import jax
    import optax

    from __graft_entry__ import _flagship_config, _make_batch
    from gamer_tpu.models.generative.qwen_family import (
        QwenFamilyModel, prepare_train_inputs)
    from gamer_tpu.modules.losses import causal_lm_loss
    from gamer_tpu.train.state import OptimizerConfig, make_optimizer

    cfg = _flagship_config()
    cfg = cfg.replace(dtype="bfloat16", dropout_rate=0.2,
                      attention_impl="pallas")
    model = QwenFamilyModel(cfg)
    b = _make_batch(cfg, batch, BLOCKS, np.random.default_rng(0))
    key = jax.random.key(0, impl="unsafe_rbg")
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), **prepare_train_inputs(cfg, b)))()
    tx = make_optimizer(OptimizerConfig(total_steps=10_000))
    opt_state = tx.init(variables)

    @jax.jit
    def train_step(variables, opt_state, b, step):
        def loss_fn(v):
            inputs = prepare_train_inputs(cfg, b)
            out = model.apply(v, **inputs, route_mode="periodic",
                              deterministic=False,
                              rngs={"dropout": jax.random.fold_in(key, step)})
            return causal_lm_loss(out["logits"], b["labels"], cfg.temperature)

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        return variables, opt_state, loss

    step = 0

    def one():
        nonlocal variables, opt_state, step
        variables, opt_state, loss = train_step(variables, opt_state, b, step)
        step += 1
        return loss

    for _ in range(3):
        loss = one()
    float(np.asarray(loss))  # sync

    d = f"{OUT}/trace_b{batch}"
    os.makedirs(d, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(d):
        for _ in range(5):
            loss = one()
        float(np.asarray(loss))
    print(f"b{batch}: traced 5 steps in {time.perf_counter() - t0:.2f}s -> {d}",
          flush=True)
    files = []
    for root, _, fs in os.walk(d):
        files += [os.path.join(root, f) for f in fs]
    for f in files:
        print(f"  {os.path.getsize(f):>10d}  {f}", flush=True)


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    for batch in (64, 256):
        try:
            run(batch)
        except Exception as e:
            print(f"b{batch}: trace FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
