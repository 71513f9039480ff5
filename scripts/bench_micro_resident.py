#!/usr/bin/env python
"""Micro-batch scaling: device-resident vs host-numpy batches.

Round-2 weak #2 (and the round-3 rail) show per-seq throughput FALLING with
micro-batch (916 -> 812 seq/s/chip from B=64 to B=128 at the flagship
recipe). Hypothesis: the timing loop (and the axon tunnel) re-transfers the
host-side numpy batch every step — a per-step cost LINEAR in B that a real
TPU host hides on PCIe but the tunnel serializes. If true, the kernel/fusion
tiling was never the problem.

This script slope-fits the same train step with (a) the batch passed as
numpy every call (what bench.py and the rail measure) and (b) the batch
jax.device_put once and reused (steady-state compute; real training overlaps
the next batch's transfer with compute via async dispatch).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_micro_resident.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BLOCKS = 101
WARMUP = 3
STEPS_LO = 5
STEPS_HI = 25


def main():
    import jax
    import optax

    from __graft_entry__ import _flagship_config, _make_batch
    from gamer_tpu.models.generative.qwen_family import (
        QwenFamilyModel, prepare_train_inputs)
    from gamer_tpu.modules.losses import causal_lm_loss
    from gamer_tpu.train.state import OptimizerConfig, make_optimizer

    x = jax.numpy.ones((256, 256))
    print(f"probe ok: {float(np.asarray((x @ x).sum())):.0f} on {jax.devices()}",
          flush=True)

    cfg = _flagship_config()
    cfg = cfg.replace(dtype="bfloat16", dropout_rate=0.2,
                      attention_impl="pallas")
    model = QwenFamilyModel(cfg)
    key = jax.random.key(0, impl="unsafe_rbg")

    for batch_size in (64, 128, 256):
        rng = np.random.default_rng(0)
        batch = _make_batch(cfg, batch_size, BLOCKS, rng)
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), **prepare_train_inputs(cfg, batch)))()
        tx = make_optimizer(OptimizerConfig(
            total_steps=4 * (STEPS_LO + STEPS_HI) + 2 * WARMUP))
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
            variables = optax.apply_updates(variables, updates)
            return variables, opt_state, loss

        for mode in ("numpy", "resident"):
            b = jax.device_put(batch) if mode == "resident" else batch
            step_no = 0
            vs, os_ = variables, opt_state

            def _step():
                nonlocal vs, os_, step_no
                vs, os_, loss = train_step(vs, os_, b, step_no)
                step_no += 1
                return loss

            for _ in range(WARMUP):
                loss = _step()
            float(np.asarray(loss))

            def window(n):
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    for _ in range(n):
                        loss = _step()
                    float(np.asarray(loss))
                    best = min(best, time.perf_counter() - t0)
                return best

            t_lo, t_hi = window(STEPS_LO), window(STEPS_HI)
            per_step = (t_hi - t_lo) / (STEPS_HI - STEPS_LO)
            print(f"B={batch_size:3d} {mode:8s}: {per_step * 1e3:7.1f} ms/step, "
                  f"{batch_size / per_step:7.0f} seq/s", flush=True)


if __name__ == "__main__":
    main()
