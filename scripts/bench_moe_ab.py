#!/usr/bin/env python
"""A/B: flagship train step with the fused MoE-FFN Pallas kernel
(ops/pallas_moe.py) vs the jnp periodic path, at the SHIPPED recipe
(bf16, dropout 0.2, rbg keys, pallas attention) — the round-5 perf
centerpiece (VERDICT r4 next #2). Sandwich order (jnp, pallas, jnp,
pallas at micro 128/256) so a drifting session can't fake a win.

Slope-fit timing (see bench.py / CLAUDE.md): block_until_ready does not
sync through the axon tunnel — time two step counts each ended by a host
transfer and fit the per-step cost. Run on the real TPU chip:

    python scripts/bench_moe_ab.py
"""

import json
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


def bench_config(tag, moe_impl, batch=BATCH, dropout_rate=0.2, **cfg_over):
    import jax
    import optax

    from __graft_entry__ import _flagship_config, _make_batch
    from gamer_tpu.models.generative.qwen_family import (
        QwenFamilyModel, prepare_train_inputs)
    from gamer_tpu.tasks.train_smb_decoder import make_loss_fn
    from gamer_tpu.train.state import OptimizerConfig, make_optimizer

    cfg = _flagship_config()
    cfg = cfg.replace(dtype="bfloat16", dropout_rate=dropout_rate,
                      attention_impl="pallas", moe_impl=moe_impl, **cfg_over)
    model = QwenFamilyModel(cfg)
    rng = np.random.default_rng(0)
    n_seq = batch
    batch = _make_batch(cfg, n_seq, BLOCKS, rng)
    deterministic = dropout_rate == 0.0
    base_key = (None if deterministic
                else jax.random.key(0, impl="unsafe_rbg"))

    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), **prepare_train_inputs(cfg, batch)))()
    tx = make_optimizer(OptimizerConfig(total_steps=10_000))
    opt_state = tx.init(variables)

    # the SHIPPED loss path (fused-CE/logits branch included) — one source
    # of truth with the train task
    loss_core = make_loss_fn(model, cfg, deterministic=deterministic)

    @jax.jit
    def train_step(variables, opt_state, batch, step):
        def loss_fn(v):
            rng = (jax.random.PRNGKey(0) if deterministic else
                   jax.random.fold_in(base_key, step))
            return loss_core(v, batch, rng)[0]

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
    print(f"{tag}: {per_step * 1e3:.1f} ms/step, {seqs:.0f} seq/s/chip",
          flush=True)
    return seqs


def main():
    probe()
    results = {}
    # sandwich: jnp / pallas / jnp re-check / pallas, then larger micros
    # (the fused kernel removes the reshape producers implicated in the
    # micro-batch falloff — test whether the regime shifts, VERDICT weak #2).
    # Per-config try/except: a Mosaic rejection of one config must not kill
    # the unattended rail's remaining arms.
    for key, tag, impl, bs in [
        ("jnp_a", "A jnp periodic (baseline)", "jnp", BATCH),
        ("pallas", "B fused pallas kernel", "pallas", BATCH),
        ("jnp_b", "A' jnp re-check (drift guard)", "jnp", BATCH),
        ("pallas_b128", "B fused pallas, micro 128", "pallas", 128),
        ("jnp_b128", "A jnp, micro 128", "jnp", 128),
        ("pallas_b256", "B fused pallas, micro 256", "pallas", 256),
    ]:
        try:
            results[key] = bench_config(tag, impl, batch=bs)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}"[:800], flush=True)
            results[key] = None
    print(json.dumps(results))


if __name__ == "__main__":
    main()
