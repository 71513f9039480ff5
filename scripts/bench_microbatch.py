#!/usr/bin/env python
"""Micro-batch scaling diagnosis (round-2 weak #2: 64->1053, 128->934,
256->848 seq/s/chip — per-seq throughput should be flat-to-rising in B on an
HBM-bound step).

For each micro batch size, slope-fit the full flagship train step (bf16 +
dropout 0.2 + rbg — the shipped recipe) and component-ablated variants:

  full       — the real step
  no_head    — lm logits einsum + CE replaced by a mean over hidden states
  no_moe     — MoE layers routed dense through expert 1 only (route_mode
               "periodic" with num_experts=1-style single pass is not
               expressible; instead sparse_layers=[] -> plain dense MLP)
  no_attndrop— attention-prob dropout off (rate 0), rest unchanged

The deltas attribute step time to the lm-head/CE block, the MoE block and the
in-kernel dropout hash across batch sizes. Slope-fit timing per CLAUDE.md
(the tunnel fakes block_until_ready).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_microbatch.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BLOCKS = 101  # flagship S=505
WARMUP = 3
STEPS_LO = 5
STEPS_HI = 25


def probe():
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256))
    v = float(np.asarray(jnp.dot(x, x).sum()))
    print(f"probe ok: {v:.0f} on {jax.devices()}", flush=True)


def bench(tag, batch, variant="full"):
    import jax
    import jax.numpy as jnp
    import optax

    from gamer_tpu.ops import pallas_attention as PA

    from __graft_entry__ import _flagship_config, _make_batch
    from gamer_tpu.models.generative.qwen_family import (
        QwenFamilyModel, prepare_train_inputs)
    from gamer_tpu.modules.losses import causal_lm_loss
    from gamer_tpu.train.state import OptimizerConfig, make_optimizer

    cfg = _flagship_config()
    cfg = cfg.replace(dtype="bfloat16", dropout_rate=0.2,
                      attention_impl="pallas")
    if variant == "no_moe":
        cfg = cfg.replace(sparse_layers=[])
    if variant == "no_attndrop":
        cfg = cfg.replace(attention_dropout=0.0)
    model = QwenFamilyModel(cfg)
    rng = np.random.default_rng(0)
    batch_data = _make_batch(cfg, batch, BLOCKS, rng)
    S = batch_data["input_ids"].shape[1]
    key = jax.random.key(0, impl="unsafe_rbg")

    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), **prepare_train_inputs(cfg, batch_data)))()
    tx = make_optimizer(OptimizerConfig(total_steps=10_000))
    opt_state = tx.init(variables)

    @jax.jit
    def train_step(variables, opt_state, b, step):
        def loss_fn(v):
            inputs = prepare_train_inputs(cfg, b)
            out = model.apply(v, **inputs, route_mode="periodic",
                              deterministic=False,
                              rngs={"dropout": jax.random.fold_in(key, step)},
                              logits_last_only=variant == "no_head")
            if variant == "no_head":
                return jnp.mean(out["logits"].astype(jnp.float32) ** 2)
            return causal_lm_loss(out["logits"], b["labels"], cfg.temperature)

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, loss

    step_no = 0

    def run(n):
        nonlocal variables, opt_state, step_no
        t0 = time.perf_counter()
        loss = None
        for _ in range(n):
            variables, opt_state, loss = train_step(
                variables, opt_state, batch_data, step_no)
            step_no += 1
        lv = float(np.asarray(loss))
        assert np.isfinite(lv), f"{tag}: non-finite loss {lv}"
        return time.perf_counter() - t0

    # "stream": force the (B, nQ)-grid streaming kernels at S<=1024 — if the
    # (B,)-grid monolithic kernel is what regresses large micro batches, this
    # variant is the candidate replacement threshold
    mono_max = PA.MONO_MAX
    if variant == "stream":
        PA.MONO_MAX = 0
    try:
        for _ in range(WARMUP):
            run(1)
        t_lo = min(run(STEPS_LO) for _ in range(2))
        t_hi = min(run(STEPS_HI) for _ in range(2))
    finally:
        PA.MONO_MAX = mono_max
    per_step = (t_hi - t_lo) / (STEPS_HI - STEPS_LO)
    seqs = batch / per_step
    print(f"{tag}: B={batch} S={S} {variant}: {per_step * 1e3:.1f} ms/step, "
          f"{seqs:.0f} seq/s", flush=True)
    return per_step


def main():
    probe()
    results = {}
    for B in (64, 128, 256):
        for variant in ("full", "no_head", "no_moe", "no_attndrop", "stream"):
            results[(B, variant)] = bench(f"micro[{B}]", B, variant)
    print("\n--- attribution (ms/step) ---")
    for B in (64, 128, 256):
        full = results[(B, "full")] * 1e3
        head = full - results[(B, "no_head")] * 1e3
        moe = full - results[(B, "no_moe")] * 1e3
        drop = full - results[(B, "no_attndrop")] * 1e3
        print(f"B={B}: full={full:.1f} head+CE~{head:.1f} moe~{moe:.1f} "
              f"attndrop~{drop:.1f} (per-seq {full / B:.3f} ms)")


if __name__ == "__main__":
    main()
