#!/usr/bin/env python
"""HBM bytes-accessed inventory of the flagship train step (VERDICT r2 weak #4:
"MoE backward layouts / fusion boundaries unprofiled").

Compiles (does NOT run) the flagship train step on the TPU for component-
ablated variants and prints XLA's own cost analysis: flops and bytes accessed.
The deltas attribute the HBM traffic that makes the step memory-bound
(docs/benchmarks.md: ~56 GB vs 1.5 TFLOP at round 1) to the lm-head/CE block,
the MoE block, attention dropout and remat — without timing noise, and one
tunnel compile per variant instead of a timing loop.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/hbm_inventory.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

BLOCKS = 101  # flagship S=505
BATCH = 64


def build(variant, remat=False, remat_policy="attn"):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_config, _make_batch
    from gamer_tpu.models.generative.qwen_family import (
        QwenFamilyModel, prepare_train_inputs)
    from gamer_tpu.modules.losses import causal_lm_loss
    from gamer_tpu.train.state import OptimizerConfig, make_optimizer

    cfg = _flagship_config()
    cfg = cfg.replace(dtype="bfloat16", dropout_rate=0.2,
                      attention_impl="pallas", remat=remat,
                      remat_policy=remat_policy)
    if variant == "no_moe":
        cfg = cfg.replace(sparse_layers=[])
    if variant == "moe_pallas":
        # fused MoE-FFN kernel (round 5): NOTE XLA's cost analysis cannot see
        # inside pallas_call, so compare this arm's bytes against "full" minus
        # the kernel's true traffic (x + out + weights per layer) — the DELTA
        # vs "full" is the HBM bytes the fusion removed from XLA's graph
        cfg = cfg.replace(moe_impl="pallas")
    if variant == "no_attndrop":
        cfg = cfg.replace(attention_dropout=0.0)
    if variant == "drop0":
        # round-1's 56 GB reference point was measured at dropout 0; this arm
        # attributes the hidden-state BitDropout mask traffic
        cfg = cfg.replace(dropout_rate=0.0)
    model = QwenFamilyModel(cfg)
    batch = _make_batch(cfg, BATCH, BLOCKS, np.random.default_rng(0))
    key = jax.random.key(0, impl="unsafe_rbg")
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), **prepare_train_inputs(cfg, batch)))()
    tx = make_optimizer(OptimizerConfig(total_steps=10_000))
    opt_state = tx.init(variables)

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

    import jax

    compiled = jax.jit(train_step).lower(
        variables, opt_state, batch, 0).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return ca


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    rows = []
    for name, kw in [
        ("full", dict(variant="full")),
        ("no_head", dict(variant="no_head")),
        ("no_moe", dict(variant="no_moe")),
        ("moe_pallas", dict(variant="moe_pallas")),
        ("no_attndrop", dict(variant="no_attndrop")),
        ("drop0", dict(variant="drop0")),
        ("remat_attn", dict(variant="full", remat=True, remat_policy="attn")),
        ("remat_full", dict(variant="full", remat=True, remat_policy="full")),
    ]:
        try:
            ca = build(**kw)
            fl = ca.get("flops", float("nan"))
            by = ca.get("bytes accessed", float("nan"))
            rows.append((name, fl, by))
            print(f"{name:12s}: {fl / 1e12:7.3f} TFLOP  "
                  f"{by / 1e9:7.2f} GB accessed", flush=True)
        except Exception as e:  # keep going: one variant's failure isn't fatal
            print(f"{name:12s}: FAILED {type(e).__name__}: {e}", flush=True)
    base = {n: (f, b) for n, f, b in rows}
    if "full" in base:
        f0, b0 = base["full"]
        for n, f, b in rows[1:]:
            print(f"delta full-{n:12s}: {(f0 - f) / 1e12:7.3f} TFLOP  "
                  f"{(b0 - b) / 1e9:7.2f} GB")


if __name__ == "__main__":
    main()
