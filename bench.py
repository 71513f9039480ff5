#!/usr/bin/env python
"""Benchmark: flagship (Qwen3Multi, GAMER scale) training throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config mirrors the reference flagship recipe (ref README.md:59-73 /
config/s2s-models/Qwen3Multi/config.json): 8 layers, hidden 256, 6 heads
(3 KV), head_dim 64, all layers sparse MoE, behavior injection on 0-3, cross
attention on 4-7, max_his_len 100 -> sequence 505 tokens, bf16 compute.

vs_baseline: the reference publishes no numbers (BASELINE.md); the denominator
is this framework's round-1 recorded value so the ratio tracks round-over-round
progress (>1.0 = faster than round 1).
"""

import json
import os
import time

import numpy as np

# Round-1 reference point (seq/s/chip on one v5e chip), recorded when this
# bench first ran on real hardware. Update only when hardware changes.
# NOTE: an earlier value (27,375) was measured with jax.block_until_ready,
# which does NOT synchronize through the axon tunnel and therefore recorded
# async dispatch rate, not compute. Timing now slope-fits wall time over two
# step counts with a forced host transfer, which removes both the async bias
# and the fixed transfer overhead. Honest round-1 value below.
ROUND1_BASELINE_SEQS_PER_SEC = 595.0

BATCH = 64
BLOCKS = 101  # max_his_len 100 + target block
WARMUP = 3
STEPS_LO = 5
STEPS_HI = 50


def _probe_device(timeout_s: float = 240.0):
    """Probe the TPU tunnel in a killable subprocess, retrying until
    BENCH_PROBE_BUDGET_S (default 1800s) is exhausted.

    Round-2 AND round-3 bench artifacts were null because a single fail-fast
    probe coincided with a transient tunnel wedge (VERDICT r3 missing #5);
    observed outages self-recover in minutes, so a transient outage must
    degrade to a LATE capture, not a null one."""
    import subprocess
    import sys

    budget_s = float(os.environ.get("BENCH_PROBE_BUDGET_S", "1800"))
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            p = subprocess.run(
                [sys.executable, "-c",
                 "import jax, numpy as np\n"
                 "x = jax.numpy.ones((256, 256))\n"
                 "print(float(np.asarray((x @ x).sum())))"],
                capture_output=True, timeout=timeout_s)
            err = None if p.returncode == 0 else p.stderr.decode()[-500:]
        except subprocess.TimeoutExpired:
            err = f"probe timed out after {timeout_s}s"
        if err is None:
            return
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            raise RuntimeError(
                f"{attempt} probe attempts over {budget_s:.0f}s: {err}")
        print(f"# probe attempt {attempt} failed ({err.splitlines()[-1] if err.splitlines() else err}); "
              f"{remaining:.0f}s of budget left", flush=True)
        time.sleep(min(120.0, max(0.0, remaining)))


# Fixed drift-normalization workload: an HBM-BOUND sweep (the flagship step
# itself is HBM-bound, so HBM bandwidth is the right thing to normalize by)
# timed the same slope-fit way as the main bench. Cross-session tunnel drift
# is ~12% (docs/benchmarks.md), so the raw seq/s number is only comparable
# across sessions when divided by this probe's relative speed.
# NORM_BASELINE_MS: pin from BENCH_r04's recorded norm_workload_ms (the first
# capture with this workload); drift > 1.0 means this session's chip+tunnel
# is slower than that recording. (A first matmul-chain version was compute-
# bound and finished in ~0.1 ms — unmeasurable through tunnel noise.)
NORM_BASELINE_MS = 0.827  # BENCH_r04 norm_workload_ms


def _norm_workload_ms():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def sweep(x, a):
        # 8 read+write passes over a 256 MB array ~ 4 GB of HBM traffic
        for _ in range(8):
            x = x * a + 0.25
        return x

    # vary inputs across iterations — the axon runtime dedupes identical
    # (executable, input) dispatches (CLAUDE.md)
    xs = [jnp.full((8192, 16384), 1.0 + 1e-6 * i, jnp.bfloat16)
          for i in range(4)]
    a = jnp.bfloat16(1.0 + 2 ** -8)
    out = sweep(xs[0], a)
    float(np.asarray(out[0, :8].astype(jnp.float32)).sum())  # warm + sync

    def window(n):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for i in range(n):
                out = sweep(xs[i % len(xs)], a)
            float(np.asarray(out[0, :8].astype(jnp.float32)).sum())
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = window(5), window(45)
    return (t_hi - t_lo) / 40.0 * 1000.0


def main():
    import jax
    import optax

    try:
        _probe_device()
    except Exception as e:  # wedged tunnel / unreachable device
        print(json.dumps({"metric": "train_seqs_per_sec_per_chip",
                          "value": None, "unit": "seq/s/chip",
                          "vs_baseline": None,
                          "error": f"device unreachable: {e}"[:300]}))
        raise SystemExit(1)

    from __graft_entry__ import _flagship_config, _make_batch
    from gamer_tpu.models.generative.qwen_family import (
        QwenFamilyModel, prepare_train_inputs)
    from gamer_tpu.tasks.train_smb_decoder import make_loss_fn
    from gamer_tpu.train.state import OptimizerConfig, make_optimizer

    # attention_impl: honest same-session A/B (docs/benchmarks.md) — the fused
    # pallas kernel beats the XLA path 808 vs 595 seq/s/chip at this geometry
    # (the jnp path materializes [B,H,S,S] fp32 scores in HBM). An earlier A/B
    # concluded the opposite because block_until_ready does not sync through
    # the axon tunnel and was timing dispatch rate.
    #
    # This is the SHIPPED train_SMB_decoder config: bf16 (--dtype auto on
    # TPU), dropout 0.2 (the model default, ref flagship config.json), pallas
    # attention, rbg dropout keys (train/loop.py). Round 1 benched dropout 0;
    # the measured dropout cost at the rbg impl is ~8% (docs/benchmarks.md
    # "Dropout path").
    cfg = _flagship_config()
    cfg = cfg.replace(dtype="bfloat16", dropout_rate=0.2,
                      attention_impl="pallas")
    model = QwenFamilyModel(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(cfg, BATCH, BLOCKS, rng)
    dropout_key = jax.random.key(0, impl="unsafe_rbg")

    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), **prepare_train_inputs(cfg, batch)))()
    tx = make_optimizer(OptimizerConfig(total_steps=2 * (STEPS_LO + STEPS_HI) + WARMUP))
    opt_state = tx.init(variables)

    loss_core = make_loss_fn(model, cfg, deterministic=False)

    @jax.jit
    def train_step(variables, opt_state, batch, step):
        def loss_fn(v):
            return loss_core(v, batch, jax.random.fold_in(dropout_key, step))[0]

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, loss

    step_no = 0

    def _step():
        nonlocal variables, opt_state, step_no
        variables, opt_state, loss = train_step(variables, opt_state, batch, step_no)
        step_no += 1
        return loss

    for _ in range(WARMUP):
        loss = _step()
    float(np.asarray(loss))  # host transfer: the only real sync through axon

    # jax.block_until_ready does NOT synchronize through the axon tunnel and a
    # host transfer has a fixed overhead, so: time two step counts to a host
    # sync and slope-fit the per-step cost (overhead cancels).
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
    n_chips = jax.device_count()
    seqs_per_sec = BATCH / per_step / n_chips
    norm_ms = _norm_workload_ms()
    rec = {
        "metric": "flagship_train_seqs_per_sec_per_chip",
        "value": round(seqs_per_sec, 2),
        "unit": "seq/s/chip",
        "vs_baseline": round(seqs_per_sec / ROUND1_BASELINE_SEQS_PER_SEC, 3),
        "norm_workload_ms": round(norm_ms, 3),
    }
    if NORM_BASELINE_MS is not None:
        # drift > 1.0: session slower than the norm recording -> the
        # drift-corrected value estimates what a nominal session would measure
        drift = norm_ms / NORM_BASELINE_MS
        rec["session_drift"] = round(drift, 3)
        rec["value_drift_corrected"] = round(seqs_per_sec * drift, 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
