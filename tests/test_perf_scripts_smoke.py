"""Smoke-execute the perf-rail scripts (scripts/bench_*.py, hbm_inventory) at
tiny geometry on CPU.

The rail runs unattended on the exclusive TPU the moment the tunnel recovers
(scripts/perf_round3.sh); a code error there burns scarce on-chip time. Each
script's core bench/build function is executed here with module constants
monkeypatched small, so signature drift against __graft_entry__ /
QwenFamilyConfig / beam-search APIs is caught by the CPU suite instead.
"""

import importlib.util
import math
import sys

import pytest

SCRIPTS = "/root/repo/scripts"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, f"{SCRIPTS}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # defs only; main() is __main__-guarded
    return mod


def _shrink(mod, **over):
    for k, v in dict(WARMUP=1, STEPS_LO=1, STEPS_HI=2, **over).items():
        if hasattr(mod, k):
            setattr(mod, k, v)


@pytest.mark.parametrize("variant", ["full", "no_head", "no_moe",
                                     "no_attndrop", "stream"])
def test_bench_microbatch_variants(variant):
    mod = _load("bench_microbatch")
    _shrink(mod, BLOCKS=2)
    per_step = mod.bench(f"smoke:{variant}", batch=4, variant=variant)
    # smoke only: the 2-step slope fit is meaningless (and routinely negative)
    # on a contended host core — assert the plumbing ran, not the timing
    # (round-4 verdict weak #3: a timing assert here trained people to
    # ignore red)
    assert math.isfinite(per_step)


def test_hbm_inventory_variants():
    mod = _load("hbm_inventory")
    mod.BLOCKS, mod.BATCH = 2, 4
    base = mod.build("full")
    assert base.get("flops", 0) > 0 and base.get("bytes accessed", 0) > 0
    # remat variants exercise the checkpoint-policy names used by the rail
    for kw in (dict(variant="no_head"), dict(variant="no_moe"),
               dict(variant="full", remat=True, remat_policy="attn"),
               dict(variant="full", remat=True, remat_policy="full")):
        ca = mod.build(**kw)
        assert ca.get("flops", 0) > 0


def test_bench_long_context_step():
    mod = _load("bench_long_context")
    _shrink(mod)
    for remat, policy in ((False, "attn"), (True, "full"), (True, "attn")):
        per_step = mod.bench(f"smoke remat={remat}", blocks=2, batch=4,
                             remat=remat, remat_policy=policy)
        assert math.isfinite(per_step)


def test_bench_dropout_ab_configs():
    mod = _load("bench_dropout_ab")
    _shrink(mod, BLOCKS=2)
    assert math.isfinite(mod.bench_config("smoke d0", 0.0, None, batch=4))
    assert math.isfinite(mod.bench_config("smoke rbg", 0.2, "unsafe_rbg",
                                          batch=4))


def test_bench_decode_main():
    mod = _load("bench_decode")
    argv = sys.argv
    sys.argv = ["bench_decode", "--batch", "2", "--blocks", "2",
                "--beams", "3", "--iters", "1"]
    try:
        mod.main()
    finally:
        sys.argv = argv


def test_bench_moe_ab_configs():
    mod = _load("bench_moe_ab")
    _shrink(mod, BLOCKS=2)
    assert math.isfinite(mod.bench_config("smoke jnp", "jnp", batch=4))
    assert math.isfinite(mod.bench_config("smoke pallas", "pallas_interpret",
                                          batch=4))
