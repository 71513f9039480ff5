#!/usr/bin/env python
"""CLI entry: one subcommand per task (parity with the reference's main.py:11-46)."""

import argparse
import os
import sys


def _apply_platform_env():
    """Honor JAX_PLATFORMS before backend init: the axon TPU plugin in this
    image ignores the env var, but jax.config.update (pre-first-use) works."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def _enable_compilation_cache():
    """Persistent XLA compilation cache: quality/perf pipelines launch many
    processes with identical jit geometries (ablation arms, resume retries),
    and first compiles through the TPU tunnel cost minutes each. Keyed by HLO
    hash, so code changes miss naturally; JAX logs and continues if the
    backend can't serialize executables. GAMER_COMPILATION_CACHE=0 disables."""
    cache = os.environ.get("GAMER_COMPILATION_CACHE",
                           os.path.expanduser("~/.cache/gamer_tpu_xla"))
    if cache in ("0", ""):
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    # only persist compiles that are actually expensive
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main(argv=None):
    _apply_platform_env()
    _enable_compilation_cache()
    # multi-host bootstrap (no-op unless GAMER_COORDINATOR/GAMER_DISTRIBUTED
    # is set; ref: torchrun env:// rendezvous, SeqRec/tasks/multi_gpu.py:41-53)
    from gamer_tpu.core import distributed

    distributed.maybe_initialize()
    from gamer_tpu.tasks import task_list

    parser = argparse.ArgumentParser("gamer_tpu", description="TPU-native GAMER framework")
    sub = parser.add_subparsers(dest="task", required=True)
    for name, cls in task_list.items():
        cls.add_parser(sub)
    args = parser.parse_args(argv)
    task_cls = task_list[args.task]
    kwargs = vars(args)
    kwargs.pop("task")
    return task_cls().invoke(**kwargs)


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
