"""Multi-process (multi-host) runtime bootstrap.

TPU-native counterpart of the reference's torchrun/NCCL rendezvous
(ref: SeqRec/tasks/multi_gpu.py:41-71 — env:// init_process_group at :53,
rank/world from torchrun env, per-rank device binding, rank-0 gating).

On TPU pods each host runs one process; `jax.distributed.initialize()` wires
the cluster so `jax.devices()` is the GLOBAL device list while
`jax.local_devices()` is this host's chips. All model/grad communication still
rides XLA collectives inserted by shardings (core/mesh.py) — this module only
provides process bootstrap, data sharding across processes, and rank helpers.

Rendezvous config, in precedence order:
 1. explicit kwargs to `maybe_initialize`
 2. GAMER_COORDINATOR / GAMER_NUM_PROCESSES / GAMER_PROCESS_ID env vars
    (the torchrun MASTER_ADDR/WORLD_SIZE/RANK analog)
 3. native TPU-pod auto-detection (jax.distributed.initialize with no args)
    when GAMER_DISTRIBUTED=1

With none of these set, the session is single-process and this is a no-op —
the same code path runs from 1 chip to a pod slice.
"""

from __future__ import annotations

import os
from typing import Sequence

from gamer_tpu.core.logging import get_logger

logger = get_logger("distributed")

_initialized = False


def maybe_initialize(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids: Sequence[int] | None = None) -> bool:
    """Initialize the multi-process runtime if configured; idempotent.

    Returns True when running multi-process (after initialization).
    """
    global _initialized

    if _initialized:
        import jax

        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get("GAMER_COORDINATOR")
    env_np = os.environ.get("GAMER_NUM_PROCESSES")
    env_pid = os.environ.get("GAMER_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    if coordinator_address is not None:
        import jax

        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids)
        _initialized = True
        logger.info("distributed: process %d/%d via %s (%d global devices)",
                    jax.process_index(), jax.process_count(),
                    coordinator_address, jax.device_count())
        return True
    if os.environ.get("GAMER_DISTRIBUTED") == "1":
        # TPU-pod auto-detection: coordinator/rank resolved from the metadata
        # server / TPU env (jax's built-in cluster detection)
        import jax

        jax.distributed.initialize()
        _initialized = True
        logger.info("distributed: auto-initialized process %d/%d (%d devices)",
                    jax.process_index(), jax.process_count(), jax.device_count())
        return True
    # unconfigured = single-process by definition. Do NOT query
    # jax.process_count() here: that would initialize the backend (and open a
    # TPU client) on every CLI invocation, even `main.py --help` — hazardous
    # on single-tenant chips.
    return False


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return process_index() == 0


def shard_examples(examples, index: int | None = None, count: int | None = None):
    """This process's stride-shard of an example list, truncated to the common
    per-process length so every process runs the same number of steps
    (the training analog of eval's example striding,
    ref: DistributedSampler in SeqRec/tasks/test_SMB_decoder.py:434-438).
    """
    idx = process_index() if index is None else index
    cnt = process_count() if count is None else count
    if cnt <= 1:
        return examples
    per = len(examples) // cnt
    return examples[idx::cnt][:per]
