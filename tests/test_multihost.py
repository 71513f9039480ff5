"""Multi-host runtime integration: 2 real processes vs 1 process.

Spawns two coordinated CPU processes (jax.distributed + gloo collectives, 2
virtual devices each) training a tiny Qwen3Multi through the real
Trainer/MeshContext stack with per-process data shards, and asserts the
train-loss trajectory and eval loss match a single-process run over the same
global batches. This is the TPU-native analog of the reference's torchrun DDP
path (ref: SeqRec/tasks/multi_gpu.py:41-71) — same math, no NCCL.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from gamer_tpu.core.distributed import shard_examples

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_worker(env_extra, out_path):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.update({"MP_OUT": out_path, "PYTHONPATH": REPO, **env_extra})
    return subprocess.Popen([sys.executable, WORKER], env=env, cwd=REPO,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    multi_out = str(tmp_path / "multi.json")
    single_out = str(tmp_path / "single.json")

    procs = [
        _run_worker({"GAMER_COORDINATOR": f"localhost:{port}",
                     "GAMER_NUM_PROCESSES": "2",
                     "GAMER_PROCESS_ID": str(r),
                     "MP_LOCAL_DEVICES": "2"}, multi_out)
        for r in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode())
        assert p.returncode == 0, f"worker failed:\n{out.decode()[-3000:]}"

    p = _run_worker({"MP_LOCAL_DEVICES": "4"}, single_out)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, f"single worker failed:\n{out.decode()[-3000:]}"

    multi = json.load(open(multi_out))
    single = json.load(open(single_out))
    assert multi["process_count"] == 2 and multi["device_count"] == 4
    assert single["process_count"] == 1 and single["device_count"] == 4
    np.testing.assert_allclose(multi["train_losses"], single["train_losses"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(multi["eval_loss"], single["eval_loss"],
                               rtol=1e-5, atol=1e-5)


def test_shard_examples_stride_and_truncation():
    ex = list(range(10))
    s0 = shard_examples(ex, index=0, count=3)
    s1 = shard_examples(ex, index=1, count=3)
    s2 = shard_examples(ex, index=2, count=3)
    # equal per-process lengths (same step count everywhere)
    assert len(s0) == len(s1) == len(s2) == 3
    # disjoint cover of a prefix of the example set
    assert sorted(s0 + s1 + s2) == sorted(set(s0 + s1 + s2))
    assert shard_examples(ex, index=0, count=1) == ex


def test_maybe_initialize_unconfigured_touches_no_backend():
    """With no rendezvous config, maybe_initialize must return False WITHOUT
    initializing the JAX backend: querying process_count would open a TPU
    client on every CLI invocation (even --help), which wedges a single-tenant
    chip's tunnel if a training process is live."""
    code = (
        "import os\n"
        "for k in ('GAMER_COORDINATOR','GAMER_NUM_PROCESSES',"
        "'GAMER_PROCESS_ID','GAMER_DISTRIBUTED'):\n"
        "    os.environ.pop(k, None)\n"
        "from gamer_tpu.core import distributed\n"
        "assert distributed.maybe_initialize() is False\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, f'backend initialized: {list(xb._backends)}'\n"
        "print('no-backend ok')\n"
    )
    env = {k: v for k, v in os.environ.items()}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=120)
    assert p.returncode == 0 and "no-backend ok" in p.stdout, (
        p.stdout + p.stderr)
