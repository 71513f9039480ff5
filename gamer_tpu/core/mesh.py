"""Device mesh + sharding utilities.

TPU-native replacement for the reference's NCCL/DDP distributed layer
(ref: SeqRec/tasks/multi_gpu.py:10-71, dist.init_process_group at :53).
Instead of per-process replicas with gradient all-reduce, we build one
`jax.sharding.Mesh` with axes:

  data   — data parallelism (gradient psum inserted by XLA via shardings)
  model  — tensor/expert/table parallelism: MoE experts, item & codebook
           embedding tables are row-sharded here (capabilities the
           reference does not have; SURVEY.md section 2.9)

All collectives ride XLA (psum / all_gather / reduce_scatter) on ICI —
there is no hand-written NCCL analog anywhere in this codebase.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def default_mesh(data: int | None = None, model: int = 1, devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a (data, model) mesh from available devices.

    With `data=None` the data axis absorbs all remaining devices. On a single
    chip this is a 1x1 mesh, making every sharding a no-op — the same code path
    runs from 1 chip to a full pod slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


@dataclass
class ShardingRules:
    """Regex-on-param-path → PartitionSpec rules.

    Params whose flattened path (`"a/b/kernel"`) matches a rule are sharded
    with the paired spec; unmatched params are replicated. First match wins.
    """

    rules: Sequence[tuple[str, P]] = field(default_factory=list)

    def spec_for(self, path: str) -> P:
        for pattern, spec in self.rules:
            if re.search(pattern, path):
                return spec
        return P()


# Default rules for the model zoo:
#  - stacked MoE expert kernels (leading experts axis) -> expert parallelism
#  - large vocab/item embedding tables -> row-sharded on the model axis
DEFAULT_RULES = ShardingRules(
    rules=[
        # stacked MoE expert weights [E, d_in, d_ff] (modules/moe.py) -> EP
        (r"experts_(gate|up|down|wi|wo)$", P(MODEL_AXIS)),
        # vocab / item / codebook tables -> row-sharded
        (r"(embed_tokens|item_embedding|shared|item_m|item_c)/(emb/)?embedding$", P(MODEL_AXIS)),
        (r"codebooks$", P(None, MODEL_AXIS)),
        (r"lm_head/kernel$", P(None, MODEL_AXIS)),
    ]
)


class MeshContext:
    """Carries the mesh plus input/param sharding helpers through a task."""

    def __init__(self, mesh: Mesh | None = None, rules: ShardingRules | None = None):
        self.mesh = mesh if mesh is not None else default_mesh()
        self.rules = rules if rules is not None else DEFAULT_RULES

    @property
    def n_data(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def n_model(self) -> int:
        return self.mesh.shape[MODEL_AXIS]

    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(DATA_AXIS))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def shard_batch(self, batch: Any) -> Any:
        """Place a host batch pytree onto the mesh, split along the data axis.

        Single-process: the batch is the global batch; device_put splits it.
        Multi-process (multi-host): the batch is this PROCESS's shard of the
        global batch (see core/distributed.shard_examples); global arrays are
        assembled from per-process shards without any cross-host copy of the
        full batch (the reference has no analog — its DDP feeds full per-rank
        batches, SeqRec/tasks/multi_gpu.py).
        """
        sh = self.batch_sharding()
        rep = self.replicated()
        pc = jax.process_count()

        if pc == 1:
            def put(x):
                x = np.asarray(x)
                if x.ndim >= 1 and x.shape[0] % self.n_data == 0:
                    return jax.device_put(x, sh)
                return jax.device_put(x, rep)
        else:
            def put(x):
                x = np.asarray(x)
                # local rows * process_count = global batch; it must split
                # over the data axis (which spans all processes' devices)
                if x.ndim >= 1 and (x.shape[0] * pc) % self.n_data == 0:
                    return jax.make_array_from_process_local_data(sh, x)
                if x.ndim >= 1:
                    # Replicating here would assemble a "global replicated"
                    # array from per-process-local values that differ across
                    # processes — silently inconsistent. Fail loudly instead.
                    raise ValueError(
                        f"multi-process batch leaf shape {x.shape}: global rows "
                        f"{x.shape[0] * pc} not divisible by data axis "
                        f"{self.n_data}; pad the batch (see local_batch_size)")
                return jax.make_array_from_process_local_data(rep, x)

        return jax.tree_util.tree_map(put, batch)

    def param_shardings(self, params: Any) -> Any:
        """Compute a NamedSharding tree for a parameter pytree via the rules."""
        flat, treedef = jax.tree_util.tree_flatten_with_path(params)
        shardings = []
        for path, leaf in flat:
            path_str = "/".join(_key_str(k) for k in path)
            spec = self.rules.spec_for(path_str)
            spec = _fit_spec(spec, np.shape(leaf), self.mesh, path_str)
            shardings.append(NamedSharding(self.mesh, spec))
        return jax.tree_util.tree_unflatten(treedef, shardings)

    def shard_params(self, params: Any) -> Any:
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), params, self.param_shardings(params)
        )


def _key_str(k: Any) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    if hasattr(k, "name"):
        return str(k.name)
    return str(k)


def _fit_spec(spec: P, shape: tuple, mesh: Mesh, path: str = "") -> P:
    """Drop trailing spec axes beyond the array rank; replicate any dimension
    whose mesh-axis size doesn't divide it (e.g. odd vocab on a 2-way axis).

    Replication is a fallback, not a policy: it is logged loudly so an
    indivisible table is never *silently* replicated — pad the dimension
    (e.g. vocab via `pad_to_multiple`) to get the sharding the rules ask for.
    """
    parts = list(spec)[: len(shape)]
    fitted = []
    for dim, axis in zip(shape, parts + [None] * (len(shape) - len(parts))):
        if axis is None:
            fitted.append(None)
        else:
            size = mesh.shape[axis]
            if dim % size == 0:
                fitted.append(axis)
            else:
                if size > 1:
                    from gamer_tpu.core.logging import get_logger

                    get_logger("mesh").warning(
                        "replicating %s dim %d (not divisible by %s=%d) — "
                        "pad it to shard as ruled", path or "param", dim, axis, size)
                fitted.append(None)
    while fitted and fitted[-1] is None:
        fitted.pop()
    return P(*fitted) if fitted else P()


def pad_to_multiple(n: int, multiple: int) -> int:
    """Round n up to a multiple (vocab/table padding for clean sharding +
    MXU-friendly lane tiling)."""
    return ((n + multiple - 1) // multiple) * multiple


def local_batch_size(global_batch: int, ctx: MeshContext) -> int:
    if global_batch % ctx.n_data != 0:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {ctx.n_data}")
    return global_batch // ctx.n_data
