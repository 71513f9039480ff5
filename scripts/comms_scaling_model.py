#!/usr/bin/env python
"""Multi-host scaling projection from the compiled HLO (docs/comms.md).

Compiles the REAL flagship-dims train step (hidden 256, 8 layers, 6 experts,
S=505) on an 8-virtual-device {data: 4, model: 2} CPU mesh, sums the
per-micro-step collective traffic by class, and projects data-parallel
scaling efficiency on v5e ICI from the measured single-chip step time.

Parameter-gradient all-reduce bytes are exact at any micro batch (they depend
only on model dims); activation-scale collectives are measured at the real
micro batch 64 / S 505.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       PYTHONPATH=/root/repo:/root/.axon_site python scripts/comms_scaling_model.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tests.test_comms_audit import _collectives

# measured single-chip flagship recipe (docs/benchmarks.md, shipped recipe)
MEASURED_MS_PER_MICRO_STEP = 60.7  # 1054 seq/s at micro 64
# v5e: 4 ICI links/chip at ~186 GB/s is the marketing aggregate; the
# conservative per-direction ring bandwidth for one all-reduce is ~45 GB/s
ICI_RING_GBPS = 45.0


def main():
    from __graft_entry__ import _flagship_config, _make_batch
    from gamer_tpu.core.mesh import MeshContext, default_mesh, pad_to_multiple
    from gamer_tpu.models.generative.qwen_family import (
        QwenFamilyModel, prepare_train_inputs)
    from gamer_tpu.tasks.train_smb_decoder import make_loss_fn
    from gamer_tpu.train.loop import Trainer, TrainLoopConfig
    from gamer_tpu.train.state import OptimizerConfig

    def audit(data_ax, model_ax):
        ctx = MeshContext(default_mesh(data=data_ax, model=model_ax))
        cfg = _flagship_config()
        cfg = cfg.replace(dtype="bfloat16",
                          padded_vocab_size=pad_to_multiple(cfg.vocab_size, 256))
        model = QwenFamilyModel(cfg)
        batch = _make_batch(cfg, batch_size=64, blocks=101)  # S=505, micro 64
        variables = model.init(jax.random.PRNGKey(0),
                               **prepare_train_inputs(cfg, batch))
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(variables))
        trainer = Trainer(loss_fn=make_loss_fn(model, cfg), params=variables,
                          opt_cfg=OptimizerConfig(total_steps=100),
                          loop_cfg=TrainLoopConfig(
                              epochs=1, save_checkpoints=False,
                              gradient_accumulation_steps=16),
                          mesh_ctx=ctx, output_dir=None)
        sharded = ctx.shard_batch(batch)
        hlo = trainer._train_step.lower(
            trainer.state, sharded, trainer.base_rng).compile().as_text()
        coll = _collectives(hlo)
        ar = sum(b for op, b, _, _ in coll if op == "all-reduce")
        cp = sum(b for op, b, _, _ in coll if op == "collective-permute")
        ag = sum(b for op, b, _, _ in coll if op == "all-gather")
        total = ar + cp + ag
        print(f"\nmesh {{data:{data_ax}, model:{model_ax}}} — params "
              f"{n_params / 1e6:.2f}M ({4 * n_params / 1e6:.1f} MB fp32 grads), "
              f"per-micro-step collectives (micro 64, S 505):")
        print(f"  all-reduce          {ar / 1e6:8.2f} MB")
        print(f"  collective-permute  {cp / 1e6:8.2f} MB")
        print(f"  all-gather          {ag / 1e6:8.2f} MB")
        print(f"  total               {total / 1e6:8.2f} MB")
        # ring all-reduce moves 2*(N-1)/N * bytes per chip; overlap ignored
        # (conservative: XLA overlaps backward collectives with compute)
        for n in (4, 8, 16, 64, 256):
            wire = 2 * (n - 1) / n * total
            t_comm_ms = wire / (ICI_RING_GBPS * 1e9) * 1e3
            eff = MEASURED_MS_PER_MICRO_STEP / (MEASURED_MS_PER_MICRO_STEP + t_comm_ms)
            print(f"  N={n:3d} chips: comm {t_comm_ms:6.2f} ms/micro-step "
                  f"-> projected efficiency {eff * 100:5.1f}%")

    audit(8, 1)  # pure data-parallel: the shipping mode at flagship scale
    audit(4, 2)  # data x model: the big-vocab / big-expert-table regime


if __name__ == "__main__":
    main()
