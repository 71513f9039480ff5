"""Subprocess worker for the multi-host integration test (test_multihost.py).

Runs a few deterministic train steps + an eval of a tiny Qwen3Multi through
the real Trainer/MeshContext stack. In multi-process mode (GAMER_COORDINATOR
set) each process holds only its stride-shard of the data and the global batch
is assembled by MeshContext.shard_batch via make_array_from_process_local_data;
in single-process mode the same global batches are fed whole. Process 0 writes
{"train_losses": [...], "eval_loss": ...} to $MP_OUT — the test asserts the two
modes produce the same numbers (multi-host data plane correctness).
"""

import json
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(os.environ.get("MP_LOCAL_DEVICES", "2")))
if os.environ.get("GAMER_COORDINATOR"):
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np

from gamer_tpu.core import distributed
from gamer_tpu.core.mesh import MeshContext
from gamer_tpu.models.generative.qwen_family import (
    QwenFamilyModel, build_config, prepare_train_inputs)
from gamer_tpu.tasks.train_smb_decoder import make_loss_fn
from gamer_tpu.train.loop import Trainer, TrainLoopConfig
from gamer_tpu.train.state import OptimizerConfig

N_ROWS, GLOBAL_BATCH, STEPS = 16, 8, 4


def global_rows(cfg, blocks=4, seed=7):
    """Deterministic global example arrays — identical on every process."""
    P = cfg.num_positions
    S = blocks * P
    rng = np.random.default_rng(seed)
    ids = rng.integers(16, cfg.vocab_size, (N_ROWS, S)).astype(np.int32)
    ids[:, ::P] = rng.integers(14, 14 + cfg.num_behavior, (N_ROWS, blocks))
    sessions = np.repeat(rng.integers(0, 3, (N_ROWS, blocks)), P, axis=1)
    sessions.sort(axis=1)
    actions = np.repeat(rng.integers(1, 4, (N_ROWS, blocks)), P, axis=1)
    esid = np.arange(S, dtype=np.int32)[None].repeat(N_ROWS, 0)
    return {
        "input_ids": ids,
        "attention_mask": np.ones((N_ROWS, S), np.int32),
        "session_ids": sessions.astype(np.int32),
        "actions": actions.astype(np.int32),
        "extended_session_ids": esid,
        "labels": ids.copy(),
        "row_valid": np.ones(N_ROWS, np.int32),
    }


def main():
    distributed.maybe_initialize()
    rank, pc = distributed.process_index(), distributed.process_count()

    cfg = build_config(
        "Qwen3Multi", vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=48, dropout_rate=0.0, num_positions=3, num_experts=4,
        num_behavior=2, behavior_embedding_dim=8, behavior_base=14,
        model_max_length=64, behavior_injection_layers=[])
    model = QwenFamilyModel(cfg)
    rows = global_rows(cfg)

    def batch_at(step):
        sl = slice((step * GLOBAL_BATCH) % N_ROWS,
                   (step * GLOBAL_BATCH) % N_ROWS + GLOBAL_BATCH)
        g = {k: v[sl] for k, v in rows.items()}
        # this process's stride-shard of the global batch
        return {k: v[rank::pc] for k, v in g.items()}

    params = model.init(jax.random.PRNGKey(0),
                        **prepare_train_inputs(cfg, batch_at(0)))
    trainer = Trainer(
        loss_fn=make_loss_fn(model, cfg),
        eval_loss_fn=make_loss_fn(model, cfg, deterministic=True),
        params=params,
        opt_cfg=OptimizerConfig(learning_rate=1e-3, total_steps=STEPS),
        loop_cfg=TrainLoopConfig(epochs=1, seed=0, save_checkpoints=False),
        mesh_ctx=MeshContext())

    losses = []
    for step in range(STEPS):
        b = trainer.ctx.shard_batch(batch_at(step))
        trainer.state, loss, _ = trainer._train_step(trainer.state, b,
                                                     trainer.base_rng)
        losses.append(float(loss))
    eval_loss = trainer.evaluate(batch_at(s) for s in range(2))

    if rank == 0:
        with open(os.environ["MP_OUT"], "w") as f:
            json.dump({"train_losses": losses, "eval_loss": eval_loss,
                       "process_count": pc,
                       "device_count": jax.device_count()}, f)


if __name__ == "__main__":
    main()
