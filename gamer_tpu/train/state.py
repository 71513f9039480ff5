"""Train state + optimizer factory.

optax replaces the fused CUDA AdamW the reference inherits from torch/HF
(SURVEY.md section 2.9). Defaults mirror the reference recipe: AdamW lr 5e-4,
cosine schedule with linear warmup ratio, weight decay 0.01
(ref: SeqRec/tasks/train_SMB_decoder.py:39-43,86-88, scripts/train_SMB_decoder.sh:5).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

from gamer_tpu.core.config import Config


class OptimizerConfig(Config):
    learning_rate: float = 5e-4
    lr_scheduler_type: str = "cosine"  # cosine | linear | constant
    warmup_ratio: float = 0.04
    warmup_steps: int = 0
    weight_decay: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    total_steps: int = 10_000


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def make_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    warmup = cfg.warmup_steps or int(cfg.warmup_ratio * cfg.total_steps)
    decay_steps = max(cfg.total_steps - warmup, 1)
    if cfg.lr_scheduler_type == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, warmup, warmup + decay_steps, end_value=0.0)
    if cfg.lr_scheduler_type == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, max(warmup, 1)),
             optax.linear_schedule(cfg.learning_rate, 0.0, decay_steps)],
            [warmup])
    return optax.constant_schedule(cfg.learning_rate)


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    schedule = make_schedule(cfg)
    # no weight decay on norms / biases / embeddings scales (standard practice;
    # HF AdamW decays everything except bias/LayerNorm — match that)
    def decay_mask(params):
        def keep(path, _):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            return not (name.endswith("scale") or name.endswith("bias"))
        return jax.tree_util.tree_map_with_path(keep, params)

    chain = []
    if cfg.max_grad_norm and cfg.max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    chain.append(optax.adamw(
        schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
        weight_decay=cfg.weight_decay, mask=decay_mask))
    return optax.chain(*chain)
