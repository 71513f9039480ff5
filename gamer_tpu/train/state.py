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
    optim: str = "adamw"  # adamw | adam | sgd | adagrad | rmsprop
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


def schedule_horizon(n_examples: int, micro: int, accum: int, epochs: int) -> int:
    """Total OPTIMIZER UPDATES for the LR schedule.

    optax.MultiSteps advances the inner schedule once per accumulation cycle
    (pinned by tests/test_train_eval.py), matching HF Trainer's update-step
    max_steps — a micro-step horizon would stretch warmup and truncate the
    cosine by the accumulation factor.
    """
    return max(n_examples // (micro * max(accum, 1)), 1) * epochs


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
    """Optimizer family selected by cfg.optim (ref SMBRec.py:46-76 offers
    adam/sgd/adagrad/rmsprop/adamw; RQVAE.py --learner; HF "adamw_torch").

    adamw decouples the decay (torch.AdamW); the others add L2 decay to the
    gradient before the moment updates, matching torch's coupled weight_decay.
    """
    schedule = make_schedule(cfg)
    # no weight decay on norms / biases / embeddings scales (standard practice;
    # HF AdamW decays everything except bias/LayerNorm — match that). Only the
    # trainable "params" collection decays: variables trees may also carry
    # batch_stats (RQVAE --bn), which must never be decayed.
    def decay_mask(params):
        def keep(path, _):
            parts = [str(getattr(k, "key", k)) for k in path]
            if "batch_stats" in parts:
                return False
            name = "/".join(parts)
            return not (name.endswith("scale") or name.endswith("bias"))
        return jax.tree_util.tree_map_with_path(keep, params)

    optim = cfg.optim.lower().replace("_torch", "")
    chain = []
    if cfg.max_grad_norm and cfg.max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    if optim == "adamw":
        chain.append(optax.adamw(
            schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay, mask=decay_mask))
        return optax.chain(*chain)
    if cfg.weight_decay and optim in ("adam", "sgd", "adagrad", "rmsprop"):
        chain.append(optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask))
    if optim == "adam":
        chain.append(optax.adam(schedule, b1=cfg.adam_b1, b2=cfg.adam_b2,
                                eps=cfg.adam_eps))
    elif optim == "sgd":
        chain.append(optax.sgd(schedule))
    elif optim == "adagrad":
        chain.append(optax.adagrad(schedule))
    elif optim == "rmsprop":
        chain.append(optax.rmsprop(schedule))
    else:
        # ref SMBRec.py:71-75: warn and fall back to Adam without decay
        import logging

        logging.getLogger("gamer_tpu.train").warning(
            "unrecognized optimizer %r; using adam", cfg.optim)
        chain.append(optax.adam(schedule))
    return optax.chain(*chain)
