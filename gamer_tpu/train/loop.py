"""Generic training loop.

TPU-native replacement for the reference's three trainer stacks (HF `Trainer`,
SeqRec/trainers/RQVAE.py, SeqRec/trainers/SMBRec.py): one loop with
 * a jitted, mesh-sharded train step (data-parallel gradients via XLA psum —
   no DDP wrapper, no NCCL; SURVEY.md section 2.9),
 * per-epoch eval, best-metric checkpointing and early stopping with patience
   (ref: train_SMB_decoder.py:430-440, trainers/SMBRec.py:152-175),
 * gradient accumulation via optax.MultiSteps
   (ref: train_SMB_decoder.py:50-55),
 * JSONL metric stream (core/metrics.py) standing in for wandb.

The loop is model-agnostic: it consumes `loss_fn(params, batch, rng) ->
(loss, aux)` so generative, discriminative and RQ-VAE training all reuse it.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gamer_tpu.core.checkpoint import CheckpointManager
from gamer_tpu.core.config import Config
from gamer_tpu.core.logging import get_logger
from gamer_tpu.core.mesh import MeshContext
from gamer_tpu.core.metrics import MetricWriter
from gamer_tpu.train.state import OptimizerConfig, TrainState, make_optimizer

logger = get_logger("train")


class TrainLoopConfig(Config):
    epochs: int = 200
    patience: int = 20  # early-stop after N evals without improvement (<=0: off)
    # "epoch": eval/save at epoch boundaries every eval_every_epochs.
    # "steps": eval/save every eval_every_steps optimizer-UPDATE steps
    # (micro-steps / gradient_accumulation_steps), mid-epoch — the HF
    # save_and_eval_strategy pair (ref train_SMB_decoder.py:409-421).
    eval_strategy: str = "epoch"
    eval_every_epochs: int = 1
    eval_every_steps: int = 2000
    eval_delay: int = 0  # skip evals before this epoch (epoch mode) / update step
    log_every_steps: int = 50
    gradient_accumulation_steps: int = 1
    metric_mode: str = "min"  # "min" (valid loss) or "max" (ranking metric)
    seed: int = 42
    save_checkpoints: bool = True
    # periodic per-epoch snapshots, keeping the newest N
    # (ref HF Trainer save_total_limit=2, train_SMB_decoder.py:413-418)
    snapshot_every_epochs: int = 0  # 0 = off
    snapshot_limit: int = 2
    resume: bool = False  # restore the full train state from "last_state"


class Trainer:
    def __init__(
        self,
        loss_fn: Callable[[Any, dict, jax.Array], tuple[jnp.ndarray, dict]],
        params: Any,
        opt_cfg: OptimizerConfig,
        loop_cfg: TrainLoopConfig,
        mesh_ctx: MeshContext | None = None,
        output_dir: str | None = None,
        metric_writer: MetricWriter | None = None,
        eval_fn: Callable[[Any], tuple[float, dict]] | None = None,
        eval_loss_fn: Callable[[Any, dict, jax.Array], tuple[jnp.ndarray, dict]] | None = None,
    ):
        self.loss_fn = loss_fn
        # eval variant of the loss (dropout off). Early stopping and best-
        # checkpoint selection must not be driven by dropout-noised loss
        # (ref HF Trainer evals in model.eval() mode).
        self.eval_loss_fn = eval_loss_fn or loss_fn
        self.opt_cfg = opt_cfg
        self.cfg = loop_cfg
        self.ctx = mesh_ctx or MeshContext()
        self.writer = metric_writer
        self.eval_fn = eval_fn  # optional custom eval: params -> (metric, extras)
        self.ckpt = CheckpointManager(output_dir) if (output_dir and loop_cfg.save_checkpoints) else None

        tx = make_optimizer(opt_cfg)
        if loop_cfg.gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, loop_cfg.gradient_accumulation_steps)
        self.tx = tx

        params = self.ctx.shard_params(params)
        self.state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                opt_state=tx.init(params))
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        # Dropout keys use the rbg generator: threefry key derivation costs
        # ~24% of the flagship step on TPU (measured, docs/benchmarks.md
        # "Dropout path"), rbg ~8%. Dropout needs no cryptographic stream
        # quality; loss math is unchanged, only mask sampling.
        self.base_rng = jax.random.key(loop_cfg.seed, impl="unsafe_rbg")

    # ------------------------------------------------------------------ steps

    def _build_train_step(self):
        def step(state: TrainState, batch: dict, rng: jax.Array):
            rng = jax.random.fold_in(rng, state.step)

            def lfn(params):
                return self.loss_fn(params, batch, rng)

            (loss, aux), grads = jax.value_and_grad(lfn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
            return new_state, loss, aux

        return jax.jit(step, donate_argnums=(0,))

    def _build_eval_step(self):
        def step(params: Any, batch: dict):
            loss, aux = self.eval_loss_fn(params, batch, jax.random.PRNGKey(0))
            return loss, aux

        return jax.jit(step)

    # ------------------------------------------------------------------ loops

    def evaluate(self, batches: Iterable[dict]) -> float:
        """Global mean loss over batches.

        Batch means are re-weighted by the loss's own denominator (aux
        "denom": valid-target count) when the loss provides it, so the result
        equals a single global token mean and is invariant to batch-size
        re-chunking; otherwise falls back to valid-row weighting.

        Accumulates ON DEVICE and host-syncs once at the end: a float() per
        batch is a blocking tunnel round-trip, and at ~1k eval batches those
        syncs dominated eval wall time (and stretched 10x under host CPU
        contention — see CLAUDE.md). Same pattern as the train loop's
        device-side epoch loss.
        """
        total, weight = None, None
        for batch in batches:
            row_w = float(np.asarray(batch.get("row_valid", np.ones(1))).sum())
            batch = self.ctx.shard_batch(batch)
            loss, aux = self._eval_step(self.state.params, batch)
            w = aux["denom"] if "denom" in aux else row_w
            contrib, w = loss * w, w * jnp.ones(())
            total = contrib if total is None else total + contrib
            weight = w if weight is None else weight + w
        if total is None:
            return 0.0
        return float(total) / max(float(weight), 1.0)

    def fit(
        self,
        train_batches: Callable[[int], Iterator[dict]],
        eval_batches: Callable[[], Iterator[dict]] | None = None,
    ) -> dict:
        cfg = self.cfg
        best = np.inf if cfg.metric_mode == "min" else -np.inf
        better = (lambda a, b: a < b) if cfg.metric_mode == "min" else (lambda a, b: a > b)
        evals_since_best = 0
        history = []
        start_epoch = 0
        if cfg.resume and self.ckpt and self.ckpt.exists("last_state"):
            state_np = jax.tree_util.tree_map(np.asarray, self.state)
            restored = self.ckpt.restore("last_state", template=state_np)
            self.state = jax.tree_util.tree_map(jnp.asarray, restored)
            meta = self.ckpt.metadata("last_state") or {}
            start_epoch = int(meta.get("epoch", -1)) + 1
            best = float(meta.get("best", best))
            logger.info("resumed from epoch %d (step %d, best %.4f)",
                        start_epoch, int(self.state.step), best)

        accum = max(cfg.gradient_accumulation_steps, 1)
        # anchor to absolute micro-step count (state.step) so steps-strategy
        # eval/save cadence survives --resume_from_checkpoint unchanged
        micro_steps_total = int(self.state.step)
        stop = False

        def run_eval(epoch: int, epoch_loss: float | None) -> bool:
            """One eval + best-tracking + early-stop check. Returns True to stop."""
            nonlocal best, evals_since_best
            metric = None
            if self.eval_fn is not None:
                metric, extras = self.eval_fn(self.state.params)
                if self.writer:
                    self.writer.log({"eval/metric": metric, **{f"eval/{k}": v for k, v in extras.items()}},
                                    step=int(self.state.step))
            elif eval_batches is not None:
                metric = self.evaluate(eval_batches())
                if self.writer:
                    self.writer.log({"eval/loss": metric}, step=int(self.state.step))
            if metric is None:
                return False
            logger.info("epoch %d: eval metric %.4f (best %.4f)", epoch, metric, best)
            entry = {"epoch": epoch, "eval": metric, "step": int(self.state.step)}
            if epoch_loss is not None:
                entry["train_loss"] = epoch_loss
            history.append(entry)
            if better(metric, best):
                best = metric
                evals_since_best = 0
                if self.ckpt:
                    self.ckpt.save("best", self.state.params,
                                   {"epoch": epoch, "metric": float(metric),
                                    "step": int(self.state.step)})
            else:
                evals_since_best += 1
                if cfg.patience > 0 and evals_since_best >= cfg.patience:
                    logger.info("early stopping at epoch %d", epoch)
                    return True
            if self.ckpt and cfg.eval_strategy == "steps":
                self.ckpt.save("last_state", self.state,
                               {"epoch": epoch, "best": float(best),
                                "step": int(self.state.step)})
            return False

        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            n_steps, loss_acc = 0, None
            for batch in train_batches(epoch):
                batch = self.ctx.shard_batch(batch)
                self.state, loss, aux = self._train_step(self.state, batch, self.base_rng)
                # accumulate ON DEVICE: float(loss) here is a host sync every
                # micro-step — through the TPU tunnel that serializes dispatch
                # and dominates wall time (CLAUDE.md); one transfer per
                # log_every_steps / epoch instead
                loss_acc = loss if loss_acc is None else loss_acc + loss
                n_steps += 1
                micro_steps_total += 1
                if self.writer and n_steps % cfg.log_every_steps == 0:
                    self.writer.log({"train/loss": float(loss), "epoch": epoch},
                                    step=int(self.state.step))
                if (cfg.eval_strategy == "steps"
                        and micro_steps_total % (cfg.eval_every_steps * accum) == 0
                        and micro_steps_total // accum >= cfg.eval_delay):
                    stop = run_eval(epoch, None)
                    if stop:
                        break
            if stop:
                break
            epoch_loss = float(loss_acc) / max(n_steps, 1) if n_steps else 0.0
            dt = time.time() - t0
            logger.info("epoch %d: train loss %.4f (%d steps, %.1fs)", epoch, epoch_loss, n_steps, dt)

            if (cfg.eval_strategy == "epoch"
                    and (epoch + 1) % cfg.eval_every_epochs == 0
                    and epoch >= cfg.eval_delay):
                if run_eval(epoch, epoch_loss):
                    break
            if self.ckpt:
                if cfg.snapshot_every_epochs > 0 and (epoch + 1) % cfg.snapshot_every_epochs == 0:
                    self.ckpt.save(f"epoch_{epoch}", self.state.params, {"epoch": epoch})
                    self._prune_snapshots(cfg.snapshot_limit)
                self.ckpt.save("last_state", self.state,
                               {"epoch": epoch, "best": float(best),
                                "step": int(self.state.step)})
        if self.ckpt:
            self.ckpt.save("last", self.state.params, {"step": int(self.state.step)})
        return {"best_metric": float(best), "history": history,
                "steps": int(self.state.step)}

    # --------------------------------------------------------------- restore

    def _prune_snapshots(self, limit: int) -> None:
        import os
        import re
        import shutil

        snaps = []
        for name in os.listdir(self.ckpt.directory):
            m = re.fullmatch(r"epoch_(\d+)", name)
            if m:
                snaps.append((int(m.group(1)), name))
        for _, name in sorted(snaps)[:-limit] if limit > 0 else []:
            shutil.rmtree(os.path.join(self.ckpt.directory, name), ignore_errors=True)
            meta = os.path.join(self.ckpt.directory, name + ".meta.json")
            if os.path.exists(meta):
                os.remove(meta)

    def best_params(self) -> Any:
        if self.ckpt and self.ckpt.exists("best"):
            return self.ckpt.restore("best", template=jax.tree_util.tree_map(np.asarray, self.state.params))
        return self.state.params
