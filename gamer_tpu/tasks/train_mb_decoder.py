"""train_MB_decoder — multi-behavior (non-session) generative training.

TPU-native counterpart of the reference task (ref: SeqRec/tasks/train_MB_decoder.py):
MB dataset with behavior tokens (+ optional `filter_target` that drops
lower-level duplicates of the target from history, ref MB_dataset.py:107-110),
ForDecoder augmentation, behavior tokens masked from the loss.
"""

from __future__ import annotations

import os

from gamer_tpu.core.logging import get_logger
from gamer_tpu.core.mesh import MeshContext
from gamer_tpu.core.metrics import MetricWriter
from gamer_tpu.core.registry import TASKS
from gamer_tpu.data.batching import DecoderBatcher, EncDecBatcher, iterate_batches
from gamer_tpu.data.contract import DataFiles
from gamer_tpu.data.seq import MBExampleBuilder, SeqCorpus
from gamer_tpu.data.smb import TokenLayout
from gamer_tpu.data.vocab import EOS_ID
from gamer_tpu.models.generative.encdec_utils import encdec_loss_fn, prepare_encdec_inputs
from gamer_tpu.models.generative.qwen_family import prepare_train_inputs
from gamer_tpu.tasks.base import (
    Task, add_dataset_args, add_global_args, add_hf_train_args,
    add_ref_compat_args, resolve_hf_train_args)
from gamer_tpu.tasks.train_decoder import ENCDEC_BACKBONES, build_seq_model
from gamer_tpu.tasks.train_smb_decoder import _lcm, make_loss_fn
from gamer_tpu.train.loop import Trainer, TrainLoopConfig
from gamer_tpu.train.state import OptimizerConfig, schedule_horizon

logger = get_logger("tasks.train_mb_decoder")


def layout_for_mb_task(task: str) -> TokenLayout:
    t = task.lower()
    if t == "mb":
        return TokenLayout(explicit=False)
    if t.endswith("_back"):
        return TokenLayout(explicit=True, behavior_first=False)
    return TokenLayout(explicit=True, behavior_first=True)


def load_mb_train(dataset, data_path, max_his_len, index_file, tasks, filter_target):
    """ref loading_MB.py:18-69: mb | mb_explicit | mb_explicit_back |
    mb_explicit_decoder[_N]."""
    task_list = tasks.split(",")
    corpus = SeqCorpus(DataFiles(data_path, dataset), index_file, multi_behavior=True)
    layout = layout_for_mb_task(task_list[0])
    train = []
    for task in task_list:
        t = task.lower()
        builder = MBExampleBuilder(corpus, layout, max_his_len, filter_target)
        if t in ("mb", "mb_explicit", "mb_explicit_back"):
            train.extend(builder.build("train"))
        elif t.startswith("mb_explicit_decoder"):
            augment = None if t == "mb_explicit_decoder" else int(t.split("_")[3])
            train.extend(builder.build_decoder_train(augment=augment))
        else:
            raise NotImplementedError(f"unknown MB train task {task!r}")
    valid = MBExampleBuilder(corpus, layout, max_his_len, filter_target).build("valid")
    return corpus, layout, train, valid


@TASKS.register("train_MB_decoder")
class TrainMBDecoder(Task):
    name = "train_MB_decoder"
    help = "Train a multi-behavior generative decoder."

    @classmethod
    def add_args(cls, parser):
        add_global_args(parser)
        add_dataset_args(parser)
        g = parser.add_argument_group("training")
        g.add_argument("--epochs", type=int, default=200)
        g.add_argument("--batch_size", type=int, default=256)
        g.add_argument("--learning_rate", "--lr", type=float, default=5e-4)
        g.add_argument("--weight_decay", type=float, default=0.01)
        g.add_argument("--warmup_ratio", type=float, default=0.04)
        g.add_argument("--temperature", type=float, default=1.0)
        g.add_argument("--patience", type=int, default=20)
        g.add_argument("--filter_target", action="store_true")
        g.add_argument("--model_max_length", type=int, default=1024)
        g.add_argument("--n_layers", type=int, default=0)
        g.add_argument("--hidden_size", type=int, default=0)
        g.add_argument("--lr_scheduler_type", type=str, default="cosine")
        g.add_argument("--resume_from_checkpoint", action="store_true",
                       help="resume params/optimizer/epoch from output_dir")
        g.add_argument("--wandb_run_name", type=str, default=None,
                       help="run name in the metric stream (ref wandb name)")
        add_ref_compat_args(parser, "deepspeed")
        add_hf_train_args(parser)
        return parser

    def run(self, *, dataset, data_path, index_file, max_his_len, tasks, backbone,
            base_model, output_dir, seed, epochs, batch_size, learning_rate,
            weight_decay, warmup_ratio, temperature, patience, filter_target,
            model_max_length, n_layers=0, hidden_size=0,
            lr_scheduler_type="cosine", resume_from_checkpoint=False,
            wandb_run_name=None, **extra):
        hf = resolve_hf_train_args(extra, batch_size=batch_size)
        corpus, layout, train, valid = load_mb_train(
            dataset, data_path, max_his_len, index_file, tasks, filter_target)
        logger.info("mb train=%d valid=%d", len(train), len(valid))
        tc = layout.token_count(corpus.sole_item_len)

        overrides = {"num_positions": tc, "num_experts": tc + 1}
        if n_layers:
            if backbone in ENCDEC_BACKBONES:
                overrides.update(num_layers=n_layers, num_decoder_layers=n_layers)
            else:
                overrides["num_hidden_layers"] = n_layers
        if hidden_size:
            overrides["d_model" if backbone in ENCDEC_BACKBONES else "hidden_size"] = hidden_size
        model, cfg, family = build_seq_model(
            backbone, corpus, temperature, model_max_length, base_model,
            dtype=hf["dtype"] if hf["dtype"] != "auto" else "float32",
            **overrides)

        import jax

        if family == "encdec":
            batcher = EncDecBatcher.for_examples(train + valid, eos_id=EOS_ID)
            loss_fn = encdec_loss_fn(model, cfg)
            eval_loss_fn = encdec_loss_fn(model, cfg, deterministic=True)
            sample = batcher.collate(train[:2])
            params = model.init(jax.random.PRNGKey(seed),
                                **prepare_encdec_inputs(cfg, sample))
        else:
            batcher = DecoderBatcher.for_examples(
                train + valid, pad_multiple=_lcm(tc, 8),
                behavior_token_ids=corpus.vocab.behavior_token_ids)
            loss_fn = make_loss_fn(model, cfg)
            eval_loss_fn = make_loss_fn(model, cfg, deterministic=True)
            sample = batcher.collate(train[:2])
            params = model.init(jax.random.PRNGKey(seed),
                                **prepare_train_inputs(cfg, sample))

        micro, accum = hf["micro"], hf["accum"]
        trainer = Trainer(
            loss_fn=loss_fn, params=params, eval_loss_fn=eval_loss_fn,
            opt_cfg=OptimizerConfig(optim=hf["optim"],
                                    learning_rate=learning_rate,
                                    weight_decay=weight_decay,
                                    warmup_ratio=warmup_ratio,
                                    lr_scheduler_type=lr_scheduler_type,
                                    total_steps=schedule_horizon(
                                        len(train), micro, accum, epochs)),
            loop_cfg=TrainLoopConfig(epochs=epochs, patience=patience, seed=seed,
                                     gradient_accumulation_steps=accum,
                                     resume=resume_from_checkpoint,
                                     **hf["loop_kwargs"]),
            mesh_ctx=MeshContext(), output_dir=output_dir,
            metric_writer=MetricWriter(os.path.join("runs", self.name),
                                       run_name=wandb_run_name,
                                       config=getattr(self, "param_dict", {})))
        # multi-process: each process feeds ITS stride-shard at micro/pc rows
        # per step; shard_batch assembles the global array (core/distributed)
        from gamer_tpu.core import distributed

        pc = distributed.process_count()
        if micro % pc:
            raise ValueError(f"micro batch {micro} not divisible by process_count {pc}")
        ltrain, lvalid = distributed.shard_examples(train), distributed.shard_examples(valid)
        result = trainer.fit(
            lambda epoch: iterate_batches(ltrain, micro // pc, batcher.collate,
                                          shuffle=True, seed=seed + epoch),
            lambda: iterate_batches(lvalid, micro // pc, batcher.collate))
        os.makedirs(output_dir, exist_ok=True)
        cfg.extra["family"] = family
        cfg.extra["behavior_first"] = layout.behavior_first
        cfg.extra["explicit"] = layout.explicit
        cfg.save(output_dir)
        corpus.vocab.save(os.path.join(output_dir, "vocab.json"))
        logger.info("done: best valid loss %.4f", result["best_metric"])
        return result
