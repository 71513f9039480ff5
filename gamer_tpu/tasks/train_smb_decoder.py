"""train_SMB_decoder — the flagship GAMER training pipeline.

TPU-native counterpart of the reference task (ref: SeqRec/tasks/train_SMB_decoder.py):
backbone dispatch over the Qwen3 family presets, SMB dataset with generative
augmentation, behavior tokens masked from the loss, temperature-scaled CE,
AdamW + cosine + warmup, early stopping on valid loss, best/last checkpoints.

Differences by design (SURVEY.md section 7): no HF Trainer/tokenizer — integer
token streams end-to-end, one jitted mesh-sharded train step, orbax checkpoints.
"""

from __future__ import annotations

import math
import os

import numpy as np

from gamer_tpu.core.logging import get_logger
from gamer_tpu.core.mesh import MeshContext
from gamer_tpu.core.metrics import MetricWriter
from gamer_tpu.core.registry import TASKS
from gamer_tpu.data.batching import DecoderBatcher, iterate_batches
from gamer_tpu.data.loading_smb import load_smb_train
from gamer_tpu.models.generative.qwen_family import (
    QwenFamilyConfig, QwenFamilyModel, build_config, prepare_train_inputs)
from gamer_tpu.modules.losses import causal_lm_loss_with_denom
from gamer_tpu.tasks.base import (
    Task, add_dataset_args, add_global_args, add_hf_train_args,
    add_ref_compat_args, resolve_hf_train_args)
from gamer_tpu.train.loop import Trainer, TrainLoopConfig
from gamer_tpu.train.state import OptimizerConfig, schedule_horizon

logger = get_logger("tasks.train_smb_decoder")


def _lcm(a: int, b: int) -> int:
    return a * b // math.gcd(a, b)


def parse_model_overrides(spec: str | None) -> dict:
    """'k=v,k2=v2' -> dict with JSON-parsed values ('cross_attention_layers=[]'
    -> {'cross_attention_layers': []}); unknown keys fail fast."""
    if not spec:
        return {}
    import json
    import re

    out = {}
    # split on commas not inside [...] so list values survive
    for part in re.split(r",(?![^\[]*\])", spec):
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in QwenFamilyConfig.field_names():
            raise ValueError(f"unknown model override {k!r}")
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def make_model_config(backbone: str, data, base_model: str | None,
                      temperature: float, model_max_length: int,
                      dtype: str = "float32", **overrides) -> QwenFamilyConfig:
    """Derive the model config from the dataset geometry, mirroring the
    config mutation in the reference task (ref train_SMB_decoder.py:275-382:
    vocab resize, num_positions/num_experts/behavior_maps injection)."""
    corpus = data.corpus
    tc = data.builder.tc
    derived = dict(
        vocab_size=corpus.vocab.vocab_size,
        num_positions=tc,
        num_experts=tc + 1,
        num_behavior=len(corpus.behavior_names),
        behavior_base=corpus.vocab.behavior_base,
        model_max_length=model_max_length,
        temperature=temperature,
        dtype=dtype,
    )
    if base_model:
        file_cfg = QwenFamilyConfig.from_file(base_model).to_dict()
        file_cfg.update(derived)
        file_cfg.update(overrides)
        return build_config(backbone, **{k: v for k, v in file_cfg.items()
                                         if k in QwenFamilyConfig.field_names()})
    derived.update(overrides)
    return build_config(backbone, **derived)


def use_fused_ce(cfg: QwenFamilyConfig) -> bool:
    """The fused tied-head CE kernel (ops/pallas_ce.py) applies when the head
    is tied and lane-aligned; "auto" resolves to the kernel on TPU only."""
    import jax

    return (cfg.tie_word_embeddings and cfg.hidden_size % 128 == 0
            and (cfg.ce_impl == "pallas_interpret"
                 or (cfg.ce_impl in ("auto", "pallas")
                     and jax.default_backend() == "tpu")))


def make_loss_fn(model: QwenFamilyModel, cfg: QwenFamilyConfig,
                 deterministic: bool = False):
    """Temperature-scaled causal-LM loss. `deterministic=True` is the eval
    variant: dropout off, no rng consumed (ref evals under model.eval(),
    SeqRec/tasks/train_SMB_decoder.py:395-444). aux carries the valid-target
    count so Trainer.evaluate can form a global token mean."""
    fused = use_fused_ce(cfg)

    def loss_fn(params, batch, rng):
        inputs = prepare_train_inputs(cfg, batch)
        rngs = None if deterministic else {"dropout": rng}
        out = model.apply(params, **inputs, deterministic=deterministic,
                          route_mode="periodic", rngs=rngs,
                          return_hidden=fused)
        if fused:
            from gamer_tpu.modules.losses import (
                fused_causal_lm_loss_with_denom)

            table = params["params"]["embed_tokens"]["embedding"]
            table = table[:cfg.vocab_size].astype(cfg.jax_dtype)
            loss, denom = fused_causal_lm_loss_with_denom(
                out["hidden"], table, batch["labels"], cfg.temperature,
                batch.get("row_valid"),
                interpret=cfg.ce_impl == "pallas_interpret")
        else:
            loss, denom = causal_lm_loss_with_denom(
                out["logits"], batch["labels"], cfg.temperature,
                batch.get("row_valid"))
        return loss, {"denom": denom}
    return loss_fn


@TASKS.register("train_SMB_decoder")
class TrainSMBDecoder(Task):
    name = "train_SMB_decoder"
    help = "Train a session-wise multi-behavior generative decoder."

    @classmethod
    def add_args(cls, parser):
        add_global_args(parser)
        add_dataset_args(parser)
        g = parser.add_argument_group("training")
        g.add_argument("--epochs", type=int, default=200)
        g.add_argument("--batch_size", type=int, default=1024)
        g.add_argument("--micro_batch_size", type=int, default=0,
                       help="per-step batch; 0 = batch_size (grad-accum = batch/micro)")
        g.add_argument("--learning_rate", "--lr", type=float, default=5e-4)
        g.add_argument("--weight_decay", type=float, default=0.01)
        g.add_argument("--warmup_ratio", type=float, default=0.04)
        g.add_argument("--lr_scheduler_type", type=str, default="cosine")
        g.add_argument("--temperature", type=float, default=1.0)
        g.add_argument("--patience", type=int, default=20)
        g.add_argument("--only_train_response", action="store_true")
        g.add_argument("--model_max_length", type=int, default=1024)
        g.add_argument("--dtype", type=str, default="auto",
                       choices=["auto", "float32", "bfloat16"],
                       help="auto = bfloat16 on TPU (the benched config), "
                            "float32 elsewhere")
        g.add_argument("--attention_impl", type=str, default="auto",
                       choices=["auto", "jnp", "pallas"],
                       help="auto = fused Pallas kernel on TPU, jnp elsewhere")
        g.add_argument("--resume_from_checkpoint", action="store_true",
                       help="resume params/optimizer/epoch from output_dir")
        g.add_argument("--save_epochs", type=int, default=0,
                       help="periodic epoch snapshots (keep newest 2)")
        g.add_argument("--profile_dir", type=str, default=None,
                       help="write a jax.profiler trace of a few steps here")
        g.add_argument("--n_layers", type=int, default=0, help="override num layers (0=preset)")
        g.add_argument("--hidden_size", type=int, default=0, help="override hidden size")
        import argparse

        g.add_argument("--gradient_checkpointing",
                       action=argparse.BooleanOptionalAction, default=None,
                       help="remat the layer stack in backward (ref HF "
                            "TrainingArguments gradient_checkpointing). "
                            "Unset = auto: off when the step's estimated HBM "
                            "fits (measured ~40%% faster), attn-remat when it "
                            "doesn't (train/memory.py)")
        g.add_argument("--remat_policy", type=str, default="attn",
                       choices=["full", "attn", "dots"],
                       help="with --gradient_checkpointing: what backward may "
                            "keep (attn = save attention outputs, re-run the rest)")
        g.add_argument("--wandb_run_name", type=str, default=None,
                       help="run name in the metric stream (ref wandb name)")
        g.add_argument("--model_overrides", type=str, default=None,
                       help="comma-separated k=v QwenFamilyConfig overrides "
                            "(values JSON-parsed), e.g. "
                            "cross_attention_layers=[] for the mechanism "
                            "switch ablation; applied after the preset")
        add_ref_compat_args(parser, "deepspeed")
        add_hf_train_args(parser)
        return parser

    def run(self, *, dataset, data_path, tasks, index_file, max_his_len, backbone,
            base_model, output_dir, seed, epochs, batch_size, micro_batch_size,
            learning_rate, weight_decay, warmup_ratio, lr_scheduler_type,
            temperature, patience, only_train_response, model_max_length, dtype,
            n_layers=0, hidden_size=0, mesh_ctx=None, attention_impl="auto",
            resume_from_checkpoint=False, save_epochs=0, profile_dir=None,
            wandb_run_name=None, gradient_checkpointing=None,
            remat_policy="attn", model_overrides=None, **extra):
        data = load_smb_train(dataset, data_path, max_his_len, index_file, tasks)
        corpus, builder = data.corpus, data.builder

        import jax

        hf = resolve_hf_train_args(extra, batch_size=batch_size,
                                   micro_batch_size=micro_batch_size,
                                   dtype=dtype)
        batch_size, dtype = hf["batch_size"], hf["dtype"]
        micro_batch_size = hf["micro"]

        if attention_impl == "auto":
            # the fused pallas kernel wins the honest end-to-end A/B on TPU
            # (808 vs 595 seq/s/chip, docs/benchmarks.md); prepare_train_inputs
            # falls back to jnp masks off-TPU or when S exceeds the kernel limit
            attention_impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
        if dtype == "auto":
            # ship the measured config: bf16 MXU compute on TPU (the bench.py
            # recipe), fp32 on CPU where tests need exact parity
            dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
        # enc-dec backbones on SMB data (ref train_SMB_decoder.py:194-240
        # dispatches TIGER/PBATransformer too)
        from gamer_tpu.tasks.train_decoder import ENCDEC_BACKBONES

        if backbone in ENCDEC_BACKBONES:
            if gradient_checkpointing:
                logger.warning(
                    "--gradient_checkpointing is a qwen-family option; the "
                    "enc-dec backbones train at GAMER context lengths without "
                    "remat (flag ignored)")
            return self._run_encdec(
                data=data, backbone=backbone, base_model=base_model,
                output_dir=output_dir, seed=seed, epochs=epochs,
                batch_size=hf["micro"], accum=hf["accum"], optim=hf["optim"],
                loop_kwargs=hf["loop_kwargs"],
                learning_rate=learning_rate, weight_decay=weight_decay,
                warmup_ratio=warmup_ratio, temperature=temperature,
                patience=patience, n_layers=n_layers, hidden_size=hidden_size,
                resume=resume_from_checkpoint)

        ctx = mesh_ctx or MeshContext()
        overrides = {"attention_impl": attention_impl}
        if gradient_checkpointing:
            overrides["remat"] = True
            overrides["remat_policy"] = remat_policy
        if n_layers:
            overrides["num_hidden_layers"] = n_layers
        if hidden_size:
            overrides["hidden_size"] = hidden_size
        overrides.update(parse_model_overrides(model_overrides))
        cfg = make_model_config(backbone, data, base_model, temperature,
                                model_max_length, dtype, **overrides)
        if ctx.n_model > 1:
            # pad the vocab table so it row-shards evenly on the model axis
            # (and tiles the 128-lane MXU); logits stay [.., vocab_size]
            from gamer_tpu.core.mesh import pad_to_multiple

            cfg = cfg.replace(padded_vocab_size=pad_to_multiple(
                cfg.vocab_size, _lcm(128, ctx.n_model)))
            if cfg.moe_impl == "auto":
                # expert weights row-shard on the model axis; pallas_call has
                # no partitioning rule, so under expert parallelism the fused
                # kernel would force replication — keep XLA's partitioned
                # einsums there (single-chip/DP meshes keep the kernel)
                cfg = cfg.replace(moe_impl="jnp")
        micro, accum = hf["micro"], hf["accum"]
        pad_multiple = _lcm(builder.tc, 8)
        # one sequence length across train+valid so jit compiles once
        batcher = DecoderBatcher.for_examples(
            data.train + data.valid, pad_multiple=pad_multiple,
            behavior_token_ids=corpus.vocab.behavior_token_ids,
            only_train_response=only_train_response)
        if gradient_checkpointing is None and not cfg.remat:
            # no flag given: pick remat from the geometry (off when it fits)
            from gamer_tpu.train.memory import auto_remat_overrides

            cfg = cfg.replace(**auto_remat_overrides(
                cfg, micro // max(ctx.n_data, 1), batcher.seq_len))
        model = QwenFamilyModel(cfg)
        logger.info("model %s: vocab=%d seq_len=%d train=%d valid=%d",
                    backbone, cfg.vocab_size, batcher.seq_len, len(data.train), len(data.valid))

        opt_cfg = OptimizerConfig(
            optim=hf["optim"], learning_rate=learning_rate,
            weight_decay=weight_decay, warmup_ratio=warmup_ratio,
            lr_scheduler_type=lr_scheduler_type,
            total_steps=schedule_horizon(len(data.train), micro, accum, epochs))
        loop_cfg = TrainLoopConfig(epochs=epochs, patience=patience, seed=seed,
                                   gradient_accumulation_steps=accum,
                                   snapshot_every_epochs=save_epochs,
                                   resume=resume_from_checkpoint,
                                   **hf["loop_kwargs"])

        import jax
        sample = batcher.collate(data.train[:micro])
        params = model.init(jax.random.PRNGKey(seed),
                            **prepare_train_inputs(cfg, sample))["params"]
        n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
        logger.info("parameters: %.2fM", n_params / 1e6)

        writer = MetricWriter(os.path.join("runs", self.name),
                              run_name=wandb_run_name or f"{dataset}-{backbone}",
                              config=getattr(self, "param_dict", {}))
        trainer = Trainer(
            loss_fn=self._wrap_loss(model, cfg), params={"params": params},
            eval_loss_fn=make_loss_fn(model, cfg, deterministic=True),
            opt_cfg=opt_cfg, loop_cfg=loop_cfg, mesh_ctx=ctx,
            output_dir=output_dir, metric_writer=writer)

        # arena-resident collation (gamer_tpu/native): one C call per field.
        # Multi-process: each process stores only ITS stride-shard of the
        # examples and feeds micro/process_count rows per step; shard_batch
        # assembles the global batch (core/distributed.py).
        from gamer_tpu import native
        from gamer_tpu.core import distributed

        pc = distributed.process_count()
        if micro % pc != 0:
            raise ValueError(f"micro batch {micro} not divisible by "
                             f"process_count {pc}")
        local_micro = micro // pc
        train_store = native.ExampleStore(
            distributed.shard_examples(data.train),
            corpus.vocab.behavior_token_ids,
            only_train_response=only_train_response)
        valid_store = native.ExampleStore(
            distributed.shard_examples(data.valid),
            corpus.vocab.behavior_token_ids,
            only_train_response=only_train_response)

        def train_batches(epoch):
            return train_store.iterate(local_micro, batcher.seq_len, shuffle=True,
                                       seed=seed + epoch)

        def eval_batches():
            return valid_store.iterate(local_micro, batcher.seq_len)

        if profile_dir:
            # first-class step tracing (the reference has none, SURVEY.md 5.1)
            with jax.profiler.trace(profile_dir):
                for i, b in enumerate(train_batches(0)):
                    trainer.state, _, _ = trainer._train_step(
                        trainer.state, trainer.ctx.shard_batch(b), trainer.base_rng)
                    if i >= 4:
                        break
            logger.info("profiler trace written to %s", profile_dir)

        result = trainer.fit(train_batches, eval_batches)

        # persist everything the test task needs
        os.makedirs(output_dir, exist_ok=True)
        cfg.extra["family"] = "decoder_only"
        cfg.save(output_dir)
        corpus.vocab.save(os.path.join(output_dir, "vocab.json"))
        logger.info("done: best valid loss %.4f after %d steps",
                    result["best_metric"], result["steps"])
        return result

    def _run_encdec(self, *, data, backbone, base_model, output_dir, seed,
                    epochs, batch_size, learning_rate, weight_decay,
                    warmup_ratio, temperature, patience, n_layers, hidden_size,
                    accum=1, optim="adamw", loop_kwargs=None, resume=False):
        """TIGER/PBATransformer on SMB data (seq2seq: history -> target block)."""
        import jax

        from gamer_tpu.data.batching import EncDecBatcher
        from gamer_tpu.data.vocab import EOS_ID
        from gamer_tpu.models.generative.encdec import EncDecModel, build_encdec_config
        from gamer_tpu.models.generative.encdec_utils import (
            encdec_loss_fn, prepare_encdec_inputs)

        corpus = data.corpus
        tc = data.builder.tc
        overrides = dict(
            vocab_size=corpus.vocab.vocab_size, num_positions=tc,
            num_experts=tc + 1, num_behavior=len(corpus.behavior_names),
            behavior_base=corpus.vocab.behavior_base, temperature=temperature)
        if n_layers:
            overrides.update(num_layers=n_layers, num_decoder_layers=n_layers)
        if hidden_size:
            overrides["d_model"] = hidden_size
        if base_model:
            from gamer_tpu.models.generative.encdec import EncDecConfig

            file_cfg = EncDecConfig.from_file(base_model).to_dict()
            file_cfg.update(overrides)
            overrides = {k: v for k, v in file_cfg.items()
                         if k in EncDecConfig.field_names()}
        cfg = build_encdec_config(backbone, **overrides)
        model = EncDecModel(cfg)
        batcher = EncDecBatcher.for_examples(data.train + data.valid, eos_id=EOS_ID)
        loss_fn = encdec_loss_fn(model, cfg)
        sample = batcher.collate(data.train[:2])
        params = model.init(jax.random.PRNGKey(seed),
                            **prepare_encdec_inputs(cfg, sample))
        # batch_size here is the MICRO batch (caller passes hf["micro"])
        trainer = Trainer(
            loss_fn=loss_fn, params=params,
            eval_loss_fn=encdec_loss_fn(model, cfg, deterministic=True),
            opt_cfg=OptimizerConfig(optim=optim, learning_rate=learning_rate,
                                    weight_decay=weight_decay,
                                    warmup_ratio=warmup_ratio,
                                    total_steps=schedule_horizon(
                                        len(data.train), batch_size, accum, epochs)),
            loop_cfg=TrainLoopConfig(epochs=epochs, patience=patience, seed=seed,
                                     gradient_accumulation_steps=accum,
                                     # --resume_from_checkpoint was silently
                                     # dropped on this branch until round 5
                                     # (the decoder branch passed it; PBAT's
                                     # interrupted round-5 arm restarted at
                                     # epoch 0)
                                     resume=resume,
                                     **(loop_kwargs or {})),
            mesh_ctx=MeshContext(), output_dir=output_dir,
            metric_writer=MetricWriter(os.path.join("runs", self.name),
                                       config=getattr(self, "param_dict", {})))
        # multi-process: stride-shard + micro/pc rows per process (see _run)
        from gamer_tpu.core import distributed

        pc = distributed.process_count()
        if batch_size % pc:
            raise ValueError(f"micro batch {batch_size} not divisible by process_count {pc}")
        ltrain = distributed.shard_examples(data.train)
        lvalid = distributed.shard_examples(data.valid)
        result = trainer.fit(
            lambda epoch: iterate_batches(ltrain, batch_size // pc, batcher.collate,
                                          shuffle=True, seed=seed + epoch),
            lambda: iterate_batches(lvalid, batch_size // pc, batcher.collate))
        os.makedirs(output_dir, exist_ok=True)
        cfg.extra["family"] = "encdec"
        cfg.save(output_dir)
        corpus.vocab.save(os.path.join(output_dir, "vocab.json"))
        logger.info("done: best valid loss %.4f", result["best_metric"])
        return result

    @staticmethod
    def _wrap_loss(model, cfg):
        base = make_loss_fn(model, cfg)

        def loss_fn(variables, batch, rng):
            return base(variables, batch, rng)

        return loss_fn
