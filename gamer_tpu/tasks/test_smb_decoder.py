"""test_SMB_decoder — trie-constrained beam-search evaluation.

TPU-native counterpart of the reference eval task (ref: SeqRec/tasks/test_SMB_decoder.py):
per-behavior filtered eval views, behavior token + action level appended to the
prompt (:113-119), beam search num_beams=20 returning all beams (:122-195),
hit/recall/ndcg with session-target normalization, duplicate-vs-history ratio
(:217-223), merged-behavior weighted metrics (:287-304), collision reporting
(:66-88), and a --valid_loss mode (:306-322).

The decode itself is the fully-jitted constrained beam search
(gamer_tpu/decode/beam.py) instead of HF generate + per-token host callbacks.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from gamer_tpu.core.logging import get_logger
from gamer_tpu.core.registry import TASKS
from gamer_tpu.data.batching import DecodeBatcher, DecoderBatcher, iterate_batches
from gamer_tpu.data.loading_smb import load_smb_test
from gamer_tpu.data.smb import filter_examples_by_behavior
from gamer_tpu.decode.beam import BeamSearchConfig, constrained_beam_search
from gamer_tpu.decode.trie import LeveledTrie
from gamer_tpu.evaluation.ranking import hits_matrix, merge_behavior_metrics, metrics_from_hits
from gamer_tpu.models.generative.qwen_family import (
    QwenFamilyConfig, QwenFamilyModel, prepare_train_inputs)
from gamer_tpu.modules.losses import causal_lm_loss
from gamer_tpu.tasks.base import Task, add_dataset_args, add_global_args

logger = get_logger("tasks.test_smb_decoder")


@TASKS.register("test_SMB_decoder")
class TestSMBDecoder(Task):
    name = "test_SMB_decoder"
    help = "Evaluate a SMB decoder with constrained beam search."

    @classmethod
    def add_args(cls, parser):
        add_global_args(parser)
        add_dataset_args(parser)
        g = parser.add_argument_group("test")
        g.add_argument("--ckpt_path", type=str, default="./checkpoint")
        g.add_argument("--ckpt_tag", type=str, default="best",
                       help="best | last | epoch_<N>")
        g.add_argument("--results_file", type=str, default="./results/test.json")
        g.add_argument("--test_batch_size", type=int, default=128)
        g.add_argument("--num_beams", type=int, default=20)
        g.add_argument("--metrics", type=str,
                       default="hit@1,hit@5,hit@10,recall@1,recall@5,recall@10,ndcg@5,ndcg@10")
        g.add_argument("--test_task", type=str, default="smb_explicit")
        g.add_argument("--behaviors", type=str, nargs="+", default=None)
        g.add_argument("--valid_loss", action="store_true")
        g.add_argument("--cache_dtype", type=str, default="auto",
                       choices=["auto", "float32", "bfloat16"],
                       help="auto = bfloat16 on TPU, float32 elsewhere")
        return parser

    def run(self, *, dataset, data_path, index_file, max_his_len, test_task,
            ckpt_path, ckpt_tag, results_file, test_batch_size, num_beams,
            metrics, behaviors, valid_loss, cache_dtype="auto", **_):
        from gamer_tpu.tasks.test_decoder import load_generative_model

        model, cfg, params, vocab, self.family = load_generative_model(ckpt_path, ckpt_tag)
        data = load_smb_test(dataset, data_path, max_his_len, index_file, test_task)
        corpus = data.corpus
        metric_list = metrics.split(",")

        if valid_loss:
            return self._valid_loss(model, cfg, params, dataset, data_path,
                                    max_his_len, index_file, results_file)

        behaviors = behaviors or list(corpus.behavior_names)
        # Decoder-only candidates: pure item code rows (behavior token is in
        # the prompt) — identical trie for every behavior, collision rows
        # deduplicated (ref get_all_items set semantics).
        item_rows = corpus.item_codes[~corpus.collision_rows]
        trie = LeveledTrie.from_token_rows(item_rows, vocab)
        L = trie.num_levels

        # one jitted search + one batcher shared by every behavior so the
        # executable compiles once (per-behavior ids/tokens are traced args)
        from gamer_tpu.data.batching import EncDecBatcher
        from gamer_tpu.data.vocab import EOS_ID
        from gamer_tpu.decode.beam import (make_beam_search_encdec_fn,
                                           make_beam_search_fn)

        search_cfg = BeamSearchConfig(num_beams=num_beams, cache_dtype=cache_dtype)
        if self.family == "encdec":
            self._batcher = EncDecBatcher.for_examples(data.test, eos_id=EOS_ID)
            self._search = make_beam_search_encdec_fn(model, trie, 2, search_cfg)
        else:
            self._batcher = DecodeBatcher.for_examples(data.test, extra=1)
            self._search = make_beam_search_fn(model, trie, search_cfg)

        collision = self._collision_report(corpus, data.test)
        # ONE mixed-behavior example stream -> one batched search dispatch per
        # chunk (behavior ids/tokens are per-row traced args, so all behaviors
        # share a single executable AND a single padded tail instead of one
        # per behavior; the reference loops whole eval passes per behavior,
        # ref test_SMB_decoder.py:362-380)
        rows: list[tuple[str, int, object]] = []
        for behavior in behaviors:
            b_idx = corpus.behavior_names.index(behavior)
            for ex in filter_examples_by_behavior(
                    data.test, b_idx, corpus.target_behavior_idx):
                rows.append((behavior, b_idx, ex))
        acc = self._eval_mixed(cfg, params, corpus, vocab, trie, rows,
                               behaviors, test_batch_size, metric_list)
        per_behavior: dict[str, dict] = {}
        counts: dict[str, int] = {}
        dup_ratios: dict[str, float] = {}
        for behavior in behaviors:
            a = acc[behavior]
            if not a["count"]:
                continue
            per_behavior[behavior] = a["totals"]
            counts[behavior] = a["count"]
            dup_ratios[behavior] = a["dup_sum"] / max(a["dup_n"], 1)
            logger.info("behavior %s (%d examples): %s", behavior, a["count"],
                        {k: round(v / a["count"], 4) for k, v in a["totals"].items()})

        merged = merge_behavior_metrics(per_behavior, counts)
        results = {
            "per_behavior": {
                b: {k: v / counts[b] for k, v in m.items()} for b, m in per_behavior.items()
            },
            "merged": merged,
            "counts": counts,
            "duplicate_ratio": dup_ratios,
            "collision": collision,
            "config": {"test_task": test_task, "num_beams": num_beams,
                       "dataset": dataset, "ckpt": ckpt_path},
        }
        os.makedirs(os.path.dirname(results_file) or ".", exist_ok=True)
        with open(results_file, "w") as f:
            json.dump(results, f, indent=2)
        logger.info("merged: %s", {k: round(v, 4) for k, v in merged.items()})
        return results

    # ------------------------------------------------------------------ eval

    def _eval_mixed(self, cfg, params, corpus, vocab, trie, rows, behaviors,
                    batch_size, metric_list):
        """Evaluate a mixed-behavior row stream ((behavior, b_idx, example)
        tuples) in single-dispatch batches; returns per-behavior accumulators
        {totals, count, dup_sum, dup_n}."""
        import jax.numpy as jnp

        family = getattr(self, "family", "decoder_only")
        # multi-host eval: stride rows across processes and sum fixed-shape
        # metric tensors at the end (replaces the reference's all_gather_object
        # of pickled python lists, ref :232-255 / SURVEY.md 2.9)
        n_proc = jax.process_count()
        if n_proc > 1:
            rows = rows[jax.process_index()::n_proc]
        L = trie.num_levels
        batcher = self._batcher
        acc = {b: {"totals": {m: 0.0 for m in metric_list}, "count": 0,
                   "dup_sum": 0.0, "dup_n": 0} for b in behaviors}

        for batch_rows in _chunks(rows, batch_size):
            n_real = len(batch_rows)
            if n_real < batch_size:  # pad to static shape for jit
                batch_rows = list(batch_rows) + [batch_rows[0]] * (batch_size - n_real)
            ex_list = [r[2] for r in batch_rows]
            btoks = np.asarray([vocab.behavior_token(r[0]) for r in batch_rows],
                               np.int32)
            if family == "encdec":
                # decoder seeded with [start, behavior_token] per row (ref :188-195)
                prefix = np.stack([np.full(len(btoks), cfg.decoder_start_token_id,
                                           np.int32), btoks], axis=1)
                batch = batcher.collate(ex_list)
                codes, scores = self._search(params, _to_jnp(batch), jnp.asarray(prefix))
            else:
                levels = np.asarray([int(corpus.behavior_levels[r[1]])
                                     for r in batch_rows], np.int32)
                beh_emb_ids = np.asarray([r[1] + 1 for r in batch_rows], np.int32)
                batch = batcher.collate(ex_list, append_behavior_token=btoks,
                                        append_action_level=levels)
                codes, scores = self._search(params, _to_jnp(batch),
                                             jnp.asarray(beh_emb_ids))
            codes = np.asarray(codes)[:n_real]  # [B, K, L] 0-based level codes
            batch_rows = batch_rows[:n_real]
            # targets: strip the behavior token column -> per-level codes
            target_codes = [
                vocab.decode_tokens(_item_cols(r[2].targets, corpus, L))
                for r in batch_rows
            ]
            hits, n_targets = hits_matrix(codes, target_codes)
            row_behaviors = np.asarray([r[0] for r in batch_rows])
            for behavior in set(row_behaviors.tolist()):
                mask = row_behaviors == behavior
                bm = metrics_from_hits(hits[mask], n_targets[mask], metric_list)
                a = acc[behavior]
                for k, v in bm.items():
                    a["totals"][k] += v
                a["count"] += int(mask.sum())
            # duplicate-vs-history ratio (ref :217-223)
            for i, (behavior, _, ex) in enumerate(batch_rows):
                hist = {tuple(r) for r in vocab.decode_tokens(
                    corpus.item_codes[corpus.item_rows(ex.history_item_ids)]).tolist()}
                gen = {tuple(r) for r in codes[i].tolist()}
                acc[behavior]["dup_sum"] += len(gen & hist) / max(len(gen), 1)
                acc[behavior]["dup_n"] += 1

        if n_proc > 1:
            from jax.experimental import multihost_utils

            M = len(metric_list)
            vec = np.zeros((len(behaviors), M + 3), np.float64)
            for j, b in enumerate(behaviors):
                a = acc[b]
                vec[j, :M] = [a["totals"][m] for m in metric_list]
                vec[j, M:] = [a["count"], a["dup_sum"], a["dup_n"]]
            summed = np.asarray(multihost_utils.process_allgather(vec)).sum(axis=0)
            for j, b in enumerate(behaviors):
                acc[b] = {"totals": {m: float(summed[j, i])
                                     for i, m in enumerate(metric_list)},
                          "count": int(summed[j, M]),
                          "dup_sum": float(summed[j, M + 1]),
                          "dup_n": int(summed[j, M + 2])}
        return acc

    def _valid_loss(self, model, cfg, params, dataset, data_path, max_his_len,
                    index_file, results_file):
        data = load_smb_test(dataset, data_path, max_his_len, index_file,
                             "smb_explicit_valid")
        # score the valid split with the training objective (ref :306-322)
        from gamer_tpu.data.loading_smb import load_smb_train
        tdata = load_smb_train(dataset, data_path, max_his_len, index_file, "smb_explicit")
        batcher = DecoderBatcher.for_examples(
            tdata.valid, behavior_token_ids=data.corpus.vocab.behavior_token_ids)
        total, n = 0.0, 0

        family = getattr(self, "family", "decoder_only")
        if family == "encdec":
            from gamer_tpu.data.batching import EncDecBatcher
            from gamer_tpu.data.vocab import EOS_ID

            from gamer_tpu.models.generative.encdec_utils import prepare_encdec_inputs
            from gamer_tpu.modules.losses import IGNORE_LABEL
            import jax.numpy as jnp

            batcher = EncDecBatcher.for_examples(tdata.valid, eos_id=EOS_ID)

            @jax.jit
            def eval_step(batch):
                inputs = prepare_encdec_inputs(cfg, batch)
                out = model.apply(params, **inputs)  # deterministic
                logits = out["logits"].astype(jnp.float32) / cfg.temperature
                labels = batch["labels"]
                valid = (labels != IGNORE_LABEL) & (batch["row_valid"][:, None] == 1)
                safe = jnp.where(valid, labels, 0)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
                return jnp.where(valid, nll, 0.0).sum() / jnp.maximum(valid.sum(), 1)
        else:
            @jax.jit
            def eval_step(batch):
                inputs = prepare_train_inputs(cfg, batch)
                out = model.apply(params, **inputs, route_mode="onehot")
                return causal_lm_loss(out["logits"], batch["labels"], cfg.temperature,
                                      batch.get("row_valid"))

        for batch in iterate_batches(tdata.valid, 32, batcher.collate):
            w = int(batch["row_valid"].sum())
            total += float(eval_step(_to_jnp(batch))) * w
            n += w
        loss = total / max(n, 1)
        logger.info("valid loss: %.4f", loss)
        results = {"valid_loss": loss}
        os.makedirs(os.path.dirname(results_file) or ".", exist_ok=True)
        with open(results_file, "w") as f:
            json.dump(results, f, indent=2)
        return results

    @staticmethod
    def _collision_report(corpus, examples):
        """ref test_SMB_decoder.py:66-88."""
        n_coll_items = int(corpus.collision_rows.sum())
        coll_rows = {tuple(r) for r in corpus.item_codes[corpus.collision_rows].tolist()}
        coll_samples = 0
        for ex in examples:
            L = corpus.sole_item_len
            tgt = _item_cols(ex.targets, corpus, L)
            for row in tgt.reshape(-1, L).tolist():
                if tuple(row) in coll_rows:
                    coll_samples += 1
        return {"total": len(examples), "collision_items": n_coll_items,
                "collision_samples": coll_samples,
                "collision_ratio": coll_samples / max(len(examples), 1)}


def _item_cols(target_blocks: np.ndarray, corpus, L: int) -> np.ndarray:
    """Strip behavior-token column(s) from target blocks -> [n, L] item tokens."""
    tc = target_blocks.shape[1]
    if tc == L:
        return target_blocks
    # explicit layout: behavior token first or last
    first = target_blocks[:, 0]
    if np.all((first >= corpus.vocab.behavior_base) & (first < corpus.vocab.code_base)):
        return target_blocks[:, 1:]
    return target_blocks[:, :-1]


def _chunks(seq, n):
    for i in range(0, len(seq), n):
        yield seq[i:i + n]


def _to_jnp(batch):
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in batch.items()}
