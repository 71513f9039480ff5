"""test_MB_decoder — multi-behavior eval over three evaluation modes.

TPU-native counterpart of the reference task (ref: SeqRec/tasks/test_MB_decoder.py:218-232;
enum ref MB_dataset.py:12-16):

  TARGET_BEHAVIOR   target-behavior examples; decoder seeded with the target
                    behavior token; constrained to the target-behavior trie
  BEHAVIOR_SPECIFIC all examples; seeded with each sample's true behavior token;
                    constrained to the all-items trie
  BEHAVIOR_ITEM     all examples; behavior token + item decoded JOINTLY over the
                    behavior+item trie (per-beam behavior ids derived from the
                    decoded level-0 token; see decode/beam.py)
"""

from __future__ import annotations

import json
import os

import numpy as np

from gamer_tpu.core.logging import get_logger
from gamer_tpu.core.registry import TASKS
from gamer_tpu.data.batching import DecodeBatcher
from gamer_tpu.data.contract import DataFiles
from gamer_tpu.data.seq import EvaluationType, MBExampleBuilder, SeqCorpus, filter_mb_examples
from gamer_tpu.decode.beam import BeamSearchConfig, constrained_beam_search
from gamer_tpu.decode.trie import LeveledTrie
from gamer_tpu.evaluation.ranking import hits_matrix, metrics_from_hits
from gamer_tpu.tasks.base import Task, add_dataset_args, add_global_args
from gamer_tpu.tasks.test_decoder import load_generative_model, run_seq_eval
from gamer_tpu.tasks.train_mb_decoder import layout_for_mb_task

logger = get_logger("tasks.test_mb_decoder")


@TASKS.register("test_MB_decoder")
class TestMBDecoder(Task):
    name = "test_MB_decoder"
    help = "Evaluate a multi-behavior decoder (3 evaluation modes)."

    @classmethod
    def add_args(cls, parser):
        add_global_args(parser)
        add_dataset_args(parser)
        g = parser.add_argument_group("test")
        g.add_argument("--ckpt_path", type=str, default="./checkpoint")
        g.add_argument("--ckpt_tag", type=str, default="best")
        g.add_argument("--results_file", type=str, default="./results/test_mb.json")
        g.add_argument("--test_batch_size", type=int, default=128)
        g.add_argument("--num_beams", type=int, default=20)
        g.add_argument("--metrics", type=str,
                       default="hit@1,hit@5,hit@10,recall@1,recall@5,recall@10,ndcg@5,ndcg@10")
        g.add_argument("--test_task", type=str, default="mb_explicit")
        g.add_argument("--filter", action="store_true",
                       help="drop collision-target samples (ref :66-94)")
        g.add_argument("--cache_dtype", type=str, default="auto",
                       choices=["auto", "float32", "bfloat16"],
                       help="auto = bfloat16 on TPU, float32 elsewhere")
        return parser

    def run(self, *, dataset, data_path, index_file, max_his_len, test_task,
            ckpt_path, ckpt_tag, results_file, test_batch_size, num_beams,
            metrics, filter, cache_dtype="auto", **_):
        model, cfg, params, vocab, family = load_generative_model(ckpt_path, ckpt_tag)
        corpus = SeqCorpus(DataFiles(data_path, dataset), index_file, multi_behavior=True)
        layout = layout_for_mb_task(test_task)
        examples = MBExampleBuilder(corpus, layout, max_his_len).build("test")
        metric_list = metrics.split(",")

        if filter:
            coll_rows = {tuple(r) for r in corpus.item_codes[corpus.collision_rows].tolist()}
            kept = []
            for ex in examples:
                t = _strip_behavior(ex.targets, corpus, vocab)
                if tuple(t[0].tolist()) not in coll_rows:
                    kept.append(ex)
            logger.info("filtered collision targets: %d -> %d", len(examples), len(kept))
            examples = kept

        item_rows = corpus.item_codes[~corpus.collision_rows]
        item_trie = LeveledTrie.from_token_rows(item_rows, vocab)

        results = []
        # -- TARGET_BEHAVIOR ------------------------------------------------
        tgt_examples = filter_mb_examples(examples, corpus.target_behavior_idx)
        totals, count = run_seq_eval(
            model, cfg, params, vocab, family, corpus, tgt_examples,
            num_beams, test_batch_size, metric_list, cache_dtype,
            behavior_token=vocab.behavior_token(corpus.target_behavior),
            action_level=int(corpus.behavior_levels[corpus.target_behavior_idx]),
            behavior_emb_id=corpus.target_behavior_idx + 1, trie=item_trie)
        results.append({"eval_type": EvaluationType.TARGET_BEHAVIOR.value,
                        **{m: v / max(count, 1) for m, v in totals.items()}})

        # -- BEHAVIOR_SPECIFIC ----------------------------------------------
        res = self._behavior_specific(model, cfg, params, vocab, family, corpus,
                                      examples, item_trie, num_beams,
                                      test_batch_size, metric_list, cache_dtype)
        results.append({"eval_type": EvaluationType.BEHAVIOR_SPECIFIC.value, **res})

        # -- BEHAVIOR_ITEM (decoder-only joint decode) ----------------------
        if family != "encdec":
            res = self._behavior_item(model, cfg, params, vocab, family, corpus,
                                      examples, num_beams, test_batch_size,
                                      metric_list, cache_dtype)
            results.append({"eval_type": EvaluationType.BEHAVIOR_ITEM.value, **res})

        os.makedirs(os.path.dirname(results_file) or ".", exist_ok=True)
        with open(results_file, "w") as f:
            json.dump(results, f, indent=2)
        for r in results:
            logger.info("%s: %s", r["eval_type"],
                        {k: round(v, 4) for k, v in r.items() if k != "eval_type"})
        return results

    def _behavior_specific(self, model, cfg, params, vocab, family, corpus,
                           examples, trie, num_beams, batch_size, metric_list,
                           cache_dtype):
        import jax.numpy as jnp

        from gamer_tpu.data.batching import EncDecBatcher
        from gamer_tpu.data.vocab import EOS_ID
        from gamer_tpu.decode.beam import (make_beam_search_encdec_fn,
                                           make_beam_search_fn)

        search = BeamSearchConfig(num_beams=num_beams, cache_dtype=cache_dtype)
        if family == "encdec":
            search_fn = make_beam_search_encdec_fn(model, trie, 2, search)
            batcher = EncDecBatcher.for_examples(examples, eos_id=EOS_ID)
        else:
            search_fn = make_beam_search_fn(model, trie, search)
            batcher = DecodeBatcher.for_examples(examples, extra=1)
        totals = {m: 0.0 for m in metric_list}
        count = 0
        L = trie.num_levels
        for s in range(0, len(examples), batch_size):
            chunk = examples[s:s + batch_size]
            n_real = len(chunk)
            if n_real < batch_size:
                chunk = list(chunk) + [chunk[0]] * (batch_size - n_real)
            behs = np.array([int(ex.target_behaviors[0]) for ex in chunk])
            btoks = np.array([vocab.behavior_token(corpus.behavior_names[b]) for b in behs])
            levels = corpus.behavior_levels[behs]
            if family == "encdec":
                batch = batcher.collate(chunk)
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                prefix = np.stack([np.full_like(btoks, cfg.decoder_start_token_id),
                                   btoks], axis=1)
                codes, _ = search_fn(params, batch, jnp.asarray(prefix))
            else:
                batch = batcher.collate(chunk, append_behavior_token=btoks,
                                        append_action_level=levels)
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                codes, _ = search_fn(params, batch, jnp.asarray(behs + 1))
            codes = np.asarray(codes)[:n_real]
            chunk = chunk[:n_real]
            target_codes = [vocab.decode_tokens(_strip_behavior(ex.targets, corpus, vocab))
                            for ex in chunk]
            hits, n_t = hits_matrix(codes, target_codes)
            for k, v in metrics_from_hits(hits, n_t, metric_list).items():
                totals[k] += v
            count += n_real
        return {m: v / max(count, 1) for m, v in totals.items()}

    def _behavior_item(self, model, cfg, params, vocab, family, corpus, examples,
                       num_beams, batch_size, metric_list, cache_dtype):
        """Joint behavior+item decode over the combined trie."""
        import jax.numpy as jnp

        item_codes = corpus.item_codes[~corpus.collision_rows]
        n_items, L = item_codes.shape
        n_beh = len(corpus.behavior_names)
        # combined rows: [behavior_code, item levels...] for all pairs
        combined = np.zeros((n_items * n_beh, L + 1), dtype=np.int64)
        for b in range(n_beh):
            rows = slice(b * n_items, (b + 1) * n_items)
            combined[rows, 0] = b
            combined[rows, 1:] = vocab.decode_tokens(item_codes)
        sizes = [n_beh] + list(vocab.level_sizes[:L])
        bases = [vocab.behavior_base] + [vocab.code_token(l, 0) for l in range(L)]
        trie = LeveledTrie.build(combined, sizes, bases)

        from gamer_tpu.decode.beam import make_beam_search_fn

        search = BeamSearchConfig(num_beams=num_beams, cache_dtype=cache_dtype)
        search_fn = make_beam_search_fn(model, trie, search)
        batcher = DecodeBatcher.for_examples(examples, extra=0)
        totals = {m: 0.0 for m in metric_list}
        count = 0
        for s in range(0, len(examples), batch_size):
            chunk = examples[s:s + batch_size]
            n_real = len(chunk)
            if n_real < batch_size:
                chunk = list(chunk) + [chunk[0]] * (batch_size - n_real)
            batch = batcher.collate(chunk)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            codes, _ = search_fn(params, batch, None)
            codes = np.asarray(codes)[:n_real]
            chunk = chunk[:n_real]
            # targets include the behavior as level 0
            target_codes = []
            for ex in chunk:
                item = vocab.decode_tokens(_strip_behavior(ex.targets, corpus, vocab))
                beh = np.asarray(ex.target_behaviors)[:, None]
                target_codes.append(np.concatenate([beh, item], axis=1))
            hits, n_t = hits_matrix(codes, target_codes)
            for k, v in metrics_from_hits(hits, n_t, metric_list).items():
                totals[k] += v
            count += n_real
        return {m: v / max(count, 1) for m, v in totals.items()}


def _strip_behavior(targets: np.ndarray, corpus, vocab) -> np.ndarray:
    if targets.shape[1] == corpus.sole_item_len:
        return targets
    first = targets[:, 0]
    if np.all((first >= vocab.behavior_base) & (first < vocab.code_base)):
        return targets[:, 1:]
    return targets[:, :-1]
