"""test_decoder — single-behavior constrained beam-search eval.

TPU-native counterpart of the reference task (ref: SeqRec/tasks/test_decoder.py):
all-items trie, beam search, hit/recall/ndcg over the leave-one-out target.
Dispatches decoder-only (Qwen3 family) and enc-dec (TIGER/PBATransformer)
decode paths.
"""

from __future__ import annotations

import json
import os

import numpy as np

from gamer_tpu.core.checkpoint import CheckpointManager
from gamer_tpu.core.logging import get_logger
from gamer_tpu.core.registry import TASKS
from gamer_tpu.data.batching import DecodeBatcher, EncDecBatcher
from gamer_tpu.data.contract import DataFiles
from gamer_tpu.data.seq import SeqCorpus, SeqExampleBuilder
from gamer_tpu.data.vocab import SemanticVocab
from gamer_tpu.decode.beam import (BeamSearchConfig, constrained_beam_search,
                                   constrained_beam_search_encdec)
from gamer_tpu.decode.trie import LeveledTrie
from gamer_tpu.evaluation.ranking import hits_matrix, metrics_from_hits
from gamer_tpu.models.generative.encdec import EncDecConfig, EncDecModel
from gamer_tpu.models.generative.qwen_family import QwenFamilyConfig, QwenFamilyModel
from gamer_tpu.tasks.base import Task, add_dataset_args, add_global_args

logger = get_logger("tasks.test_decoder")


def load_generative_model(ckpt_path: str, ckpt_tag: str = "best"):
    """Loads either family from a checkpoint dir via the saved family marker."""
    with open(os.path.join(ckpt_path, "config.json")) as f:
        raw = json.load(f)
    family = raw.get("family", "decoder_only")
    if family == "encdec":
        cfg = EncDecConfig.from_dict(raw)
        model = EncDecModel(cfg)
    else:
        cfg = QwenFamilyConfig.from_dict(raw)
        model = QwenFamilyModel(cfg)
    params = CheckpointManager(ckpt_path).restore(ckpt_tag)
    vocab = SemanticVocab.load(os.path.join(ckpt_path, "vocab.json"))
    return model, cfg, params, vocab, family


def run_seq_eval(model, cfg, params, vocab, family, corpus, examples,
                 num_beams, batch_size, metric_list, cache_dtype="auto",
                 behavior_token=None, action_level=None, behavior_emb_id=0,
                 trie=None):
    """Shared beam-search eval over single-target examples. Returns metric sums
    + count (caller normalizes)."""
    import jax.numpy as jnp

    from gamer_tpu.decode.beam import make_beam_search_encdec_fn, make_beam_search_fn

    if trie is None:
        item_rows = corpus.item_codes[~corpus.collision_rows]
        trie = LeveledTrie.from_token_rows(item_rows, vocab)
    L = trie.num_levels
    search = BeamSearchConfig(num_beams=num_beams, cache_dtype=cache_dtype)
    totals = {m: 0.0 for m in metric_list}
    count = 0

    if family == "encdec":
        batcher = EncDecBatcher.for_examples(examples)
        prefix = [cfg.decoder_start_token_id]
        if behavior_token is not None:
            prefix = prefix + [behavior_token]
        prefix = np.asarray(prefix, np.int32)
        search_fn = make_beam_search_encdec_fn(model, trie, len(prefix), search)
    else:
        batcher = DecodeBatcher.for_examples(examples, extra=1 if behavior_token is not None else 0)
        search_fn = make_beam_search_fn(model, trie, search)

    for s in range(0, len(examples), batch_size):
        chunk = examples[s:s + batch_size]
        n_real = len(chunk)
        if n_real < batch_size:
            chunk = list(chunk) + [chunk[0]] * (batch_size - n_real)
        if family == "encdec":
            batch = batcher.collate(chunk)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            codes, _ = search_fn(params, batch, prefix)
        else:
            batch = batcher.collate(chunk, append_behavior_token=behavior_token,
                                    append_action_level=action_level)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            codes, _ = search_fn(params, batch, behavior_emb_id)
        codes = np.asarray(codes)[:n_real]
        chunk = chunk[:n_real]
        target_codes = []
        for ex in chunk:
            t = ex.targets
            if t.shape[1] > L:  # strip behavior-token column
                first = t[:, 0]
                if np.all((first >= vocab.behavior_base) & (first < vocab.code_base)):
                    t = t[:, 1:]
                else:
                    t = t[:, :-1]
            target_codes.append(vocab.decode_tokens(t))
        hits, n_t = hits_matrix(codes, target_codes)
        for k, v in metrics_from_hits(hits, n_t, metric_list).items():
            totals[k] += v
        count += n_real
    return totals, count


def filter_collision_targets(corpus, examples, apply_filter: bool):
    """Collision accounting over test targets (ref test_decoder.py:65-90):
    a sample 'collides' when its target's semantic-id row is shared by more
    than one item. With apply_filter, those samples are dropped."""
    uniq, counts = np.unique(corpus.item_codes, axis=0, return_counts=True)
    colliding = {tuple(int(v) for v in r) for r, c in zip(uniq, counts) if c > 1}

    def target_row(ex):
        t = ex.targets[0]
        if t.shape[0] > corpus.sole_item_len:  # strip behavior-token column
            t = (t[1:] if int(t[0]) >= corpus.vocab.behavior_base
                 and int(t[0]) < corpus.vocab.code_base else t[:-1])
        return tuple(int(v) for v in t)

    is_coll = [target_row(ex) in colliding for ex in examples]
    info = {"total": len(examples), "collision_items": len(colliding),
            "collision_samples": int(sum(is_coll)),
            "collision_ratio": float(sum(is_coll)) / max(len(examples), 1)}
    if apply_filter:
        examples = [ex for ex, c in zip(examples, is_coll) if not c]
        logger.info("filtered collision targets: %d -> %d examples",
                    info["total"], len(examples))
    return examples, info


@TASKS.register("test_decoder")
class TestDecoder(Task):
    name = "test_decoder"
    help = "Evaluate a single-behavior generative decoder."

    @classmethod
    def add_args(cls, parser):
        add_global_args(parser)
        add_dataset_args(parser)
        g = parser.add_argument_group("test")
        g.add_argument("--inter_type", type=str, default=None)
        g.add_argument("--test_task", type=str, default="SeqRec",
                       help="'SeqRec' or 'seqrec_<type>' (selects the "
                            "interaction-file variant, ref test_decoder.py:58)")
        g.add_argument("--filter", action="store_true",
                       help="drop test samples whose target semantic id "
                            "collides (ref test_decoder.py:65-90)")
        g.add_argument("--ckpt_path", type=str, default="./checkpoint")
        g.add_argument("--ckpt_tag", type=str, default="best")
        g.add_argument("--results_file", type=str, default="./results/test_decoder.json")
        g.add_argument("--test_batch_size", type=int, default=128)
        g.add_argument("--num_beams", type=int, default=20)
        g.add_argument("--metrics", type=str,
                       default="hit@1,hit@5,hit@10,recall@1,recall@5,recall@10,ndcg@5,ndcg@10")
        g.add_argument("--cache_dtype", type=str, default="auto",
                       choices=["auto", "float32", "bfloat16"],
                       help="auto = bfloat16 on TPU, float32 elsewhere")
        return parser

    def run(self, *, dataset, data_path, index_file, max_his_len, inter_type,
            ckpt_path, ckpt_tag, results_file, test_batch_size, num_beams,
            metrics, cache_dtype="auto", test_task="SeqRec", filter=False,
            **_):
        t = (test_task or "SeqRec").lower()
        if t.startswith("seqrec_") and inter_type is None:
            inter_type = t[len("seqrec_"):]
        model, cfg, params, vocab, family = load_generative_model(ckpt_path, ckpt_tag)
        corpus = SeqCorpus(DataFiles(data_path, dataset), index_file,
                           multi_behavior=False, inter_type=inter_type)
        examples = SeqExampleBuilder(corpus, max_his_len).build("test")
        examples, collision_info = filter_collision_targets(
            corpus, examples, apply_filter=filter)
        metric_list = metrics.split(",")
        totals, count = run_seq_eval(
            model, cfg, params, vocab, family, corpus, examples,
            num_beams, test_batch_size, metric_list, cache_dtype)
        results = {m: v / max(count, 1) for m, v in totals.items()}
        out = {"metrics": results, "count": count,
               "collision_info": collision_info,
               "config": {"dataset": dataset, "num_beams": num_beams, "ckpt": ckpt_path}}
        os.makedirs(os.path.dirname(results_file) or ".", exist_ok=True)
        with open(results_file, "w") as f:
            json.dump(out, f, indent=2)
        logger.info("metrics: %s", {k: round(v, 4) for k, v in results.items()})
        return out
