"""Diagnose whether a trained enc-dec checkpoint actually CONDITIONS on its
encoder input: valid-split CE with real encoder inputs vs encoder inputs
rotated across the batch (history/target pairs decorrelated). If the two are
equal, the decoder is an unconditional LM over target codes — explaining a
popularity-level beam eval (~10x random, below the repeat-history floor).

Usage: PYTHONPATH=/root/repo python scripts/diag_encdec_conditioning.py \
           <ckpt_dir> <dataset> <data_path> <index_file> [max_his_len]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ckpt, dataset, data_path, index_file = sys.argv[1:5]
    max_his_len = int(sys.argv[5]) if len(sys.argv) > 5 else 100

    from gamer_tpu.data.batching import EncDecBatcher, iterate_batches
    from gamer_tpu.data.loading_smb import load_smb_train
    from gamer_tpu.data.vocab import EOS_ID
    from gamer_tpu.models.generative.encdec_utils import prepare_encdec_inputs
    from gamer_tpu.modules.losses import IGNORE_LABEL
    from gamer_tpu.tasks.test_decoder import load_generative_model

    model, cfg, params, vocab, family = load_generative_model(ckpt, "best")
    assert family == "encdec", family
    tdata = load_smb_train(dataset, data_path, max_his_len, index_file,
                           "smb_explicit")
    batcher = EncDecBatcher.for_examples(tdata.valid, eos_id=EOS_ID)

    @jax.jit
    def nll_sums(batch):
        inputs = prepare_encdec_inputs(cfg, batch)
        out = model.apply(params, **inputs)
        logits = out["logits"].astype(jnp.float32) / cfg.temperature
        labels = batch["labels"]
        valid = (labels != IGNORE_LABEL) & (batch["row_valid"][:, None] == 1)
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.where(valid, nll, 0.0).sum(), valid.sum()

    totals = {"real": 0.0, "rotated": 0.0, "empty": 0.0}
    counts = {k: 0 for k in totals}
    for bi, batch in enumerate(iterate_batches(tdata.valid, 64, batcher.collate)):
        if bi >= 8:
            break
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        for kind in totals:
            b = dict(batch)
            if kind == "rotated":
                b["input_ids"] = jnp.roll(batch["input_ids"], 1, axis=0)
                b["attention_mask"] = jnp.roll(batch["attention_mask"], 1, axis=0)
            elif kind == "empty":
                # EOS-only encoder input: unconditional decoder baseline
                ii = np.full(batch["input_ids"].shape, 0, dtype=np.int32)
                am = np.zeros(batch["attention_mask"].shape, dtype=np.int32)
                ii[:, 0] = EOS_ID
                am[:, 0] = 1
                b["input_ids"], b["attention_mask"] = jnp.asarray(ii), jnp.asarray(am)
            s, n = nll_sums(b)
            totals[kind] += float(s)
            counts[kind] += int(n)

    for kind in totals:
        print(f"{kind:8s} CE = {totals[kind] / max(counts[kind], 1):.4f} "
              f"({counts[kind]} tokens)")


if __name__ == "__main__":
    main()
