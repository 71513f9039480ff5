"""Decode micro-benchmark: jitted trie-constrained beam search throughput.

Measures beams/s of `constrained_beam_search` on the flagship Qwen3Multi at
eval geometry (num_beams=20, 3-level trie) with randomized prompts per timing
iteration (the axon runtime dedupes identical dispatches — see CLAUDE.md).

Run on TPU:  python scripts/bench_decode.py [--batch 128] [--blocks 40]
Run on CPU:  JAX_PLATFORMS=cpu python scripts/bench_decode.py --batch 8
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=40, help="prompt item blocks")
    ap.add_argument("--beams", type=int, default=20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cache_dtype", type=str, default="float32")
    args = ap.parse_args()

    plat = os.environ.get("JAX_PLATFORMS")
    import jax

    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_config, _make_batch
    from gamer_tpu.decode.beam import BeamSearchConfig, make_beam_search_fn
    from gamer_tpu.decode.trie import LeveledTrie
    from gamer_tpu.models.generative.qwen_family import (
        QwenFamilyModel, prepare_train_inputs)

    cfg = _flagship_config()
    model = QwenFamilyModel(cfg)
    rng = np.random.default_rng(0)

    # 3-level trie over a dense 8x8x16 code space (the capstone dataset shape)
    levels = [8, 8, 16]
    n_items = 800
    codes = np.stack([rng.integers(0, k, n_items) for k in levels], axis=1)
    codes = np.unique(codes, axis=0)
    base = cfg.behavior_base + cfg.num_behavior  # level-major token layout
    bases = [base, base + levels[0], base + levels[0] + levels[1]]
    trie = LeveledTrie.build(codes, levels, bases)

    B, blocks = args.batch, args.blocks
    batch = _make_batch(cfg, batch_size=B, blocks=blocks)
    batch["prompt_len"] = jnp.full((B,), blocks * cfg.num_positions, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), **prepare_train_inputs(cfg, batch))

    search = make_beam_search_fn(model, trie, BeamSearchConfig(num_beams=args.beams, cache_dtype=args.cache_dtype))
    beh = jnp.int32(1)

    codes_out, scores = search(variables, batch, beh)
    float(np.asarray(scores).sum())  # compile + sync (axon block_until_ready is lazy)

    times = []
    for i in range(args.iters):
        b = _make_batch(cfg, batch_size=B, blocks=blocks,
                        rng=np.random.default_rng(i + 1))
        b["prompt_len"] = batch["prompt_len"]
        b = jax.tree_util.tree_map(jnp.asarray, b)
        t0 = time.perf_counter()
        _, s = search(variables, b, beh)
        float(np.asarray(s).sum())  # host transfer forces real completion
        times.append(time.perf_counter() - t0)
    best = min(times)
    beams_per_s = B * args.beams / best
    print(f"batch={B} beams={args.beams} S={blocks * cfg.num_positions} "
          f"best={best * 1e3:.1f}ms  beams/s={beams_per_s:.0f}  "
          f"seqs/s={B / best:.1f}")


if __name__ == "__main__":
    main()
