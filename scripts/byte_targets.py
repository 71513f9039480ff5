#!/usr/bin/env python
"""Per-buffer HBM target list for the byte-reduction attack (VERDICT r3 #5).

Compiles the flagship train step on the TPU (no execution), dumps the
optimized HLO, and ranks the largest tensors XLA actually materializes —
fusion outputs and parameters — attributed to source ops via HLO metadata.
cost_analysis() gives a single "bytes accessed" total; this names WHICH
buffers those bytes are.

Also compiles at micro 256 to compare per-seq buffer growth (VERDICT r3 #6:
which op grows super-linearly with B).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/byte_targets.py
"""

import collections
import os
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # env alone does not win over the axon plugin (CLAUDE.md); needed for a
    # CPU-side provisional inventory while the chip is busy
    import jax

    jax.config.update("jax_platforms", "cpu")

BLOCKS = 101
OUT = "runs/perf_r4"

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"\b([a-z]+[0-9]+|pred)\[([0-9,]*)\]")
_META_RE = re.compile(r'op_name="([^"]*)"')


def tensor_bytes(dtype, dims):
    n = 1
    for d in dims:
        n *= d
    return n * _DTYPE_BYTES.get(dtype, 4)


def parse_hlo(text):
    """Yield (bytes, shape_str, kind, op_name) for each instruction that
    materializes a buffer (skip tuple/get-tuple-element/parameter plumbing
    inside fusions — only entry-computation + fusion roots count as HBM)."""
    rows = []
    in_entry = False
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and s == "}":
            in_entry = False
        if not in_entry:
            continue
        # "%name = TYPE[dims]{layout} opcode(...)" possibly tuple "(T1, T2)"
        m = re.match(r"%?[\w.\-]+ = (.+)", s)
        if not m:
            continue
        rhs = m.group(1)
        opm = re.search(r"\)?\s*([a-z][\w\-]*)\(", rhs)
        kind = opm.group(1) if opm else "?"
        if kind in ("parameter", "get-tuple-element", "tuple", "constant"):
            continue
        total = 0
        shapes = []
        # only the type prefix before the opcode
        prefix = rhs.split(kind + "(")[0] if kind != "?" else rhs
        for dt, dims in _SHAPE_RE.findall(prefix):
            dims = [int(x) for x in dims.split(",") if x] or [1]
            total += tensor_bytes(dt, dims)
            shapes.append(f"{dt}[{','.join(map(str, dims))}]")
        meta = _META_RE.search(rhs)
        op_name = meta.group(1) if meta else ""
        if total:
            rows.append((total, " ".join(shapes[:3]), kind, op_name))
    return rows


def shorten(op_name):
    # "jit(train_step)/jit(main)/transpose(...)/model/layers_3/..." -> tail
    parts = [p for p in op_name.split("/") if not p.startswith("jit(")]
    return "/".join(parts[-5:]) if parts else op_name[-80:]


def build_compiled(batch):
    import jax
    import optax

    from __graft_entry__ import _flagship_config, _make_batch
    from gamer_tpu.models.generative.qwen_family import (
        QwenFamilyModel, prepare_train_inputs)
    from gamer_tpu.modules.losses import causal_lm_loss
    from gamer_tpu.train.state import OptimizerConfig, make_optimizer

    cfg = _flagship_config()
    cfg = cfg.replace(dtype="bfloat16", dropout_rate=0.2,
                      attention_impl="pallas")
    model = QwenFamilyModel(cfg)
    b = _make_batch(cfg, batch, BLOCKS, np.random.default_rng(0))
    key = jax.random.key(0, impl="unsafe_rbg")
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), **prepare_train_inputs(cfg, b)))()
    tx = make_optimizer(OptimizerConfig(total_steps=10_000))
    opt_state = tx.init(variables)

    def train_step(variables, opt_state, b, step):
        def loss_fn(v):
            inputs = prepare_train_inputs(cfg, b)
            out = model.apply(v, **inputs, route_mode="periodic",
                              deterministic=False,
                              rngs={"dropout": jax.random.fold_in(key, step)})
            return causal_lm_loss(out["logits"], b["labels"], cfg.temperature)

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, loss

    return jax.jit(train_step).lower(variables, opt_state, b, 0).compile()


def report(batch):
    compiled = build_compiled(batch)
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    ma = compiled.memory_analysis()
    print(f"\n===== micro batch {batch} =====")
    print(f"cost_analysis: {ca.get('flops', 0) / 1e12:.3f} TFLOP, "
          f"{ca.get('bytes accessed', 0) / 1e9:.2f} GB accessed")
    if ma is not None:
        print(f"memory_analysis: temp={getattr(ma, 'temp_size_in_bytes', 0) / 1e9:.2f} GB "
              f"args={getattr(ma, 'argument_size_in_bytes', 0) / 1e9:.2f} GB "
              f"out={getattr(ma, 'output_size_in_bytes', 0) / 1e9:.2f} GB")
    text = compiled.as_text()
    os.makedirs(OUT, exist_ok=True)
    with open(f"{OUT}/hlo_b{batch}.txt", "w") as f:
        f.write(text)
    rows = parse_hlo(text)
    rows.sort(key=lambda r: -r[0])
    print(f"\ntop 30 materialized buffers (of {len(rows)} entry instructions, "
          f"total {sum(r[0] for r in rows) / 1e9:.2f} GB written):")
    for total, shape, kind, op_name in rows[:30]:
        print(f"  {total / 1e6:9.1f} MB  {kind:12s} {shape:28s} {shorten(op_name)}")
    # aggregate by op tail to see which source op owns the bytes
    agg = collections.Counter()
    for total, _, _, op_name in rows:
        tail = shorten(op_name).split("/")[-1][:60] or "?"
        agg[tail] += total
    print("\nbytes written by source op (top 20):")
    for name, total in agg.most_common(20):
        print(f"  {total / 1e9:7.2f} GB  {name}")
    return rows


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    r64 = report(64)
    r256 = report(256)
    # per-seq comparison: a buffer class whose per-seq bytes grow with B is
    # the super-linear suspect for the micro-batch falloff
    def per_seq(rows, b):
        agg = collections.Counter()
        for total, _, _, op_name in rows:
            agg[shorten(op_name).split("/")[-1][:60] or "?"] += total / b
        return agg

    a, c = per_seq(r64, 64), per_seq(r256, 256)
    print("\nper-seq MB written, micro 64 vs 256 (ops where ratio != 1):")
    for name in sorted(set(a) | set(c), key=lambda n: -max(a[n], c[n]))[:25]:
        va, vc = a[name] / 1e6, c[name] / 1e6
        flag = "  <-- grows" if vc > va * 1.05 else ""
        print(f"  {va:8.2f} -> {vc:8.2f} MB/seq  {name}{flag}")


if __name__ == "__main__":
    main()
