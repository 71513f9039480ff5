"""Sharded-training comms audit (docs/comms.md).

Compiles the flagship train step on a {data: 4, model: 2} mesh and inspects
the HLO's collectives. Catches sharding-rule regressions that would make XLA
all-gather parameters (expert stacks, vocab tables) every step instead of
keeping them sharded and moving activations.
"""

import re

import jax
import numpy as np
import pytest

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "u16": 2,
               "s16": 2, "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8,
               "u64": 8}


def _collectives(hlo: str):
    """[(op, bytes, dtype, shape_str)] for every collective in the HLO."""
    out = []
    for m in re.finditer(
            r"= (\S+?)\[([\d,]*)\][^\n]*?"
            r"(all-gather|all-reduce|reduce-scatter|all-to-all|collective-permute)",
            hlo):
        dims = [int(x) for x in m.group(2).split(",") if x] or [1]
        out.append((m.group(3), int(np.prod(dims)) * DTYPE_BYTES.get(m.group(1), 4),
                    m.group(1), m.group(2)))
    return out


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_no_parameter_allgather_on_model_axis():
    from __graft_entry__ import _flagship_config, _make_batch
    from gamer_tpu.core.mesh import (MODEL_AXIS, MeshContext, default_mesh,
                                     pad_to_multiple)
    from gamer_tpu.models.generative.qwen_family import (
        QwenFamilyModel, prepare_train_inputs)
    from gamer_tpu.tasks.train_smb_decoder import make_loss_fn
    from gamer_tpu.train.loop import Trainer, TrainLoopConfig
    from gamer_tpu.train.state import OptimizerConfig
    from jax.sharding import PartitionSpec as P

    ctx = MeshContext(default_mesh(data=4, model=2))
    cfg = _flagship_config(tiny=True)
    cfg = cfg.replace(vocab_size=cfg.vocab_size + 3,
                      padded_vocab_size=pad_to_multiple(cfg.vocab_size + 3, 16))
    model = QwenFamilyModel(cfg)
    batch = _make_batch(cfg, batch_size=8, blocks=4)
    variables = model.init(jax.random.PRNGKey(0),
                           **prepare_train_inputs(cfg, batch))
    trainer = Trainer(loss_fn=make_loss_fn(model, cfg), params=variables,
                      opt_cfg=OptimizerConfig(total_steps=10),
                      loop_cfg=TrainLoopConfig(epochs=1, save_checkpoints=False),
                      mesh_ctx=ctx, output_dir=None)

    # sizes of every model-axis-sharded parameter (expert stacks, vocab table)
    shardings = ctx.param_shardings(trainer.state.params)
    flat_p = jax.tree_util.tree_leaves(trainer.state.params)
    flat_s = jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: hasattr(x, "spec"))
    def uses_model_axis(spec):
        return any(a == MODEL_AXIS or (isinstance(a, tuple) and MODEL_AXIS in a)
                   for a in tuple(spec))

    sharded_sizes = [int(np.prod(p.shape)) * p.dtype.itemsize
                     for p, s in zip(flat_p, flat_s)
                     if uses_model_axis(s.spec)]
    assert sharded_sizes, "rules stopped sharding anything — audit is vacuous"
    assert any(s.spec == P(MODEL_AXIS) for s in flat_s
               if hasattr(s, "spec")), "vocab table no longer model-sharded"

    sharded = ctx.shard_batch(batch)
    hlo = trainer._train_step.lower(
        trainer.state, sharded, trainer.base_rng).compile().as_text()
    coll = _collectives(hlo)
    assert coll, "no collectives at all — mesh not applied?"

    ag = [(b, d, s) for op, b, d, s in coll if op == "all-gather"]
    min_param = min(sharded_sizes)
    offenders = [x for x in ag if x[0] >= min_param]
    assert not offenders, (
        f"parameter-scale all-gathers appeared (>= {min_param}B): {offenders}\n"
        "a sharding rule likely regressed to replicate+gather — see docs/comms.md")

    # total all-gather traffic stays activation-scale (generous 4x budget)
    B, S = batch["input_ids"].shape
    act_bytes = B * S * cfg.hidden_size * 4
    total_ag = sum(b for b, _, _ in ag)
    budget = 4 * act_bytes * cfg.num_hidden_layers
    assert total_ag < budget, (
        f"all-gather traffic {total_ag}B exceeds activation budget {budget}B")
    print(f"\ncomms audit: {len(coll)} collectives, "
          f"all-gather total {total_ag / 1e3:.1f}KB (budget {budget / 1e3:.0f}KB), "
          f"min sharded param {min_param / 1e3:.1f}KB")
