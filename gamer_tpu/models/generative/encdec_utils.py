"""Input preparation + loss for the enc-dec family (shared by tasks)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gamer_tpu.models.generative.encdec import EncDecConfig, EncDecModel, shift_right
from gamer_tpu.modules.losses import IGNORE_LABEL, causal_lm_loss
from gamer_tpu.ops import router as router_ops


def prepare_encdec_inputs(cfg: EncDecConfig, batch: dict) -> dict:
    """Routing indices for encoder/decoder streams (PBATransformer; harmless
    zeros for TIGER since its layers are dense)."""
    enc_ids = batch["input_ids"]
    attn = batch["attention_mask"]
    rel = router_ops.rel_positions(attn)
    enc_pos, enc_beh, _ = router_ops.route_tokens(
        enc_ids, rel, cfg.num_positions, cfg.behavior_base, cfg.num_behavior)
    dec_in = shift_right(batch["labels"], cfg.decoder_start_token_id)
    sd = dec_in.shape[1]
    # decoder routing by absolute decoder position (see encdec.py docstring)
    dpos = jnp.arange(sd)
    dec_pos = jnp.tile(((dpos % cfg.num_positions) + 1)[None], (dec_in.shape[0], 1))
    dec_beh = jnp.zeros_like(dec_pos)
    return dict(
        encoder_input_ids=enc_ids,
        encoder_attention_mask=attn,
        decoder_input_ids=dec_in,
        enc_position_index=enc_pos,
        enc_behavior_index=enc_beh,
        dec_position_index=dec_pos,
        dec_behavior_index=dec_beh,
    )


def encdec_loss_fn(model: EncDecModel, cfg: EncDecConfig,
                   deterministic: bool = False):
    """Temperature-scaled CE: logits[t] predicts labels[t] (decoder inputs are
    already shifted; ref TIGER/model.py:156-161). `deterministic=True` is the
    eval variant (dropout off, no rng); aux carries the valid-target count so
    Trainer.evaluate can form a global token mean."""

    def loss_fn(variables, batch, rng):
        inputs = prepare_encdec_inputs(cfg, batch)
        rngs = None if deterministic else {"dropout": rng}
        out = model.apply(variables, **inputs, deterministic=deterministic,
                          rngs=rngs)
        logits = out["logits"].astype(jnp.float32) / cfg.temperature
        labels = batch["labels"]
        valid = labels != IGNORE_LABEL
        if "row_valid" in batch:
            valid = valid & (batch["row_valid"][:, None] == 1)
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        denom = jnp.maximum(valid.sum(), 1)
        loss = nll.sum() / denom
        return loss, {"denom": denom}

    return loss_fn
