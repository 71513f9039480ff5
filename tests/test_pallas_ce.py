"""Parity tests for the fused tied-head CE kernel (interpret mode, CPU)
against modules/losses.causal_lm_loss_with_denom on explicitly-built logits.
Covers: shift, IGNORE_LABEL masking, row_valid, temperature, vocab padding,
row padding, and grads to hidden states and the table."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamer_tpu.modules.losses import (
    IGNORE_LABEL, causal_lm_loss_with_denom, fused_causal_lm_loss_with_denom)

B, S, D, V = 3, 87, 128, 333  # V deliberately not 128-aligned; B*(S-1) % TM != 0


def _mk(seed=0):
    rng = np.random.RandomState(seed)
    hidden = jnp.asarray(rng.randn(B, S, D) * 0.3, jnp.float32)
    table = jnp.asarray(rng.randn(V, D) / np.sqrt(D), jnp.float32)
    labels = rng.randint(0, V, (B, S))
    labels[rng.rand(B, S) < 0.3] = IGNORE_LABEL
    labels[:, :5] = IGNORE_LABEL
    row_valid = jnp.asarray([1, 1, 0], jnp.int32)
    return hidden, table, jnp.asarray(labels, jnp.int32), row_valid


@pytest.mark.parametrize("temperature", [1.0, 0.7])
def test_fused_ce_loss_and_grad_parity(temperature):
    hidden, table, labels, row_valid = _mk()

    def ref(args):
        h, t = args
        logits = jnp.einsum("bsd,vd->bsv", h, t)
        loss, denom = causal_lm_loss_with_denom(logits, labels, temperature,
                                                row_valid)
        return loss, denom

    def fused(args):
        h, t = args
        return fused_causal_lm_loss_with_denom(h, t, labels, temperature,
                                               row_valid, interpret=True)

    (lr, dr), gr = jax.value_and_grad(lambda a: ref(a)[0], 0)((hidden, table)), None
    lf, df = fused((hidden, table))
    np.testing.assert_allclose(float(lf), float(lr), rtol=2e-5)
    assert int(df) == int(ref((hidden, table))[1])

    gr = jax.grad(lambda a: ref(a)[0])((hidden, table))
    gf = jax.grad(lambda a: fused(a)[0])((hidden, table))
    for a, b, name in zip(gf, gr, ["dhidden", "dtable"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_fused_ce_all_rows_masked():
    hidden, table, labels, _ = _mk(1)
    labels = jnp.full_like(labels, IGNORE_LABEL)
    loss, denom = fused_causal_lm_loss_with_denom(hidden, table, labels,
                                                  1.0, None, interpret=True)
    assert float(loss) == 0.0 and int(denom) == 1
    g = jax.grad(lambda h: fused_causal_lm_loss_with_denom(
        h, table, labels, 1.0, None, interpret=True)[0])(hidden)
    np.testing.assert_allclose(np.asarray(g), 0.0)
