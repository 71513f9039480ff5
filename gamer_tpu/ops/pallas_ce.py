"""Fused tied-head cross-entropy Pallas kernel (round 5, follows the MoE
kernel + hash dropout: after those cuts the lm-head/CE block is the largest
remaining attributable HBM class — 3.46 GB/step by XLA cost-analysis delta,
artifacts/perf_r5/hbm_posthash.log).

Computes next-token CE directly from the final hidden states and the tied
embedding table, per 256-row tile in VMEM:

    logits = (h @ E^T) / T        [TM, Vp] f32, never written to HBM
    nll    = logsumexp(logits) - logits[target]   (valid rows only)

The backward (custom VJP) recomputes the tile's logits and emits
    dh = (softmax - onehot(target)) * g / T @ E
    dE += ((softmax - onehot) * g / T)^T @ h      [f32 accumulator, revisited]
so neither the [N, V] logits nor dlogits ever exist in HBM. The target-logit
"gather" is a lane-mask sum (col == target), not a gather — Mosaic-friendly.

Semantics match `modules/losses.causal_lm_loss_with_denom` (ref temperature
CE, SeqRec/models/generative/*/model.py loss): shift done by the caller,
IGNORE_LABEL rows excluded via the valid mask, temperature divides logits
inside the softmax. Precision: the jnp path reduces bf16 logits with on-the-
fly f32 views; this kernel keeps the whole tile f32 from the MXU — equal or
better precision (tolerance-pinned by tests/test_pallas_ce.py).

The vocab axis is zero-padded to a 128-lane multiple by the caller; padded
columns are masked to -inf before the reduce and produce exactly zero
gradient (softmax of -inf), so dE's padded rows are zero and the caller's
pad/slice autodiff is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 256
NEG = -1e30


def _tile_logits(h, e_ref, V, inv_t):
    # [TM, Vp] f32 from the MXU; padded vocab columns -> -inf
    logits = jax.lax.dot_general(h, e_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    logits = logits * inv_t
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    return jnp.where(col < V, logits, NEG), col


def _ce_fwd_kernel(tgt_ref, val_ref, h_ref, e_ref, nll_ref, lse_ref,
                   *, V, inv_t):
    h = h_ref[:]
    logits, col = _tile_logits(h, e_ref, V, inv_t)
    m = jnp.max(logits, axis=1, keepdims=True)
    lse = (m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1,
                               keepdims=True)))[:, 0]
    tgt = tgt_ref[0, 0]
    tl = jnp.sum(jnp.where(col == tgt[:, None], logits, 0.0), axis=1)
    valid = val_ref[0, 0] == 1
    nll_ref[0, 0] = jnp.where(valid, lse - tl, 0.0)
    lse_ref[0, 0] = lse


def _ce_bwd_kernel(tgt_ref, val_ref, lse_ref, g_ref, h_ref, e_ref,
                   dh_ref, de_ref, *, V, inv_t):
    i = pl.program_id(0)
    h = h_ref[:]
    logits, col = _tile_logits(h, e_ref, V, inv_t)
    p = jnp.exp(logits - lse_ref[0, 0][:, None])  # [TM, Vp]; 0 on pad cols
    tgt = tgt_ref[0, 0]
    onehot = (col == tgt[:, None]).astype(jnp.float32)
    gv = jnp.where(val_ref[0, 0] == 1, g_ref[0, 0], 0.0) * inv_t  # [TM]
    dlog = (p - onehot) * gv[:, None]
    dlog_c = dlog.astype(h.dtype)
    # dh = dlog @ E   ([TM, Vp] x [Vp, D])
    dh_ref[:] = jax.lax.dot_general(dlog_c, e_ref[:],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(dh_ref.dtype)
    # dE contribution = dlog^T @ h  ([Vp, TM] x [TM, D]) — f32 accumulate
    c_de = jax.lax.dot_general(dlog_c, h, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        de_ref[:] = c_de

    @pl.when(i > 0)
    def _acc():
        de_ref[:] += c_de


def _plane(arr):
    return pl.BlockSpec((1, 1, TM), lambda i: (i, 0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_ce_rows(h, table, targets, valid, vocab_size: int,
                  inv_t: float, interpret: bool = False):
    """h [N, D] (N % TM == 0), table [Vp, D] (Vp % 128 == 0, rows >= vocab
    zero-padded), targets/valid [N//TM, 1, TM] int32 -> per-row nll [N] f32.
    Gradients flow to h and table."""
    nll, _ = _ce_forward(h, table, targets, valid, vocab_size, inv_t,
                         interpret)
    return nll


def _ce_forward(h, table, targets, valid, V, inv_t, interpret):
    N, D = h.shape
    Vp = table.shape[0]
    assert N % TM == 0 and Vp % 128 == 0
    nT = N // TM
    kern = functools.partial(_ce_fwd_kernel, V=V, inv_t=inv_t)
    nll, lse = pl.pallas_call(
        kern,
        grid=(nT,),
        in_specs=[_plane(targets), _plane(valid),
                  pl.BlockSpec((TM, D), lambda i: (i, 0)),
                  pl.BlockSpec((Vp, D), lambda i: (0, 0))],
        out_specs=(_plane(None), _plane(None)),
        out_shape=(jax.ShapeDtypeStruct((nT, 1, TM), jnp.float32),
                   jax.ShapeDtypeStruct((nT, 1, TM), jnp.float32)),
        interpret=interpret,
    )(targets, valid, h, table)
    return nll.reshape(N), lse


def _ce_fwd_rule(h, table, targets, valid, V, inv_t, interpret):
    nll, lse = _ce_forward(h, table, targets, valid, V, inv_t, interpret)
    return nll, (h, table, targets, valid, lse)


def _ce_bwd_rule(V, inv_t, interpret, res, g):
    h, table, targets, valid, lse = res
    N, D = h.shape
    Vp = table.shape[0]
    nT = N // TM
    kern = functools.partial(_ce_bwd_kernel, V=V, inv_t=inv_t)
    dh, de = pl.pallas_call(
        kern,
        grid=(nT,),
        in_specs=[_plane(targets), _plane(valid),
                  pl.BlockSpec((1, 1, TM), lambda i: (i, 0, 0)),  # lse
                  pl.BlockSpec((1, 1, TM), lambda i: (i, 0, 0)),  # g
                  pl.BlockSpec((TM, D), lambda i: (i, 0)),
                  pl.BlockSpec((Vp, D), lambda i: (0, 0))],
        out_specs=(pl.BlockSpec((TM, D), lambda i: (i, 0)),
                   pl.BlockSpec((Vp, D), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((N, D), h.dtype),
                   jax.ShapeDtypeStruct((Vp, D), jnp.float32)),
        interpret=interpret,
    )(targets, valid, lse.reshape(nT, 1, TM),
      g.astype(jnp.float32).reshape(nT, 1, TM), h, table)
    return dh, de.astype(table.dtype), None, None


fused_ce_rows.defvjp(_ce_fwd_rule, _ce_bwd_rule)
