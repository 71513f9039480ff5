"""Fused position-routed MoE-FFN Pallas kernel (round-5 perf centerpiece).

The periodic MoE path (modules/moe.py) is exact batched dense compute per
expert, but XLA materializes its intermediates in HBM: the round-4 post-cuts
byte inventory (artifacts/perf_r4/byte_targets_postcuts.log) shows ~24
per-layer-step 92-132 MB `copy/async-start` buffers of `bf16[P,b,n,2*d_ff]`
(the gate-up activations around the expert axis) plus `pred[P,b,n,d_ff]`
dropout masks — together the largest remaining HBM byte class of the train
step, and unmovable from user code. This kernel runs the whole FFN —
    gu = x @ Wgu (+ behavior-injection bias)   [gate | up, one matmul]
    h  = act(gu[:, :F]) * gu[:, F:]            [SwiGLU]
    h  = dropout(h)                            [stateless coordinate hash]
    y  = h @ Wdown
— per (expert, row-tile) entirely in VMEM, so the [*, 2F] intermediates and
the dropout masks never exist in HBM. The backward (custom VJP: jax cannot
autodiff pallas_call) recomputes gu/h from x and emits dx plus f32
accumulated dWgu/dWd/dbtab in ONE pass, revisiting the per-expert weight-grad
blocks across row tiles.

Behavior injection (ref Qwen3Moe/FFN.py:8-27 concatenates a behavior
embedding to the FFN input) is refactored into an exactly-equivalent
per-behavior BIAS: concat(x, e_b) @ [Wx; Wb] == x @ Wx + (e_b @ Wb), and
e_b @ Wb has only num_behavior+1 distinct rows — the caller precomputes that
[P, NB, 2F] table and the kernel adds rows by behavior id. This keeps the
kernel's contraction dims 128-lane aligned (the concat layout's d_model+64
input width is not) and drops the [B,S,d+bdim] concat buffer.

Dropout uses the same stateless fmix32 coordinate hash as the attention
kernels (ops/pallas_attention.py) keyed on (seed, expert, abs_row, col):
forward and backward regenerate identical masks with no draw-order coupling,
interpret (CPU) mode matches compiled, and the mask is reproducible outside
the kernel for tests.

Ref parity target: modules/moe.py periodic path (itself ref
SeqRec/models/generative/Qwen3Moe/FFN.py:53-72 semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gamer_tpu.ops.pallas_attention import dropout_keep_tile, keep_fraction

# Row-tile size. T (=B*n_blocks per expert) is padded to a multiple by the
# caller; 256 rows keeps every VMEM buffer of the one-pass backward
# (operands + f32 dW accumulators) ~6 MB total.
TM = 256

_ACTS = {"silu": jax.nn.silu, "gelu": jax.nn.gelu, "relu": jax.nn.relu,
         "gelu_new": jax.nn.gelu}


def _gu_tile(x, wgu, beh_ref, btab_ref, use_bias, i):
    # Bias rows are added by select/broadcast rather than a [TM, NB] one-hot
    # matmul: NB (~4) is far below the 128-lane tile minimum and Mosaic
    # support for K=4 contractions is not worth gambling an unattended rail
    # on. NB fused multiply-adds of a full-width [TM, 2F] tile are cheap VPU
    # work next to the two MXU matmuls.
    gu = jnp.dot(x, wgu, preferred_element_type=jnp.float32)
    if use_bias:
        beh = beh_ref[0, i][:, None]  # [TM, 1] int32
        for a in range(btab_ref.shape[1]):
            gu = gu + jnp.where(beh == a, btab_ref[0, a][None, :].astype(
                jnp.float32), 0.0)
    return gu


def _fwd_kernel(seed_ref, beh_ref, x_ref, wgu_ref, wd_ref, btab_ref, out_ref,
                *, F, act_name, rate, use_bias):
    p = pl.program_id(0)
    i = pl.program_id(1)
    x = x_ref[0]
    gu = _gu_tile(x, wgu_ref[0], beh_ref, btab_ref, use_bias, i)
    h = _ACTS[act_name](gu[:, :F]) * gu[:, F:]
    if rate > 0.0:
        keep = dropout_keep_tile(seed_ref[0], p, i * TM, 0, (TM, F), rate)
        h = jnp.where(keep, h * (1.0 / keep_fraction(rate)), 0.0)
    out_ref[0] = jnp.dot(h.astype(x.dtype), wd_ref[0],
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, beh_ref, x_ref, wgu_ref, wd_ref, btab_ref, g_ref,
                dx_ref, dwgu_ref, dwd_ref, dbtab_ref,
                *, F, act_name, rate, use_bias):
    p = pl.program_id(0)
    i = pl.program_id(1)
    x = x_ref[0]
    wgu = wgu_ref[0]
    gout = g_ref[0]
    gu = _gu_tile(x, wgu, beh_ref, btab_ref, use_bias, i)
    g_, u = gu[:, :F], gu[:, F:]
    act = _ACTS[act_name]
    a, act_vjp = jax.vjp(act, g_)
    # dL/dh_drop = gout @ Wd^T   ([TM, Dout] x [F, Dout] -> [TM, F])
    dh = jax.lax.dot_general(gout, wd_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if rate > 0.0:
        keep = dropout_keep_tile(seed_ref[0], p, i * TM, 0, (TM, F), rate)
        inv = 1.0 / keep_fraction(rate)
        h_drop = jnp.where(keep, (a * u) * inv, 0.0)
        dh = jnp.where(keep, dh * inv, 0.0)
    else:
        h_drop = a * u
    dg = act_vjp(dh * u)[0]
    du = dh * a
    dgu = jnp.concatenate([dg, du], axis=1)  # [TM, 2F] f32
    dgu_c = dgu.astype(x.dtype)
    # dx = dgu @ Wgu^T  ([TM, 2F] x [D, 2F] -> [TM, D])
    dx_ref[0] = jax.lax.dot_general(dgu_c, wgu, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(dx_ref.dtype)
    # weight grads accumulate in f32 across the i grid axis (same out block)
    c_wgu = jax.lax.dot_general(x, dgu_c, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    c_wd = jax.lax.dot_general(h_drop.astype(x.dtype), gout,
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    if use_bias:
        # per-behavior masked row-sums of dgu (full-width [TM, 2F] reduces;
        # see the lane-width note in _gu_tile), stacked to [NB, 2F]
        beh = beh_ref[0, i][:, None]
        c_bt = jnp.concatenate(
            [jnp.sum(jnp.where(beh == a, dgu, 0.0), axis=0, keepdims=True)
             for a in range(btab_ref.shape[1])], axis=0)

    @pl.when(i == 0)
    def _init():
        dwgu_ref[0] = c_wgu
        dwd_ref[0] = c_wd
        if use_bias:
            dbtab_ref[0] = c_bt
        else:
            dbtab_ref[0] = jnp.zeros(btab_ref.shape[1:], jnp.float32)

    @pl.when(i > 0)
    def _acc():
        dwgu_ref[0] += c_wgu
        dwd_ref[0] += c_wd
        if use_bias:
            dbtab_ref[0] += c_bt


def _specs(P, T, D, F2, F, Dout, NB):
    row = lambda width: pl.BlockSpec((1, TM, width), lambda p, i: (p, i, 0))
    per_p = lambda a, b: pl.BlockSpec((1, a, b), lambda p, i: (p, 0, 0))
    return dict(
        seed=pl.BlockSpec(memory_space=pltpu.SMEM),
        # full [nT, TM] id plane per expert (tiny); a (1, 1, TM) row block
        # violates Mosaic's sublane rule (last-two block dims must divide
        # (8, 128) or equal the array dims) — the kernel row-slices instead
        beh=pl.BlockSpec((1, T // TM, TM), lambda p, i: (p, 0, 0)),
        x=row(D), wgu=per_p(D, F2), wd=per_p(F, Dout), btab=per_p(NB, F2),
        out=row(Dout),
        dwgu=per_p(D, F2), dwd=per_p(F, Dout), dbtab=per_p(NB, F2),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_moe_ffn(xp, wgu, wdown, btab, beh, seed,
                  act_name: str = "silu", rate: float = 0.0,
                  use_bias: bool = False, interpret: bool = False):
    """xp [P, T, D] (T % TM == 0, caller zero-pads), wgu [P, D, 2F],
    wdown [P, F, Dout], btab [P, NB, 2F], beh [P, T//TM, TM] int32, seed
    scalar -> [P, T, Dout]. Gradients flow to xp/wgu/wdown/btab."""
    return _forward(xp, wgu, wdown, btab, beh, seed,
                    act_name, rate, use_bias, interpret)


def _forward(xp, wgu, wdown, btab, beh, seed, act_name, rate, use_bias,
             interpret):
    P, T, D = xp.shape
    F2, F, Dout, NB = wgu.shape[2], wdown.shape[1], wdown.shape[2], btab.shape[1]
    assert T % TM == 0, f"T={T} must be a multiple of {TM}"
    s = _specs(P, T, D, F2, F, Dout, NB)
    kern = functools.partial(_fwd_kernel, F=F, act_name=act_name, rate=rate,
                             use_bias=use_bias)
    return pl.pallas_call(
        kern,
        grid=(P, T // TM),
        in_specs=[s["seed"], s["beh"], s["x"], s["wgu"], s["wd"], s["btab"]],
        out_specs=s["out"],
        out_shape=jax.ShapeDtypeStruct((P, T, Dout), xp.dtype),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), beh, xp, wgu, wdown, btab)


def _fwd_rule(xp, wgu, wdown, btab, beh, seed, act_name, rate, use_bias,
              interpret):
    out = _forward(xp, wgu, wdown, btab, beh, seed, act_name, rate, use_bias,
                   interpret)
    return out, (xp, wgu, wdown, btab, beh, seed)


def _bwd_rule(act_name, rate, use_bias, interpret, res, gout):
    xp, wgu, wdown, btab, beh, seed = res
    P, T, D = xp.shape
    F2, F, Dout, NB = wgu.shape[2], wdown.shape[1], wdown.shape[2], btab.shape[1]
    s = _specs(P, T, D, F2, F, Dout, NB)
    kern = functools.partial(_bwd_kernel, F=F, act_name=act_name, rate=rate,
                             use_bias=use_bias)
    dx, dwgu, dwd, dbtab = pl.pallas_call(
        kern,
        grid=(P, T // TM),
        in_specs=[s["seed"], s["beh"], s["x"], s["wgu"], s["wd"], s["btab"],
                  s["out"]],
        out_specs=(s["x"], s["dwgu"], s["dwd"], s["dbtab"]),
        out_shape=(jax.ShapeDtypeStruct(xp.shape, xp.dtype),
                   jax.ShapeDtypeStruct(wgu.shape, jnp.float32),
                   jax.ShapeDtypeStruct(wdown.shape, jnp.float32),
                   jax.ShapeDtypeStruct(btab.shape, jnp.float32)),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), beh, xp, wgu, wdown, btab,
      gout.astype(xp.dtype))
    return (dx, dwgu.astype(wgu.dtype), dwd.astype(wdown.dtype),
            dbtab.astype(btab.dtype), None, None)


fused_moe_ffn.defvjp(_fwd_rule, _bwd_rule)
