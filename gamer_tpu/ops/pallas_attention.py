"""Pallas TPU kernels: fused attention with the GAMER mask family (+ custom VJP).

The reference materializes [B, 1, S, S] float masks on the host and hands them
to CUDA SDPA (ref: SeqRec/models/generative/Qwen3Multi/model.py:573-741). The
jnp fallback (modules/layers.attend) builds masks lazily inside jit, but XLA
still writes [B, h, S, S] score tensors to HBM. These kernels keep scores in
VMEM: each program handles one (batch, head) — at GAMER scale (S <= ~1024,
D = 64) the full S x S score tile fits on-chip — evaluates the mask predicate
from the integer streams inside the kernel, and writes only O(S*D) per head.

A custom VJP provides the backward pass (jax cannot autodiff through
pallas_call): the backward kernel recomputes the masked softmax and emits
dq / dk / dv, accumulating dk/dv over the GQA query-head group so no atomics
are needed (grid over kv heads).

Supported mask kinds (semantics in ops/masks.py):
  self:  "causal" | "session"        cross: "multi" | "session_multi"
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


# ---------------------------------------------------------------------------
# Attention-prob dropout (ref applies attention_dropout inside SDPA during
# training, SeqRec/models/generative/Qwen3Multi/model.py:139). The keep-mask
# is a STATELESS hash of the element's absolute coordinates — a murmur3-style
# finalizer over (seed, batch*head, row, col) in plain integer ops. That makes
# the mask (a) identical between the forward and both backward kernels with no
# draw-order coupling between their different tilings, (b) identical between
# interpret (CPU) and compiled (TPU) modes, and (c) reproducible OUTSIDE the
# kernel for parity tests — none of which holds for the stateful hardware PRNG
# (pltpu.prng_random_bits), which also has no CPU interpret lowering.
# ---------------------------------------------------------------------------

import numpy as np

_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)
_M3 = np.uint32(0x9E3779B1)


def _fmix32(x):
    """Single-mul mixer (xorshift-multiply-xorshift): statistically
    equivalent for dropout to the murmur3 finalizer it replaced (keep rate
    exact by construction, row/col keep-count variance binomial, adjacent-
    lane correlation <0.3% measured offline) at half the VPU multiplies —
    on-chip A/B: 916.9 -> 932.6 seq/s/chip (+1.7%), main re-benched at
    916.1 after, so the gain is not drift (artifacts/perf_r4)."""
    x = x ^ (x >> 16)
    x = x * _M1
    x = x ^ (x >> 15)
    return x


def keep_fraction(rate: float) -> float:
    """Exact keep probability after uint32 threshold quantization."""
    thresh = min(int(round(rate * 4294967296.0)), 4294967295)
    return (4294967296 - thresh) / 4294967296.0


def dropout_keep_tile(seed, bh, r0, c0, shape, rate: float):
    """Boolean keep-mask tile for query rows [r0, r0+shape[0]) x key cols
    [c0, c0+shape[1]) of attention matrix (batch*num_heads + head) == bh.
    Pure function of absolute coordinates — any tiling draws the same mask.

    NEGATIVE RESULT (round 3, measured on-chip): packing two u16 Bernoullis
    per hash word (half-height fmix32 tile + sublane interleave via
    stack/reshape) halves the VPU hash multiplies but the interleave is a
    sublane shuffle on every [Sq, Sk] tile — the flagship train step fell
    919 -> 749 seq/s/chip (-19%). Same Mosaic trap as the round-1 in-kernel
    RoPE fusion (docs/benchmarks.md). One full-height hash per element is
    the fast layout; don't re-pack without an on-chip A/B."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(r0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + jnp.uint32(c0)
    x = (rows * _M3 + cols * _M1
         + jnp.uint32(bh) * _M2 + jnp.uint32(seed))
    thresh = min(int(round(rate * 4294967296.0)), 4294967295)
    return _fmix32(x) >= jnp.uint32(thresh)


def _mask_tile(kind: str, qpos, kpos, q_sid, k_sid, q_act, k_act, q_blk, k_blk, k_ok):
    """Boolean allowed tile [Sq, Sk] from per-token streams."""
    causal = qpos[:, None] >= kpos[None, :]
    if kind == "causal":
        allowed = causal
    elif kind == "session":
        same_block = (q_blk[:, None] == k_blk[None, :]) & (q_blk[:, None] >= 0)
        allowed = (same_block & causal) | (k_sid[None, :] < q_sid[:, None])
    elif kind == "multi":
        allowed = causal & (k_act[None, :] < q_act[:, None])
    elif kind == "session_multi":
        allowed = (k_sid[None, :] < q_sid[:, None]) & (k_act[None, :] < q_act[:, None])
    else:
        raise ValueError(kind)
    return allowed & (k_ok[None, :] == 1)


def _streams_from_refs(attn_ref, sid_ref, act_ref, blk_ref, S):
    pos = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)[:, 0]
    return pos, attn_ref[0, 0], sid_ref[0, 0], act_ref[0, 0], blk_ref[0, 0]


def _masked_probs(kind, q, k, scale, pos, k_ok, sid, act, blk, rows=None):
    """rows=(r0, r1) restricts the query side to a row chunk (flash-style
    blocked backward); streams are always full-length key-side vectors."""
    if rows is None:
        qpos, qsid, qact, qblk = pos, sid, act, blk
    else:
        r0, r1 = rows
        qpos, qsid, qact, qblk = pos[r0:r1], sid[r0:r1], act[r0:r1], blk[r0:r1]
    allowed = _mask_tile(kind, qpos, pos, qsid, sid, qact, act, qblk, blk, k_ok)
    # operands in their native dtype (bf16 on the train path): the MXU
    # accumulates in fp32 via preferred_element_type, and skipping the f32
    # casts avoids [S,D] fp32 copies in VMEM
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    scores = jnp.where(allowed, scores, NEG)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    # no-key rows (the mask allows nothing — e.g. min-action rows of the
    # "multi" cross mask) output ZERO probs -> zero out AND zero grads, the
    # same contract in every kernel generation and the jnp path
    # (docs/parity.md divergence #13)
    return jnp.where(jnp.any(allowed, axis=-1, keepdims=True), probs, 0.0)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, attn_ref, sid_ref, act_ref,
                blk_ref, out_ref, *, kind: str, scale: float, num_heads: int,
                rate: float):
    """One program per batch element; heads are static column slices of the
    projection-native [S, H*D] block (one HBM pass, no transposes).
    rate > 0: attention-prob dropout (training), applied per 256-row chunk so
    the uint32 hash tile never adds a full [S, S] VMEM tensor."""
    S, HD = q_ref.shape[1], q_ref.shape[2]
    D = HD // num_heads
    G = num_heads // (k_ref.shape[2] // D)
    pos, k_ok, sid, act, blk = _streams_from_refs(attn_ref, sid_ref, act_ref, blk_ref, S)
    b = pl.program_id(0)
    for h in range(num_heads):
        q = q_ref[0, :, h * D:(h + 1) * D]
        kc = (h // G) * D
        k = k_ref[0, :, kc:kc + D]
        v = v_ref[0, :, kc:kc + D]
        if rate == 0.0:
            probs = _masked_probs(kind, q, k, scale, pos, k_ok, sid, act, blk)
            out_ref[0, :, h * D:(h + 1) * D] = jnp.dot(
                probs.astype(v.dtype), v,
                preferred_element_type=jnp.float32).astype(out_ref.dtype)
        else:
            inv_keep = 1.0 / keep_fraction(rate)
            for r0 in range(0, S, 256):
                r1 = min(S, r0 + 256)
                P = _masked_probs(kind, q_ref[0, r0:r1, h * D:(h + 1) * D], k,
                                  scale, pos, k_ok, sid, act, blk, rows=(r0, r1))
                keep = dropout_keep_tile(seed_ref[0], b * num_heads + h, r0, 0,
                                         (r1 - r0, S), rate)
                Pd = jnp.where(keep, P * inv_keep, 0.0).astype(v.dtype)
                out_ref[0, r0:r1, h * D:(h + 1) * D] = jnp.dot(
                    Pd, v, preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, dout_ref, attn_ref, sid_ref,
                act_ref, blk_ref, dq_ref, dk_ref, dv_ref, *, kind: str,
                scale: float, num_heads: int, groups: int, rate: float):
    """One program per batch element: loops kv heads x their GQA query group,
    recomputes probs and emits gradients (flash-attention backward math)."""
    S = k_ref.shape[1]
    D = k_ref.shape[2] // (num_heads // groups)
    pos, k_ok, sid, act, blk = _streams_from_refs(attn_ref, sid_ref, act_ref, blk_ref, S)

    # Operands stay in the input dtype (bf16 in training) — the MXU takes them
    # natively with fp32 accumulation via preferred_element_type. Only P/dP are
    # fp32 [S,S]; dS is rounded to the input dtype immediately so at most two
    # fp32 [S,S] tensors are ever live (S=1024 OOMs VMEM otherwise).
    dt = q_ref.dtype
    b = pl.program_id(0)
    # query rows are processed in chunks so only [C, S] score-sized fp32
    # temporaries live in VMEM at once — whole-row backward OOMs at S ~ 1024
    # (the dropout path carries an extra fp32 [C, S], hence the smaller chunk)
    CHUNK = 512 if rate == 0.0 else 256
    inv_keep = 1.0 / keep_fraction(rate) if rate > 0.0 else 1.0
    for hk in range(num_heads // groups):
        k = k_ref[0, :, hk * D:(hk + 1) * D]
        v = v_ref[0, :, hk * D:(hk + 1) * D]
        dk_acc = jnp.zeros((S, D), jnp.float32)
        dv_acc = jnp.zeros((S, D), jnp.float32)
        for g in range(groups):
            col = (hk * groups + g) * D
            for r0 in range(0, S, CHUNK):
                r1 = min(S, r0 + CHUNK)
                q = q_ref[0, r0:r1, col:col + D]
                dout = dout_ref[0, r0:r1, col:col + D]
                P = _masked_probs(kind, q, k, scale, pos, k_ok, sid, act, blk,
                                  rows=(r0, r1))  # [C, S] f32
                if rate > 0.0:
                    keep = dropout_keep_tile(seed_ref[0],
                                             b * num_heads + hk * groups + g,
                                             r0, 0, (r1 - r0, S), rate)
                    # dropped prob matrix: O/dV/Drow see it; softmax bwd keeps
                    # the undropped P against the row correction
                    P_use = jnp.where(keep, P * inv_keep, 0.0)
                else:
                    P_use = P
                Pd = P_use.astype(dt)
                # all uses of P precede dS so its buffer can be reclaimed
                dv_acc += jnp.dot(Pd.T, dout, preferred_element_type=jnp.float32)
                Drow = jnp.sum(dout.astype(jnp.float32)
                               * jnp.dot(Pd, v, preferred_element_type=jnp.float32),
                               axis=-1, keepdims=True)
                dP = jnp.dot(dout, v.T, preferred_element_type=jnp.float32)
                # dS = P*(M/keep*dP - Drow) = P_use*dP - P*Drow
                dS = (P_use * dP - P * Drow).astype(dt)  # P and dP die here
                dq_ref[0, r0:r1, col:col + D] = (
                    jnp.dot(dS, k, preferred_element_type=jnp.float32) * scale
                ).astype(dq_ref.dtype)
                dk_acc += jnp.dot(dS.T, q, preferred_element_type=jnp.float32) * scale
        dk_ref[0, :, hk * D:(hk + 1) * D] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, hk * D:(hk + 1) * D] = dv_acc.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Streaming (flash) path for S > MONO_MAX: the monolithic kernels above keep a
# full [S, S] (fwd) / [C, S] (bwd) score tile in VMEM, which caps S at ~1024.
# The streaming kernels grid over query chunks with an online softmax over key
# blocks (forward saves the per-row logsumexp), and split the backward into a
# dq kernel (grid over query chunks) and a dk/dv kernel (grid over key blocks)
# — the flash-attention-2 structure, with the GAMER mask predicates evaluated
# per tile from the integer streams. Replaces the reference's
# flash-attention-2 option (ref Qwen3Multi/model.py:123-131) for long context.
# ---------------------------------------------------------------------------

MONO_MAX = 1024  # monolithic kernels above handle S <= MONO_MAX
# Up to STREAM_MAX the fwd/dq streaming kernels keep full-row k/v in VMEM
# (fastest: keys fetched once per program). Beyond it the XL kernels below
# take over: the key axis becomes the minor-most GRID dimension with the
# online-softmax state carried in VMEM scratch, so k/v arrive as [KC] tiles
# through the Pallas pipeline (auto double-buffered DMA) and S is unbounded.
STREAM_MAX = 4096
_QC = 512  # query-chunk rows (grid dim)
_KC = 512  # key-block columns (inner online-softmax loop)
# dkv kernel holds FULL q/dout rows in VMEM on top of its tiles; a smaller
# inner query chunk keeps its peak under the 16MB scoped-vmem limit at S=4096
_QC_DKV = 256

# kinds whose predicate implies j <= i: key blocks past the query chunk (and
# query chunks before the key block, in the dkv kernel) can be skipped
_CAUSAL_BOUNDED = ("causal", "multi")


def _stream_fwd_kernel(seed_ref, q_ref, k_ref, v_ref,
                       qattn_ref, qsid_ref, qact_ref, qblk_ref,
                       kattn_ref, ksid_ref, kact_ref, kblk_ref,
                       out_ref, lse_ref, *, kind, scale, num_heads, rate):
    """Grid (B, nQ). q/out blocks [1, QC, H*D]; k/v full rows [1, S, Hkv*D];
    q-side streams [1, 1, QC] (chunked), k-side streams [1, 1, S] (full).
    lse_ref [1, num_heads, QC]: per-row logsumexp saved for the backward."""
    QC = q_ref.shape[1]
    S = k_ref.shape[1]
    D = q_ref.shape[2] // num_heads
    G = num_heads // (k_ref.shape[2] // D)
    b = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * QC
    qpos = jax.lax.broadcasted_iota(jnp.int32, (QC, 1), 0)[:, 0] + r0
    qsid, qact, qblk = qsid_ref[0, 0], qact_ref[0, 0], qblk_ref[0, 0]

    nK = S // _KC
    if kind in _CAUSAL_BOUNDED:
        # last key block intersecting j <= max(qpos) = r0 + QC - 1
        n_blocks = (r0 + QC + _KC - 1) // _KC
    else:
        n_blocks = nK
    for h in range(num_heads):
        q = q_ref[0, :, h * D:(h + 1) * D]
        kcol = ((h // G)) * D

        def body(j, carry):
            m, l, acc = carry
            j0 = j * _KC
            k = k_ref[0, pl.ds(j0, _KC), kcol:kcol + D]
            v = v_ref[0, pl.ds(j0, _KC), kcol:kcol + D]
            kpos = jax.lax.broadcasted_iota(jnp.int32, (_KC, 1), 0)[:, 0] + j0
            k_ok = kattn_ref[0, 0, pl.ds(j0, _KC)]
            ksid = ksid_ref[0, 0, pl.ds(j0, _KC)]
            kact = kact_ref[0, 0, pl.ds(j0, _KC)]
            kblk = kblk_ref[0, 0, pl.ds(j0, _KC)]
            allowed = _mask_tile(kind, qpos, kpos, qsid, ksid, qact, kact,
                                 qblk, kblk, k_ok)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            s = jnp.where(allowed, s, NEG)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            # l accumulates the UNDROPPED softmax denominator; dropout zeroes
            # contributions to the numerator only (out is rescaled below)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            if rate > 0.0:
                keep = dropout_keep_tile(seed_ref[0], b * num_heads + h,
                                         r0, j0, (QC, _KC), rate)
                p = jnp.where(keep, p, 0.0)
            acc = acc * corr + jnp.dot(p.astype(v.dtype), v,
                                       preferred_element_type=jnp.float32)
            return m_new, l, acc

        m0 = jnp.full((QC, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((QC, 1), jnp.float32)
        a0 = jnp.zeros((QC, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, a0))
        l_safe = jnp.maximum(l, 1e-30)
        inv_keep = 1.0 / keep_fraction(rate) if rate > 0.0 else 1.0
        # no-key rows (m never rose above the NEG fill): zero output, and an
        # lse sentinel of +1e30 makes every backward P = exp(s - lse) vanish
        # -> zero grads with no extra backward logic (divergence #13)
        has_key = m > NEG * 0.5
        out = jnp.where(has_key, acc * inv_keep / l_safe, 0.0)
        out_ref[0, :, h * D:(h + 1) * D] = out.astype(out_ref.dtype)
        lse_ref[0, h, :] = jnp.where(has_key[:, 0],
                                     m[:, 0] + jnp.log(l_safe[:, 0]), 1e30)


def _stream_dq_kernel(seed_ref, q_ref, k_ref, v_ref, dout_ref, lse_ref,
                      delta_ref, qattn_ref, qsid_ref, qact_ref, qblk_ref,
                      kattn_ref, ksid_ref, kact_ref, kblk_ref,
                      dq_ref, *, kind, scale, num_heads, rate):
    """Grid (B, nQ). Recompute P from the saved logsumexp per key block and
    accumulate dq for the chunk. delta_ref [1, num_heads, QC] = rowsum(dO*O)."""
    QC = q_ref.shape[1]
    S = k_ref.shape[1]
    D = q_ref.shape[2] // num_heads
    G = num_heads // (k_ref.shape[2] // D)
    dt = q_ref.dtype
    b = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * QC
    qpos = jax.lax.broadcasted_iota(jnp.int32, (QC, 1), 0)[:, 0] + r0
    qsid, qact, qblk = qsid_ref[0, 0], qact_ref[0, 0], qblk_ref[0, 0]
    inv_keep = 1.0 / keep_fraction(rate) if rate > 0.0 else 1.0

    if kind in _CAUSAL_BOUNDED:
        n_blocks = (r0 + QC + _KC - 1) // _KC
    else:
        n_blocks = S // _KC
    for h in range(num_heads):
        q = q_ref[0, :, h * D:(h + 1) * D]
        dout = dout_ref[0, :, h * D:(h + 1) * D]
        lse = lse_ref[0, h, :][:, None]
        delta = delta_ref[0, h, :][:, None]
        kcol = (h // G) * D

        def body(j, dq_acc):
            j0 = j * _KC
            k = k_ref[0, pl.ds(j0, _KC), kcol:kcol + D]
            v = v_ref[0, pl.ds(j0, _KC), kcol:kcol + D]
            kpos = jax.lax.broadcasted_iota(jnp.int32, (_KC, 1), 0)[:, 0] + j0
            k_ok = kattn_ref[0, 0, pl.ds(j0, _KC)]
            ksid = ksid_ref[0, 0, pl.ds(j0, _KC)]
            kact = kact_ref[0, 0, pl.ds(j0, _KC)]
            kblk = kblk_ref[0, 0, pl.ds(j0, _KC)]
            allowed = _mask_tile(kind, qpos, kpos, qsid, ksid, qact, kact,
                                 qblk, kblk, k_ok)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            s = jnp.where(allowed, s, NEG)
            P = jnp.exp(s - lse)  # [QC, KC] f32
            dP = jnp.dot(dout, v.T, preferred_element_type=jnp.float32)
            if rate > 0.0:
                keep = dropout_keep_tile(seed_ref[0], b * num_heads + h,
                                         r0, j0, (QC, _KC), rate)
                P_use = jnp.where(keep, P * inv_keep, 0.0)
                dS = (P_use * dP - P * delta).astype(dt)
            else:
                dS = (P * (dP - delta)).astype(dt)
            return dq_acc + jnp.dot(dS, k, preferred_element_type=jnp.float32)

        dq = jax.lax.fori_loop(0, n_blocks, body, jnp.zeros((QC, D), jnp.float32))
        dq_ref[0, :, h * D:(h + 1) * D] = (dq * scale).astype(dq_ref.dtype)


def _stream_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, dout_ref, lse_ref,
                       delta_ref, qattn_ref, qsid_ref, qact_ref, qblk_ref,
                       kattn_ref, ksid_ref, kact_ref, kblk_ref,
                       dk_ref, dv_ref, dk_s, dv_s, *, kind, scale, num_heads,
                       groups, rate):
    """Grid (B, nK, nQd) — the query-chunk axis is a GRID dimension, not an
    in-kernel loop: full-row q/dout VMEM residency (double-buffered) blew the
    16MB scoped-vmem limit at S=4096. dk/dv accumulate in f32 VMEM scratch
    (persists across the minor-most, sequentially-executed i axis) and are
    written to the output block — indexed by the key block only — at the last
    query chunk."""
    KC = k_ref.shape[1]
    QCd = q_ref.shape[1]
    D = q_ref.shape[2] // num_heads
    dt = q_ref.dtype
    b = pl.program_id(0)
    jk = pl.program_id(1)
    i = pl.program_id(2)
    inv_keep = 1.0 / keep_fraction(rate) if rate > 0.0 else 1.0
    j0 = jk * KC
    r0 = i * QCd
    kpos = jax.lax.broadcasted_iota(jnp.int32, (KC, 1), 0)[:, 0] + j0
    qpos = jax.lax.broadcasted_iota(jnp.int32, (QCd, 1), 0)[:, 0] + r0
    k_ok, ksid = kattn_ref[0, 0], ksid_ref[0, 0]
    kact, kblk = kact_ref[0, 0], kblk_ref[0, 0]
    qsid, qact, qblk = qsid_ref[0, 0], qact_ref[0, 0], qblk_ref[0, 0]

    @pl.when(i == 0)
    def _init():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    # causal-bounded kinds: query chunks strictly before the key block
    # contribute nothing — skip their compute (the DMA already happened)
    relevant = (r0 + QCd - 1 >= j0) if kind in _CAUSAL_BOUNDED else (i >= 0)

    @pl.when(relevant)
    def _accumulate():
        for hk in range(num_heads // groups):
            k = k_ref[0, :, hk * D:(hk + 1) * D]
            v = v_ref[0, :, hk * D:(hk + 1) * D]
            dk_acc = jnp.zeros((KC, D), jnp.float32)
            dv_acc = jnp.zeros((KC, D), jnp.float32)
            for g in range(groups):
                h = hk * groups + g
                col = h * D
                q = q_ref[0, :, col:col + D]
                dout = dout_ref[0, :, col:col + D]
                lse = lse_ref[0, h, :][:, None]
                delta = delta_ref[0, h, :][:, None]
                allowed = _mask_tile(kind, qpos, kpos, qsid, ksid, qact, kact,
                                     qblk, kblk, k_ok)
                s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
                s = jnp.where(allowed, s, NEG)
                P = jnp.exp(s - lse)  # [QCd, KC] f32
                if rate > 0.0:
                    keep = dropout_keep_tile(seed_ref[0], b * num_heads + h,
                                             r0, j0, (QCd, KC), rate)
                    P_use = jnp.where(keep, P * inv_keep, 0.0)
                else:
                    P_use = P
                Pd = P_use.astype(dt)
                dv_acc = dv_acc + jnp.dot(Pd.T, dout,
                                          preferred_element_type=jnp.float32)
                dP = jnp.dot(dout, v.T, preferred_element_type=jnp.float32)
                dS = (P_use * dP - P * delta).astype(dt)
                dk_acc = dk_acc + jnp.dot(dS.T, q,
                                          preferred_element_type=jnp.float32) * scale
            sl = slice(hk * D, (hk + 1) * D)
            dk_s[:, sl] = dk_s[:, sl] + dk_acc
            dv_s[:, sl] = dv_s[:, sl] + dv_acc

    @pl.when(i == pl.num_programs(2) - 1)
    def _emit():
        dk_ref[0] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_s[...].astype(dv_ref.dtype)


def _stream_fwd_kernel_xl(seed_ref, q_ref, k_ref, v_ref,
                          qattn_ref, qsid_ref, qact_ref, qblk_ref,
                          kattn_ref, ksid_ref, kact_ref, kblk_ref,
                          out_ref, lse_ref, m_s, l_s, acc_s,
                          *, kind, scale, num_heads, rate):
    """Arbitrary-S forward: grid (B, nQ, nK) with the KEY axis minor-most.
    k/v arrive as [1, KC, Hkv*D] pipeline tiles; the online-softmax state
    (m, l, acc) lives in VMEM scratch across the j axis and the normalized
    output + logsumexp are emitted at the last key block. Unlike the
    bounded-S kernels, k/v never need full-row VMEM residency."""
    QC = q_ref.shape[1]
    KC = k_ref.shape[1]
    D = q_ref.shape[2] // num_heads
    G = num_heads // (k_ref.shape[2] // D)
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    r0, j0 = i * QC, j * KC
    qpos = jax.lax.broadcasted_iota(jnp.int32, (QC, 1), 0)[:, 0] + r0
    kpos = jax.lax.broadcasted_iota(jnp.int32, (KC, 1), 0)[:, 0] + j0
    qsid, qact, qblk = qsid_ref[0, 0], qact_ref[0, 0], qblk_ref[0, 0]
    k_ok, ksid = kattn_ref[0, 0], ksid_ref[0, 0]
    kact, kblk = kact_ref[0, 0], kblk_ref[0, 0]

    @pl.when(j == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, -1e30)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    relevant = (j0 <= r0 + QC - 1) if kind in _CAUSAL_BOUNDED else (j >= 0)

    @pl.when(relevant)
    def _accumulate():
        allowed = _mask_tile(kind, qpos, kpos, qsid, ksid, qact, kact,
                             qblk, kblk, k_ok)
        for h in range(num_heads):
            q = q_ref[0, :, h * D:(h + 1) * D]
            kcol = (h // G) * D
            k = k_ref[0, :, kcol:kcol + D]
            v = v_ref[0, :, kcol:kcol + D]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            s = jnp.where(allowed, s, NEG)
            m_prev = m_s[h, :][:, None]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_s[h, :] = l_s[h, :] * corr[:, 0] + jnp.sum(p, axis=-1)
            if rate > 0.0:
                keep = dropout_keep_tile(seed_ref[0], b * num_heads + h,
                                         r0, j0, (QC, KC), rate)
                p = jnp.where(keep, p, 0.0)
            sl = slice(h * D, (h + 1) * D)
            acc_s[:, sl] = acc_s[:, sl] * corr + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            m_s[h, :] = m_new[:, 0]

    @pl.when(j == pl.num_programs(2) - 1)
    def _emit():
        inv_keep = 1.0 / keep_fraction(rate) if rate > 0.0 else 1.0
        for h in range(num_heads):
            l_safe = jnp.maximum(l_s[h, :], 1e-30)[:, None]
            sl = slice(h * D, (h + 1) * D)
            # no-key rows: zero out + lse sentinel (see _stream_fwd_kernel)
            has_key = m_s[h, :][:, None] > NEG * 0.5
            out = jnp.where(has_key, acc_s[:, sl] * inv_keep / l_safe, 0.0)
            out_ref[0, :, sl] = out.astype(out_ref.dtype)
            lse_ref[0, h, :] = jnp.where(has_key[:, 0],
                                         m_s[h, :] + jnp.log(l_safe[:, 0]), 1e30)


def _stream_dq_kernel_xl(seed_ref, q_ref, k_ref, v_ref, dout_ref, lse_ref,
                         delta_ref, qattn_ref, qsid_ref, qact_ref, qblk_ref,
                         kattn_ref, ksid_ref, kact_ref, kblk_ref,
                         dq_ref, dq_s, *, kind, scale, num_heads, rate):
    """Arbitrary-S dq: grid (B, nQ, nK), dq accumulated in VMEM scratch
    across the minor-most key axis (same P-recompute math as
    _stream_dq_kernel, k/v as pipeline tiles instead of full rows)."""
    QC = q_ref.shape[1]
    KC = k_ref.shape[1]
    D = q_ref.shape[2] // num_heads
    G = num_heads // (k_ref.shape[2] // D)
    dt = q_ref.dtype
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    r0, j0 = i * QC, j * KC
    qpos = jax.lax.broadcasted_iota(jnp.int32, (QC, 1), 0)[:, 0] + r0
    kpos = jax.lax.broadcasted_iota(jnp.int32, (KC, 1), 0)[:, 0] + j0
    qsid, qact, qblk = qsid_ref[0, 0], qact_ref[0, 0], qblk_ref[0, 0]
    k_ok, ksid = kattn_ref[0, 0], ksid_ref[0, 0]
    kact, kblk = kact_ref[0, 0], kblk_ref[0, 0]
    inv_keep = 1.0 / keep_fraction(rate) if rate > 0.0 else 1.0

    @pl.when(j == 0)
    def _init():
        dq_s[...] = jnp.zeros_like(dq_s)

    relevant = (j0 <= r0 + QC - 1) if kind in _CAUSAL_BOUNDED else (j >= 0)

    @pl.when(relevant)
    def _accumulate():
        allowed = _mask_tile(kind, qpos, kpos, qsid, ksid, qact, kact,
                             qblk, kblk, k_ok)
        for h in range(num_heads):
            q = q_ref[0, :, h * D:(h + 1) * D]
            dout = dout_ref[0, :, h * D:(h + 1) * D]
            lse = lse_ref[0, h, :][:, None]
            delta = delta_ref[0, h, :][:, None]
            kcol = (h // G) * D
            k = k_ref[0, :, kcol:kcol + D]
            v = v_ref[0, :, kcol:kcol + D]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            s = jnp.where(allowed, s, NEG)
            P = jnp.exp(s - lse)
            dP = jnp.dot(dout, v.T, preferred_element_type=jnp.float32)
            if rate > 0.0:
                keep = dropout_keep_tile(seed_ref[0], b * num_heads + h,
                                         r0, j0, (QC, KC), rate)
                P_use = jnp.where(keep, P * inv_keep, 0.0)
                dS = (P_use * dP - P * delta).astype(dt)
            else:
                dS = (P * (dP - delta)).astype(dt)
            sl = slice(h * D, (h + 1) * D)
            dq_s[:, sl] = dq_s[:, sl] + jnp.dot(
                dS, k, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _emit():
        dq_ref[0] = (dq_s[...] * scale).astype(dq_ref.dtype)


def _pad_s(x, S_pad, axis=1, fill=0):
    S = x.shape[axis]
    if S == S_pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, S_pad - S)
    return jnp.pad(x, widths, constant_values=fill)


def _stream_pad_inputs(q, k, v, attention_mask, session_ids, actions, block_ids):
    """Pad S to a multiple of the chunk size. Padded keys carry attn=0 (fully
    masked out); padded query rows produce garbage that the caller slices off
    (and contribute zero gradient because their dout is zero-padded)."""
    S = q.shape[1]
    chunk = max(_QC, _KC, _QC_DKV)
    S_pad = -(-S // chunk) * chunk
    return (S, S_pad,
            _pad_s(q, S_pad), _pad_s(k, S_pad), _pad_s(v, S_pad),
            _pad_s(attention_mask, S_pad), _pad_s(session_ids, S_pad),
            _pad_s(actions, S_pad), _pad_s(block_ids, S_pad, fill=-1))


def _forward_streaming(q, k, v, attention_mask, session_ids, actions, block_ids,
                       seed, num_heads, kind, interpret, rate):
    S, S_pad, q, k, v, attn, sid, act, blk = _stream_pad_inputs(
        q, k, v, attention_mask, session_ids, actions, block_ids)
    B, _, HD = q.shape
    D = HD // num_heads
    KW = k.shape[2]
    nQ = S_pad // _QC
    streams = _stream_args(attn, sid, act, blk)

    if S_pad > STREAM_MAX:  # XL: key axis on the grid, k/v as pipeline tiles
        nK = S_pad // _KC
        kernel = functools.partial(_stream_fwd_kernel_xl, kind=kind,
                                   scale=D ** -0.5, num_heads=num_heads,
                                   rate=rate)
        qspec = lambda width: pl.BlockSpec((1, _QC, width), lambda b, i, j: (b, i, 0))
        kspec = lambda width: pl.BlockSpec((1, _KC, width), lambda b, i, j: (b, j, 0))
        qstream = pl.BlockSpec((1, 1, _QC), lambda b, i, j: (b, 0, i))
        kstream = pl.BlockSpec((1, 1, _KC), lambda b, i, j: (b, 0, j))
        out, lse = pl.pallas_call(
            kernel,
            grid=(B, nQ, nK),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      qspec(HD), kspec(KW), kspec(KW),
                      qstream, qstream, qstream, qstream,
                      kstream, kstream, kstream, kstream],
            out_specs=(qspec(HD),
                       pl.BlockSpec((1, num_heads, _QC), lambda b, i, j: (b, 0, i))),
            out_shape=(jax.ShapeDtypeStruct((B, S_pad, HD), q.dtype),
                       jax.ShapeDtypeStruct((B, num_heads, S_pad), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((num_heads, _QC), jnp.float32),
                            pltpu.VMEM((num_heads, _QC), jnp.float32),
                            pltpu.VMEM((_QC, HD), jnp.float32)],
            interpret=interpret,
        )(_seed_arr(seed), q, k, v, *streams, *streams)
        return out[:, :S], lse

    kernel = functools.partial(_stream_fwd_kernel, kind=kind, scale=D ** -0.5,
                               num_heads=num_heads, rate=rate)
    qspec = lambda width: pl.BlockSpec((1, _QC, width), lambda b, i: (b, i, 0))
    full = lambda width: pl.BlockSpec((1, S_pad, width), lambda b, i: (b, 0, 0))
    qstream = pl.BlockSpec((1, 1, _QC), lambda b, i: (b, 0, i))
    kstream = pl.BlockSpec((1, 1, S_pad), lambda b, i: (b, 0, 0))
    out, lse = pl.pallas_call(
        kernel,
        grid=(B, nQ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), qspec(HD), full(KW), full(KW),
                  qstream, qstream, qstream, qstream,
                  kstream, kstream, kstream, kstream],
        out_specs=(qspec(HD),
                   pl.BlockSpec((1, num_heads, _QC), lambda b, i: (b, 0, i))),
        out_shape=(jax.ShapeDtypeStruct((B, S_pad, HD), q.dtype),
                   jax.ShapeDtypeStruct((B, num_heads, S_pad), jnp.float32)),
        interpret=interpret,
    )(_seed_arr(seed), q, k, v, *streams, *streams)
    return out[:, :S], lse


def _bwd_streaming(q, k, v, dout, out, lse, attention_mask, session_ids,
                   actions, block_ids, seed, num_heads, kind, interpret, rate):
    S, S_pad, q, k, v, attn, sid, act, blk = _stream_pad_inputs(
        q, k, v, attention_mask, session_ids, actions, block_ids)
    dout = _pad_s(dout, S_pad)
    lse = _pad_s(lse, S_pad, axis=2)
    B, _, HD = q.shape
    D = HD // num_heads
    KW = k.shape[2]
    Hkv = KW // D
    G = num_heads // Hkv
    nQ = S_pad // _QC
    nK = S_pad // _KC
    # delta_i = rowsum(dO_i * O_i) per head — tiny fused XLA reduce
    delta = (dout.astype(jnp.float32)
             * _pad_s(out, S_pad).astype(jnp.float32)).reshape(
        B, S_pad, num_heads, D).sum(-1).transpose(0, 2, 1)  # [B, H, S_pad]

    qspec = lambda width: pl.BlockSpec((1, _QC, width), lambda b, i: (b, i, 0))
    fullq = lambda width: pl.BlockSpec((1, S_pad, width), lambda b, i: (b, 0, 0))
    qrow = pl.BlockSpec((1, num_heads, _QC), lambda b, i: (b, 0, i))
    qstream_c = pl.BlockSpec((1, 1, _QC), lambda b, i: (b, 0, i))
    stream_f = pl.BlockSpec((1, 1, S_pad), lambda b, i: (b, 0, 0))
    streams = _stream_args(attn, sid, act, blk)

    if S_pad > STREAM_MAX:  # XL: key axis on the grid, k/v as pipeline tiles
        nKx = S_pad // _KC
        qspec_x = lambda width: pl.BlockSpec((1, _QC, width), lambda b, i, j: (b, i, 0))
        kspec_x = lambda width: pl.BlockSpec((1, _KC, width), lambda b, i, j: (b, j, 0))
        qrow_x = pl.BlockSpec((1, num_heads, _QC), lambda b, i, j: (b, 0, i))
        qstream_x = pl.BlockSpec((1, 1, _QC), lambda b, i, j: (b, 0, i))
        kstream_x = pl.BlockSpec((1, 1, _KC), lambda b, i, j: (b, 0, j))
        dq = pl.pallas_call(
            functools.partial(_stream_dq_kernel_xl, kind=kind, scale=D ** -0.5,
                              num_heads=num_heads, rate=rate),
            grid=(B, nQ, nKx),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      qspec_x(HD), kspec_x(KW), kspec_x(KW), qspec_x(HD),
                      qrow_x, qrow_x,
                      qstream_x, qstream_x, qstream_x, qstream_x,
                      kstream_x, kstream_x, kstream_x, kstream_x],
            out_specs=qspec_x(HD),
            out_shape=jax.ShapeDtypeStruct((B, S_pad, HD), q.dtype),
            scratch_shapes=[pltpu.VMEM((_QC, HD), jnp.float32)],
            interpret=interpret,
        )(_seed_arr(seed), q, k, v, dout, lse, delta, *streams, *streams)
    else:
        dq = pl.pallas_call(
            functools.partial(_stream_dq_kernel, kind=kind, scale=D ** -0.5,
                              num_heads=num_heads, rate=rate),
            grid=(B, nQ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), qspec(HD), fullq(KW), fullq(KW), qspec(HD),
                      qrow, qrow,
                      qstream_c, qstream_c, qstream_c, qstream_c,
                      stream_f, stream_f, stream_f, stream_f],
            out_specs=qspec(HD),
            out_shape=jax.ShapeDtypeStruct((B, S_pad, HD), q.dtype),
            interpret=interpret,
        )(_seed_arr(seed), q, k, v, dout, lse, delta, *streams, *streams)

    # dkv: 3D grid — q-side operands arrive as [QC_DKV] chunks along the
    # minor-most axis; dk/dv accumulate in f32 scratch across it
    nQd = S_pad // _QC_DKV
    qspec_d = lambda width: pl.BlockSpec((1, _QC_DKV, width),
                                         lambda b, j, i: (b, i, 0))
    kspec_d = lambda width: pl.BlockSpec((1, _KC, width),
                                         lambda b, j, i: (b, j, 0))
    qrow_d = pl.BlockSpec((1, num_heads, _QC_DKV), lambda b, j, i: (b, 0, i))
    qstream_d = pl.BlockSpec((1, 1, _QC_DKV), lambda b, j, i: (b, 0, i))
    kstream_d = pl.BlockSpec((1, 1, _KC), lambda b, j, i: (b, 0, j))
    dk, dv = pl.pallas_call(
        functools.partial(_stream_dkv_kernel, kind=kind, scale=D ** -0.5,
                          num_heads=num_heads, groups=G, rate=rate),
        grid=(B, nK, nQd),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), qspec_d(HD), kspec_d(KW), kspec_d(KW), qspec_d(HD),
                  qrow_d, qrow_d,
                  qstream_d, qstream_d, qstream_d, qstream_d,
                  kstream_d, kstream_d, kstream_d, kstream_d],
        out_specs=(kspec_d(KW), kspec_d(KW)),
        out_shape=(jax.ShapeDtypeStruct((B, S_pad, KW), k.dtype),
                   jax.ShapeDtypeStruct((B, S_pad, KW), v.dtype)),
        scratch_shapes=[pltpu.VMEM((_KC, KW), jnp.float32),
                        pltpu.VMEM((_KC, KW), jnp.float32)],
        interpret=interpret,
    )(_seed_arr(seed), q, k, v, dout, lse, delta, *streams, *streams)
    return dq[:, :S], dk[:, :S], dv[:, :S]


def _seed_arr(seed):
    """Scalar dropout seed as a [1] int32 SMEM operand."""
    return jnp.asarray(seed, jnp.int32).reshape(1)


def _stream_args(attention_mask, session_ids, actions, block_ids):
    return (attention_mask.astype(jnp.int32)[:, None, :],
            session_ids.astype(jnp.int32)[:, None, :],
            actions.astype(jnp.int32)[:, None, :],
            block_ids.astype(jnp.int32)[:, None, :])


def _stream_spec(S):
    return pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_mask_attention(q, k, v, attention_mask, session_ids, actions,
                         block_ids, dropout_seed,
                         num_heads: int, kind: str = "causal",
                         interpret: bool = False, dropout_rate: float = 0.0):
    """q [B, S, H*D] (projection-native layout, head h = columns [h*D,(h+1)*D)),
    k/v [B, S, Hkv*D] -> out [B, S, H*D].

    Taking the flat head-contiguous layout lets the BlockSpec index map slice
    one head per program as contiguous lanes — no [B,H,S,D] transpose copies on
    either side of the kernel. Masks are evaluated inside the kernel from the
    integer streams (all [B, S]).

    `dropout_rate` > 0 applies attention-prob dropout inside the kernel
    (training path; ref SDPA attention_dropout, Qwen3Multi/model.py:139) with
    the stateless hash mask keyed on `dropout_seed` — both backward kernels
    regenerate the identical mask from the same seed."""
    return _forward(q, k, v, attention_mask, session_ids, actions, block_ids,
                    dropout_seed, num_heads, kind, interpret, dropout_rate)


def _forward(q, k, v, attention_mask, session_ids, actions, block_ids,
             seed, num_heads, kind, interpret, rate):
    B, S, HD = q.shape
    if S > MONO_MAX:
        out, _ = _forward_streaming(q, k, v, attention_mask, session_ids,
                                    actions, block_ids, seed, num_heads, kind,
                                    interpret, rate)
        return out
    D = HD // num_heads
    kernel = functools.partial(_fwd_kernel, kind=kind, scale=D ** -0.5,
                               num_heads=num_heads, rate=rate)
    full = lambda width: pl.BlockSpec((1, S, width), lambda b: (b, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  full(HD), full(k.shape[2]), full(v.shape[2]),
                  _stream_spec(S), _stream_spec(S), _stream_spec(S), _stream_spec(S)],
        out_specs=full(HD),
        out_shape=jax.ShapeDtypeStruct((B, S, HD), q.dtype),
        interpret=interpret,
    )(_seed_arr(seed), q, k, v,
      *_stream_args(attention_mask, session_ids, actions, block_ids))


def _fwd_rule(q, k, v, attention_mask, session_ids, actions, block_ids,
              dropout_seed, num_heads, kind, interpret, dropout_rate):
    if q.shape[1] > MONO_MAX:
        out, lse = _forward_streaming(q, k, v, attention_mask, session_ids,
                                      actions, block_ids, dropout_seed,
                                      num_heads, kind, interpret, dropout_rate)
        return out, (q, k, v, attention_mask, session_ids, actions, block_ids,
                     dropout_seed, out, lse)
    out = _forward(q, k, v, attention_mask, session_ids, actions, block_ids,
                   dropout_seed, num_heads, kind, interpret, dropout_rate)
    return out, (q, k, v, attention_mask, session_ids, actions, block_ids,
                 dropout_seed, None, None)


def _bwd_rule(num_heads, kind, interpret, dropout_rate, residuals, dout):
    (q, k, v, attention_mask, session_ids, actions, block_ids, dropout_seed,
     out, lse) = residuals
    if lse is not None:
        dq, dk, dv = _bwd_streaming(q, k, v, dout, out, lse, attention_mask,
                                    session_ids, actions, block_ids,
                                    dropout_seed, num_heads, kind, interpret,
                                    dropout_rate)
        return dq, dk, dv, None, None, None, None, None
    B, S, HD = q.shape
    D = HD // num_heads
    Hkv = k.shape[2] // D
    G = num_heads // Hkv
    kernel = functools.partial(_bwd_kernel, kind=kind, scale=D ** -0.5,
                               num_heads=num_heads, groups=G, rate=dropout_rate)
    full = lambda width: pl.BlockSpec((1, S, width), lambda b: (b, 0, 0))
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  full(HD), full(Hkv * D), full(Hkv * D), full(HD),
                  _stream_spec(S), _stream_spec(S), _stream_spec(S), _stream_spec(S)],
        out_specs=(full(HD), full(Hkv * D), full(Hkv * D)),
        out_shape=(jax.ShapeDtypeStruct((B, S, HD), q.dtype),
                   jax.ShapeDtypeStruct((B, S, Hkv * D), k.dtype),
                   jax.ShapeDtypeStruct((B, S, Hkv * D), v.dtype)),
        interpret=interpret,
    )(_seed_arr(dropout_seed), q, k, v, dout,
      *_stream_args(attention_mask, session_ids, actions, block_ids))
    return dq, dk, dv, None, None, None, None, None


fused_mask_attention.defvjp(_fwd_rule, _bwd_rule)
