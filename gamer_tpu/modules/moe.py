"""Position-routed mixture-of-experts FFN.

The reference routes each token to an expert *deterministically* by its
position-in-item (plus behavior for the Action variant) and executes experts as
a Python loop over boolean masks (ref: SeqRec/models/generative/Qwen3Moe/FFN.py:53-72,
Qwen3MoeAction/FFN.py:31-53). Deterministic routing is a gift on TPU: because
the expert of a token is a pure function of (position mod P), a training batch
can be reshaped to [B, blocks, P, D] and each of the P used experts runs as one
dense batched matmul — exact semantics, zero routing overhead, no sort/scatter,
perfect MXU utilization ("periodic" path). The general "onehot" path (select
over experts) covers unaligned layouts and the Action variant.

Expert parameters are stacked with a leading experts axis, which is what the
mesh sharding rules row-shard for expert parallelism
(gamer_tpu/core/mesh.py DEFAULT_RULES).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gamer_tpu.modules.dropout import BitDropout


def _act(name: str):
    return {"silu": jax.nn.silu, "gelu": jax.nn.gelu, "relu": jax.nn.relu,
            "gelu_new": jax.nn.gelu}[name]


class PositionRoutedMLP(nn.Module):
    """Sparse (or dense) FFN with deterministic routing.

    mlp_type "qwen3": SwiGLU — down(drop(act(gate(x)) * up(x)))
        (ref Qwen3Moe/FFN.py:8-27, input width d_model + behavior_dim if injected)
    mlp_type "t5":    wo(drop(act(wi(x))))   (ref Qwen3Moe/FFN.py:75-88)
    """

    d_model: int
    d_ff: int
    num_experts: int  # total experts incl. expert 0 (pad/eos)
    is_sparse: bool = True
    mlp_type: str = "qwen3"
    hidden_act: str = "silu"
    behavior_injection: bool = False
    num_behavior: int = 0
    behavior_dim: int = 0
    dropout_rate: float = 0.0
    # PBATransformer shared-expert mode (ref PBATransformer/FFN.py:29-43,108-130):
    # routed experts emit d_model//2, a shared expert emits the other half.
    shared_expert: bool = False
    dtype: Any = jnp.float32
    # "auto" | "jnp" | "pallas" | "pallas_interpret": the fused Pallas FFN
    # kernel (ops/pallas_moe.py) on the periodic qwen3 path; auto = pallas on
    # TPU. Falls back to jnp whenever the kernel's preconditions don't hold.
    impl: str = "jnp"

    @property
    def d_out(self) -> int:
        return self.d_model // 2 if (self.shared_expert and self.is_sparse) else self.d_model

    def _expert_params(self):
        d_in = self.d_model + (self.behavior_dim if self.behavior_injection else 0)
        E = self.num_experts if self.is_sparse else 1
        init = nn.initializers.lecun_normal(batch_axis=(0,))
        if self.mlp_type == "qwen3":
            gate = self.param("experts_gate", init, (E, d_in, self.d_ff))
            up = self.param("experts_up", init, (E, d_in, self.d_ff))
            down = self.param("experts_down", init, (E, self.d_ff, self.d_out))
            return {"gate": gate, "up": up, "down": down}
        wi = self.param("experts_wi", init, (E, d_in, self.d_ff))
        wo = self.param("experts_wo", init, (E, self.d_ff, self.d_out))
        return {"wi": wi, "wo": wo}

    def _shared_params(self):
        d_in = self.d_model + (self.behavior_dim if self.behavior_injection else 0)
        init = nn.initializers.lecun_normal()
        if self.mlp_type == "qwen3":
            return {"gate": self.param("shared_gate", init, (d_in, self.d_ff)),
                    "up": self.param("shared_up", init, (d_in, self.d_ff)),
                    "down": self.param("shared_down", init, (self.d_ff, self.d_out))}
        return {"wi": self.param("shared_wi", init, (d_in, self.d_ff)),
                "wo": self.param("shared_wo", init, (self.d_ff, self.d_out))}

    def _apply_expert(self, x: jnp.ndarray, w: dict, deterministic: bool) -> jnp.ndarray:
        """x [..., d_in] with per-expert weight slices already selected [..., d_in, d_ff]-style
        contraction is done by the caller; here weights are plain [d_in, d_ff]."""
        act = _act(self.hidden_act)
        if self.mlp_type == "qwen3":
            # fused gate-up: one matmul reads x ONCE from HBM (two separate
            # dots re-read the [B,S,d_in] activations; the weight concat is
            # a few MB and amortizes). Same columns, bit-identical results.
            gu = x @ jnp.concatenate([w["gate"], w["up"]], axis=-1)
            h = act(gu[..., :self.d_ff]) * gu[..., self.d_ff:]
            h = BitDropout(self.dropout_rate)(h, deterministic=deterministic)
            return h @ w["down"]
        h = act(x @ w["wi"])
        h = BitDropout(self.dropout_rate)(h, deterministic=deterministic)
        return h @ w["wo"]

    def _fused_periodic(self, x, params, emb_mod, behavior_index,
                        num_positions, deterministic):
        """Periodic path through the fused Pallas FFN kernel
        (ops/pallas_moe.py): whole SwiGLU + dropout + down-proj per
        (expert, row-tile) in VMEM. Behavior injection becomes the exactly-
        equivalent per-behavior bias table (concat(x, e_b) @ [Wx; Wb] ==
        x @ Wx + e_b @ Wb)."""
        from gamer_tpu.ops.pallas_moe import TM, fused_moe_ffn

        P = num_positions
        assert P is not None and x.shape[1] % P == 0
        b, s, d = x.shape
        n = s // P
        # expert-major rows: token (p, b, n) -> row p*T + (b*n + n)
        xp = x.reshape(b, n, P, d).transpose(2, 0, 1, 3).reshape(P, b * n, d)
        T = b * n
        Tp = -(-T // TM) * TM
        if Tp != T:
            xp = jnp.pad(xp, ((0, 0), (0, Tp - T), (0, 0)))

        gate, up, down = (params[k][1:P + 1] for k in ("gate", "up", "down"))
        wgu = jnp.concatenate([gate[:, :d], up[:, :d]], axis=-1)
        if self.behavior_injection:
            table = emb_mod(jnp.arange(self.num_behavior + 1))  # [NB+1, bdim]
            wb = jnp.concatenate([gate[:, d:], up[:, d:]], axis=-1)
            btab = jnp.einsum("ae,pef->paf", table.astype(wb.dtype), wb)
            beh = behavior_index.reshape(b, n, P).transpose(2, 0, 1)
            beh = beh.reshape(P, T).astype(jnp.int32)
            if Tp != T:
                beh = jnp.pad(beh, ((0, 0), (0, Tp - T)))
            beh = beh.reshape(P, Tp // TM, TM)
        else:
            btab = jnp.zeros((P, 1, wgu.shape[-1]), wgu.dtype)
            beh = jnp.zeros((P, Tp // TM, TM), jnp.int32)

        rate = 0.0 if deterministic else self.dropout_rate
        if rate > 0.0:
            seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                      jnp.iinfo(jnp.int32).max, jnp.int32)
        else:
            seed = jnp.int32(0)
        out = fused_moe_ffn(xp, wgu, down, btab, beh, seed,
                            self.hidden_act, rate, self.behavior_injection,
                            self.impl == "pallas_interpret")
        out = out[:, :T].reshape(P, b, n, self.d_out)
        return out.transpose(1, 2, 0, 3).reshape(b, s, self.d_out)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, S, D]
        position_index: jnp.ndarray,  # [B, S] expert ids (0 = pad/eos expert)
        behavior_index: Optional[jnp.ndarray] = None,  # [B, S]
        expert_index: Optional[jnp.ndarray] = None,  # [B, S] overrides routing (MoeAction)
        route_mode: str = "onehot",  # "periodic" | "onehot"
        num_positions: int | None = None,  # block size for the periodic path
        deterministic: bool = True,
    ) -> jnp.ndarray:
        # Cast stacked expert weights (stored fp32) to the compute dtype so the
        # expert einsums hit the MXU at bf16 rate instead of promoting to fp32.
        params = {k: v.astype(self.dtype) for k, v in self._expert_params().items()}
        x = x.astype(self.dtype)
        emb_mod = None
        if self.behavior_injection:
            assert behavior_index is not None
            emb_mod = nn.Embed(self.num_behavior + 1, self.behavior_dim,
                               dtype=self.dtype, name="behavior_embedding")

        use_fused = (
            self.is_sparse and self.mlp_type == "qwen3"
            and route_mode == "periodic" and expert_index is None
            and not self.shared_expert
            and self.d_model % 128 == 0 and self.d_ff % 128 == 0
            and self.d_out % 128 == 0
            and (self.impl == "pallas_interpret"
                 or (self.impl in ("auto", "pallas")
                     and jax.default_backend() == "tpu"))
        )
        if use_fused:
            return self._fused_periodic(
                x, params, emb_mod, behavior_index, num_positions,
                deterministic).astype(x.dtype)

        if self.behavior_injection:
            bemb = emb_mod(behavior_index)
            x_in = jnp.concatenate([x, bemb.astype(x.dtype)], axis=-1)
        else:
            x_in = x

        if not self.is_sparse:
            w = {k: v[0] for k, v in params.items()}  # already compute-dtype
            return self._apply_expert(x_in, w, deterministic).astype(x.dtype)

        routing = expert_index if expert_index is not None else position_index
        shared_out = None
        if self.shared_expert:
            shared_w = {k: v.astype(self.dtype) for k, v in self._shared_params().items()}
            shared_out = self._apply_expert(x_in, shared_w, deterministic)

        if route_mode == "periodic":
            # Exact fast path: token t routes to expert (t % P) + 1. Valid when
            # the batch is right-padded and starts at a block boundary (training)
            # — pad/eos rows then compute with the "wrong" expert, but their
            # outputs are unobservable (masked from attention keys of real
            # tokens and from the loss), so results match the onehot path.
            P = num_positions
            assert P is not None and x.shape[1] % P == 0, "periodic path needs S % P == 0"
            b, s, _ = x_in.shape
            xb = x_in.reshape(b, s // P, P, x_in.shape[-1])
            # expert-major layout: [P, b, n, d] makes each within-block
            # position's tokens contiguous, so the per-expert dots lower to
            # clean batched matmuls instead of the strided slice copies XLA
            # emits for a mid-tensor batch axis (round-4 byte inventory:
            # dozens of 26-92 MB async copies per step on the [b,n,p,·]
            # operands)
            xp = xb.transpose(2, 0, 1, 3)

            def periodic_out(w_sel):
                # w_sel: P stacked experts, one per within-block position
                act = _act(self.hidden_act)
                if self.mlp_type == "qwen3":
                    # fused gate-up (see _apply_expert): xp read once
                    gu = jnp.einsum(
                        "pbnd,pdf->pbnf", xp,
                        jnp.concatenate([w_sel["gate"], w_sel["up"]], axis=-1))
                    h = act(gu[..., :self.d_ff]) * gu[..., self.d_ff:]
                    h = BitDropout(self.dropout_rate)(h, deterministic=deterministic)
                    return jnp.einsum("pbnf,pfd->pbnd", h, w_sel["down"])
                h = act(jnp.einsum("pbnd,pdf->pbnf", xp, w_sel["wi"]))
                h = BitDropout(self.dropout_rate)(h, deterministic=deterministic)
                return jnp.einsum("pbnf,pfd->pbnd", h, w_sel["wo"])

            if expert_index is not None:
                # MoeAction factorized fast path: expert = P*(a-1) + p with the
                # action level `a` constant within each item block
                # (ref Qwen3MoeAction/FFN.py:42-45), so each behavior level is
                # one periodic pass over its own P-expert slice, combined by a
                # block-level one-hot. Cost: num_behavior x dense instead of
                # total_experts x dense (the onehot path).
                assert self.num_behavior > 0
                e0 = expert_index.reshape(b, s // P, P)[:, :, 0]  # block's first expert id
                # a_blk == 0 (pad/eos) blocks output ZERO here, while the
                # onehot path routes them through expert 0 — full logit
                # tensors differ on pad positions across route modes. Loss-
                # invariant: pad labels are ignored and pad keys are masked
                # (see test_moe_action_periodic_equals_onehot).
                a_blk = jnp.where(e0 > 0, (e0 - 1) // P + 1, 0)  # 0 = pad/eos block
                out = jnp.zeros((P, b, s // P, self.d_out), dtype=x_in.dtype)
                for a in range(1, self.num_behavior + 1):
                    w_a = {k: v[P * (a - 1) + 1: P * (a - 1) + 1 + P]
                           for k, v in params.items()}
                    gate_a = (a_blk == a).astype(x_in.dtype)[None, :, :, None]
                    out = out + periodic_out(w_a) * gate_a
            else:
                # select experts 1..P (leading axis) and batch the P matmuls
                out = periodic_out({k: v[1:P + 1] for k, v in params.items()})
            # back to token order for the residual stream
            out = out.transpose(1, 2, 0, 3).reshape(b, s, self.d_out)
            if shared_out is not None:
                out = jnp.concatenate([out, shared_out], axis=-1)
            return out.astype(x.dtype)

        # General path: compute every expert, select per token. Exact for any
        # routing (incl. MoeAction); costs num_experts x FLOPs — used for
        # decode steps (S == 1) and unaligned layouts.
        E = self.num_experts
        outs = []
        for e in range(E):
            w = {k: v[e] for k, v in params.items()}
            outs.append(self._apply_expert(x_in, w, deterministic))
        stacked = jnp.stack(outs, axis=0)  # [E, B, S, Dout]
        sel = jax.nn.one_hot(routing, E, dtype=stacked.dtype)  # [B, S, E]
        out = jnp.einsum("ebsd,bse->bsd", stacked, sel)
        if shared_out is not None:
            out = jnp.concatenate([out, shared_out], axis=-1)
        return out.astype(x.dtype)
