"""Geometry-based HBM estimate + automatic remat policy selection.

Round-3 on-chip A/Bs (artifacts/perf_r3/long_context_trim.log) established
the practical rule: remat OFF is ~40% faster whenever the step fits
(S=2045 B=64 off: 217k tok/s vs attn-remat 154k), and `attn` is the right
policy when it doesn't (S=8185 trains at 59k tok/s). This module encodes
that rule so an XL-context CLI run without flags picks a working config
instead of OOMing (VERDICT r3 #7; ref gradient-checkpointing plumbing:
/root/reference/SeqRec/tasks/train_SMB_decoder.py:412).

The estimate is structural (enumerated saved activations + optimizer
state), deliberately conservative, and pinned by tests/test_train_eval.py:
flagship geometry must select OFF (known fit with 2x headroom), 4x-token
geometries must select attn remat.
"""

from __future__ import annotations

from gamer_tpu.core.logging import get_logger

logger = get_logger(__name__)

# v5e HBM; used when the backend doesn't report a limit through the tunnel
DEFAULT_TPU_HBM_BYTES = 16e9
# enable remat above this fraction of HBM: conservative in the cheap
# direction (attn remat costs ~40%, an OOM costs the run)
BUDGET_FRACTION = 0.7


def count_params(cfg) -> int:
    """Analytic parameter count for a QwenFamilyConfig (no init needed —
    remat must be decided before the model is built)."""
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    nh, nkv, dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    V = cfg.padded_vocab_size or cfg.vocab_size
    n = V * H  # tied embedding/lm-head table
    n += cfg.num_behavior * cfg.behavior_embedding_dim
    mlp_in = H + cfg.behavior_embedding_dim  # injection layers widen the FFN
    for layer in range(L):
        n += H * nh * dh + 2 * H * nkv * dh + nh * dh * H  # q,k,v,o
        n += 2 * H + 2 * dh  # rms norms (pre-attn/pre-mlp, q/k norms)
        width = mlp_in if layer in cfg.behavior_injection_layers else H
        if layer in cfg.sparse_layers:
            n += cfg.total_experts * (2 * width * I + I * H)
        else:
            n += 2 * width * I + I * H
        if layer in cfg.cross_attention_layers:
            n += H * nh * dh + 2 * H * nkv * dh + nh * dh * H + H  # + gate
    return int(n)


def estimate_train_hbm_bytes(cfg, micro: int, seq_len: int) -> dict:
    """Rough live-memory estimate of a train step WITHOUT remat.

    Components:
      params   — fp32 master copy + adam m/v (fp32) + one grad buffer
      acts     — bf16 activations the backward needs per layer per token
                 (norm outs, qkv, attention out+lse, o/residual, MLP
                 intermediates); the flash kernels never materialize S^2
      logits   — CE block buffers (logsumexp CE: bf16 logits + f32 rowstats)
    """
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    nh, nkv, dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    V = cfg.padded_vocab_size or cfg.vocab_size
    act_bytes = 2 if cfg.dtype == "bfloat16" else 4

    params = count_params(cfg)
    params_bytes = params * (4 + 8 + 4)  # master + adam(m,v) + grads

    per_token_layer = (
        4 * H                     # pre-attn norm, o-proj out, residual, pre-mlp norm
        + (nh + 2 * nkv) * dh     # q, k, v
        + nh * dh + nh            # attention out + logsumexp rows
        + 3 * I                   # mlp gate/up outs + down in (one expert/token)
    )
    if cfg.cross_attention_layers:
        frac = len(cfg.cross_attention_layers) / L
        per_token_layer += frac * ((nh + 2 * nkv) * dh + 2 * nh * dh + H)
    tokens = micro * seq_len
    acts_bytes = tokens * per_token_layer * L * act_bytes

    logits_bytes = tokens * V * act_bytes + tokens * 8  # logits + f32 stats
    total = params_bytes + acts_bytes + logits_bytes
    return {"params": params_bytes, "acts": acts_bytes,
            "logits": logits_bytes, "total": total, "n_params": params}


def select_remat(cfg, micro: int, seq_len: int,
                 hbm_bytes: float | None = None) -> tuple[bool, str, dict]:
    """(remat, policy, estimate) for a geometry. Off when the no-remat step
    fits under BUDGET_FRACTION of HBM (measured ~40% faster), else attn."""
    if hbm_bytes is None:
        hbm_bytes = device_hbm_bytes()
    est = estimate_train_hbm_bytes(cfg, micro, seq_len)
    over = est["total"] > BUDGET_FRACTION * hbm_bytes
    return over, "attn", est


def device_hbm_bytes() -> float:
    import jax

    if jax.default_backend() != "tpu":
        return float("inf")  # CPU/virtual-device tests: never auto-remat
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit:
            return float(limit)
    except Exception:  # the axon tunnel may not expose memory stats
        pass
    return DEFAULT_TPU_HBM_BYTES


def auto_remat_overrides(cfg, micro: int, seq_len: int) -> dict:
    """Config overrides for a geometry the user didn't pin flags for."""
    remat, policy, est = select_remat(cfg, micro, seq_len)
    if remat:
        logger.warning(
            "auto remat: estimated %.1f GB (acts %.1f + params %.1f + "
            "logits %.1f) exceeds %d%% of HBM — enabling remat_policy=%s "
            "(pass --no-gradient_checkpointing to force off)",
            est["total"] / 1e9, est["acts"] / 1e9, est["params"] / 1e9,
            est["logits"] / 1e9, int(BUDGET_FRACTION * 100), policy)
        return {"remat": True, "remat_policy": policy}
    logger.info("auto remat: off (estimated %.1f GB fits; remat off measured "
                "~40%% faster when it fits)", est["total"] / 1e9)
    return {}
