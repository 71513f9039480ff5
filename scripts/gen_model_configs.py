#!/usr/bin/env python
"""Regenerate the shipped model-config directories under config/.

The reference ships ready-made `--base_model` config dirs
(ref: config/s2s-models/* consumed by HF from_pretrained,
scripts/train_SMB_decoder.sh:22-40 backbone->dir cascade; config/dis-models/*
consumed by pydantic Config.from_pretrained, utils/config.py:6-14). This emits
the same inventory in gamer_tpu's own config schema — hyperparameter values
follow the reference configs (data/config parity), the schema is ours.

Run from the repo root:  python scripts/gen_model_configs.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gamer_tpu.models.generative.encdec import build_encdec_config
    from gamer_tpu.models.generative.qwen_family import build_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s2s = os.path.join(root, "config", "s2s-models")
    dis = os.path.join(root, "config", "dis-models")

    # ---- generative (ref config/s2s-models/*/config.json) ------------------
    # (dirname, backbone, overrides). Values mirror the reference configs:
    # the Light base is 8x256 with dropout 0.1; Moe variants dropout 0.1;
    # the Multi flagships dropout 0.2 (+ attention_dropout 0.2);
    # Qwen3-Light-2 is the rope_theta=1e4 ablation base.
    qwen = [
        ("Qwen3-Light", "Qwen3", dict(dropout_rate=0.1, attention_dropout=0.1)),
        ("Qwen3-Light-2", "Qwen3", dict(dropout_rate=0.1, attention_dropout=0.1,
                                        rope_theta=1e4)),
        ("Qwen3", "Qwen3", dict(dropout_rate=0.1, attention_dropout=0.1)),
        ("Qwen3Moe", "Qwen3Moe", dict(dropout_rate=0.1, attention_dropout=0.1)),
        ("Qwen3ActionMoe", "Qwen3MoeAction", dict(dropout_rate=0.1,
                                                  attention_dropout=0.1)),
        ("Qwen3SessionMoe", "Qwen3SessionMoe", dict(dropout_rate=0.1,
                                                    attention_dropout=0.1)),
        ("Qwen3Multi", "Qwen3Multi", dict(dropout_rate=0.2,
                                          attention_dropout=0.2)),
        ("Qwen3SessionMulti", "Qwen3SessionMulti", dict(dropout_rate=0.2,
                                                        attention_dropout=0.2)),
    ]
    for dirname, backbone, overrides in qwen:
        cfg = build_config(backbone, **overrides)
        cfg.extra["family"] = "decoder_only"
        out = os.path.join(s2s, dirname)
        os.makedirs(out, exist_ok=True)
        cfg.save(out)
        print(f"wrote {out}/config.json ({backbone})")

    encdec = [
        ("TIGER", "TIGER", dict(d_model=128, d_ff=1024, d_kv=64, num_layers=4,
                                num_decoder_layers=4, num_heads=6,
                                dropout_rate=0.1)),
        ("PBATransformer", "PBATransformer",
         dict(d_model=256, d_ff=512, d_kv=64, num_layers=4,
              num_decoder_layers=4, num_heads=6, dropout_rate=0.1)),
    ]
    for dirname, backbone, overrides in encdec:
        cfg = build_encdec_config(backbone, **overrides)
        cfg.extra["family"] = "encdec"
        out = os.path.join(s2s, dirname)
        os.makedirs(out, exist_ok=True)
        cfg.save(out)
        print(f"wrote {out}/config.json ({backbone})")

    # ---- discriminative (ref config/dis-models/*/config.json) --------------
    common = dict(n_layers=2, n_heads=2, inner_size=256, hidden_act="gelu",
                  layer_norm_eps=1e-12, initializer_range=0.02, loss_type="CE")
    dis_cfgs = {
        "SASRec": dict(common, hidden_size=128, dropout_prob=0.5),
        "BERT4Rec": dict(common, hidden_size=64, dropout_prob=0.2,
                         mask_ratio=0.2, ft_ratio=0.5),
        "GRU4Rec": dict(embedding_size=64, hidden_size=128, n_layers=1,
                        dropout_prob=0.3, loss_type="CE"),
        "MBHT": dict(common, hidden_size=64, dropout_prob=0.5, enable_hg=True,
                     enable_ms=True, hyper_len=6, scales=[5, 4, 20]),
        "MBSTR": dict(common, hidden_size=64, dropout_prob=0.2,
                      hidden_act="relu", mask_ratio=0.2, num_buckets=32,
                      max_distance=40, behavior_head=True,
                      behavior_attention=True, behavior_moe=True,
                      behavior_position_bias=True, n_shared_experts=3,
                      n_specific_experts=1),
        "PBAT": dict(common, hidden_size=64, dropout_prob=0.2,
                     hidden_act="elu", mask_ratio=0.2),
    }
    from gamer_tpu.models.discriminative.base import DisModelConfig

    for name, values in dis_cfgs.items():
        cfg = DisModelConfig(**values)
        out = os.path.join(dis, name)
        os.makedirs(out, exist_ok=True)
        cfg.save(out)
        print(f"wrote {out}/config.json")

    # index for humans
    with open(os.path.join(root, "config", "README.md"), "w") as f:
        f.write(
            "# Shipped model configs\n\n"
            "`--base_model config/s2s-models/<Name>` / `--base_model "
            "config/dis-models/<Name>` mirrors the reference's config "
            "inventory (same hyperparameters, gamer_tpu schema). Regenerate "
            "with `python scripts/gen_model_configs.py`.\n\n"
            "Dataset-derived fields (vocab_size, num_positions, num_experts, "
            "num_behavior, behavior_base) are overwritten at task start "
            "(tasks/train_smb_decoder.py make_model_config), exactly like the "
            "reference's config mutation (ref train_SMB_decoder.py:275-382).\n"
        )
    print("wrote config/README.md")


if __name__ == "__main__":
    main()
