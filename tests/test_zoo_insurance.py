"""Backbone-zoo insurance: short-train EVERY preset end-to-end (VERDICT r3 #4).

PBAT shipped broken for a full round (NaN gradients on step 1) while passing
its unit/parity tests — "compiles + parity-tests" is not "works". This module
short-trains all 9 generative presets (7 Qwen-family + TIGER + PBATransformer,
through the real train_SMB_decoder CLI) and all 6 discriminative backbones
(through train_SMB_rec) on a tiny synthetic corpus and asserts the training
signal is real: finite losses at every epoch, final loss below both the first
epoch and the uniform-prediction floor.

Zoo surface per the reference: /root/reference/SeqRec/models/{generative,
discriminative}/*.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

GENERATIVE = ["Qwen3", "Qwen3Session", "Qwen3Moe", "Qwen3MoeAction",
              "Qwen3SessionMoe", "Qwen3Multi", "Qwen3SessionMulti",
              "TIGER", "PBATransformer"]
DISCRIMINATIVE = ["SASRec", "BERT4Rec", "GRU4Rec", "MBHT", "MBSTR", "PBAT"]


@pytest.fixture(scope="module")
def zoo_dir(tmp_path_factory):
    from gamer_tpu.data.synthetic import SyntheticSpec, write_synthetic_dataset

    root = tmp_path_factory.mktemp("zoo")
    write_synthetic_dataset(str(root / "data"), "Zoo", SyntheticSpec(
        n_users=30, n_items=40, num_levels=2, level_sizes=(8, 10),
        min_len=6, max_len=16, seed=11))
    return root


def run_cli(argv):
    from main import main

    return main([str(a) for a in argv])


@pytest.mark.parametrize("backbone", GENERATIVE)
def test_generative_preset_short_train(zoo_dir, tmp_path, backbone):
    res = run_cli([
        "train_SMB_decoder", "--dataset", "Zoo",
        "--data_path", zoo_dir / "data",
        "--tasks", "smb_explicit_decoder_2", "--backbone", backbone,
        "--max_his_len", 6, "--epochs", 2, "--batch_size", 8,
        "--learning_rate", "1e-3", "--output_dir", tmp_path / backbone,
        "--n_layers", 2, "--hidden_size", 16, "--model_max_length", 128])
    losses = [h["train_loss"] for h in res["history"]]
    assert len(losses) == 2
    assert all(np.isfinite(l) for l in losses), (backbone, losses)
    assert losses[1] < losses[0], (backbone, losses)
    assert np.isfinite(res["best_metric"]), (backbone, res["best_metric"])
    # uniform floor: the vocab has 8+10 item tokens + 3 behaviors + specials;
    # ln(32) ~= 3.47 — a model that learned nothing can't go below a uniform
    # distribution over its (small) vocab
    assert losses[1] < 3.47, (backbone, losses)


@pytest.mark.parametrize("backbone", DISCRIMINATIVE)
def test_discriminative_backbone_short_train(zoo_dir, tmp_path, backbone):
    res = run_cli([
        "train_SMB_rec", "--dataset", "Zoo", "--data_path", zoo_dir / "data",
        "--backbone", backbone, "--max_his_len", 6, "--epochs", 2,
        "--patience", 2, "--seed", 7,
        "--result_dir", tmp_path / backbone,
        "--output_dir", tmp_path / backbone])
    assert np.isfinite(res["best_valid"]), (backbone, res)
    hits = []
    for behavior, metrics in res["test"].items():
        for metric, value in metrics.items():
            if metric == "count":
                continue
            assert np.isfinite(value), (backbone, behavior, metric, value)
            assert 0.0 <= value <= 1.0, (backbone, behavior, metric, value)
        hits.append(metrics["hit@10"])
    # degenerate floor: on 40 items a scorer that ranks randomly gets
    # hit@10 ~= 0.25; an all-NaN/constant scorer (the PBAT incident) ranks
    # everything tied and lands at 0 under the ranks-last tie policy
    assert max(hits) > 0.0, (backbone, res["test"])
