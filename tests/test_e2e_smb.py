"""End-to-end: synthetic data -> train_SMB_decoder -> test_SMB_decoder + rule."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def e2e_dir(tmp_path_factory):
    from gamer_tpu.data.synthetic import SyntheticSpec, write_synthetic_dataset

    root = tmp_path_factory.mktemp("e2e")
    write_synthetic_dataset(str(root / "data"), "Demo", SyntheticSpec(
        n_users=30, n_items=40, num_levels=2, level_sizes=(8, 10),
        min_len=6, max_len=16, seed=11))
    return root


def run_cli(argv):
    from main import main

    return main([str(a) for a in argv])


def test_train_eval_rule_pipeline(e2e_dir):
    train_res = run_cli([
        "train_SMB_decoder", "--dataset", "Demo", "--data_path", e2e_dir / "data",
        "--tasks", "smb_explicit_decoder_2", "--backbone", "Qwen3Multi",
        "--max_his_len", 6, "--epochs", 2, "--batch_size", 8,
        "--learning_rate", "1e-3", "--temperature", "0.7",
        "--output_dir", e2e_dir / "ckpt", "--n_layers", 2, "--hidden_size", 16,
        "--model_max_length", 128])
    assert np.isfinite(train_res["best_metric"])
    assert len(train_res["history"]) == 2
    # loss decreases across epochs
    assert train_res["history"][1]["train_loss"] < train_res["history"][0]["train_loss"]

    eval_res = run_cli([
        "test_SMB_decoder", "--dataset", "Demo", "--data_path", e2e_dir / "data",
        "--max_his_len", 6, "--test_task", "smb_explicit",
        "--ckpt_path", e2e_dir / "ckpt", "--test_batch_size", 8,
        "--num_beams", 4, "--results_file", e2e_dir / "test.json"])
    assert set(eval_res["per_behavior"]) == {"click", "cart", "buy"}
    for m, v in eval_res["merged"].items():
        assert 0.0 <= v <= 1.0, (m, v)
    assert (e2e_dir / "test.json").exists()
    saved = json.loads((e2e_dir / "test.json").read_text())
    assert saved["merged"] == eval_res["merged"]

    rule_res = run_cli([
        "test_SMB_rule", "--dataset", "Demo", "--data_path", e2e_dir / "data",
        "--max_his_len", 6, "--test_task", "smb_explicit",
        "--results_file", e2e_dir / "rule.json", "--unique"])
    for m, v in rule_res["merged"].items():
        assert 0.0 <= v <= 1.0


def test_valid_loss_mode(e2e_dir):
    res = run_cli([
        "test_SMB_decoder", "--dataset", "Demo", "--data_path", e2e_dir / "data",
        "--max_his_len", 6, "--test_task", "smb_explicit",
        "--ckpt_path", e2e_dir / "ckpt",
        "--results_file", e2e_dir / "valid_loss.json", "--valid_loss"])
    assert np.isfinite(res["valid_loss"]) and res["valid_loss"] > 0


def test_tiger_on_smb_pipeline(e2e_dir, tmp_path):
    """TIGER (enc-dec) backbone through the SMB train + eval tasks."""
    out = tmp_path / "tiger_smb"
    res = run_cli([
        "train_SMB_decoder", "--dataset", "Demo", "--data_path", e2e_dir / "data",
        "--tasks", "smb_explicit_decoder", "--backbone", "TIGER",
        "--max_his_len", 6, "--epochs", 2, "--batch_size", 8,
        "--learning_rate", "1e-3", "--output_dir", out, "--n_layers", 1,
        "--hidden_size", 32])
    assert res["history"][1]["train_loss"] < res["history"][0]["train_loss"]
    ev = run_cli([
        "test_SMB_decoder", "--dataset", "Demo", "--data_path", e2e_dir / "data",
        "--max_his_len", 6, "--test_task", "smb_explicit",
        "--ckpt_path", out, "--test_batch_size", 8, "--num_beams", 4,
        "--results_file", tmp_path / "tiger_smb.json"])
    for m, v in ev["merged"].items():
        assert 0.0 <= v <= 1.0


def test_resume_and_snapshots(e2e_dir, tmp_path):
    out = tmp_path / "resume_ckpt"
    args = ["train_SMB_decoder", "--dataset", "Demo", "--data_path", e2e_dir / "data",
            "--tasks", "smb_explicit_decoder", "--backbone", "Qwen3",
            "--max_his_len", 6, "--batch_size", 8, "--n_layers", 1,
            "--hidden_size", 16, "--model_max_length", 128,
            "--output_dir", out, "--save_epochs", 1]
    r1 = run_cli(args + ["--epochs", 2])
    assert (out / "last_state").exists()
    import os
    snaps = [d for d in os.listdir(out) if d.startswith("epoch_") and not d.endswith(".json")]
    assert len(snaps) == 2  # limit
    r2 = run_cli(args + ["--epochs", 4, "--resume_from_checkpoint"])
    # resumed training continued past the first run's step count
    assert r2["steps"] > r1["steps"]
    assert len(r2["history"]) == 2  # only epochs 2..3 ran


def test_augment_eval_and_drop_gt_tasks(e2e_dir):
    """smb_augment_<ratio> (dropped-history view for the target behavior) and
    smb_drop_gt (ground-truth leakage eval) test-task variants."""
    for task in ["smb_augment_0.5", "smb_drop_gt", "smb_explicit_valid",
                 "smb_valid_augment_0.5"]:
        ev = run_cli([
            "test_SMB_decoder", "--dataset", "Demo", "--data_path", e2e_dir / "data",
            "--max_his_len", 6, "--test_task", task,
            "--ckpt_path", e2e_dir / "ckpt", "--test_batch_size", 8,
            "--num_beams", 4, "--results_file", e2e_dir / f"{task}.json"])
        assert ev["merged"], task
        for m, v in ev["merged"].items():
            assert 0.0 <= v <= 1.0, (task, m, v)


@pytest.mark.parametrize("backbone", ["Qwen3Session", "Qwen3MoeAction", "Qwen3SessionMulti"])
def test_other_backbones_train_and_decode(e2e_dir, tmp_path, backbone):
    """Session rope / action-indexed experts / session_multi cross mask through
    the full train + constrained-decode pipeline."""
    out = tmp_path / backbone
    res = run_cli([
        "train_SMB_decoder", "--dataset", "Demo", "--data_path", e2e_dir / "data",
        "--tasks", "smb_explicit_decoder", "--backbone", backbone,
        "--max_his_len", 6, "--epochs", 1, "--batch_size", 8,
        "--output_dir", out, "--n_layers", 1, "--hidden_size", 16,
        "--model_max_length", 128])
    assert np.isfinite(res["best_metric"])
    ev = run_cli([
        "test_SMB_decoder", "--dataset", "Demo", "--data_path", e2e_dir / "data",
        "--max_his_len", 6, "--test_task", "smb_explicit",
        "--ckpt_path", out, "--test_batch_size", 8, "--num_beams", 4,
        "--results_file", tmp_path / f"{backbone}.json"])
    for m, v in ev["merged"].items():
        assert 0.0 <= v <= 1.0, (backbone, m, v)


def test_behind_layout_pipeline(e2e_dir, tmp_path):
    """smb_explicit_back: behavior token AFTER the item tokens."""
    out = tmp_path / "behind"
    res = run_cli([
        "train_SMB_decoder", "--dataset", "Demo", "--data_path", e2e_dir / "data",
        "--tasks", "smb_explicit_back", "--backbone", "Qwen3",
        "--max_his_len", 6, "--epochs", 1, "--batch_size", 8,
        "--output_dir", out, "--n_layers", 1, "--hidden_size", 16,
        "--model_max_length", 128])
    assert np.isfinite(res["best_metric"])


def test_train_with_shipped_base_model_and_hf_flags(e2e_dir, tmp_path):
    """--base_model config/s2s-models/<Name> (the shipped config inventory)
    plus the HF-parity flags: step-strategy eval, per-device batch spec,
    sgd optimizer — the ref launch-script path end-to-end."""
    res = run_cli([
        "train_SMB_decoder", "--dataset", "Demo", "--data_path", e2e_dir / "data",
        "--tasks", "smb_explicit_decoder_2", "--backbone", "Qwen3Multi",
        "--base_model", "config/s2s-models/Qwen3Multi",
        "--max_his_len", 6, "--epochs", 1,
        "--per_device_batch_size", 4, "--gradient_accumulation_steps", 2,
        "--optim", "sgd", "--learning_rate", "1e-2",
        "--save_and_eval_strategy", "steps", "--save_and_eval_steps", 3,
        "--output_dir", tmp_path / "ckpt", "--n_layers", 2, "--hidden_size", 16,
        "--model_max_length", 128])
    assert np.isfinite(res["best_metric"])
    # steps strategy: evals at update steps 3, 6, ... (history carries steps)
    assert res["history"] and all("step" in h for h in res["history"])
    assert res["history"][0]["step"] == 3 * 2  # 3 updates x accum 2 micro-steps
