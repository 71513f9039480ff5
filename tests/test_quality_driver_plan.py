"""Pin the quality-run driver's stage plan for both profiles.

The flagship run launches unattended from the tunnel watchdog; a refactor
that drops an arm, loses --resume_from_checkpoint, or changes a budget flag
would burn hours of exclusive TPU time. Execute main() with the stage runner
stubbed out and assert the planned argv sequences."""

import importlib.util
import sys

import pytest

SCRIPTS = "/root/repo/scripts"


def _plan(profile, monkeypatch, tmp_path):
    spec = importlib.util.spec_from_file_location(
        "quality_run", f"{SCRIPTS}/quality_run.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    stages = []
    monkeypatch.setattr(mod, "run_stage",
                        lambda name, argv, timeout_s=0: stages.append(
                            (name, [str(a) for a in argv])))
    monkeypatch.setattr(mod, "gen_corpus", lambda: None)
    monkeypatch.setattr(mod, "write_summary", lambda: {})
    monkeypatch.setattr(sys, "argv", ["quality_run.py", "--profile", profile])
    mod.main()
    return mod, stages


@pytest.mark.parametrize("profile", ["flagship", "mini-cpu"])
def test_stage_plan(profile, monkeypatch, tmp_path):
    mod, stages = _plan(profile, monkeypatch, tmp_path)
    names = [n for n, _ in stages]
    # round-3 order: missing-evidence arms first (rule floor, tokenizer
    # ablation, rec zoo), full-budget backbone arms last — the round-2
    # flagship number is already committed, so its retrain is sacrificeable
    assert names == [
        "sememb", "rqvae", "tokenize_rqvae",
        "rule_floor",
        "tokenize_rqkmeans", "tokenize_cid", "tokenize_rid",
        "train_abl_rqvae", "eval_abl_rqvae", "train_abl_rid", "eval_abl_rid",
        "rec_SASRec", "rec_BERT4Rec", "rec_GRU4Rec", "rec_MBHT", "rec_MBSTR",
        "rec_PBAT",
        "train_abl_rqkmeans", "eval_abl_rqkmeans", "train_abl_cid",
        "eval_abl_cid", "train_abl_noaug", "eval_abl_noaug",
        "train_tiger", "eval_tiger",
        "train_qwen3", "eval_qwen3",
        "train_qwen3multi", "eval_qwen3multi",
    ]
    by = dict(stages)

    # backbone comparison arms share the full budget; ablations the short one
    for tag in ("qwen3multi", "qwen3"):
        argv = by[f"train_{tag}"]
        assert argv[argv.index("--epochs") + 1] == str(
            mod.P["main_budget"]["epochs"])
    for tag in ("abl_rqvae", "abl_rid", "abl_rqkmeans", "abl_cid", "abl_noaug"):
        argv = by[f"train_{tag}"]
        assert argv[argv.index("--epochs") + 1] == str(
            mod.P["abl_budget"]["epochs"])

    # the augmentation control trains WITHOUT xN augmentation; all other
    # decoder arms use the flagship task string
    assert by["train_abl_noaug"][
        by["train_abl_noaug"].index("--tasks") + 1] == "smb_explicit_decoder"
    assert by["train_abl_rqvae"][
        by["train_abl_rqvae"].index("--tasks") + 1] == "smb_explicit_decoder_4"

    # tokenizer arms point at their own index files
    assert by["train_abl_rid"][
        by["train_abl_rid"].index("--index_file") + 1] == ".index.rid.json"
    assert by["train_abl_cid"][by["train_abl_cid"].index("--index_file") + 1] \
        == ".index.cid.chunk64.json"

    # every eval writes a results file the report renderer will find
    for tag in ("qwen3multi", "qwen3", "abl_rqvae", "abl_rid", "abl_noaug"):
        argv = by[f"eval_{tag}"]
        assert argv[argv.index("--results_file") + 1].endswith(
            f"results_{tag}.json")


def test_flagship_resume_flag_appended_when_ckpt_exists(monkeypatch, tmp_path):
    spec = importlib.util.spec_from_file_location(
        "quality_run", f"{SCRIPTS}/quality_run.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._select("flagship")
    monkeypatch.setattr(mod, "OUT", str(tmp_path))
    stages = []
    monkeypatch.setattr(mod, "run_stage",
                        lambda name, argv, timeout_s=0: stages.append(
                            (name, [str(a) for a in argv])))
    monkeypatch.setattr(mod, "write_summary", lambda: {})
    (tmp_path / "ckpt_x" / "last_state").mkdir(parents=True)
    mod.train_eval_decoder("x", "Qwen3", ".index.json", mod.P["main_budget"])
    assert "--resume_from_checkpoint" in dict(stages)["train_x"]
