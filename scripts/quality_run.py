#!/usr/bin/env python
"""Flagship-scale quality run (VERDICT round-2 item 6).

Reference-recipe-scale synthetic pipeline (the reference's datasets are LFS
stubs, BASELINE.md): a ShortVideoAD-shaped corpus (12k users / 8k items /
4-level semantic IDs / sessions / 3 behaviors), then the full chain at the
reference flagship recipe (ref README.md:59-73):

  SemEmb (hash) -> RQVAE (4x64 codebooks) -> tokenize (rq_vae)
  -> train_SMB_decoder Qwen3Multi smb_explicit_decoder_4, global batch 1024
     (micro 64 x grad-accum 16), max_his_len 100 -> test_SMB_decoder 20 beams
  -> test_SMB_rule floor
  -> Qwen3 backbone comparison (same budget)
  -> tokenizer ablation: rq_kmeans / cid / rid (short budget)
  -> 6 discriminative models via train_SMB_rec

Stages run sequentially (the TPU is exclusive); each logs to
runs/quality_r3/logs/<stage>.log and the summary lands in
runs/quality_r3/summary.json. Re-running skips completed stages (marker files).
"""

import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
OUT = os.path.join(REPO, "runs", "quality_r3")
DATA = os.path.join(OUT, "data")
LOGS = os.path.join(OUT, "logs")
DS = "SVADQ"
SEED = 7
INDEX_RQVAE = ".index.epoch300.alpha0.02-beta0.0001.json"

FLAGSHIP = dict(batch_size=1024, micro_batch_size=64, max_his_len=100,
                epochs=18, patience=4, tasks="smb_explicit_decoder_4")
# short equal-budget ablation: relative tokenizer ordering, not best quality
ABLATION = dict(batch_size=1024, micro_batch_size=64, max_his_len=100,
                epochs=6, patience=3, tasks="smb_explicit_decoder_4")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


STALL_S = 1800  # no child log output for this long = wedged tunnel
COOLDOWN_S = 300  # tunnel needs minutes after a killed TPU client


def _tpu_alive() -> bool:
    p = subprocess.run([sys.executable, "-c",
                        "import jax, numpy as np\n"
                        "x = jax.numpy.ones((256, 256))\n"
                        "print(float(np.asarray((x @ x).sum())))"],
                       cwd=REPO, capture_output=True, timeout=120)
    return p.returncode == 0


def _run_once(name, argv, logf, timeout_s):
    """Run one stage attempt; kill the child on log-output stall (wedged
    tunnel, observed 20-90 min mid-eval). Returns (rc, stalled)."""
    with open(logf, "a") as f:
        p = subprocess.Popen([sys.executable, "main.py"]
                             + [str(a) for a in argv],
                             cwd=REPO, stdout=f, stderr=subprocess.STDOUT)
    t0 = time.time()
    while True:
        try:
            rc = p.wait(timeout=30)
            return rc, False
        except subprocess.TimeoutExpired:
            pass
        quiet = time.time() - os.path.getmtime(logf)
        if quiet > STALL_S:
            log(f"stage {name}: no output for {quiet:.0f}s — killing pid {p.pid}")
            p.kill()
            p.wait()
            return -1, True
        if time.time() - t0 > timeout_s:
            log(f"stage {name}: timeout {timeout_s}s — killing pid {p.pid}")
            p.kill()
            p.wait()
            return -1, False


def run_stage(name, argv, timeout_s=7200):
    marker = os.path.join(OUT, f".done.{name}")
    if os.path.exists(marker):
        log(f"skip {name} (done)")
        return
    log(f"stage {name}: {' '.join(map(str, argv))}")
    logf = os.path.join(LOGS, f"{name}.log")
    open(logf, "a").close()
    t0 = time.time()
    for attempt in range(3):
        rc, stalled = _run_once(name, argv, logf, timeout_s)
        if rc == 0:
            open(marker, "w").write(str(time.time()))
            log(f"stage {name} ok ({time.time() - t0:.0f}s)")
            return
        if not stalled:
            log(f"stage {name} FAILED (rc={rc}) — see {logf}")
            sys.exit(1)
        # wedged tunnel: cool down, wait for a live probe, then retry —
        # train stages resume from last_state (--resume_from_checkpoint is
        # appended by train_eval_decoder when a checkpoint exists)
        log(f"stage {name}: stall recovery, attempt {attempt + 1}")
        time.sleep(COOLDOWN_S)
        for _ in range(20):
            if _tpu_alive():
                break
            time.sleep(150)
        if "train_SMB_decoder" in argv[0] and "--resume_from_checkpoint" not in argv:
            ckpt = argv[argv.index("--output_dir") + 1]
            if os.path.exists(os.path.join(str(ckpt), "last_state")):
                argv = list(argv) + ["--resume_from_checkpoint"]
    log(f"stage {name} FAILED after stall retries — see {logf}")
    sys.exit(1)


def gen_corpus():
    marker = os.path.join(OUT, ".done.corpus")
    if os.path.exists(marker):
        return
    from gamer_tpu.data.synthetic import SyntheticSpec, write_synthetic_dataset

    spec = SyntheticSpec(
        n_users=12000, n_items=8000, n_clusters=64,
        min_len=20, max_len=120,
        num_levels=4, level_sizes=(64, 64, 64, 64),
        behaviors=("click", "cart", "buy"), behavior_freq=(0.6, 0.25, 0.15),
        session_len=6, min_sessions=4, emb_dim=128, seed=SEED,
        # v2 sequential signal: true-oracle hit@10 0.233 vs rule floor 0.019
        # at this geometry (12.5x headroom; see synthetic.py docstring)
        cluster_stickiness=0.6, succ_per_cluster=3, item_pop_alpha=1.0,
        behavior_stickiness_gain=0.4)
    t0 = time.time()
    write_synthetic_dataset(DATA, DS, spec)
    open(marker, "w").write(str(time.time()))
    log(f"corpus written ({time.time() - t0:.0f}s)")


def train_eval_decoder(tag, backbone, index_file, budget):
    ckpt = os.path.join(OUT, f"ckpt_{tag}")
    argv = [
        "train_SMB_decoder", "--dataset", DS, "--data_path", DATA,
        "--tasks", budget["tasks"], "--backbone", backbone,
        "--index_file", index_file,
        "--max_his_len", budget["max_his_len"],
        "--epochs", budget["epochs"], "--patience", budget["patience"],
        "--batch_size", budget["batch_size"],
        "--micro_batch_size", budget["micro_batch_size"],
        "--warmup_ratio", "0.04", "--seed", SEED,
        "--output_dir", ckpt]
    # interrupted run: pick up from last_state instead of restarting
    if os.path.exists(os.path.join(ckpt, "last_state")):
        argv.append("--resume_from_checkpoint")
    run_stage(f"train_{tag}", argv, timeout_s=6 * 3600)
    run_stage(f"eval_{tag}", [
        "test_SMB_decoder", "--dataset", DS, "--data_path", DATA,
        "--index_file", index_file, "--max_his_len", budget["max_his_len"],
        "--test_task", "smb_explicit", "--ckpt_path", ckpt,
        "--test_batch_size", 256, "--num_beams", 20,
        "--cache_dtype", "bfloat16",
        "--results_file", os.path.join(OUT, f"results_{tag}.json")],
        timeout_s=2 * 3600)


def main():
    os.makedirs(LOGS, exist_ok=True)
    gen_corpus()

    # ---- tokenizer chain ---------------------------------------------------
    run_stage("sememb", ["SemEmb", "--dataset", DS, "--data_path", DATA,
                         "--plm_name", "hash", "--emb_dim", 128,
                         "--seed", SEED])
    emb = os.path.join(DATA, DS, f"{DS}.emb-hash-td.npy")
    rqvae_dir = os.path.join(OUT, "rqvae")
    run_stage("rqvae", ["RQVAE", "--dataset", DS, "--data_path", DATA,
                        "--emb_file", emb, "--output_dir", rqvae_dir,
                        "--epochs", 300, "--batch_size", 1024,
                        "--num_emb", 64, "--num_levels", 4, "--e_dim", 32,
                        "--layers", "256,128,64", "--kmeans_init",
                        "--seed", SEED], timeout_s=3 * 3600)
    run_stage("tokenize_rqvae", ["tokenize", "--mode", "rq_vae",
                                 "--dataset", DS, "--data_path", DATA,
                                 "--ckpt_path", rqvae_dir,
                                 "--ckpt_tag", "best_collision",
                                 "--epoch", 300, "--emb_file", emb,
                                 "--seed", SEED])

    # ---- flagship + backbone comparison + rule floor -----------------------
    train_eval_decoder("qwen3multi", "Qwen3Multi", INDEX_RQVAE, FLAGSHIP)
    run_stage("rule_floor", [
        "test_SMB_rule", "--dataset", DS, "--data_path", DATA,
        "--index_file", INDEX_RQVAE, "--max_his_len", 100,
        "--test_task", "smb_explicit", "--unique",
        "--results_file", os.path.join(OUT, "results_rule.json")])
    train_eval_decoder("qwen3", "Qwen3", INDEX_RQVAE, FLAGSHIP)

    # ---- tokenizer ablation (short budget) ---------------------------------
    run_stage("tokenize_rqkmeans", ["tokenize", "--mode", "rq_kmeans",
                                    "--dataset", DS, "--data_path", DATA,
                                    "--emb_file", emb,
                                    "--num_code_list", "64,64,64,64",
                                    "--seed", SEED], timeout_s=3600)
    run_stage("tokenize_cid", ["tokenize", "--mode", "cid", "--dataset", DS,
                               "--data_path", DATA, "--chunk_size", 64,
                               "--seed", SEED])
    run_stage("tokenize_rid", ["tokenize", "--mode", "rid", "--dataset", DS,
                               "--data_path", DATA, "--seed", SEED])
    # highest-value comparisons first (rqvae vs rid is the headline ordering)
    train_eval_decoder("abl_rqvae", "Qwen3Multi", INDEX_RQVAE, ABLATION)
    train_eval_decoder("abl_rid", "Qwen3Multi", ".index.rid.json", ABLATION)

    # ---- discriminative zoo (before the remaining ablation arms: a whole
    # results table beats two extra rows if the round ends mid-run) ----------
    for backbone in ["SASRec", "BERT4Rec", "GRU4Rec", "MBHT", "MBSTR", "PBAT"]:
        run_stage(f"rec_{backbone}", [
            "train_SMB_rec", "--dataset", DS, "--data_path", DATA,
            "--backbone", backbone, "--max_his_len", 100,
            "--epochs", 10, "--patience", 4, "--seed", SEED,
            "--result_dir", os.path.join(OUT, f"rec_{backbone}"),
            "--output_dir", os.path.join(OUT, f"rec_{backbone}")],
            timeout_s=3 * 3600)

    # ---- remaining ablation arms (sacrificeable if the round ends) ---------
    train_eval_decoder("abl_rqkmeans", "Qwen3Multi", ".index.rq-kmeans.json",
                       ABLATION)
    train_eval_decoder("abl_cid", "Qwen3Multi", ".index.cid.chunk64.json",
                       ABLATION)

    # ---- summary -----------------------------------------------------------
    summary = {}
    for tag in ["qwen3multi", "qwen3", "rule", "abl_rqvae", "abl_rqkmeans",
                "abl_cid", "abl_rid"]:
        path = os.path.join(OUT, f"results_{tag}.json")
        if os.path.exists(path):
            r = json.load(open(path))
            summary[tag] = r.get("merged", r)
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    subprocess.run([sys.executable, "scripts/quality_report.py", OUT,
                    "--write"], cwd=REPO)
    log("quality run complete")
    log(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
