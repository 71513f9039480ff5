"""Discriminative model zoo + SMB-dis data + train_SMB_rec E2E."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from gamer_tpu.data.contract import DataFiles
from gamer_tpu.data.smb import SMBCorpus
from gamer_tpu.data.smb_dis import DisBatcher, SMBDisBuilder
from gamer_tpu.models.discriminative import DIS_MODELS, DisModelConfig


@pytest.fixture(scope="module")
def corpus(synth_dir):
    return SMBCorpus(DataFiles(synth_dir, "Synth"))


@pytest.fixture(scope="module")
def dis_builder(corpus):
    return SMBDisBuilder(corpus, max_his_len=8)


def tiny_cfg(**kw):
    d = dict(n_layers=1, n_heads=2, hidden_size=16, inner_size=32,
             dropout_prob=0.0, embedding_size=16, n_behaviors=3,
             scales=[4, 3, 9], hyper_len=3, num_buckets=8, max_distance=10)
    d.update(kw)
    return DisModelConfig(**d)


class TestDisData:
    def test_train_examples(self, corpus, dis_builder):
        train = dis_builder.build_train()
        assert len(train) > 0
        for ex in train[:10]:
            assert (ex.inters > 0).all()
            assert ex.targets[0] >= 1
            assert len(ex.inter_behaviors) == len(ex.inters)

    def test_diff_ids(self, corpus):
        b = SMBDisBuilder(corpus, max_his_len=8, diff=True)
        train = b.build_train()
        n = b.n_raw_items
        for ex in train[:10]:
            expect = ex.inter_behaviors.astype(np.int64) * n + 0  # lower bound
            assert (ex.inters >= ex.inter_behaviors * n + 1).all()
        assert b.num_items == 3 * n

    def test_neg_sampling(self, corpus, dis_builder):
        train = SMBDisBuilder(corpus, max_his_len=8).build_train("neg")
        assert all(ex.neg_item >= 1 for ex in train)

    def test_eval_mask_slot(self, corpus, dis_builder):
        ev = dis_builder.build_eval("test", append_mask_slot=True)
        for ex in ev[:5]:
            assert ex.inters[-1] == dis_builder.num_items + 1
            assert ex.inter_behaviors[-1] == -1
        filt = dis_builder.filter_by_behavior(ev, 2)
        for ex in filt[:5]:
            assert ex.inter_behaviors[-1] == 2
            assert (ex.target_behaviors == 2).all()

    def test_batcher(self, dis_builder):
        train = dis_builder.build_train()
        b = DisBatcher.for_examples(train, seq_len=8)
        batch = b.collate(train[:4])
        assert batch["inputs"].shape == (4, 8)
        # behaviors are +1 shifted with 0 padding
        assert (batch["behaviors"][batch["inputs"] == 0] == 0).all()
        assert (batch["behaviors"][batch["inputs"] != 0] >= 1).all()


ALL_BACKBONES = ["SASRec", "GRU4Rec", "BERT4Rec", "MBSTR", "PBAT", "MBHT"]


@pytest.mark.parametrize("backbone", ALL_BACKBONES)
def test_model_loss_and_scores(backbone, corpus, dis_builder):
    """Every model: finite masked/CE loss with gradients + full-sort scores."""
    from gamer_tpu.tasks.train_smb_rec import (build_dis_model, make_dis_loss_fn,
                                               make_score_fn)

    cfg = tiny_cfg()
    L = 9 if backbone == "MBHT" else 8
    n_items = dis_builder.num_items
    model = build_dis_model(backbone, cfg, n_items, L, 3, len(corpus.users))
    train = dis_builder.build_train()
    batcher = DisBatcher.for_examples(train, seq_len=L)
    batch = {k: jnp.asarray(v) for k, v in batcher.collate(train[:4]).items()}
    rng = jax.random.PRNGKey(0)
    init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    M = type(model)
    if backbone in ("SASRec", "GRU4Rec"):
        variables = model.init(init_rngs, batch["inputs"], batch["seq_len"],
                               None, False, method=M.encode_with_table)
    elif backbone == "BERT4Rec":
        variables = model.init(init_rngs, batch["inputs"], batch["seq_len"], rng,
                               None, method=M.calculate_loss)
    elif backbone == "MBSTR":
        variables = model.init(init_rngs, batch["inputs"], batch["behaviors"], rng,
                               None, method=M.calculate_loss)
    elif backbone == "PBAT":
        variables = model.init(init_rngs, batch["inputs"], batch["behaviors"],
                               batch["uid"], rng, None, method=M.calculate_loss)
    else:
        variables = model.init(init_rngs, batch["inputs"], batch["behaviors"],
                               batch["target"], batch["behavior"] + 1,
                               batch["seq_len"], rng, None, method=M.calculate_loss)

    loss_fn = make_dis_loss_fn(backbone, model, cfg)
    (loss, _), grads = jax.value_and_grad(
        lambda v: loss_fn(v, batch, rng), has_aux=True)(variables)
    assert np.isfinite(float(loss)), backbone
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads)), backbone

    score_fn = make_score_fn(backbone, model)
    eval_ex = dis_builder.build_eval(
        "test", append_mask_slot=backbone in ("BERT4Rec", "MBSTR", "PBAT", "MBHT"))
    eb = DisBatcher.for_examples(eval_ex, seq_len=L)
    ebatch = {k: jnp.asarray(v) for k, v in eb.collate(eval_ex[:4]).items()}
    scores = np.asarray(score_fn(variables, ebatch))
    assert scores.shape == (4, n_items + 1)
    assert np.isfinite(scores).all()


def test_train_smb_rec_cli(synth_dir, tmp_path):
    from main import main

    res = main(["train_SMB_rec", "--dataset", "Synth", "--data_path", synth_dir,
                "--tasks", "smb_dis", "--backbone", "SASRec",
                "--max_his_len", "8", "--epochs", "3", "--batch_size", "32",
                "--learning_rate", "1e-2", "--patience", "3",
                "--output_dir", str(tmp_path / "ckpt"),
                "--result_dir", str(tmp_path / "results")])
    assert set(res["test"]) == {"click", "cart", "buy"}
    for b, ms in res["test"].items():
        for k, v in ms.items():
            if k != "count":
                assert 0.0 <= v <= 1.0
    assert res["best_valid"] > 0  # model learned something above zero


def test_sampled_eval_cli(synth_dir, tmp_path):
    """smb_dis_sample: 1000-negative sampled evaluation path."""
    from main import main

    res = main(["train_SMB_rec", "--dataset", "Synth", "--data_path", synth_dir,
                "--tasks", "smb_dis_sample", "--backbone", "SASRec",
                "--max_his_len", "8", "--epochs", "1", "--batch_size", "32",
                "--output_dir", str(tmp_path / "ckpt"),
                "--result_dir", str(tmp_path / "results")])
    for b, ms in res["test"].items():
        for k, v in ms.items():
            if k != "count":
                assert 0.0 <= v <= 1.0


def test_user_level_and_neg_variants(synth_dir, tmp_path):
    from gamer_tpu.data.contract import DataFiles
    from gamer_tpu.data.smb import SMBCorpus
    from gamer_tpu.data.smb_dis import SMBDisBuilder

    corpus = SMBCorpus(DataFiles(synth_dir, "Synth"))
    b = SMBDisBuilder(corpus, max_his_len=8)
    user = b.build_train("user")
    # one example per eligible user
    assert len(user) == sum(1 for u in range(len(corpus.users))
                            if corpus.valid_pos[u] > 0)
    ev = b.build_eval("test", num_neg=50)
    for ex in ev[:5]:
        assert ex.all_item is not None and len(ex.all_item) <= 50
        # negatives exclude the user's history
        hist = set((corpus.user_items[0] + 1).tolist())


def test_pbat_gaussian_ops_finite_grads_at_cov_underflow():
    """elu(x)+1 underflows to EXACTLY 0 in f32 for x <~ -17; the Gaussian
    product/distance ops must keep fwd AND bwd finite there (round-3 mini
    quality run: PBAT hit gnorm=NaN on its first optimizer step and then
    'scored' hit@10=1.0 through the old optimistic tie ranking)."""
    from gamer_tpu.models.discriminative.pbat import sagp, tri_sagp, w2_distance

    m = jnp.asarray([[1.0, -2.0], [300.0, -300.0]])
    c0 = jnp.zeros((2, 2))  # exact underflow
    c1 = jnp.asarray([[0.5, 2.0], [80.0, 1e-30]])

    def loss_tri(c):
        mean, cov = tri_sagp(m, 2 * m, -m, c, c1, c0)
        return jnp.sum(mean ** 2) + jnp.sum(cov)

    def loss_sagp(c):
        mean, cov = sagp(m, 2 * m, c, c1)
        return jnp.sum(mean ** 2) + jnp.sum(cov)

    def loss_w2(c):
        return jnp.sum(w2_distance(m, c, 2 * m, c1))

    for f in (loss_tri, loss_sagp, loss_w2):
        val, grad = jax.value_and_grad(f)(c0)
        assert np.isfinite(float(val)), f
        assert np.isfinite(np.asarray(grad)).all(), f


def test_rank_targets_matches_stable_argsort_and_handles_nan():
    """Ties and NaNs must rank like the reference's stable np.argsort(-scores)
    (ref train_SMB_rec.py:120): equal scores break by index, non-finite
    scores rank last — a constant or NaN scorer must NOT report hit=1/ndcg>1."""
    from gamer_tpu.tasks.train_smb_rec import dis_eval_metrics, rank_targets

    rng = np.random.default_rng(0)
    B, N, T = 5, 40, 3
    # quantized scores -> plenty of ties; one NaN row; one constant row
    scores = rng.integers(0, 6, (B, N)).astype(np.float64)
    scores[1] = np.nan
    scores[2] = 3.14
    targets = rng.integers(0, N, (B, T))

    got = rank_targets(scores.copy(), targets)

    safe = np.where(np.isfinite(scores), scores, -np.inf)
    for b in range(B):
        order = np.argsort(-safe[b], kind="stable")
        for t in range(T):
            want = int(np.where(order == targets[b, t])[0][0])
            assert got[b, t] == want, (b, t)

    n_targets = np.full(B, T)
    m = dis_eval_metrics(got, n_targets, ["hit@10", "ndcg@10"])
    assert m["ndcg@10"] <= B  # per-row ndcg <= 1
    per_row = dis_eval_metrics(got[1:2], n_targets[1:2], ["hit@10", "ndcg@10"])
    assert per_row["ndcg@10"] <= 1.0 + 1e-9

    # candidates (sampled eval) path: same stable-order semantics in the
    # pool, which the reference collator truncates to num_neg entries —
    # targets first, then the first C - n_targets negatives
    # (ref datasets/collator_traditional.py:30-31)
    C = 10
    cand = rng.integers(0, N, (B, C))
    ranks = rank_targets(scores.copy(), targets,
                         candidates={"all_item": cand,
                                     "n_targets": n_targets})
    for b in range(B):
        tgt = safe[b, targets[b]]
        pool = np.concatenate([tgt, safe[b, cand[b, :C - T]]])
        order = np.argsort(-pool, kind="stable")
        for t in range(T):
            want = int(np.where(order == t)[0][0])
            assert ranks[b, t] == want, (b, t)
