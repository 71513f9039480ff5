"""RQ-VAE, sinkhorn, balanced k-means and tokenize tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamer_tpu.models.tokenizer.rqvae import RQVAE, RQVAEConfig, rqvae_loss
from gamer_tpu.ops.kmeans import balanced_kmeans, kmeans
from gamer_tpu.ops.sinkhorn import balanced_assign, center_distance, sinkhorn


def small_cfg(**kw):
    d = dict(in_dim=16, num_emb_list=[8, 8, 8], e_dim=4, layers=[32, 8],
             alpha=0.0, beta=0.0, sk_epsilons=[0.0, 0.0, 0.003])
    d.update(kw)
    return RQVAEConfig(**d)


class TestSinkhorn:
    def test_rows_sum_to_one(self):
        rng = np.random.default_rng(0)
        d = jnp.asarray(rng.normal(size=(32, 8)) ** 2)
        Q = sinkhorn(center_distance(d), 0.01, 50)
        np.testing.assert_allclose(np.asarray(Q.sum(axis=1)), np.ones(32), rtol=1e-3)

    def test_balanced_assignment_spreads(self):
        # near-identical rows (tiny noise): greedy crowds one cluster,
        # sinkhorn spreads the mass across clusters
        rng = np.random.default_rng(0)
        d = np.tile(np.arange(8) * 0.01, (32, 1)) + 1e-4 * rng.normal(size=(32, 8))
        greedy = np.bincount(np.argmin(d, axis=1), minlength=8)
        idx = np.asarray(balanced_assign(jnp.asarray(d), 0.003, 100))
        counts = np.bincount(idx, minlength=8)
        assert greedy.max() == 32  # sanity: greedy is degenerate
        assert counts.max() <= 8, f"not balanced: {counts}"


class TestKMeans:
    def test_kmeans_clusters_separated_data(self):
        rng = np.random.default_rng(0)
        centers = rng.normal(size=(4, 8)) * 10
        x = np.concatenate([c + 0.1 * rng.normal(size=(20, 8)) for c in centers])
        _, labels = kmeans(jnp.asarray(x), 4, iters=20, seed=1)
        labels = np.asarray(labels)
        # each true cluster maps to one label
        for g in range(4):
            assert len(np.unique(labels[g * 20:(g + 1) * 20])) == 1

    def test_balanced_kmeans_sizes(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(64, 6))
        _, labels = balanced_kmeans(jnp.asarray(x), 8, iters=10, seed=0)
        counts = np.bincount(np.asarray(labels), minlength=8)
        assert counts.min() >= 2 and counts.max() <= 16, counts

    def test_rq_kmeans_golden_parity_vs_sklearn(self):
        """Golden parity with the reference's iterated-residual-KMeans
        (ref SeqRec/tasks/tokenize.py:152-207: sklearn KMeans per level,
        R -= C[s]) on a planted-hierarchy embedding matrix (VERDICT r3 #3).

        Asserts the jitted greedy-k-means++ Lloyd implementation recovers the
        planted structure as well as sklearn (ARI), reaches the same residual
        energy after all levels (inertia), and emits a code tree with the
        same collision profile — i.e. no code-assignment defect (residual
        update / level ordering / seeding quality)."""
        sk_cluster = pytest.importorskip("sklearn.cluster")
        from sklearn.metrics import adjusted_rand_score

        rng = np.random.default_rng(0)
        coarse = rng.standard_normal((64, 24)) * 3
        sub = rng.standard_normal((64, 8, 24))
        n = 2500
        ci = rng.integers(0, 64, n)
        si = rng.integers(0, 8, n)
        x = (coarse[ci] + sub[ci, si]
             + rng.standard_normal((n, 24)) * 0.3).astype(np.float32)
        levels = (64, 64, 64, 64)

        R = x.copy()
        ref_codes = []
        for k in levels:
            m = sk_cluster.KMeans(n_clusters=k, max_iter=1000,
                                  n_init="auto", random_state=0).fit(R)
            s = m.predict(R)
            ref_codes.append(s)
            R = R - m.cluster_centers_[s]
        ref_codes = np.stack(ref_codes, 1)
        ref_inertia = float((R ** 2).sum())

        R = x.copy()
        my_codes = []
        for lvl, k in enumerate(levels):
            c, lab = kmeans(jnp.asarray(R), k, iters=50, seed=lvl, n_init=4)
            c, lab = np.asarray(c), np.asarray(lab)
            my_codes.append(lab)
            R = R - c[lab]
        my_codes = np.stack(my_codes, 1)
        my_inertia = float((R ** 2).sum())

        ari_ref = adjusted_rand_score(ref_codes[:, 0], ci)
        ari_mine = adjusted_rand_score(my_codes[:, 0], ci)
        assert ari_mine >= ari_ref - 0.05, (ari_mine, ari_ref)
        assert my_inertia <= 1.05 * ref_inertia, (my_inertia, ref_inertia)

        def collision(c):
            return 1 - len(set(map(tuple, c))) / len(c)

        assert abs(collision(my_codes) - collision(ref_codes)) <= 0.08, (
            collision(my_codes), collision(ref_codes))


class TestRQVAE:
    def test_forward_shapes_and_st_gradients(self):
        cfg = small_cfg()
        model = RQVAE(cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 16)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out["out"].shape == (16, 16)
        assert out["indices"].shape == (16, 3)
        assert out["x_q"].shape == (16, 4)

        def loss_fn(v):
            o = model.apply(v, x)
            total, _ = rqvae_loss(cfg, o, x)
            return total

        grads = jax.grad(loss_fn)(variables)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # encoder gets gradient through the straight-through estimator
        enc_g = grads["params"]["encoder"]["Dense_0"]["kernel"]
        assert float(jnp.abs(enc_g).sum()) > 0

    def test_training_reduces_recon_loss(self):
        import optax

        cfg = small_cfg()
        model = RQVAE(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        tx = optax.adam(1e-2)
        opt_state = tx.init(variables)

        @jax.jit
        def step(v, o):
            def loss_fn(v):
                out = model.apply(v, x)
                total, aux = rqvae_loss(cfg, out, x)
                return total, aux["recon_loss"]
            (l, recon), g = jax.value_and_grad(loss_fn, has_aux=True)(v)
            updates, o = tx.update(g, o, v)
            return optax.apply_updates(v, updates), o, recon

        first = None
        for i in range(60):
            variables, opt_state, recon = step(variables, opt_state)
            if first is None:
                first = float(recon)
        assert float(recon) < first * 0.8

    def test_diversity_loss_runs(self):
        cfg = small_cfg(beta=0.1)
        model = RQVAE(cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 16)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        labels = jnp.asarray(np.random.default_rng(1).integers(0, 3, (3, 8)))
        out = model.apply(variables, x, diversity_labels=labels,
                          diversity_rng=jax.random.PRNGKey(2))
        assert np.isfinite(float(out["rq_loss"]))

    def test_get_indices_deterministic(self):
        cfg = small_cfg()
        model = RQVAE(cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 16)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        i1 = model.apply(variables, x, method=RQVAE.get_indices)
        i2 = model.apply(variables, x, method=RQVAE.get_indices)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


class TestTokenizeTask:
    def test_cid_and_rid(self, synth_dir, tmp_path):
        import sys
        sys.path.insert(0, "/root/repo")
        from main import main

        res = main(["tokenize", "--mode", "cid", "--dataset", "Synth",
                    "--data_path", synth_dir, "--chunk_size", "8"])
        assert res["collision_rate"] == 0.0
        with open(res["output_file"]) as f:
            d = json.load(f)
        assert len(d) == 60 and all(len(v) == 2 for v in d.values())

        res = main(["tokenize", "--mode", "rid", "--dataset", "Synth",
                    "--data_path", synth_dir, "--num_code_list", "8,8"])
        assert res["collision_rate"] == 0.0

    def test_rq_kmeans(self, synth_dir):
        import sys
        sys.path.insert(0, "/root/repo")
        from main import main

        res = main(["tokenize", "--mode", "rq_kmeans", "--dataset", "Synth",
                    "--data_path", synth_dir, "--num_code_list", "8,8,8",
                    "--emb_file", f"{synth_dir}/Synth/Synth.emb-synthetic-td.npy"])
        assert res["n_items"] == 60
        assert res["collision_rate"] <= 0.05

    def test_rqvae_train_and_tokenize(self, synth_dir, tmp_path):
        import sys
        sys.path.insert(0, "/root/repo")
        from main import main

        ckpt = str(tmp_path / "rq_ckpt")
        res = main(["RQVAE", "--dataset", "Synth", "--data_path", synth_dir,
                    "--output_dir", ckpt, "--epochs", "30", "--batch_size", "32",
                    "--eval_step", "10", "--e_dim", "8", "--num_emb", "16",
                    "--num_levels", "3", "--layers", "32,16", "--alpha", "0",
                    "--beta", "0.0001", "--kmeans_init",
                    "--emb_file", f"{synth_dir}/Synth/Synth.emb-synthetic-td.npy"])
        assert np.isfinite(res["best_loss"])
        assert 0.0 <= res["best_collision"] <= 1.0

        tok = main(["tokenize", "--mode", "rq_vae", "--dataset", "Synth",
                    "--data_path", synth_dir, "--ckpt_path", ckpt,
                    "--ckpt_tag", "best_collision", "--epoch", "30",
                    "--emb_file", f"{synth_dir}/Synth/Synth.emb-synthetic-td.npy"])
        assert tok["n_items"] == 60
        with open(tok["output_file"]) as f:
            d = json.load(f)
        assert len(d) == 60


def test_load_pt_cf_embeddings(tmp_path):
    """--cf_emb_file accepts torch .pt pickles — the format the reference
    ships its real CF embeddings in (ref tasks/RQVAE.py:161-165,
    pretrained_ckpt/cf-embs/*-32d-sasrec.pt)."""
    import torch

    from gamer_tpu.tasks.rqvae import _load_tensor_file, load_embeddings

    x = np.random.default_rng(0).normal(size=(12, 6)).astype(np.float32)
    pt_path = str(tmp_path / "cf.pt")
    torch.save(torch.from_numpy(x), pt_path)
    got = _load_tensor_file(pt_path)
    np.testing.assert_allclose(got, x)
    assert got.dtype == np.float32
    # load_embeddings path (std-normalize rule) also takes .pt
    assert load_embeddings(pt_path).shape == (12, 6)
    # dict-style pickle with a single tensor also loads
    torch.save({"emb": torch.from_numpy(x)}, str(tmp_path / "cfd.pt"))
    np.testing.assert_allclose(_load_tensor_file(str(tmp_path / "cfd.pt")), x)


def test_rq_kmeans_cf_reduce(synth_dir, tmp_path):
    """rq_kmeans with CF concatenation + PCA reduction."""
    import sys
    sys.path.insert(0, "/root/repo")
    from main import main

    cf = np.random.default_rng(0).normal(size=(60, 8)).astype(np.float32)
    cf_path = str(tmp_path / "cf.npy")
    np.save(cf_path, cf)
    res = main(["tokenize", "--mode", "rq_kmeans", "--dataset", "Synth",
                "--data_path", synth_dir, "--num_code_list", "8,8,8",
                "--cf_emb_file", cf_path, "--reduce",
                "--emb_file", f"{synth_dir}/Synth/Synth.emb-synthetic-td.npy"])
    assert res["n_items"] == 60
    assert "rq-kmeans-cf" in res["output_file"]


class TestNonUniformAndBN:
    def test_non_uniform_levels_respect_bounds(self):
        """--num_emb_list with unequal sizes (ref RQVAE.py:65-70): indices
        stay inside each level's codebook; losses stay finite."""
        cfg = RQVAEConfig(in_dim=16, num_emb_list=[8, 4, 6], e_dim=4,
                          layers=[12, 8], alpha=0.0, beta=0.0001,
                          sk_epsilons=[0.0, 0.0, 0.003])
        model = RQVAE(cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 16)).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x)
        assert v["params"]["codebooks"].shape == (3, 8, 4)
        out = model.apply(v, x, use_sk=True,
                          diversity_labels=jnp.zeros((3, 8), jnp.int32),
                          diversity_rng=jax.random.PRNGKey(1))
        idx = np.asarray(out["indices"])
        assert (idx.max(0) < np.array([8, 4, 6])).all()
        loss, _ = rqvae_loss(cfg, out, x)
        assert np.isfinite(float(loss))

    def test_bn_updates_running_stats(self):
        """--bn (ref layers.py:19-22): train-mode apply must emit updated
        batch_stats; eval-mode indices use the running stats and stay
        batch-independent."""
        cfg = RQVAEConfig(in_dim=16, num_emb_list=[8, 8], e_dim=4,
                          layers=[12, 8], bn=True, alpha=0.0, beta=0.0,
                          sk_epsilons=[0.0, 0.003])
        model = RQVAE(cfg)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32) * 3 + 1)
        v = model.init(jax.random.PRNGKey(0), x)
        assert "batch_stats" in v
        _, new_state = model.apply(v, x, use_sk=True, deterministic=False,
                                   rngs={"dropout": jax.random.PRNGKey(2)},
                                   mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(v["batch_stats"])
        after = jax.tree_util.tree_leaves(new_state["batch_stats"])
        assert any(float(jnp.abs(a - b).max()) > 1e-6
                   for a, b in zip(before, after))
        # eval-mode get_indices: per-row result unchanged when batch shrinks
        v2 = dict(v, batch_stats=new_state["batch_stats"])
        idx_full = np.asarray(model.apply(v2, x, method=RQVAE.get_indices))
        idx_half = np.asarray(model.apply(v2, x[:16], method=RQVAE.get_indices))
        np.testing.assert_array_equal(idx_full[:16], idx_half)
