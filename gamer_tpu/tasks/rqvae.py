"""RQVAE — train the RQ-VAE item tokenizer.

TPU-native counterpart of the reference task + trainer
(ref: SeqRec/tasks/RQVAE.py, SeqRec/trainers/RQVAE.py): trains on the item
embedding matrix with CF-embedding alignment, re-clusters each codebook per
epoch for the diversity loss (ref trainers/RQVAE.py:163-177), evaluates the
emitted-code collision rate (ref :189-218), and keeps best-loss AND
best-collision checkpoints (ref :233-253).

Data parallelism comes from the jitted step over the mesh (no DDP wrapper /
all_reduce — ref :139-146); the dataset is a single [N, D] matrix, so batches
are row slices.
"""

from __future__ import annotations

import argparse

import os

import jax
import jax.numpy as jnp
import numpy as np

from gamer_tpu.core.checkpoint import CheckpointManager
from gamer_tpu.core.logging import get_logger
from gamer_tpu.core.metrics import MetricWriter
from gamer_tpu.core.registry import TASKS
from gamer_tpu.data.contract import DataFiles
from gamer_tpu.models.tokenizer.rqvae import RQVAE, RQVAEConfig, rqvae_loss
from gamer_tpu.ops.kmeans import balanced_kmeans, cluster_codebook
from gamer_tpu.tasks.base import (Task, add_dataset_args, add_global_args,
                                 add_ref_compat_args)
from gamer_tpu.train.state import OptimizerConfig, make_optimizer

logger = get_logger("tasks.rqvae")


def _load_tensor_file(path: str) -> np.ndarray:
    """Load a .npy or torch .pt/.pth tensor pickle as float32 numpy.

    The reference ships its real CF embeddings as torch pickles
    (ref tasks/RQVAE.py:161-165, pretrained_ckpt/cf-embs/*-32d-sasrec.pt).
    """
    if path.endswith((".pt", ".pth")):
        import torch

        t = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(t, dict):  # state-dict style: take the single tensor
            if len(t) != 1:
                raise ValueError(f"{path}: expected one tensor, got keys {list(t)}")
            t = next(iter(t.values()))
        return np.asarray(t.detach().to(torch.float32).numpy())
    return np.load(path).astype(np.float32)


def load_embeddings(path: str) -> np.ndarray:
    """ref datasets/emb_dataset.py:7-27 (std-normalize when too flat)."""
    emb = _load_tensor_file(path)
    std = emb.std()
    if std < 0.2:
        logger.warning("embedding std %.4f too low; normalizing", std)
        emb = emb / std
    return emb


def init_codebooks_from_data(model: RQVAE, variables, x: np.ndarray,
                             seed: int = 0):
    """Cascaded balanced-kmeans codebook init (ref ResidualVectorQuantizer.vq_ini,
    resiual_vector_quantizer.py:50-57 + vector_quantizer.py:44-47,90-125)."""
    cfg = model.cfg
    x_e = model.apply(variables, jnp.asarray(x), True,
                      method=lambda m, a, d: m.encoder(a, d))
    residual = np.asarray(x_e)
    max_n = max(cfg.num_emb_list)
    books = []
    for level in range(cfg.num_levels):
        n_e = cfg.num_emb_list[level]
        centers, labels = balanced_kmeans(jnp.asarray(residual), n_e,
                                          iters=cfg.kmeans_iters,
                                          seed=seed + level)
        centers, labels = np.asarray(centers), np.asarray(labels)
        # stacked [L, max_n, e_dim] codebook: pad smaller levels (rows beyond
        # num_emb_list[level] are never read)
        books.append(np.pad(centers, ((0, max_n - n_e), (0, 0))))
        residual = residual - centers[labels]
    new_params = jax.tree_util.tree_map(lambda v: v, variables)
    new_params["params"]["codebooks"] = jnp.asarray(np.stack(books))
    return new_params


def collision_rate(indices: np.ndarray) -> float:
    """ref trainers/RQVAE.py:189-218."""
    uniq = np.unique(indices.reshape(len(indices), -1), axis=0)
    return (len(indices) - len(uniq)) / len(indices)


@TASKS.register("RQVAE")
class TrainRQVAE(Task):
    name = "RQVAE"
    help = "Train the RQ-VAE semantic-ID tokenizer."

    @classmethod
    def add_args(cls, parser):
        add_global_args(parser)
        add_dataset_args(parser)
        g = parser.add_argument_group("rqvae")
        g.add_argument("--emb_file", type=str, default=None,
                       help="item embedding .npy (default <ds>.emb-synthetic-td.npy)")
        g.add_argument("--cf_emb_file", "--cf_emb", type=str, default=None,
                       help="CF embedding .npy/.pt for the alignment loss")
        g.add_argument("--epochs", type=int, default=2000)
        g.add_argument("--batch_size", type=int, default=1024)
        g.add_argument("--learning_rate", "--lr", type=float, default=1e-3)
        g.add_argument("--weight_decay", type=float, default=1e-4)
        g.add_argument("--eval_step", type=int, default=50)
        g.add_argument("--e_dim", type=int, default=32)
        g.add_argument("--num_emb", type=int, default=256)
        g.add_argument("--num_levels", type=int, default=4)
        g.add_argument("--num_emb_list", type=str, default=None,
                       help="per-level codebook sizes, comma list (ref "
                            "RQVAE.py:65-70); overrides --num_emb/--num_levels")
        g.add_argument("--layers", type=str, default="2048,1024,512,256,128,64")
        g.add_argument("--alpha", type=float, default=0.02)
        g.add_argument("--beta", type=float, default=0.0001)
        g.add_argument("--sk_epsilons", type=str, default=None,
                       help="per-level sinkhorn eps, comma list (default 0s + 0.003)")
        g.add_argument("--kmeans_init", action="store_true")
        g.add_argument("--kmeans_iters", type=int, default=100,
                       help="max kmeans iterations for codebook init")
        g.add_argument("--sk_iters", type=int, default=50,
                       help="max sinkhorn iterations")
        g.add_argument("--n_clusters", type=int, default=10,
                       help="diversity-loss clusters per codebook")
        g.add_argument("--sample_strategy", type=str, default="all",
                       help="accepted for parity (unused in the reference too)")
        g.add_argument("--bn", action="store_true",
                       help="BatchNorm in the encoder/decoder MLPs")
        g.add_argument("--dropout_prob", type=float, default=0.0)
        g.add_argument("--loss_type", type=str, default="mse")
        g.add_argument("--quant_loss_weight", type=float, default=1.0)
        g.add_argument("--learner", "--optim", type=str, default="adamw",
                       help="optimizer family (ref RQVAE.py:39)")
        g.add_argument("--ckpt_dir", dest="output_dir",
                       default=argparse.SUPPRESS,
                       help="alias of --output_dir (ref RQVAE.py:100)")
        add_ref_compat_args(parser, "device", "num_workers")
        g.add_argument("--recluster_every", type=int, default=1,
                       help="epochs between diversity re-clustering")
        return parser

    def run(self, *, dataset, data_path, output_dir, seed, emb_file, cf_emb_file,
            epochs, batch_size, learning_rate, weight_decay, eval_step,
            e_dim, num_emb, num_levels, layers, alpha, beta, sk_epsilons,
            kmeans_init, dropout_prob, loss_type, quant_loss_weight,
            recluster_every, num_emb_list=None, kmeans_iters=100, sk_iters=50,
            n_clusters=10, sample_strategy="all", bn=False, learner="adamw", **_):
        files = DataFiles(data_path, dataset)
        emb_path = emb_file or files.path(".emb-synthetic-td.npy")
        x = load_embeddings(emb_path)
        n, in_dim = x.shape

        cf = None
        if alpha > 0 and cf_emb_file:
            cf = _load_tensor_file(cf_emb_file)
            assert len(cf) == n, "CF embedding rows must match items"
        elif alpha > 0:
            logger.warning("no --cf_emb_file given; disabling CF loss")
            alpha = 0.0

        if num_emb_list:
            emb_list = [int(v) for v in str(num_emb_list).split(",")]
            num_levels = len(emb_list)
        else:
            emb_list = [num_emb] * num_levels
        if sk_epsilons:
            eps = [float(v) for v in sk_epsilons.split(",")]
        else:
            eps = [0.0] * (num_levels - 1) + [0.003]
        cfg = RQVAEConfig(
            in_dim=in_dim, num_emb_list=emb_list, e_dim=e_dim,
            layers=[int(v) for v in layers.split(",")],
            dropout_prob=dropout_prob, bn=bn, loss_type=loss_type,
            quant_loss_weight=quant_loss_weight, sk_epsilons=eps,
            sk_iters=sk_iters, kmeans_iters=kmeans_iters,
            n_clusters=n_clusters, sample_strategy=sample_strategy,
            alpha=alpha, beta=beta)
        model = RQVAE(cfg)

        rng = jax.random.PRNGKey(seed)
        variables = model.init(rng, jnp.asarray(x[: min(8, n)]))
        if kmeans_init:
            variables = init_codebooks_from_data(model, variables, x, seed)

        tx = make_optimizer(OptimizerConfig(
            optim=learner, learning_rate=learning_rate,
            weight_decay=weight_decay,
            lr_scheduler_type="constant", warmup_ratio=0.0, max_grad_norm=0.0,
            total_steps=epochs * max(n // batch_size, 1)))
        opt_state = tx.init(variables)

        cf_all = jnp.asarray(cf) if cf is not None else None

        @jax.jit
        def train_step(variables, opt_state, batch_x, batch_cf, div_labels, rng):
            def loss_fn(v):
                kwargs = dict(
                    use_sk=True, deterministic=False,
                    diversity_labels=div_labels if cfg.beta > 0 else None,
                    diversity_rng=rng,
                    rngs={"dropout": jax.random.fold_in(rng, 1)})
                if cfg.bn:
                    # BatchNorm running stats update outside the gradient
                    outputs, new_state = model.apply(
                        v, batch_x, mutable=["batch_stats"], **kwargs)
                    loss, aux = rqvae_loss(cfg, outputs, batch_x, batch_cf)
                    return loss, {**aux, "_batch_stats": new_state["batch_stats"]}
                outputs = model.apply(v, batch_x, **kwargs)
                return rqvae_loss(cfg, outputs, batch_x, batch_cf)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
            updates, opt_state = tx.update(grads, opt_state, variables)
            import optax
            variables = optax.apply_updates(variables, updates)
            if cfg.bn:
                variables = dict(variables,
                                 batch_stats=aux.pop("_batch_stats"))
            return variables, opt_state, loss, aux

        @jax.jit
        def emit_indices(variables, batch_x):
            return model.apply(variables, batch_x, method=RQVAE.get_indices)

        ckpt = CheckpointManager(output_dir)
        writer = MetricWriter(os.path.join("runs", self.name),
                              config=getattr(self, "param_dict", {}))
        best_loss, best_collision = np.inf, np.inf
        np_rng = np.random.default_rng(seed)
        max_n = max(cfg.num_emb_list)
        div_labels = jnp.zeros((cfg.num_levels, max_n), jnp.int32)
        pad_n = ((n + batch_size - 1) // batch_size) * batch_size

        for epoch in range(epochs):
            if cfg.beta > 0 and epoch % recluster_every == 0:
                books = np.asarray(variables["params"]["codebooks"])
                div_labels = jnp.asarray(np.stack([
                    np.pad(np.asarray(cluster_codebook(
                        books[l][: cfg.num_emb_list[l]],
                        # clamp: small codebooks can't fill n_clusters
                        min(cfg.n_clusters, cfg.num_emb_list[l]),
                        seed + epoch + l)),
                        (0, max_n - cfg.num_emb_list[l]))
                    for l in range(cfg.num_levels)]))
            order = np_rng.permutation(n)
            order = np.concatenate([order, order[: pad_n - n]])
            ep_loss, n_steps = 0.0, 0
            for s in range(0, pad_n, batch_size):
                idx = order[s: s + batch_size]
                bx = jnp.asarray(x[idx])
                bcf = cf_all[idx] if cf_all is not None else None
                variables, opt_state, loss, aux = train_step(
                    variables, opt_state, bx, bcf, div_labels,
                    jax.random.fold_in(rng, epoch * 100003 + s))
                ep_loss += float(loss)
                n_steps += 1
            ep_loss /= max(n_steps, 1)
            if not np.isfinite(ep_loss):
                raise ValueError("Training loss is nan")

            if (epoch + 1) % eval_step == 0 or epoch == epochs - 1:
                all_idx = []
                for s in range(0, pad_n, batch_size):
                    idx = order[s: s + batch_size]  # any order; we dedupe rows
                    all_idx.append(np.asarray(emit_indices(variables, jnp.asarray(x[idx]))))
                emitted = np.concatenate(all_idx)[:n]
                coll = collision_rate(emitted)
                writer.log({"train/loss": ep_loss, "eval/collision_rate": coll}, step=epoch)
                logger.info("epoch %d: loss %.4f collision %.4f", epoch, ep_loss, coll)
                if ep_loss < best_loss:
                    best_loss = ep_loss
                    ckpt.save("best_loss", variables, {"epoch": epoch, "loss": ep_loss})
                if coll < best_collision:
                    best_collision = coll
                    ckpt.save("best_collision", variables,
                              {"epoch": epoch, "collision_rate": coll})
        ckpt.save("last", variables, {"epoch": epochs - 1})
        cfg.save(output_dir)
        logger.info("done: best loss %.4f best collision %.4f", best_loss, best_collision)
        return {"best_loss": float(best_loss), "best_collision": float(best_collision)}
