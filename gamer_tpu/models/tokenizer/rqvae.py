"""RQ-VAE item tokenizer: residual vector quantization with Sinkhorn balancing,
CF-alignment loss and codebook-diversity loss.

Re-design of the reference tokenizer (ref: SeqRec/models/tokenizer/RQVAE/
{model.py, vector_quantizer.py, resiual_vector_quantizer.py}) as one flax
module whose codebooks are a single stacked parameter [L, n_e, e_dim] (ready
for row-sharding on the mesh model axis). Semantics preserved:

 * MLP encoder [in_dim, *layers, e_dim] / mirrored decoder, ReLU between all
   but the last layer (ref layers.py:7-38)
 * per level: L2-distance assignment, optional Sinkhorn-balanced assignment
   when sk_epsilon > 0 (ref vector_quantizer.py:146-163); optional softmax
   sampling for the last level during collision repair (ref :148-153)
 * losses: recon + quant_weight * mean_level(codebook + mu*commitment +
   beta*diversity) + alpha * CF InfoNCE (ref model.py:105-150)
 * diversity: positive = a random different code in the same (balanced-kmeans)
   cluster of the codebook; CE over code similarities with self masked
   (ref vector_quantizer.py:49-88)
 * straight-through estimator (ref :181)
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gamer_tpu.core.config import Config, config_field
from gamer_tpu.ops.sinkhorn import balanced_assign


class RQVAEConfig(Config):
    in_dim: int = 768
    num_emb_list: list = config_field([256, 256, 256, 256])
    e_dim: int = 32
    layers: list = config_field([2048, 1024, 512, 256, 128, 64])
    dropout_prob: float = 0.0
    bn: bool = False  # BatchNorm after each Dense (ref layers.py:19-22)
    loss_type: str = "mse"  # mse | l1
    quant_loss_weight: float = 1.0
    mu: float = 0.25
    sk_epsilons: list = config_field([0.0, 0.0, 0.0, 0.003])
    sk_iters: int = 50
    kmeans_iters: int = 100  # Lloyd iterations for codebook init (ref RQVAE.py:54)
    alpha: float = 0.02  # CF loss weight
    beta: float = 0.0001  # diversity loss weight
    n_clusters: int = 10  # diversity clusters per codebook
    # stored for config parity; the reference threads it through but never
    # branches on it (ref model.py:50, trainers/RQVAE.py uses the default path)
    sample_strategy: str = "all"

    @property
    def num_levels(self) -> int:
        return len(self.num_emb_list)


class MLPStack(nn.Module):
    dims: tuple
    dropout: float = 0.0
    bn: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i, d in enumerate(self.dims):
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            x = nn.Dense(d, kernel_init=nn.initializers.xavier_normal())(x)
            if self.bn:
                # ref layers.py:21-22 appends BatchNorm1d after every Linear
                # (torch defaults: eps 1e-5, running-stat momentum 0.1 — flax
                # momentum is the fraction of the OLD stat kept, so 0.9)
                x = nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, epsilon=1e-5)(x)
            if i != len(self.dims) - 1:
                x = nn.relu(x)
        return x


class RQVAE(nn.Module):
    cfg: RQVAEConfig

    def setup(self):
        c = self.cfg
        self.encoder = MLPStack(tuple(list(c.layers) + [c.e_dim]), c.dropout_prob,
                                bn=c.bn)
        self.decoder = MLPStack(tuple(list(reversed(c.layers)) + [c.in_dim]),
                                c.dropout_prob, bn=c.bn)
        # One stacked parameter [L, max_n, e_dim] (shardable on the model axis);
        # non-uniform level sizes (ref --num_emb_list) are static row slices —
        # rows >= num_emb_list[level] are never read.
        max_n = max(c.num_emb_list)

        def init_books(key, shape):
            u = jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
            scale = jnp.asarray([1.0 / n for n in c.num_emb_list])[:, None, None]
            return u * scale  # per-level uniform(-1/n_l, 1/n_l) (ref :36)

        self.codebooks = self.param("codebooks", init_books,
                                    (c.num_levels, max_n, c.e_dim))

    def _book(self, level: int) -> jnp.ndarray:
        """Static per-level slice of the stacked codebook."""
        return self.codebooks[level][: self.cfg.num_emb_list[level]]

    # ---- quantization ------------------------------------------------------

    def _assign(self, residual: jnp.ndarray, level: int, use_sk: bool,
                sample_last: bool, rng: Optional[jax.Array]) -> jnp.ndarray:
        c = self.cfg
        book = self._book(level)
        d = (
            jnp.sum(residual ** 2, axis=1, keepdims=True)
            + jnp.sum(book ** 2, axis=1)[None, :]
            - 2.0 * residual @ book.T
        )
        eps = float(c.sk_epsilons[level])
        if use_sk and eps > 0:
            return balanced_assign(d, eps, c.sk_iters)
        if sample_last and level == c.num_levels - 1 and rng is not None:
            # softmax sampling of the last level (collision repair,
            # ref vector_quantizer.py:148-153)
            return jax.random.categorical(rng, -d, axis=-1)
        return jnp.argmin(d, axis=-1)

    def quantize(self, x_e: jnp.ndarray, use_sk: bool = True,
                 sample_last: bool = False, rng: Optional[jax.Array] = None,
                 diversity_labels: Optional[jnp.ndarray] = None,
                 diversity_rng: Optional[jax.Array] = None):
        """Residual quantization. Returns (x_q, rq_loss, indices [B, L])."""
        c = self.cfg
        residual = x_e
        x_q = jnp.zeros_like(x_e)
        losses = []
        all_indices = []
        for level in range(c.num_levels):
            idx = self._assign(residual, level, use_sk, sample_last, rng)
            quant = self._book(level)[idx]
            # per-level VQ losses on the residual target (ref :175-178)
            commitment = jnp.mean((jax.lax.stop_gradient(quant) - residual) ** 2)
            codebook_l = jnp.mean((quant - jax.lax.stop_gradient(residual)) ** 2)
            level_loss = codebook_l + c.mu * commitment
            if c.beta > 0 and diversity_labels is not None and diversity_rng is not None:
                level_loss = level_loss + c.beta * self._diversity_loss(
                    quant, idx, level, diversity_labels[level],
                    jax.random.fold_in(diversity_rng, level))
            losses.append(level_loss)
            # straight-through per level, residual update
            quant_st = residual + jax.lax.stop_gradient(quant - residual)
            residual = residual - quant_st
            x_q = x_q + quant_st
            all_indices.append(idx)
        rq_loss = jnp.mean(jnp.stack(losses))
        return x_q, rq_loss, jnp.stack(all_indices, axis=-1)

    def _diversity_loss(self, x_q: jnp.ndarray, indices: jnp.ndarray, level: int,
                        labels: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """InfoNCE pulling each quantized vector toward a same-cluster positive
        code (ref vector_quantizer.py:49-88)."""
        book = self._book(level)
        n_e = book.shape[0]
        labels = labels[:n_e]  # stacked [L, max_n] labels; slice this level's
        # positive sampling: same cluster, not self — gumbel-argmax over mask
        same = labels[indices][:, None] == labels[None, :]  # [B, n_e]
        not_self = jax.nn.one_hot(indices, n_e, dtype=bool)
        mask = same & ~not_self
        has_pos = mask.any(axis=1)
        gumbel = jax.random.gumbel(rng, mask.shape)
        pos = jnp.argmax(jnp.where(mask, gumbel, -jnp.inf), axis=1)
        sim = x_q @ book.T  # [B, n_e]
        sim = sim - 1e12 * jax.nn.one_hot(indices, n_e)  # mask self (ref :67-70)
        logp = jax.nn.log_softmax(sim, axis=-1)
        nll = -jnp.take_along_axis(logp, pos[:, None], axis=-1)[:, 0]
        return jnp.where(has_pos, nll, 0.0).mean()

    # ---- public API --------------------------------------------------------

    def __call__(self, x: jnp.ndarray, use_sk: bool = True,
                 deterministic: bool = True,
                 diversity_labels: Optional[jnp.ndarray] = None,
                 diversity_rng: Optional[jax.Array] = None,
                 sample_last: bool = False,
                 sample_rng: Optional[jax.Array] = None):
        """Returns dict(out, rq_loss, indices, x_e, x_q)."""
        x_e = self.encoder(x, deterministic)
        x_q, rq_loss, indices = self.quantize(
            x_e, use_sk=use_sk, sample_last=sample_last, rng=sample_rng,
            diversity_labels=diversity_labels, diversity_rng=diversity_rng)
        out = self.decoder(x_q, deterministic)
        return {"out": out, "rq_loss": rq_loss, "indices": indices,
                "x_e": x_e, "x_q": x_q}

    def get_indices(self, x: jnp.ndarray, use_sk: bool = False,
                    sample_last: bool = False, sample_rng: Optional[jax.Array] = None):
        x_e = self.encoder(x, True)
        _, _, indices = self.quantize(x_e, use_sk=use_sk,
                                      sample_last=sample_last, rng=sample_rng)
        return indices

    def last_level_distances(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, n_e] squared distances of the last-level residual to the last
        codebook, with earlier levels assigned greedily (collision repair)."""
        c = self.cfg
        residual = self.encoder(x, True)
        for level in range(c.num_levels - 1):
            idx = self._assign(residual, level, use_sk=False, sample_last=False, rng=None)
            residual = residual - self._book(level)[idx]
        book = self._book(c.num_levels - 1)
        return (
            jnp.sum(residual ** 2, axis=1, keepdims=True)
            + jnp.sum(book ** 2, axis=1)[None, :]
            - 2.0 * residual @ book.T
        )


def rqvae_loss(cfg: RQVAEConfig, outputs: dict, x: jnp.ndarray,
               cf_emb: Optional[jnp.ndarray] = None) -> tuple[jnp.ndarray, dict]:
    """Total loss = recon + quant_weight*rq + alpha*CF (ref model.py:121-150).

    The CF InfoNCE compares the quantized representation against the item's
    collaborative-filtering embedding batch-wise (ref model.py:105-110: logits
    = x_q @ cf^T over the batch, label = own row).
    """
    out = outputs["out"]
    if cfg.loss_type == "mse":
        recon = jnp.mean((out - x) ** 2)
    elif cfg.loss_type == "l1":
        recon = jnp.mean(jnp.abs(out - x))
    else:
        raise ValueError(cfg.loss_type)
    total = recon + cfg.quant_loss_weight * outputs["rq_loss"]
    cf_loss = jnp.array(0.0)
    if cfg.alpha > 0 and cf_emb is not None:
        sims = outputs["x_q"] @ cf_emb.T
        labels = jnp.arange(sims.shape[0])
        logp = jax.nn.log_softmax(sims, axis=-1)
        cf_loss = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
        total = total + cfg.alpha * cf_loss
    return total, {"recon_loss": recon, "quant_loss": outputs["rq_loss"],
                   "cf_loss": cf_loss}
