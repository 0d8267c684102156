"""Shape-prior autoencoder (reference prepare_data/lib/auto_encoder.py:54).

A PointNet-style encoder (per-point MLP + max pool, emb 512) with an MLP
decoder to n_points, trained with the chamfer loss — the SPD pipeline that
produces ``mean_points_emb.npy`` (consumed at eval by the reference,
evaluation/load_data_eval.py:159).  Training runs as a jitted optax loop
on device; the chamfer term is givepose_tpu.ops.chamfer (replacing the
CUDA nn_distance extension the reference builds twice).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from givepose_tpu.ops import chamfer_distances

Dtype = Any


class PointCloudEncoder(nn.Module):
    emb_dim: int = 512

    @nn.compact
    def __call__(self, pts):          # (B, N, 3)
        h = nn.Dense(64)(pts)
        h = nn.relu(h)
        h = nn.Dense(128)(h)
        h = nn.relu(h)
        h = nn.Dense(256)(h)
        global_feat = jnp.max(h, axis=1)
        h = nn.Dense(self.emb_dim)(global_feat)
        return nn.relu(h)


class PointCloudDecoder(nn.Module):
    n_points: int = 1024

    @nn.compact
    def __call__(self, emb):          # (B, E)
        h = nn.relu(nn.Dense(512)(emb))
        h = nn.relu(nn.Dense(1024)(h))
        h = nn.Dense(self.n_points * 3)(h)
        return h.reshape(emb.shape[0], self.n_points, 3)


class PointCloudAE(nn.Module):
    emb_dim: int = 512
    n_points: int = 1024

    def setup(self):
        self.encoder = PointCloudEncoder(self.emb_dim)
        self.decoder = PointCloudDecoder(self.n_points)

    def __call__(self, pts):
        emb = self.encoder(pts)
        return emb, self.decoder(emb)

    def decode(self, emb):
        return self.decoder(emb)


def train_shape_prior(model_points: dict[str, np.ndarray],
                      categories: dict[str, int], n_points: int = 1024,
                      emb_dim: int = 512, steps: int = 500,
                      batch_size: int = 16, lr: float = 1e-3, seed: int = 0,
                      log=print):
    """Train the AE over all models; return (variables, mean_points (6,N,3)).

    ``categories`` maps model name -> 0-based category id.  The per-category
    mean shape is the decode of the mean embedding (SPD's
    mean_points_emb.npy semantics).
    """
    names = [n for n in model_points if n in categories]
    clouds = np.stack([
        _resample(model_points[n], n_points) for n in names])
    cats = np.asarray([categories[n] for n in names])

    model = PointCloudAE(emb_dim, n_points)
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, jnp.asarray(clouds[:2]))
    opt = optax.adam(lr)
    opt_state = opt.init(variables)

    @jax.jit
    def step(variables, opt_state, batch):
        def loss_fn(v):
            _, recon = model.apply(v, batch)
            return jnp.mean(chamfer_distances(recon, batch))
        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    np_rng = np.random.default_rng(seed)
    for i in range(steps):
        sel = np_rng.choice(len(clouds), min(batch_size, len(clouds)),
                            replace=False)
        variables, opt_state, loss = step(variables, opt_state,
                                          jnp.asarray(clouds[sel]))
        if i % max(steps // 5, 1) == 0:
            log(f"shape-prior step {i}: chamfer {float(loss):.5f}")

    # per-category mean embedding -> decoded mean shape
    embs, _ = model.apply(variables, jnp.asarray(clouds))
    embs = np.asarray(embs)
    mean_points = np.zeros((6, n_points, 3), np.float32)
    for c in range(6):
        sel = cats == c
        if sel.sum() == 0:
            continue
        mean_emb = jnp.asarray(embs[sel].mean(0, keepdims=True))
        decoded = model.apply(variables, mean_emb,
                              method=PointCloudAE.decode)
        mean_points[c] = np.asarray(decoded)[0]
    return variables, mean_points


def _resample(pts: np.ndarray, n: int) -> np.ndarray:
    if len(pts) == n:
        return pts
    sel = np.random.default_rng(0).choice(len(pts), n,
                                          replace=len(pts) < n)
    return pts[sel]
