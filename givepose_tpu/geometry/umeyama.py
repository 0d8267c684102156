"""Similarity-transform estimation (Umeyama) + RANSAC, TPU-batched.

Reference: ``tools/align_utils.py`` — estimateSimilarityUmeyama (:10-41) is a
sequential numpy SVD fit; estimateSimilarityTransform (:44-104) draws up to
128 sequential 5-point hypotheses with an early break.  Here:

  * ``umeyama_similarity`` is weighted and batched: an inlier mask enters as
    per-point weights, so refitting on an arbitrary inlier subset keeps
    static shapes (required under jit).
  * ``ransac_umeyama`` evaluates ALL 128 hypotheses in parallel with vmap
    (the sequential early-break is a latency optimization for CPUs; on TPU
    the batched evaluation is one fused kernel), then refits on the best
    hypothesis' inliers via the weighted fit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def umeyama_similarity(source: jnp.ndarray, target: jnp.ndarray,
                       weights: jnp.ndarray | None = None,
                       eps: float = 1e-12):
    """Weighted similarity fit target ~ s * R @ source + t.

    Args:
      source: (..., N, 3)
      target: (..., N, 3)
      weights: (..., N) nonnegative; None = uniform.

    Returns:
      (scale (...,), rotation (...,3,3), translation (...,3))

    Matches reference align_utils.py:10-41 including its scale convention
    Scale = sum(D)/var(source) with the det-sign fix on the last singular
    value.
    """
    if weights is None:
        weights = jnp.ones(source.shape[:-1], source.dtype)
    w = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), eps)
    mu_s = jnp.sum(source * w[..., None], axis=-2, keepdims=True)
    mu_t = jnp.sum(target * w[..., None], axis=-2, keepdims=True)
    cs = source - mu_s
    ct = target - mu_t
    # covariance of (target, source): (...,3,3) — reference builds
    # CovMatrix = centered_target @ centered_source^T / n
    cov = jnp.einsum("...ni,...nj,...n->...ij", ct, cs, w,
                     precision="highest")
    U, D, Vh = jnp.linalg.svd(cov, full_matrices=True)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vh)
    sign = jnp.where(det < 0, -1.0, 1.0)
    D = D.at[..., -1].multiply(sign)
    U = U.at[..., :, -1].multiply(sign[..., None])
    rotation = jnp.matmul(U, Vh, precision="highest")
    var_s = jnp.sum(jnp.sum(cs * cs, axis=-1) * w, axis=-1)
    scale = jnp.sum(D, axis=-1) / jnp.maximum(var_s, eps)
    translation = (mu_t[..., 0, :]
                   - scale[..., None] * jnp.einsum("...ij,...j->...i",
                                                   rotation, mu_s[..., 0, :],
                                                   precision="highest"))
    return scale, rotation, translation


def ransac_umeyama(source: jnp.ndarray, target: jnp.ndarray,
                   valid: jnp.ndarray | None = None,
                   key: jax.Array | None = None,
                   num_hypotheses: int = 128,
                   sample_size: int = 5):
    """RANSAC similarity fit with static shapes.

    Args:
      source: (N,3) NOCS-space points.
      target: (N,3) camera-space points.
      valid: optional (N,) mask of usable correspondences.
      key: PRNG key for hypothesis sampling.

    Returns:
      dict(scale, rotation, translation, inlier_ratio)

    Semantics track reference align_utils.py:44-104: inlier threshold =
    source diameter / 10 propagated by the hypothesis scale; best hypothesis
    by inlier ratio; final fit on the best inlier set.
    """
    n = source.shape[0]
    if valid is None:
        valid = jnp.ones((n,), source.dtype)
    valid = valid.astype(source.dtype)
    if key is None:
        key = jax.random.PRNGKey(0)

    wsum = jnp.maximum(jnp.sum(valid), 1e-6)
    centroid = jnp.sum(source * valid[:, None], axis=0) / wsum
    radii = jnp.linalg.norm((source - centroid) * valid[:, None], axis=-1)
    diameter = 2.0 * jnp.max(radii)
    inlier_t = diameter / 10.0

    # draw hypotheses only among valid points: sample by perturbed-uniform
    # over the valid set (gumbel-top-k on the validity logits)
    logits = jnp.where(valid > 0, 0.0, -1e9)
    keys = jax.random.split(key, num_hypotheses)

    def one_hypothesis(k):
        g = jax.random.gumbel(k, (n,)) + logits
        idx = jax.lax.top_k(g, sample_size)[1]
        s, R, t = umeyama_similarity(source[idx], target[idx])
        resid = jnp.linalg.norm(
            target - (s * jnp.matmul(source, R.T, precision="highest") + t),
            axis=-1)
        inliers = (resid < s * inlier_t).astype(source.dtype) * valid
        ratio = jnp.sum(inliers) / wsum
        return ratio, inliers

    ratios, inlier_masks = jax.vmap(one_hypothesis)(keys)
    best = jnp.argmax(ratios)
    best_inliers = inlier_masks[best]
    # guard: if the best hypothesis found no inliers fall back to all valid
    use_all = jnp.sum(best_inliers) < sample_size
    fit_w = jnp.where(use_all, valid, best_inliers)
    scale, rotation, translation = umeyama_similarity(source, target, fit_w)
    return {
        "scale": scale,
        "rotation": rotation,
        "translation": translation,
        "inlier_ratio": ratios[best],
    }


def backproject_depth(depth: jnp.ndarray, intrinsics: jnp.ndarray,
                      mask: jnp.ndarray):
    """Back-project a depth map to camera-space points (static shapes).

    Reference align_utils.py:107-125 gathers variable-length index lists;
    here every pixel is projected and an fmask marks usable points so the
    output shape stays (H*W, 3) for jit.

    Returns (points (H*W,3), valid (H*W,)).
    """
    h, w = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    ys = jnp.arange(h, dtype=depth.dtype)[:, None]
    xs = jnp.arange(w, dtype=depth.dtype)[None, :]
    z = depth
    x = (xs - cx) * z / fx
    y = (ys - cy) * z / fy
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = ((depth > 0) & (mask > 0)).reshape(-1).astype(depth.dtype)
    return pts, valid
