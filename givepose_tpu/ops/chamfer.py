"""Chamfer / nearest-neighbor distance on TPU.

The reference ships the same CUDA kernel three times (losses/nn_distance/
src/nn_distance_cuda.cu:13-72, a byte-identical copy under prepare_data/lib,
and tools/pyTorchChamferDistance): a tiled shared-memory brute force.  On
TPU the natural formulation is one MXU matmul: ||a-b||^2 = |a|^2 + |b|^2
- 2 a.b, followed by row/column minima — XLA fuses the reduction with the
matmul epilogue, so no custom kernel is needed at the reference's point
counts (<= 2048).  A masked variant supports padded/ragged point sets.
"""

from __future__ import annotations

import jax.numpy as jnp


def _pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) x (..., M, 3) -> (..., N, M) squared distances."""
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    # highest precision: the |a|^2+|b|^2-2ab form cancels, and the TPU
    # default matmul is bf16 — the rounding error would exceed true
    # nearest-neighbor distances on meter-scale point sets
    ab = jnp.einsum("...nd,...md->...nm", a, b, precision="highest")
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


def nn_distance(a: jnp.ndarray, b: jnp.ndarray,
                a_mask: jnp.ndarray | None = None,
                b_mask: jnp.ndarray | None = None):
    """Bidirectional nearest-neighbor squared distances + indices.

    Matches the contract of the reference ``NnDistanceFunction``
    (losses/nn_distance/chamfer_loss.py): returns (dist_a, idx_a, dist_b,
    idx_b) where dist_a[i] = min_j ||a_i - b_j||^2.

    Masks (1=valid) exclude padded points: invalid b points are never
    selected as neighbors; distances at invalid a points are zeroed.
    """
    d2 = _pairwise_sqdist(a, b)
    big = jnp.asarray(1e30, d2.dtype)
    if b_mask is not None:
        d2 = jnp.where(b_mask[..., None, :] > 0, d2, big)
    if a_mask is not None:
        d2_for_b = jnp.where(a_mask[..., :, None] > 0, d2, big)
    else:
        d2_for_b = d2
    dist_a = jnp.min(d2, axis=-1)
    idx_a = jnp.argmin(d2, axis=-1)
    dist_b = jnp.min(d2_for_b, axis=-2)
    idx_b = jnp.argmin(d2_for_b, axis=-2)
    if a_mask is not None:
        dist_a = dist_a * a_mask
    if b_mask is not None:
        dist_b = dist_b * b_mask
    return dist_a, idx_a, dist_b, idx_b


def chamfer_distances(a: jnp.ndarray, b: jnp.ndarray,
                      a_mask: jnp.ndarray | None = None,
                      b_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Symmetric chamfer loss: mean_i min_j d2 + mean_j min_i d2.

    Matches reference ChamferLoss (losses/nn_distance/chamfer_loss.py:96).
    """
    dist_a, _, dist_b, _ = nn_distance(a, b, a_mask, b_mask)
    if a_mask is not None:
        na = jnp.maximum(jnp.sum(a_mask, axis=-1), 1.0)
        term_a = jnp.sum(dist_a, axis=-1) / na
    else:
        term_a = jnp.mean(dist_a, axis=-1)
    if b_mask is not None:
        nb = jnp.maximum(jnp.sum(b_mask, axis=-1), 1.0)
        term_b = jnp.sum(dist_b, axis=-1) / nb
    else:
        term_b = jnp.mean(dist_b, axis=-1)
    return term_a + term_b
