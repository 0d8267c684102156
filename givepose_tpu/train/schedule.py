"""Learning-rate schedules (reference tools/torch_utils/solver/
lr_scheduler.py:177-263, flat_and_anneal_lr_scheduler)."""

from __future__ import annotations

import jax.numpy as jnp


def flat_and_anneal(base_lr: float, total_iters: int,
                    warmup_iters: int = 100,
                    warmup_factor: float = 1e-3,
                    warmup_method: str = "linear",
                    anneal_point: float = 0.72,
                    anneal_method: str = "cosine",
                    target_lr_factor: float = 0.0,
                    poly_power: float = 0.9):
    """Returns an optax-style schedule fn step -> lr.

    warmup (linear from warmup_factor) -> flat -> anneal from
    anneal_point * total_iters (cosine by default).
    """
    anneal_start = anneal_point * total_iters

    def schedule(step):
        x = jnp.asarray(step, jnp.float32)
        # warmup factor
        if warmup_method == "linear":
            alpha = x / max(warmup_iters, 1)
            wf = warmup_factor * (1 - alpha) + alpha
        elif warmup_method == "constant":
            wf = jnp.full_like(x, warmup_factor)
        else:
            raise ValueError(warmup_method)

        # anneal factor
        denom = max(total_iters - anneal_start, 1.0)
        progress = (x - anneal_start) / denom
        if anneal_method == "cosine":
            af = target_lr_factor + 0.5 * (1 - target_lr_factor) * (
                1 + jnp.cos(jnp.pi * progress))
        elif anneal_method == "linear":
            af = target_lr_factor + (1 - target_lr_factor) * (1 - progress)
        elif anneal_method == "poly":
            af = (target_lr_factor
                  + (1 - target_lr_factor) * (1 - progress) ** poly_power)
        elif anneal_method == "exp":
            tf = max(target_lr_factor, 5e-3)
            af = tf ** progress
        elif anneal_method == "none":
            af = jnp.ones_like(x)
        else:
            raise ValueError(anneal_method)

        factor = jnp.where(x < warmup_iters, wf,
                           jnp.where(x >= anneal_start, af, 1.0))
        return base_lr * factor

    return schedule
