"""Ranger optimizer (RAdam + Lookahead + Gradient Centralization) in optax.

Reproduces the update math of the reference's default optimizer
(tools/torch_utils/solver/ranger2020.py, selected at solver_utils.py:49-50):

  * gradient centralization on tensors with ndim > 1 (ranger2020.py:31-40)
  * RAdam variance rectification with N_sma threshold 5 (:192-225)
  * weight decay added to the ADAPTIVE gradient before the lr step (:227-228)
    — i.e. neither classic L2 nor AdamW; matched exactly
  * lookahead: every k=6 steps, slow <- slow + alpha*(fast-slow), fast <-
    slow (:236-244)

Defaults mirror ranger2020.Ranger.__init__: betas (0.95, 0.999), eps 1e-5,
alpha 0.5, k 6.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def centralize_gradients(use_gc: bool = True, gc_conv_only: bool = False):
    """optax transformation applying gradient centralization."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        min_ndim = 3 if gc_conv_only else 1

        def gc(g):
            if use_gc and g.ndim > min_ndim:
                # Reference semantics (ranger2020.py: grad.mean over
                # dims 1.. of a torch (out, in, ...) tensor): per OUTPUT
                # unit, subtract the mean over all INPUT dims.  Flax
                # kernels are out-LAST ((in, out) Dense, (H, W, in, out)
                # Conv), so the input dims are all but the last axis.
                # The torch-axis translation used before r3 subtracted
                # the mean over the *output* axis instead — which zeroes
                # the gradient of any single-output kernel outright
                # (ConvPnPNet's fc_z (featdim, 1) z-head trained on its
                # bias alone; the cause of the r2 overfit-proof
                # translation stall/instability).
                axes = tuple(range(0, g.ndim - 1))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree_util.tree_map(gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class RAdamCoreState(NamedTuple):
    step: jnp.ndarray
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates


def radam_core(b1: float = 0.95, b2: float = 0.999, eps: float = 1e-5,
               threshold: float = 5.0, weight_decay: float = 0.0):
    """RAdam update exactly matching ranger2020.py:184-233.

    Produces the (positive) step ``step_size * G_grad``; the caller scales
    by -lr.
    """

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return RAdamCoreState(step=jnp.zeros([], jnp.int32),
                              exp_avg=zeros,
                              exp_avg_sq=jax.tree_util.tree_map(
                                  jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        step = state.step + 1
        stepf = step.astype(jnp.float32)
        exp_avg = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, updates)
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g,
            state.exp_avg_sq, updates)

        beta2_t = b2 ** stepf
        n_sma_max = 2.0 / (1 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * stepf * beta2_t / (1 - beta2_t)
        rect = jnp.sqrt(
            (1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
            * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2))
        bias1 = 1.0 / (1 - b1 ** stepf)
        use_adaptive = n_sma > threshold
        step_size = jnp.where(use_adaptive, rect * bias1, bias1)

        def one(m, v, p):
            adaptive = m / (jnp.sqrt(v) + eps)
            g = jnp.where(use_adaptive, adaptive, m)
            if weight_decay != 0.0 and p is not None and p.ndim >= 1:
                g = g + weight_decay * p
            return step_size * g

        if params is None:
            new_updates = jax.tree_util.tree_map(
                lambda m, v: one(m, v, None), exp_avg, exp_avg_sq)
        else:
            new_updates = jax.tree_util.tree_map(one, exp_avg, exp_avg_sq,
                                                 params)
        return new_updates, RAdamCoreState(step, exp_avg, exp_avg_sq)

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    inner: tuple
    slow: optax.Params
    step: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, alpha: float = 0.5,
              k: int = 6):
    """Param-level lookahead wrapper (ranger2020.py:236-244).

    The produced updates are deltas applied to the fast weights; every k
    steps the update is adjusted so the applied result equals the
    interpolated slow weights.
    """

    def init_fn(params):
        return LookaheadState(inner=inner.init(params),
                              slow=jax.tree_util.tree_map(jnp.copy, params),
                              step=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        inner_updates, inner_state = inner.update(updates, state.inner,
                                                  params)
        step = state.step + 1
        sync = (step % k) == 0

        def apply_sync(u, p, s):
            fast = p + u                     # fast weights after this step
            new_slow = s + alpha * (fast - s)
            # when syncing, the effective update sets params to new_slow
            return jnp.where(sync, new_slow - p, u), \
                jnp.where(sync, new_slow, s)

        flat_u, tree = jax.tree_util.tree_flatten(inner_updates)
        flat_p = jax.tree_util.tree_leaves(params)
        flat_s = jax.tree_util.tree_leaves(state.slow)
        out_u, out_s = [], []
        for u, p, s in zip(flat_u, flat_p, flat_s):
            nu, ns = apply_sync(u, p, s)
            out_u.append(nu)
            out_s.append(ns)
        return (jax.tree_util.tree_unflatten(tree, out_u),
                LookaheadState(inner=inner_state,
                               slow=jax.tree_util.tree_unflatten(tree, out_s),
                               step=step))

    return optax.GradientTransformation(init_fn, update_fn)


def ranger(learning_rate, weight_decay: float = 0.0, b1: float = 0.95,
           b2: float = 0.999, eps: float = 1e-5, alpha: float = 0.5,
           k: int = 6, use_gc: bool = True) -> optax.GradientTransformation:
    """Full Ranger chain: GC -> RAdam(+wd) -> (-lr schedule) -> lookahead."""
    core = optax.chain(
        centralize_gradients(use_gc=use_gc),
        radam_core(b1=b1, b2=b2, eps=eps, weight_decay=weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
    return lookahead(core, alpha=alpha, k=k)
