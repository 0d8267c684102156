"""Remaining entries of the reference solver zoo as optax transforms.

The reference ships two near-duplicate solver trees
(tools/torch_utils/solver/ + network/torch_utils/solver/, SURVEY.md §2.5)
of which only Ranger is used by the training config.  The zoo is still
public surface (selectable via ``optimizer_type``), so the remaining
members are provided here as composable optax gradient transformations:

  * AdamP / SGDP (tools/torch_utils/solver/adamp.py, sgdp.py): Adam/SGD
    whose update is projected onto the tangent space of scale-invariant
    weights when grad ~ orthogonal to the weight (NAVER AdamP, public
    algorithm);
  * RaLamb (ralamb.py): RAdam with a LARS-style layer trust ratio;
  * SGD_GC (sgd_gc.py): SGD + gradient centralization;
  * rmsprop_tf (rmsprop_tf.py): TF-flavored RMSprop (eps inside sqrt);
  * RangerAdaBelief (ranger_adabelief.py): AdaBelief + gradient
    centralization + Lookahead;
  * MADGRAD (madgrad.py): momentumized dual-averaged adaptive method;
  * NAdamW (nadamw.py): Nesterov-momentum AdamW;
  * BAdam (badam.py): bias-correction-free AdamW with warm second-moment
    init;
  * Over9000 / RangerLars (over9000.py): RaLamb + Lookahead;
  * Ranger21 (ranger21.py): AGC + GC + grad normalization + PNM-AdamW
    with softplus denom, stable weight decay, norm loss, Lookahead.

All are jit-compatible: data-dependent branches (AdamP's projection
trigger, RAdam's rectification threshold) are expressed as arithmetic
selects rather than Python control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from givepose_tpu.train.ranger import centralize_gradients, lookahead


def _channel_cos(a, b, eps):
    """Row-wise |cosine| over the channel view (C, -1)."""
    x = a.reshape(a.shape[0], -1)
    y = b.reshape(b.shape[0], -1)
    num = jnp.abs(jnp.sum(x * y, axis=1))
    den = jnp.maximum(jnp.linalg.norm(x, axis=1)
                      * jnp.linalg.norm(y, axis=1), eps)
    return num / den


def _project_scale_invariant(p, g, perturb, delta, wd_ratio, eps):
    """AdamP projection (adamp.py:34-48): if grad is ~orthogonal to the
    weight in the channel or layer view, remove the radial component of
    the update and shrink weight decay by ``wd_ratio``.

    Returns (perturb', wd) with the branch as an arithmetic select."""
    if p.ndim <= 1:
        return perturb, jnp.float32(1.0)

    def proj(view_rows):
        pn_rows = p.reshape(view_rows, -1)
        norms = jnp.linalg.norm(pn_rows, axis=1, keepdims=True) + eps
        pn = (pn_rows / norms).reshape(p.shape)
        rad = jnp.sum((pn * perturb).reshape(view_rows, -1), axis=1)
        rad = rad.reshape((view_rows,) + (1,) * (p.ndim - 1))
        return perturb - pn * rad

    c = p.shape[0]
    cos_ch = jnp.max(_channel_cos(g, p, eps))
    cos_ly = jnp.max(_channel_cos(g.reshape(1, -1), p.reshape(1, -1), eps))
    thr_ch = delta / jnp.sqrt(jnp.float32(p.reshape(c, -1).shape[1]))
    thr_ly = delta / jnp.sqrt(jnp.float32(p.size))

    use_ch = cos_ch < thr_ch
    use_ly = jnp.logical_and(jnp.logical_not(use_ch), cos_ly < thr_ly)
    out = jnp.where(use_ch, proj(c),
                    jnp.where(use_ly, proj(1), perturb))
    wd = jnp.where(jnp.logical_or(use_ch, use_ly),
                   jnp.float32(wd_ratio), jnp.float32(1.0))
    return out, wd


class AdamPState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def adamp(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
          delta=0.1, wd_ratio=0.1,
          nesterov=False) -> optax.GradientTransformation:
    """AdamP (reference tools/torch_utils/solver/adamp.py:13-106)."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamPState(jnp.zeros([], jnp.int32), z,
                          jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count + 1
        lr = (learning_rate(count) if callable(learning_rate)
              else learning_rate)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

        def leaf(p, g, m, v):
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            step_size = lr / bc1
            if nesterov:
                perturb = (b1 * m + (1 - b1) * g) / denom
            else:
                perturb = m / denom
            perturb, wd = _project_scale_invariant(
                p, g, perturb, delta, wd_ratio, eps)
            upd = -step_size * perturb
            if weight_decay > 0:
                upd = upd - lr * weight_decay * wd * p
            return upd

        updates = jax.tree_util.tree_map(leaf, params, grads, mu, nu)
        return updates, AdamPState(count, mu, nu)

    return optax.GradientTransformation(init, update)


class SGDPState(NamedTuple):
    count: jnp.ndarray
    momentum: optax.Updates


def sgdp(learning_rate, momentum=0.9, dampening=0.0, eps=1e-8,
         weight_decay=0.0, delta=0.1, wd_ratio=0.1,
         nesterov=False) -> optax.GradientTransformation:
    """SGDP (reference tools/torch_utils/solver/sgdp.py, same projection
    as AdamP on an SGD-momentum update)."""

    def init(params):
        return SGDPState(jnp.zeros([], jnp.int32),
                         jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count + 1
        lr = (learning_rate(count) if callable(learning_rate)
              else learning_rate)
        buf = jax.tree_util.tree_map(
            lambda b, g: momentum * b + (1 - dampening) * g,
            state.momentum, grads)

        def leaf(p, g, b):
            d_p = momentum * b + g if nesterov else b
            d_p, wd = _project_scale_invariant(
                p, g, d_p, delta, wd_ratio, eps)
            upd = -lr * d_p
            if weight_decay > 0:
                upd = upd - lr * weight_decay * wd * p
            return upd

        updates = jax.tree_util.tree_map(leaf, params, grads, buf)
        return updates, SGDPState(count, buf)

    return optax.GradientTransformation(init, update)


def ralamb(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
           weight_decay=0.0) -> optax.GradientTransformation:
    """RaLamb (reference ralamb.py): RAdam step scaled per-layer by the
    trust ratio clamp(||p||, 0, 10) / ||p + update|| (ralamb.py:85-97 —
    the denominator is the norm of the TENTATIVE updated weights, not of
    the step, so the ratio hovers near 1 and damps weight-norm growth)."""
    base = optax.radam(learning_rate=learning_rate, b1=b1, b2=b2, eps=eps)

    def init(params):
        return base.init(params)

    def update(grads, state, params):
        if weight_decay > 0:
            grads = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, grads, params)
        updates, state = base.update(grads, state, params)

        def trust(u, p):
            if p.ndim == 0:
                return u
            w_norm = jnp.clip(jnp.linalg.norm(p), 0.0, 10.0)
            new_norm = jnp.linalg.norm(p + u)
            ratio = jnp.where((w_norm > 0) & (new_norm > 0),
                              w_norm / new_norm, 1.0)
            return u * ratio

        return jax.tree_util.tree_map(trust, updates, params), state

    return optax.GradientTransformation(init, update)


def sgd_gc(learning_rate, momentum=0.9,
           weight_decay=0.0) -> optax.GradientTransformation:
    """SGD with gradient centralization (reference sgd_gc.py)."""
    return optax.chain(
        centralize_gradients(),
        optax.sgd(learning_rate, momentum=momentum) if weight_decay == 0
        else optax.chain(optax.add_decayed_weights(weight_decay),
                         optax.sgd(learning_rate, momentum=momentum)))


def rmsprop_tf(learning_rate, decay=0.9, momentum=0.9,
               eps=1e-10) -> optax.GradientTransformation:
    """TF-flavored RMSprop (reference rmsprop_tf.py): epsilon inside the
    sqrt, accumulator init handled by optax's initial_scale."""
    return optax.rmsprop(learning_rate, decay=decay, momentum=momentum,
                         eps=eps, initial_scale=1.0, eps_in_sqrt=True)


def ranger_adabelief(learning_rate, b1=0.9, b2=0.999, eps=1e-16,
                     weight_decay=0.0, sync_period=6,
                     slow_step=0.5) -> optax.GradientTransformation:
    """RangerAdaBelief (reference ranger_adabelief.py): AdaBelief +
    gradient centralization + Lookahead slow weights."""
    stages = [centralize_gradients()]
    if weight_decay > 0:
        stages.append(optax.add_decayed_weights(weight_decay))
    stages.append(optax.adabelief(learning_rate, b1=b1, b2=b2, eps=eps))
    return lookahead(optax.chain(*stages), alpha=slow_step, k=sync_period)


class MadgradState(NamedTuple):
    count: jnp.ndarray
    grad_sum_sq: optax.Updates
    s: optax.Updates
    x0: optax.Updates


def madgrad(learning_rate, momentum=0.9, weight_decay=0.0,
            eps=1e-6) -> optax.GradientTransformation:
    """MADGRAD (reference madgrad.py:72-175, dense momentum branch):
    dual-averaged cube-root-RMS step, params kept as a moving average of
    the dual iterate z toward the initial point x0."""
    assert momentum != 0.0, "momentum=0 branch not used by the reference"
    ck = 1.0 - momentum

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return MadgradState(
            jnp.zeros([], jnp.int32), z,
            jax.tree_util.tree_map(jnp.zeros_like, params),
            jax.tree_util.tree_map(lambda p: p.astype(jnp.float32),
                                   params))

    def update(grads, state, params):
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate) + eps
        lamb = lr * jnp.sqrt(state.count.astype(jnp.float32) + 1.0)
        if weight_decay > 0:
            grads = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, grads, params)
        gss = jax.tree_util.tree_map(
            lambda a, g: a + lamb * g * g, state.grad_sum_sq, grads)
        s = jax.tree_util.tree_map(
            lambda a, g: a + lamb * g, state.s, grads)

        def leaf(p, x0, a, sv):
            rms = jnp.cbrt(a) + eps
            z = x0 - sv / rms
            # p_new = (1-ck) p + ck z  ->  update = ck (z - p)
            return ck * (z - p)

        updates = jax.tree_util.tree_map(leaf, params, state.x0, gss, s)
        return updates, MadgradState(state.count + 1, gss, s, state.x0)

    return optax.GradientTransformation(init, update)


class NAdamWState(NamedTuple):
    count: jnp.ndarray
    mu_product: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def nadamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2,
           momentum_decay=4e-3) -> optax.GradientTransformation:
    """NAdamW (reference nadamw.py:59-132): Nesterov-momentum Adam with
    decoupled weight decay.  Mirrors the reference's mu_product_next
    bookkeeping verbatim (mu_product * mu^2 * mu_next at :115-116,
    including the double-count of the current mu)."""

    def init(params):
        return NAdamWState(
            jnp.zeros([], jnp.int32), jnp.ones([], jnp.float32),
            jax.tree_util.tree_map(jnp.zeros_like, params),
            jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        step = (state.count + 1).astype(jnp.float32)
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        bc2 = 1.0 - b2 ** step
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (step * momentum_decay))
        mu_next = b1 * (1.0 - 0.5 * 0.96 ** ((step + 1) * momentum_decay))
        mu_product = state.mu_product * mu_t
        mu_product_next = mu_product * mu_t * mu_next

        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

        def leaf(p, g, m, v):
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            upd = (-lr * (1.0 - mu_t) / (1.0 - mu_product) * g / denom
                   - lr * mu_next / (1.0 - mu_product_next) * m / denom)
            # decoupled decay applied to p BEFORE the step (:77)
            return upd - lr * weight_decay * p

        updates = jax.tree_util.tree_map(leaf, params, grads, mu, nu)
        return updates, NAdamWState(state.count + 1, mu_product, mu, nu)

    return optax.GradientTransformation(init, update)


class BAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def badam(learning_rate, b1=0.9, b2=0.999, eps=1e-6, weight_decay=1e-2,
          avg_sq_init=1e-3) -> optax.GradientTransformation:
    """BAdam (reference badam.py:35-111): AdamW without bias correction,
    eps inside the sqrt, and exp_avg_sq initialised to avg_sq_init (the
    warmup-free trick the file documents)."""

    def init(params):
        return BAdamState(
            jnp.zeros([], jnp.int32),
            jax.tree_util.tree_map(jnp.zeros_like, params),
            jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, avg_sq_init), params))

    def update(grads, state, params):
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        updates = jax.tree_util.tree_map(
            lambda p, m, v: -lr * m / jnp.sqrt(v + eps)
            - lr * weight_decay * p, params, mu, nu)
        return updates, BAdamState(state.count + 1, mu, nu)

    return optax.GradientTransformation(init, update)


def over9000(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
             alpha=0.5, k=6) -> optax.GradientTransformation:
    """Over9000 / RangerLars (reference over9000.py:18-22): RaLamb wrapped
    in Lookahead slow weights."""
    return lookahead(ralamb(learning_rate, b1=b1, b2=b2, eps=eps,
                            weight_decay=weight_decay), alpha=alpha, k=k)


def _unit_norm(x, keepdims=True):
    """Per-output-unit L2 norm (ranger21.py:251-269 unit_norm).  The
    reference reduces torch dims 1.. of (out, in, ...) tensors; flax
    kernels are out-last, so reduce all axes but the last (scalars/vectors
    reduce fully)."""
    if x.ndim <= 1:
        return jnp.sqrt(jnp.sum(x * x))
    axes = tuple(range(x.ndim - 1))
    return jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=keepdims))


class Ranger21State(NamedTuple):
    count: jnp.ndarray
    grad_ma: optax.Updates       # positive-step EMA buffer
    neg_grad_ma: optax.Updates   # negative-step EMA buffer
    variance_ma: optax.Updates


def ranger21(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-4,
             agc_clip=1e-2, agc_eps=1e-3, normloss_factor=1e-4,
             beta_softplus=50.0, lookahead_alpha=0.5,
             lookahead_k=5) -> optax.GradientTransformation:
    """Ranger21 (reference network/torch_utils/solver/ranger21.py, the
    vendored copy: warmup/warmdown stripped, AdamW core, defaults on):
    AGC -> gradient centralization -> gradient std-normalization feed a
    positive-negative-momentum AdamW step with softplus'd denom, stable
    weight decay (scaled by the cross-parameter RMS of the debiased
    second moment) and norm loss, wrapped in Lookahead(alpha=.5, k=5).

    Deliberate divergence: the reference's phase-2 loop applies stable
    decay and norm loss OUTSIDE its inner parameter loop, so a Python
    loop-variable leak decays only the *last* parameter of each group
    (ranger21.py:468-478).  We apply both to every parameter — the
    documented intent of the cited papers.  The optimizer is dead code in
    the reference (solver_utils.py:15-42 never registers it).
    """
    noise_norm = float(jnp.sqrt((1 + b2) ** 2 + b2 ** 2))

    def transform(g, p):
        """AGC clip then GC then std-normalize (ranger21.py:325-371)."""
        gn = _unit_norm(g)
        pn = jnp.maximum(_unit_norm(p), agc_eps)
        clipped = g * (pn * agc_clip / jnp.maximum(gn, 1e-6))
        g = jnp.where(gn > pn * agc_clip, clipped, g)
        if g.ndim > 1:
            g = g - jnp.mean(g, axis=tuple(range(g.ndim - 1)),
                             keepdims=True)
        if g.size > 2:
            g = g / (jnp.std(g) + 1e-8)
        return g

    def init(params):
        z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return Ranger21State(jnp.zeros([], jnp.int32), z(), z(), z())

    def update(grads, state, params):
        assert params is not None, "ranger21 requires params"
        count = state.count + 1
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        g = jax.tree_util.tree_map(transform, grads, params)

        v = jax.tree_util.tree_map(
            lambda a, gg: b2 * a + (1 - b2) * gg * gg, state.variance_ma, g)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        # stable weight decay: sqrt of the mean debiased variance over
        # ALL parameters (ranger21.py:312-430 phase 1 + variance_normalized)
        leaves = jax.tree_util.tree_leaves(v)
        var_sum = sum(jnp.sum(l) for l in leaves) / bc2
        n_el = sum(l.size for l in leaves)
        var_norm = jnp.maximum(jnp.sqrt(var_sum / n_el), 1e-12)

        # PNM: buffers alternate by step parity; each is EMA'd with b1^2
        # since it only sees every other gradient (ranger21.py:585-597)
        odd = (count % 2) == 1

        def ema(buf, gg):
            return b1 * b1 * buf + (1 - b1 * b1) * gg

        pos = jax.tree_util.tree_map(
            lambda m, n, gg: jnp.where(odd, ema(m, gg), m),
            state.grad_ma, state.neg_grad_ma, g)
        neg = jax.tree_util.tree_map(
            lambda m, n, gg: jnp.where(odd, n, ema(n, gg)),
            state.grad_ma, state.neg_grad_ma, g)

        bc1 = 1 - b1 ** count.astype(jnp.float32)
        step_size = lr / bc1

        def leaf(p, pm, nm, vv):
            cur, other = jnp.where(odd, pm, nm), jnp.where(odd, nm, pm)
            denom = jnp.sqrt(vv) / jnp.sqrt(bc2) + eps
            denom = jax.nn.softplus(denom * beta_softplus) / beta_softplus
            pnm = (2.0 * cur - other) / noise_norm
            decay_mul = 1.0 - weight_decay * lr / var_norm
            un = _unit_norm(p)
            nl_mul = 1.0 - lr * 2 * normloss_factor * (1 - 1 / (un + eps))
            newp = p * decay_mul * nl_mul - step_size * pnm / denom
            return newp - p

        upd = jax.tree_util.tree_map(leaf, params, pos, neg, v)
        return upd, Ranger21State(count, pos, neg, v)

    return lookahead(optax.GradientTransformation(init, update),
                     alpha=lookahead_alpha, k=lookahead_k)
