"""Sharded training step for PoseNet.

Replaces engine/train.py's inner loop (reference :115-154) with a single
jitted function: forward, on-device loss (including symmetry resolution),
grad, global-norm clip at 5.0 (reference :127), Ranger update, all compiled
by XLA over a data-parallel mesh — gradient all-reduce rides ICI, there is
no host sync inside the step.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from givepose_tpu.core.config import Config
from givepose_tpu.losses import PoseLossFn
from givepose_tpu.train.ranger import ranger
from givepose_tpu.train.schedule import flat_and_anneal


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, opt_state):
        return cls(step=jnp.zeros([], jnp.int32),
                   params=variables["params"],
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=opt_state)


def make_optimizer(cfg: Config, steps_per_epoch: int | None = None
                   ) -> optax.GradientTransformation:
    t = cfg.train
    spe = steps_per_epoch or (t.train_size // max(t.batch_size, 1))
    total_iters = t.total_epoch * max(spe, 1)
    schedule = flat_and_anneal(
        t.lr, total_iters, warmup_iters=t.warmup_iters,
        warmup_factor=t.warmup_factor, warmup_method=t.warmup_method,
        anneal_point=t.anneal_point, anneal_method=t.anneal_method)
    if t.optimizer_type.lower() == "ranger":
        opt = ranger(schedule, weight_decay=t.weight_decay)
    elif t.optimizer_type.lower() == "adam":
        opt = optax.adam(schedule)
    elif t.optimizer_type.lower() == "adamw":
        # reference engine/pre_train.py:69-70 option
        opt = optax.adamw(schedule, weight_decay=t.weight_decay)
    # remaining entries of the reference's solver zoo
    # (tools/torch_utils/solver/: adabelief, sgd, radam, lookahead-adam)
    elif t.optimizer_type.lower() == "adabelief":
        opt = optax.adabelief(schedule)
    elif t.optimizer_type.lower() == "sgd":
        opt = optax.sgd(schedule, momentum=0.9)
    elif t.optimizer_type.lower() == "radam":
        opt = optax.radam(schedule)
    elif t.optimizer_type.lower() == "lookahead_adam":
        from givepose_tpu.train.ranger import lookahead
        opt = lookahead(optax.adam(schedule))
    elif t.optimizer_type.lower() in ("adamp", "sgdp", "ralamb", "sgd_gc",
                                      "rmsprop_tf", "ranger_adabelief",
                                      "madgrad", "nadamw", "badam",
                                      "over9000", "ranger21"):
        from givepose_tpu.train import solvers
        make = getattr(solvers, t.optimizer_type.lower())
        if t.optimizer_type.lower() in ("adamp", "sgdp",
                                        "ranger_adabelief", "ralamb",
                                        "madgrad", "nadamw", "badam",
                                        "over9000", "ranger21"):
            opt = make(schedule, weight_decay=t.weight_decay)
        else:
            opt = make(schedule)
    else:
        raise ValueError(t.optimizer_type)
    opt = optax.chain(optax.clip_by_global_norm(t.grad_clip_norm), opt)
    if t.accumulate > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=t.accumulate)
    # Non-finite guard, ON DEVICE: a NaN/Inf gradient step is skipped
    # (zero update, inner state untouched) instead of corrupting the
    # params — the reference's try/except seam (engine/train.py:133-143)
    # can only catch host-visible exceptions, which NaNs never raise.
    # The skip count is surfaced in the step metrics and the train CLI
    # dumps the batch + a checkpoint when it grows.  After 50 consecutive
    # non-finite steps optax gives up and applies the update so the
    # failure becomes visible in the loss curve rather than looping.
    opt = optax.apply_if_finite(opt, max_consecutive_errors=50)
    return opt


def make_train_step(model, cfg: Config,
                    mesh=None) -> Callable:
    """Build the jitted (state, batch, rng) -> (state, metrics) step.

    When ``mesh`` is given, inputs/outputs are constrained so the batch is
    sharded over the 'data' axis and state is replicated.
    """
    loss_fn = PoseLossFn(cfg.loss, r_type=cfg.model.r_type)
    optimizer = make_optimizer(cfg)

    # DropBlock LinearScheduler: rate ramps 0 -> drop_prob over 5000
    # steps (reference conv_pnp_net.py:62-67 nr_steps=5000)
    drop_prob = getattr(cfg.model, "drop_prob", 0.0)

    def step_fn(state: TrainState, batch: dict, rng) -> tuple:
        db_rate = drop_prob * jnp.minimum(
            state.step.astype(jnp.float32) / 5000.0, 1.0)

        def compute_loss(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mutated = model.apply(
                variables, batch, train=True,
                dropblock_rate=db_rate,
                mutable=["batch_stats"], rngs={"dropout": rng})
            losses = loss_fn(out, batch)
            total = sum(losses.values())
            return total, (losses, mutated.get("batch_stats", {}))

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"total_loss": total,
                   "grad_norm": optax.global_norm(grads), **losses}
        if hasattr(new_opt_state, "total_notfinite"):
            metrics["notfinite_total"] = new_opt_state.total_notfinite
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state)
        return new_state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step_fn,
            in_shardings=(repl, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        ), optimizer
    return jax.jit(step_fn, donate_argnums=(0,)), optimizer


def init_train_state(model, cfg: Config, sample_batch: dict,
                     rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.train.seed)
    variables = model.init(rng, sample_batch)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(variables["params"])
    return TrainState.create(variables, opt_state)
