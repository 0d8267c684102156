"""Training engine tests: Ranger math, schedule, sharded train step."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from givepose_tpu.core.config import Config, ModelConfig, TrainConfig
from givepose_tpu.core.mesh import make_mesh, shard_batch
from givepose_tpu.models import PoseNet
from givepose_tpu.train import (
    flat_and_anneal,
    init_train_state,
    make_train_step,
    ranger,
)
from givepose_tpu.train.ranger import radam_core, centralize_gradients


def numpy_ranger_reference(params, grads_seq, lr=0.01, b1=0.95, b2=0.999,
                           eps=1e-5, wd=0.0, alpha=0.5, k=6, threshold=5):
    """Independent numpy implementation of published Ranger (RAdam +
    lookahead + GC) from the algorithm definitions."""
    p = {n: v.copy() for n, v in params.items()}
    slow = {n: v.copy() for n, v in params.items()}
    m = {n: np.zeros_like(v) for n, v in params.items()}
    v2 = {n: np.zeros_like(v) for n, v in params.items()}
    for t, grads in enumerate(grads_seq, start=1):
        for n in p:
            g = grads[n].astype(np.float64)
            if g.ndim > 1:
                # GC: per output unit (last axis in jax layouts), mean
                # over input dims — reference ranger2020.py does
                # mean(dim=1..) on torch (out, in) tensors
                g = g - g.mean(axis=tuple(range(0, g.ndim - 1)),
                               keepdims=True)
            m[n] = b1 * m[n] + (1 - b1) * g
            v2[n] = b2 * v2[n] + (1 - b2) * g * g
            beta2_t = b2 ** t
            n_sma_max = 2 / (1 - b2) - 1
            n_sma = n_sma_max - 2 * t * beta2_t / (1 - beta2_t)
            if n_sma > threshold:
                step_size = np.sqrt(
                    (1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                    * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2)
                ) / (1 - b1 ** t)
                gg = m[n] / (np.sqrt(v2[n]) + eps)
            else:
                step_size = 1.0 / (1 - b1 ** t)
                gg = m[n]
            if wd != 0:
                gg = gg + wd * p[n]
            p[n] = p[n] - step_size * lr * gg
        if t % k == 0:
            for n in p:
                slow[n] = slow[n] + alpha * (p[n] - slow[n])
                p[n] = slow[n].copy()
    return p


class TestRanger:
    def test_matches_numpy_reference(self, rng):
        params = {"w": rng.normal(size=(4, 3)).astype(np.float64),
                  "b": rng.normal(size=(3,)).astype(np.float64)}
        grads_seq = [
            {"w": rng.normal(size=(4, 3)).astype(np.float64),
             "b": rng.normal(size=(3,)).astype(np.float64)}
            for _ in range(13)]

        expected = numpy_ranger_reference(params, grads_seq, lr=0.01,
                                          wd=0.01)

        opt = ranger(0.01, weight_decay=0.01)
        p = {k: jnp.asarray(v) for k, v in params.items()}
        state = opt.init(p)
        for grads in grads_seq:
            g = {k: jnp.asarray(v) for k, v in grads.items()}
            updates, state = opt.update(g, state, p)
            p = optax.apply_updates(p, updates)

        for n in params:
            np.testing.assert_allclose(np.asarray(p[n]), expected[n],
                                       rtol=1e-4, atol=1e-6)

    def test_gc_zero_means_per_output(self, rng):
        gc = centralize_gradients()
        g = {"w": jnp.asarray(rng.normal(size=(4, 5)), jnp.float32),
             "b": jnp.asarray(rng.normal(size=(5,)), jnp.float32)}
        out, _ = gc.update(g, gc.init(g))
        # per output unit (last axis), the mean over input dims is zero
        np.testing.assert_allclose(
            np.asarray(out["w"]).mean(axis=0), 0.0, atol=1e-6)
        # 1-d params untouched
        np.testing.assert_allclose(np.asarray(out["b"]),
                                   np.asarray(g["b"]))

    def test_gc_preserves_single_output_kernel_gradient(self, rng):
        """Regression for the r2 translation stall: a (in, 1) Dense
        kernel (ConvPnPNet fc_z) must NOT have its gradient zeroed by
        centralization."""
        gc = centralize_gradients()
        g = {"w": jnp.asarray(rng.normal(size=(256, 1)), jnp.float32)}
        out, _ = gc.update(g, gc.init(g))
        assert float(jnp.max(jnp.abs(out["w"]))) > 0.1
        np.testing.assert_allclose(np.asarray(out["w"]).mean(axis=0),
                                   0.0, atol=1e-6)

    def test_radam_early_steps_non_adaptive(self, rng):
        """For b2=0.999, N_sma <= 5 until step 5 — updates must be plain
        bias-corrected momentum."""
        core = radam_core()
        p = {"w": jnp.zeros((3,))}
        state = core.init(p)
        g = {"w": jnp.asarray([1.0, 2.0, 3.0])}
        updates, state = core.update(g, state, p)
        # step 1: m = 0.05*g, step_size = 1/(1-0.95) = 20 -> update == g
        np.testing.assert_allclose(np.asarray(updates["w"]),
                                   np.asarray(g["w"]), rtol=1e-5)


class TestSolverZoo:
    """The remaining reference solver-zoo members (train/solvers.py)."""

    NAMES = ("adamp", "sgdp", "ralamb", "sgd_gc", "rmsprop_tf",
             "ranger_adabelief", "madgrad", "nadamw", "badam", "over9000",
             "ranger21")

    @pytest.mark.parametrize("name", NAMES)
    def test_converges_on_quadratic(self, name, rng):
        from givepose_tpu.train import solvers

        opt = getattr(solvers, name)(0.05)
        target = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        # Nonzero init: LARS-style solvers (ralamb) scale steps by the
        # CURRENT weight norm, so from exactly-zero params they crawl —
        # matching the reference ralamb.py trust ratio, not a bug.
        p = {"w": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)}
        state = opt.init(p)

        def loss(params):
            return jnp.sum((params["w"] - target) ** 2)

        l0 = float(loss(p))
        for _ in range(60):
            g = jax.grad(loss)(p)
            updates, state = opt.update(g, state, p)
            p = optax.apply_updates(p, updates)
        # over9000 = Lookahead(RaLamb): the k=6 slow-weight pullbacks plus
        # the near-1 trust ratio make it deliberately sluggish on a
        # 60-step quadratic (the reference composition behaves the same).
        # ranger21 is likewise inherently slow here: PNM divides the
        # debiased step by noise_norm = sqrt((1+b2)^2+b2^2) ~ 2.24 while
        # (2*cur - other) ~ |g| on a smooth quadratic (~0.45x steps), and
        # Lookahead(k=5, alpha=.5) halves the net rate again — ~55% loss
        # reduction in 60 steps is its correct behavior, not a bug.
        bar = 0.75 if name in ("over9000", "ranger21") else 0.2
        assert float(loss(p)) < bar * l0, (name, float(loss(p)), l0)

    @pytest.mark.parametrize("name", NAMES)
    def test_selectable_from_config(self, name):
        from givepose_tpu.train.step import make_optimizer

        cfg = Config()
        object.__setattr__(cfg.train, "optimizer_type", name)
        opt = make_optimizer(cfg, steps_per_epoch=10)
        p = {"w": jnp.ones((3, 2))}
        state = opt.init(p)
        updates, _ = opt.update({"w": jnp.ones((3, 2))}, state, p)
        assert updates["w"].shape == (3, 2)

    def test_adamp_matches_reference_torch(self, rng):
        """Differential: our optax AdamP vs the GENUINE reference
        tools/torch_utils/solver/adamp.py on identical grads."""
        import importlib.util

        import torch

        spec = importlib.util.spec_from_file_location(
            "ref_adamp",
            "/root/reference/tools/torch_utils/solver/adamp.py")
        ref_adamp = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_adamp)

        from givepose_tpu.train.solvers import adamp

        w0 = rng.normal(size=(4, 6)).astype(np.float32)
        grads_seq = [rng.normal(size=(4, 6)).astype(np.float32)
                     for _ in range(8)]
        # also exercise the projection branch: a grad ~orthogonal to p
        grads_seq.append(np.zeros((4, 6), np.float32))

        pt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        topt = ref_adamp.AdamP([pt], lr=0.01, weight_decay=0.01)
        for g in grads_seq:
            pt.grad = torch.from_numpy(g.copy())
            topt.step()

        opt = adamp(0.01, weight_decay=0.01)
        p = {"w": jnp.asarray(w0)}
        state = opt.init(p)
        for g in grads_seq:
            updates, state = opt.update({"w": jnp.asarray(g)}, state, p)
            p = optax.apply_updates(p, updates)

        np.testing.assert_allclose(np.asarray(p["w"]),
                                   pt.detach().numpy(), rtol=1e-4,
                                   atol=1e-5)


class TestSchedule:
    def test_flat_and_anneal_phases(self):
        sched = flat_and_anneal(1e-3, total_iters=1000, warmup_iters=100,
                                warmup_factor=1e-3, anneal_point=0.72)
        # warmup start
        np.testing.assert_allclose(float(sched(0)), 1e-6, rtol=1e-3)
        # mid-warmup: factor = 1e-3*(1-0.5)+0.5
        np.testing.assert_allclose(float(sched(50)), 1e-3 * 0.5005,
                                   rtol=1e-4)
        # flat region
        np.testing.assert_allclose(float(sched(500)), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(float(sched(719)), 1e-3, rtol=1e-6)
        # anneal midpoint: cos(pi*(860-720)/280) -> 0.5 factor
        np.testing.assert_allclose(float(sched(860)), 1e-3 * 0.5, rtol=1e-2)
        # end ~ 0
        assert float(sched(1000)) < 1e-6


def tiny_train_batch(rng, b=8, out_res=16, img=64):
    K = np.tile(np.array([[577.5, 0, 319.5], [0, 577.5, 239.5],
                          [0, 0, 1]], np.float32), (b, 1, 1))
    from scipy.spatial.transform import Rotation as ScipyRot
    rots = ScipyRot.random(b, random_state=np.random.RandomState(1)
                           ).as_matrix().astype(np.float32)
    return {
        "roi_img": jnp.asarray(rng.normal(size=(b, img, img, 3)),
                               jnp.float32),
        "roi_coord_2d": jnp.asarray(
            rng.uniform(-1, 1, (b, out_res, out_res, 2)), jnp.float32),
        "cam_K": jnp.asarray(K),
        "bbox_center": jnp.asarray(rng.uniform(100, 400, (b, 2)),
                                   jnp.float32),
        "resize_ratio": jnp.asarray(rng.uniform(0.2, 0.5, (b,)),
                                    jnp.float32),
        "roi_wh": jnp.asarray(rng.uniform(50, 150, (b, 2)), jnp.float32),
        "mean_size": jnp.asarray(np.tile([[0.1, 0.2, 0.1]], (b, 1)),
                                 jnp.float32),
        "rotation": jnp.asarray(rots),
        "translation": jnp.asarray(
            rng.normal(size=(b, 3)) * 0.2 + [0, 0, 1.0], jnp.float32),
        "real_size": jnp.asarray(rng.uniform(0.05, 0.3, (b, 3)),
                                 jnp.float32),
        "nocs_scale": jnp.asarray(rng.uniform(0.1, 0.4, (b,)), jnp.float32),
        "sym_info": jnp.asarray(
            np.tile([[1, 1, 0, 1]], (b, 1)), jnp.float32),
        "nocs_coord": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, out_res, out_res, 3)), jnp.float32),
        "ivfc_coord": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, out_res, out_res, 3)), jnp.float32),
        "roi_mask_output": jnp.asarray(
            (rng.uniform(size=(b, out_res, out_res, 1)) > 0.4), jnp.float32),
        "roi_ivfc_mask_output": jnp.asarray(
            (rng.uniform(size=(b, out_res, out_res, 1)) > 0.4), jnp.float32),
        "model_point": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 128, 3)), jnp.float32),
    }


class TestTrainStep:
    @pytest.fixture
    def cfg(self):
        return Config(model=ModelConfig(compute_dtype="float32"),
                      train=TrainConfig(batch_size=8, warmup_iters=2,
                                        total_epoch=1, train_size=64))

    def test_loss_decreases(self, rng, cfg):
        model = PoseNet(cfg=cfg.model, backbone_variant="tiny")
        batch = tiny_train_batch(rng)
        state = init_train_state(model, cfg, batch)
        step, _ = make_train_step(model, cfg)
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["total_loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_sharded_step_on_8_device_mesh(self, rng, cfg):
        """The multichip contract: full train step jitted over a 'data'
        mesh, batch sharded, state replicated."""
        mesh = make_mesh()
        assert mesh.devices.size == 8
        model = PoseNet(cfg=cfg.model, backbone_variant="tiny")
        batch = tiny_train_batch(rng, b=16)
        state = init_train_state(model, cfg, batch)
        step, _ = make_train_step(model, cfg, mesh=mesh)
        sharded_batch = shard_batch(mesh, batch)
        state = jax.device_put(state, NamedSharding(mesh, P()))
        state, metrics = step(state, sharded_batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["total_loss"]))
        # batch really is sharded over 8 devices
        sh = sharded_batch["roi_img"].sharding
        assert sh.num_devices == 8

    def test_sharded_step_matches_unsharded(self, rng, cfg):
        """All-reduce equivalence: one step over the 8-device mesh must
        produce the same params as the unsharded step on identical data
        (data-parallel grads average to the global-batch grad)."""
        model = PoseNet(cfg=cfg.model, backbone_variant="tiny")
        batch = tiny_train_batch(rng, b=16)
        state_a = init_train_state(model, cfg, batch)
        state_b = jax.tree_util.tree_map(jnp.copy, state_a)

        step_plain, _ = make_train_step(model, cfg)
        state_a, m_a = step_plain(state_a, batch, jax.random.PRNGKey(7))

        mesh = make_mesh()
        step_mesh, _ = make_train_step(model, cfg, mesh=mesh)
        sb = shard_batch(mesh, batch)
        state_b = jax.device_put(state_b, NamedSharding(mesh, P()))
        state_b, m_b = step_mesh(state_b, sb, jax.random.PRNGKey(7))

        np.testing.assert_allclose(float(m_a["total_loss"]),
                                   float(m_b["total_loss"]),
                                   rtol=1e-5)
        for pa, pb in zip(jax.tree_util.tree_leaves(state_a.params),
                          jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       atol=2e-5, rtol=1e-4)

    def test_grad_accumulation(self, rng):
        cfg = Config(model=ModelConfig(compute_dtype="float32"),
                     train=TrainConfig(batch_size=4, accumulate=2,
                                       warmup_iters=2, total_epoch=1,
                                       train_size=64))
        model = PoseNet(cfg=cfg.model, backbone_variant="tiny")
        batch = tiny_train_batch(rng, b=4)
        state = init_train_state(model, cfg, batch)
        step, _ = make_train_step(model, cfg)
        def total_dist(a, b):
            return sum(float(jnp.sum(jnp.abs(x - y)))
                       for x, y in zip(jax.tree_util.tree_leaves(a),
                                       jax.tree_util.tree_leaves(b)))

        p0 = jax.tree_util.tree_map(jnp.copy, state.params)
        state, _ = step(state, batch, jax.random.PRNGKey(0))
        # first micro-step: params unchanged (accumulating)
        assert total_dist(p0, state.params) == 0.0
        state, _ = step(state, batch, jax.random.PRNGKey(1))
        # second micro-step applies the accumulated update
        assert total_dist(p0, state.params) > 0.0

    def test_nonfinite_update_skipped_on_device(self):
        """A NaN gradient must leave params untouched (apply_if_finite
        guard) and bump the surfaced skip counter — the reference's
        host-side try/except seam (engine/train.py:133-143) cannot catch
        NaNs at all."""
        from givepose_tpu.train.step import make_optimizer

        cfg = Config()
        opt = make_optimizer(cfg, steps_per_epoch=10)
        p = {"w": jnp.ones((3, 2))}
        state = opt.init(p)
        bad = {"w": jnp.full((3, 2), jnp.nan)}
        updates, state = opt.update(bad, state, p)
        assert float(jnp.sum(jnp.abs(updates["w"]))) == 0.0
        assert int(state.total_notfinite) == 1
        good = {"w": jnp.ones((3, 2))}
        updates, state = opt.update(good, state, p)
        assert float(jnp.sum(jnp.abs(updates["w"]))) > 0.0
        assert int(state.total_notfinite) == 1


class TestCheckpointRetention:
    def test_prunes_to_keep_newest(self, rng, tmp_path):
        from givepose_tpu.core.checkpoint import (
            latest_checkpoint, restore_checkpoint, save_checkpoint)

        cfg = Config(model=ModelConfig(compute_dtype="float32"),
                     train=TrainConfig(batch_size=2, warmup_iters=2,
                                       total_epoch=1, train_size=64))
        model = PoseNet(cfg=cfg.model, backbone_variant="tiny")
        batch = tiny_train_batch(rng, b=2)
        state = init_train_state(model, cfg, batch)
        for step in range(1, 8):
            save_checkpoint(str(tmp_path / f"ckpt_{step}"), state,
                            keep=5)
        kept = sorted((d for d in os.listdir(tmp_path)
                       if d.startswith("ckpt_")),
                      key=lambda d: int(d.split("_")[1]))
        assert kept == [f"ckpt_{i}" for i in range(3, 8)]
        # newest is intact and restorable
        assert latest_checkpoint(str(tmp_path)).endswith("ckpt_7")
        restored = restore_checkpoint(str(tmp_path / "ckpt_7"), state)
        assert int(restored.step) == int(state.step)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
