"""End-to-end CLI smoke: train a few steps on synthetic data, checkpoint,
resume, evaluate — the reference's implicit integration test made explicit
(SURVEY.md §4)."""

import os

import numpy as np
import pytest

from givepose_tpu.data.synthetic import make_synthetic_nocs, \
    make_synthetic_eval


@pytest.fixture(scope="module")
def synth_train(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_train")
    return make_synthetic_nocs(str(root), n_images=4)


class TestTrainCLI:
    def test_train_steps_and_checkpoint(self, synth_train, tmp_path):
        from givepose_tpu.cli.train import train
        data_dir, ivfc_dir = synth_train
        save = str(tmp_path / "run1")
        argv = [
            "--dataset", "Real",
            "--dataset_dir", data_dir,
            "--data.ivfc_dir", ivfc_dir,
            "--batch_size", "2",
            "--train_size", "4",
            "--total_epoch", "1",
            "--img_size", "64",
            "--out_res", "16",
            "--model_save", save,
            "--log_every", "1",
            "--model.compute_dtype", "float32",
            "--warmup_iters", "1",
        ]
        state = train(argv, max_steps=2, backbone_variant="tiny")
        assert int(state.step) == 2
        ckpts = [d for d in os.listdir(save) if d.startswith("ckpt_")]
        assert ckpts, os.listdir(save)
        # metrics stream written
        assert os.path.exists(os.path.join(save, "metrics.jsonl"))
        assert os.path.exists(os.path.join(save, "config.json"))

    def test_train_scale_bn_freeze_serves_trained_function(
            self, synth_train, tmp_path):
        """After bn_freeze_point the scale trainer recalibrates the BN
        running stats (precise-BN), FREEZES them, and fine-tunes the
        exact serving function (eval-mode apply) — the mechanism behind
        the 08-18 co-adaptation fix (eval scale err 0.036 -> 0.001 on
        the overfit fixture).  This pins the MECHANISM deterministically:
        (a) the frozen phase never mutates batch_stats, (b) it does
        update params, (c) the checkpoint restores the serving function
        bit-exactly.  Loss-quality bars live in the overfit harness —
        on this 4-image batch-2 fixture the quantity is chaotic (N=2
        batch whitening vs any fixed stats), not a contract."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from givepose_tpu.cli.train_scale import train_scale
        from givepose_tpu.cli.train import build_model_batch
        from givepose_tpu.core.config import Config, parse_overrides
        from givepose_tpu.data import NocsRecordReader, TrainPipeline
        from givepose_tpu.models import ScaleNet

        data_dir, ivfc_dir = synth_train

        def argv(save, freeze_point):
            # freeze_at = int(freeze_point * max_steps): pick the ratio
            # per run so BOTH runs freeze at the same absolute step 2
            return [
                "--dataset", "Real", "--dataset_dir", data_dir,
                "--data.ivfc_dir", ivfc_dir, "--batch_size", "2",
                "--train_size", "4", "--total_epoch", "1",
                "--img_size", "64", "--out_res", "16",
                "--model_save", save, "--log_every", "1",
                "--model.compute_dtype", "float32",
                "--warmup_iters", "1",
                "--bn_freeze_point", freeze_point,
                "--bn_recal_batches", "2",
            ]

        save4 = str(tmp_path / "run_sn4")
        state4 = train_scale(argv(save4, "0.5"), max_steps=4)
        log = os.path.join(save4, "log_train_scale.txt")
        assert "BN recalibrated" in open(log).read()
        assert "BN frozen at step 2" in open(log).read()

        # a longer run past the same freeze point: the frozen phase must
        # have updated params WITHOUT touching the frozen batch_stats
        save6 = str(tmp_path / "run_sn6")
        state6 = train_scale(argv(save6, "0.34"), max_steps=6)
        assert "BN frozen at step 2" in open(
            os.path.join(save6, "log_train_scale.txt")).read()
        for a, b in zip(jax.tree_util.tree_leaves(state4.batch_stats),
                        jax.tree_util.tree_leaves(state6.batch_stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in
                 zip(jax.tree_util.tree_leaves(state4.params),
                     jax.tree_util.tree_leaves(state6.params))]
        assert max(diffs) > 0.0, "frozen phase did not train params"

        # the checkpointed serving function reproduces eval-mode apply
        # bit-exactly on a fixed batch
        cfg = parse_overrides(Config(), argv(save4, "0.5"))
        model = ScaleNet(feat_dim=cfg.model.feat_dim,
                         use_hw=cfg.model.use_hw)
        reader = NocsRecordReader("Real", "train", data_dir, ivfc_dir)
        pipeline = TrainPipeline(reader, 2, 4, cfg.data.syn_ratio,
                                 seed=cfg.train.seed)
        raw = next(iter(pipeline.epoch()))
        batch = build_model_batch(raw, jax.random.PRNGKey(3), cfg)
        v = {"params": state6.params, "batch_stats": state6.batch_stats}
        pred = np.asarray(model.apply(v, batch))   # eval mode == serving
        assert np.isfinite(pred).all()

        from givepose_tpu.core.checkpoint import restore_checkpoint
        ckpts = sorted(
            (d for d in os.listdir(save6)
             if d.startswith("scale_ckpt_")),
            key=lambda d: int(d.rsplit("_", 1)[1]))
        assert ckpts, os.listdir(save6)
        restored = restore_checkpoint(os.path.join(save6, ckpts[-1]),
                                      state6)
        assert int(restored.step) == int(state6.step)
        rv = {"params": restored.params,
              "batch_stats": restored.batch_stats}
        np.testing.assert_array_equal(np.asarray(model.apply(rv, batch)),
                                      pred)


class TestRestartEvery:
    def test_restart_resume_matches_uninterrupted(self, synth_train,
                                                  tmp_path):
        """--restart_every exits with code 75 after checkpointing; the
        resumed process (epoch derived from the checkpointed step,
        sampler stream replayed) must land on the SAME params as an
        uninterrupted run — the durability contract behind
        cli.train_durable."""
        import jax

        from givepose_tpu.cli.train import train
        data_dir, ivfc_dir = synth_train

        def argv(save, extra=()):
            return [
                "--dataset", "Real", "--dataset_dir", data_dir,
                "--data.ivfc_dir", ivfc_dir, "--batch_size", "2",
                "--train_size", "4", "--total_epoch", "2",
                "--img_size", "64", "--out_res", "16",
                "--model_save", save, "--log_every", "1",
                "--model.compute_dtype", "float32",
                "--warmup_iters", "1", "--save_every", "100",
                # augmentation deliberately ON: the per-step device keys
                # are fold_in(seed, step) and the host read-rng is
                # (seed, epoch, batch)-derived, so a restarted process
                # reproduces the exact augmented batches — this test
                # pins that bit-exact-resume contract
                "--color_aug_prob", "1",
                *extra,
            ]

        save_a = str(tmp_path / "interrupted")
        with pytest.raises(SystemExit) as exc:
            train(argv(save_a, ["--restart_every", "1"]),
                  backbone_variant="tiny")
        assert exc.value.code == 75
        ckpts = [d for d in os.listdir(save_a) if d.startswith("ckpt_")]
        assert ckpts, "restart exit must leave a checkpoint"

        state_a = train(argv(save_a, ["--restart_every", "1",
                                      "--resume", "1"]),
                        backbone_variant="tiny")

        save_b = str(tmp_path / "uninterrupted")
        state_b = train(argv(save_b), backbone_variant="tiny")

        assert int(state_a.step) == int(state_b.step)
        la = jax.tree_util.tree_leaves(state_a.params)
        lb = jax.tree_util.tree_leaves(state_b.params)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestEvalCLI:
    def test_evaluate_random_weights(self, tmp_path):
        from givepose_tpu.cli.evaluate import evaluate
        data_dir, _ = make_synthetic_eval(str(tmp_path), n_images=2)
        out = evaluate([
            "--dataset", "Real",
            "--dataset_dir", data_dir,
            "--img_size", "64",
            "--out_res", "16",
            "--model_save", str(tmp_path / "eval_out"),
            "--model.compute_dtype", "float32",
            "--eval.max_instances", "4",
        ], backbone_variant="tiny")
        assert "absolute" in out and "relative" in out


class TestConfigAndLogging:
    def test_tuple_field_coercion(self):
        from givepose_tpu.core.config import Config, parse_overrides

        cfg = parse_overrides(Config(), ["--train.mesh_shape", "8"])
        assert cfg.train.mesh_shape == (8,)
        cfg = parse_overrides(Config(), ["--train.mesh_shape=4,2"])
        assert cfg.train.mesh_shape == (4, 2)
        cfg = parse_overrides(Config(), ["--train.mesh_shape", ""])
        assert cfg.train.mesh_shape == ()

    def test_setup_logger_retargets_file(self, tmp_path):
        """A second in-process run with a different log path must write
        to ITS file, not the first run's (named loggers are global)."""
        from givepose_tpu.core.logging_utils import setup_logger

        f1 = str(tmp_path / "a" / "log.txt")
        f2 = str(tmp_path / "b" / "log.txt")
        setup_logger("retarget_test", f1).info("first run")
        setup_logger("retarget_test", f2).info("second run")
        assert "first run" in open(f1).read()
        assert "second run" in open(f2).read()
        assert "second run" not in open(f1).read()
