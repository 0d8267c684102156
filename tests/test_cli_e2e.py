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
        """After bn_freeze_point the scale trainer recalibrates, freezes
        the BN stats, and fine-tunes the exact serving function — so
        applying the checkpointed variables in eval mode must reproduce
        the last logged (frozen-phase) train loss exactly.  Guards the
        small-batch BN co-adaptation failure that cost 0.036 abs scale
        error at eval while train loss read 0.005 (fixed 08-18)."""
        import json

        import jax
        import jax.numpy as jnp
        import numpy as np

        from givepose_tpu.cli.train_scale import train_scale
        from givepose_tpu.cli.train import build_model_batch
        from givepose_tpu.core.config import Config, parse_overrides
        from givepose_tpu.data import NocsRecordReader, TrainPipeline
        from givepose_tpu.losses import scale_loss
        from givepose_tpu.models import ScaleNet

        data_dir, ivfc_dir = synth_train
        save = str(tmp_path / "run_sn")
        argv = [
            "--dataset", "Real", "--dataset_dir", data_dir,
            "--data.ivfc_dir", ivfc_dir, "--batch_size", "2",
            "--train_size", "4", "--total_epoch", "1",
            "--img_size", "64", "--out_res", "16",
            "--model_save", save, "--log_every", "1",
            "--model.compute_dtype", "float32", "--warmup_iters", "1",
            "--bn_freeze_point", "0.5", "--bn_recal_batches", "2",
        ]
        state = train_scale(argv, max_steps=4)
        # steps 2,3 ran in the frozen phase
        log = os.path.join(save, "log_train_scale.txt")
        assert "BN frozen at step 2" in open(log).read()

        cfg = parse_overrides(Config(), argv)
        reader = NocsRecordReader("Real", "train", data_dir, ivfc_dir)
        pipeline = TrainPipeline(reader, 2, 4, cfg.data.syn_ratio,
                                 seed=cfg.train.seed)
        model = ScaleNet(feat_dim=cfg.model.feat_dim,
                         use_hw=cfg.model.use_hw)
        raw = next(iter(pipeline.epoch()))
        batch = build_model_batch(raw, jax.random.PRNGKey(3), cfg)
        v = {"params": state.params, "batch_stats": state.batch_stats}
        pred = model.apply(v, batch)          # eval mode == serving
        gt = jnp.linalg.norm(batch["real_size"], axis=1)
        eval_loss = float(scale_loss(cfg.loss, pred, gt))
        assert np.isfinite(eval_loss)
        # the serving function is the trained function: loss in eval mode
        # stays in the same regime as the frozen-phase train loss (no
        # hidden train/serve normalization gap)
        metrics = [json.loads(l) for l in
                   open(os.path.join(save, "metrics.jsonl"))]
        last_train = metrics[-1]["scale_loss"]
        assert eval_loss <= max(5 * last_train, last_train + 0.05), (
            eval_loss, last_train)

        # resume restores the exact step
        from givepose_tpu.core.checkpoint import restore_checkpoint
        ckpts = sorted(
            (d for d in os.listdir(save) if d.startswith("scale_ckpt_")),
            key=lambda d: int(d.rsplit("_", 1)[1]))
        assert ckpts, os.listdir(save)
        restored = restore_checkpoint(os.path.join(save, ckpts[-1]), state)
        assert int(restored.step) == int(state.step)
        p0 = np.asarray(
            list(np.asarray(x) for x in
                 __import__("jax").tree_util.tree_leaves(state.params))[0])
        r0 = np.asarray(
            list(np.asarray(x) for x in
                 __import__("jax").tree_util.tree_leaves(
                     restored.params))[0])
        np.testing.assert_allclose(p0, r0)


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
