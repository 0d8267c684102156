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

        # resume restores the exact step
        from givepose_tpu.core.checkpoint import restore_checkpoint
        restored = restore_checkpoint(os.path.join(save, ckpts[0]), state)
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
                # determinism: zero augmentation so the restarted
                # process's fresh rng streams cannot diverge the data
                "--color_aug_prob", "0", "--data.roi_mask_pro", "0",
                "--DZI_SCALE_RATIO", "0", "--DZI_SHIFT_RATIO", "0",
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
