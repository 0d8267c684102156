"""Evaluation CLI (reference evaluation/evaluate.py:27-286).

Usage:
  python -m givepose_tpu.cli.evaluate --dataset Real \\
      --dataset_dir ./data/NOCS --resume_model <ckpt> --sn_path <sn_ckpt>
"""

from __future__ import annotations

import os
import sys

import jax

from givepose_tpu.core.checkpoint import restore_checkpoint
from givepose_tpu.core.config import Config, parse_overrides
from givepose_tpu.core.logging_utils import setup_logger
from givepose_tpu.eval import (
    NocsEvalReader,
    WildEvalReader,
    evaluate_results,
    run_inference,
)
from givepose_tpu.models import PoseNet, ScaleNet


def _restore_variables(path: str, template_variables):
    """Load model variables from either a raw-variables checkpoint or a
    cli.train/train_scale TrainState checkpoint (step/params/batch_stats/
    opt_state) — the latter is what the training CLIs write, so eval must
    accept it directly."""
    import numpy as np
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(os.path.abspath(path))
    except Exception:
        restored = ckptr.restore(
            os.path.abspath(path),
            jax.tree_util.tree_map(np.asarray, template_variables))
    out = {"params": restored["params"]}
    bs = restored.get("batch_stats")
    if bs:
        out["batch_stats"] = bs
    return out


def evaluate(argv=None, backbone_variant: str = "base",
             posenet_variables=None, scalenet_variables=None):
    cfg = parse_overrides(Config(), argv if argv is not None
                          else sys.argv[1:])
    model_name = (os.path.basename(cfg.train.resume_model).split(".")[0]
                  if cfg.train.resume_model else "random")
    out_dir = os.path.join(cfg.train.model_save,
                           f"eval_result_{model_name}")
    os.makedirs(out_dir, exist_ok=True)
    logger = setup_logger("eval", os.path.join(out_dir, "log_eval.txt"))

    is_wild = cfg.data.dataset == "wild6d"
    if is_wild:
        reader = WildEvalReader(cfg.data.dataset_dir,
                                per_obj=cfg.data.per_obj)
        source = "Real"
        cache = os.path.join(out_dir,
                             f"pred_result_{cfg.data.per_obj}.pkl")
    else:
        reader = NocsEvalReader(cfg.data.dataset, cfg.data.dataset_dir,
                                detection_dir=cfg.eval.detection_dir
                                or None,
                                refine_mug=cfg.eval.eval_refine_mug,
                                per_obj=cfg.data.per_obj)
        source = cfg.data.dataset
        cache = os.path.join(out_dir, "pred_result.pkl")

    model = PoseNet(cfg=cfg.model, backbone_variant=backbone_variant)
    scale_model = ScaleNet(feat_dim=cfg.model.feat_dim,
                           use_hw=cfg.model.use_hw)

    variables = posenet_variables
    sn_vars = scalenet_variables
    if variables is None:
        # build templates then load the checkpoint trees
        import jax.numpy as jnp
        import numpy as np
        # scan for the first image that is readable AND has instances —
        # image 0 being corrupt or detection-less must not abort a run
        # whose remaining images are fine (run_inference already skips
        # such images per-image)
        from givepose_tpu.eval import build_instance_batch
        built = None
        for probe in range(len(reader)):
            dummy = reader.read(probe)
            if dummy is None:
                continue
            built = build_instance_batch(dummy[0], dummy[1],
                                         dummy[2], source,
                                         img_size=cfg.data.img_size,
                                         out_res=cfg.data.out_res,
                                         max_instances=cfg.eval.
                                         max_instances)
            if built is not None:
                break
        assert built is not None, "no readable eval sample with instances"
        jb = {k: jnp.asarray(v) for k, v in built[0].items()}
        variables = model.init(jax.random.PRNGKey(0), jb)
        sn_vars = scale_model.init(jax.random.PRNGKey(1), jb)
        if cfg.train.resume_model:
            variables = _restore_variables(cfg.train.resume_model,
                                           variables)
        if cfg.model.sn_path:
            sn_vars = _restore_variables(cfg.model.sn_path, sn_vars)

    results = run_inference(reader, model, variables, scale_model,
                            sn_vars, cfg, source=source,
                            is_wild6d=is_wild, cache_path=cache,
                            progress=lambda i, n: logger.info(
                                "inference %d/%d", i, n))
    if cfg.eval.eval_inference_only:
        return None
    return evaluate_results(results, cfg, log=logger.info)


if __name__ == "__main__":
    evaluate()
