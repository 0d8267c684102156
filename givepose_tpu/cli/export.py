"""Export CLI: AOT-serialize the PoseNet forward for serving.

Usage:
  python -m givepose_tpu.cli.export --out posenet_b128.jaxexp \\
      --batch_size 128 [--resume_model <orbax dir>] [--platforms cpu,tpu]

Writes ONE artifact file (serialized StableHLO, jax.export).  Weights
stay in the checkpoint — a serving process does:

  from givepose_tpu.eval.serving import load_exported_file
  fn = load_exported_file("posenet_b128.jaxexp")
  out = fn(variables, batch)        # batch: serving_batch_spec shapes

No reference equivalent (torch deploys the Python tree + .pth); this is
the TPU-native packaging of evaluation/evaluate.py's model-load step.
"""

from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

from givepose_tpu.core.config import ModelConfig
from givepose_tpu.eval.serving import (
    example_serving_batch,
    export_posenet,
    save_exported,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--backbone", default="base")
    p.add_argument("--use_dcn", default="")
    p.add_argument("--dcn_window", type=int, default=0)
    p.add_argument("--dcn_impl", default="auto",
                   choices=["auto", "pallas", "xla"],
                   help="dcnv3 kernel backend; multi-platform exports "
                        "resolve 'auto' to the portable 'xla' path")
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--gelu_exact", action="store_true",
                   help="exact erf GELU — REQUIRED for artifacts that "
                        "will serve converted reference .pth weights "
                        "(models/convert_weights.py)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms; Mosaic "
                        "(dcnv3 fast-path) configs must be tpu-only")
    args = p.parse_args(argv)

    cfg = ModelConfig(compute_dtype=args.compute_dtype,
                      use_dcn=args.use_dcn, dcn_window=args.dcn_window,
                      dcn_impl=args.dcn_impl, gelu_exact=args.gelu_exact)
    from givepose_tpu.models import PoseNet
    model = PoseNet(cfg=cfg, backbone_variant=args.backbone)

    # only SHAPES enter the artifact (weights are call arguments), so a
    # shape-level init is always sufficient — no checkpoint read here
    batch = example_serving_batch(2, args.img_size)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch))

    platforms = tuple(s for s in args.platforms.split(",") if s)
    blob = export_posenet(variables, cfg=cfg,
                          backbone_variant=args.backbone,
                          batch_size=args.batch_size,
                          img_size=args.img_size, platforms=platforms)
    save_exported(args.out, blob)
    nparams = sum(int(np.prod(l.shape)) for l in
                  jax.tree_util.tree_leaves(variables))
    print(f"exported {args.out}: {len(blob)/1024:.1f} KB, "
          f"batch {args.batch_size}, platforms {platforms}, "
          f"{nparams/1e6:.1f} M params expected at call time")


if __name__ == "__main__":
    main(sys.argv[1:])
