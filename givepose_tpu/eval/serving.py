"""AOT serving export: serialize the PoseNet forward as StableHLO.

The reference deploys by shipping a torch checkpoint plus the whole
Python tree (evaluation/evaluate.py re-builds the model and runs eager
per-image inference).  The TPU-native serving story is ahead-of-time
export: `jax.export` lowers the jitted forward once, with static shapes,
into a self-contained serialized StableHLO artifact that a serving
process can deserialize and `.call(...)` without importing any model
code — only the checkpoint (params pytree) travels separately, so
weight updates never require re-export.

Design choices (TPU-first):
  * static batch size per artifact — XLA serving wants one compiled
    shape per traffic class, not dynamic dims;
  * params are call ARGUMENTS, not baked constants: the artifact is
    ~100 KB of code instead of ~450 MB, and one artifact serves every
    checkpoint of the same architecture;
  * multi-platform lowering (default cpu+tpu) so the same artifact
    smoke-tests on CPU and serves on TPU.  Configs with Mosaic kernels
    (use_dcn='dcnv3' fast path) are TPU-only custom calls — export
    those with platforms=('tpu',) or with dcn_impl='xla'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from givepose_tpu.core.config import ModelConfig


def serving_batch_spec(batch_size: int, img_size: int = 256,
                       out_res: int = None) -> dict:
    """ShapeDtypeStructs of the inference batch dict (the eval-loader
    tensor contract, eval/load_eval.py build_instance_batch).  The
    coordinate/NOCS map resolution is img_size/4 (stride-32 backbone,
    stride-4 output head)."""
    out_res = out_res or img_size // 4
    f32 = jnp.float32
    return {
        "roi_img": jax.ShapeDtypeStruct((batch_size, img_size, img_size, 3),
                                        f32),
        "roi_coord_2d": jax.ShapeDtypeStruct((batch_size, out_res, out_res,
                                              2), f32),
        "cam_K": jax.ShapeDtypeStruct((batch_size, 3, 3), f32),
        "bbox_center": jax.ShapeDtypeStruct((batch_size, 2), f32),
        "resize_ratio": jax.ShapeDtypeStruct((batch_size,), f32),
        "roi_wh": jax.ShapeDtypeStruct((batch_size, 2), f32),
        "mean_size": jax.ShapeDtypeStruct((batch_size, 3), f32),
    }


def export_posenet(variables, cfg: ModelConfig = None,
                   backbone_variant: str = "base", batch_size: int = 128,
                   img_size: int = 256, platforms=("cpu", "tpu")) -> bytes:
    """Serialize the PoseNet forward to a portable StableHLO artifact.

    ``variables`` is only used for its shapes/dtypes (abstracted to
    avals); the returned bytes hold no weights.
    """
    from givepose_tpu.models import PoseNet

    cfg = cfg or ModelConfig(compute_dtype="bfloat16")
    # dcn_impl='auto' resolves via jax.default_backend() ONCE at trace
    # time, which would bake the export HOST's backend into every
    # platform lowering (CPU host -> slow XLA dcn served on TPU; TPU
    # host -> Mosaic custom call that fails the cpu lowering).  For a
    # multi-platform artifact force the portable XLA formulation; a
    # single-platform tpu export may keep the Pallas fast path.
    if cfg.use_dcn and cfg.dcn_impl == "auto" and len(platforms) > 1:
        import dataclasses
        cfg = dataclasses.replace(cfg, dcn_impl="xla")
    model = PoseNet(cfg=cfg, backbone_variant=backbone_variant)

    def fwd(variables, batch):
        return model.apply(variables, batch)

    # variables may be concrete arrays OR ShapeDtypeStructs (eval_shape)
    var_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
    batch_spec = serving_batch_spec(batch_size, img_size)
    exported = jax_export.export(jax.jit(fwd), platforms=list(platforms))(
        var_spec, batch_spec)
    return exported.serialize()


def load_exported(blob: bytes):
    """Deserialize an artifact; returns a jit-callable
    ``fn(variables, batch) -> output dict``."""
    exported = jax_export.deserialize(blob)
    return jax.jit(exported.call)


def save_exported(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_exported_file(path: str):
    with open(path, "rb") as f:
        return load_exported(f.read())


def example_serving_batch(batch_size: int, img_size: int = 256,
                          out_res: int = None, seed: int = 0) -> dict:
    """Random batch matching serving_batch_spec (smoke tests / warmup)."""
    out_res = out_res or img_size // 4
    rng = np.random.default_rng(seed)
    K = np.tile(np.array([[591.0, 0, 322.5], [0, 590.2, 244.1],
                          [0, 0, 1]], np.float32), (batch_size, 1, 1))
    return {
        "roi_img": jnp.asarray(
            rng.normal(size=(batch_size, img_size, img_size, 3)),
            jnp.float32),
        "roi_coord_2d": jnp.asarray(
            rng.uniform(-1, 1, (batch_size, out_res, out_res, 2)),
            jnp.float32),
        "cam_K": jnp.asarray(K),
        "bbox_center": jnp.asarray(
            rng.uniform(100, 400, (batch_size, 2)), jnp.float32),
        "resize_ratio": jnp.asarray(
            rng.uniform(0.2, 0.5, (batch_size,)), jnp.float32),
        "roi_wh": jnp.asarray(
            rng.uniform(50, 150, (batch_size, 2)), jnp.float32),
        "mean_size": jnp.asarray(
            np.tile([[0.1, 0.2, 0.1]], (batch_size, 1)), jnp.float32),
    }
