"""GIVEPose-TPU: a TPU-native JAX framework for RGB-only category-level 6D pose.

Re-implements the capabilities of the GIVEPose reference (CVPR 2025,
reference layout documented in SURVEY.md) as an idiomatic JAX/XLA/Pallas
stack: NHWC tensors, fully-batched geometry, Pallas kernels for the
deformable-conv hot path, pjit/shard_map data parallelism over a device
mesh, and an on-device fused preprocessing graph.

Layering (bottom-up):
  core      config dataclasses, mesh/sharding, checkpointing, logging
  ops       pallas/XLA kernels: dcnv3, chamfer, affine warp, color aug
  geometry  rotation reps, allo/ego, centroid-z assembly, umeyama, sym banks
  data      NOCS/Wild6D readers + on-device preprocessing
  models    ConvNeXt backbone, xyz heads, map encoder, conv-PnP, scale net
  losses    pose loss with on-device symmetry resolution
  train     pjit train step, Ranger-in-optax, flat+anneal schedule
  eval      batched 3D-IoU / deg-cm mAP harness
  cli       train / evaluate entry points mirroring the reference CLI
"""

__version__ = "0.1.0"
