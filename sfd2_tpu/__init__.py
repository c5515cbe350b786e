"""sfd2_tpu — TPU-native hierarchical localization + SfM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SFD2
(feixue94/sfd2, CVPR 2023): semantic-guided keypoint detection/description,
mutual-NN matching, map triangulation, PnP localization with covisibility
refinement, and distributed Schur-complement bundle adjustment — all built
TPU-first (static shapes, batched device programs, sharded meshes) rather
than ported from the reference's PyTorch+COLMAP stack.

Layer map (mirrors SURVEY.md §1, re-architected):
  geometry/      rotations, camera models, projection, pose metrics
  io/            COLMAP model I/O, feature stores, pair lists, SQLite export
  models/        ResSegNet[V2] + SuperPoint teacher in Flax; weight converters
  ops/           NMS, resize, grid-sample, batched extraction, matching kernels
  localization/  batched PnP-RANSAC, covisibility refinement, localizer engine
  sfm/           two-view verification, track building, triangulation, BA
  parallel/      mesh construction and sharding layouts
  training/      losses, samplers, augmentation pipeline, trainer
"""

__version__ = "0.1.0"
