"""TPU-native framework for unsupervised domain-adaptive 2D keypoint detection.

Ground-up JAX / XLA / Pallas / pjit rebuild with the capabilities of
VisionLearningGroup/UDA_PoseEstimation ("A Unified Framework for Domain
Adaptive Pose Estimation", ECCV 2022). The reference is a pure PyTorch
research repo (see /root/reference and SURVEY.md); this package re-designs it
TPU-first:

- ``ops``       pure-JAX numerics (heatmap rendering, affine warps, PCK,
                AdaIN statistics) — all batched/vectorized, no Python loops
                over samples, jit- and shard-friendly.
- ``models``    Flax models: PoseResNet (ResNet backbone + deconv head),
                VGG19-AdaIN style network, functional losses, EMA.
- ``parallel``  device mesh + fused, sharded train/eval steps (data-parallel
                over the batch axis with XLA-inserted collectives).
- ``data``      dataset registry, keypoint-aware host transforms, loaders.
- ``utils``     meters, logger, LR schedules, checkpointing.
"""

__version__ = "0.1.0"
