"""gssdf_tpu: TPU-native LiDAR-visual GS-SDF mapping framework.

A from-scratch JAX/Pallas rebuild of the capabilities of hku-mars/GS-SDF:
joint neural-SDF + 2D Gaussian Splatting training, rendering, meshing and
evaluation, designed for TPU (XLA, shard_map, Pallas kernels).
"""

__version__ = "0.1.0"
