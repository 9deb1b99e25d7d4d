"""TransMVSNet-TPU: a TPU-native multi-view-stereo framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
TransMVSNet (CVPR 2022): coarse-to-fine cascade MVS depth estimation,
feature-matching transformer, distributed (SPMD mesh) training, depth-map
inference, point-cloud fusion, and DTU benchmark evaluation.

Layout (all arrays channel-last, TPU-friendly):
  images   [B, H, W, 3]
  features [B, H, W, C]
  volumes  [B, D, H, W, C]
"""

__version__ = "0.1.0"
