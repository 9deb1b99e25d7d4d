"""Cost-volume regularization (3D U-Net) and per-view visibility weights.

``CostRegNet`` re-implements the reference's 3-level 3D U-Net
(reference models/module.py:425-456): stride-2 encoder (c→2c→4c→8c),
transpose-conv decoder with additive skips, and a final bias-free 3×3×3
conv to one channel. ``PixelwiseNet`` is the 1×1×1 visibility head
(reference models/TransMVSNet.py:10-30). Volumes are [B, D, H, W, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from transmvsnet_tpu.models.blocks import ConvBnReLU, ConvND


class CostRegNet(nn.Module):
    base_channels: int = 8
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: [B, D, H, W, C_in] -> [B, D, H, W, 1]."""
        c = self.base_channels
        an = self.axis_name

        def conv(feat, features, stride=1, name=""):
            return ConvBnReLU(
                features,
                kernel_size=3,
                strides=stride,
                padding=1,
                ndim=3,
                axis_name=an,
                name=name,
            )(feat, train)

        def deconv(feat, features, name=""):
            return ConvBnReLU(
                features,
                kernel_size=3,
                strides=2,
                padding=1,
                output_padding=1,
                ndim=3,
                transpose=True,
                axis_name=an,
                name=name,
            )(feat, train)

        conv0 = conv(x, c, name="conv0")
        conv2 = conv(conv(conv0, c * 2, stride=2, name="conv1"), c * 2, name="conv2")
        conv4 = conv(conv(conv2, c * 4, stride=2, name="conv3"), c * 4, name="conv4")
        mid = conv(conv(conv4, c * 8, stride=2, name="conv5"), c * 8, name="conv6")
        mid = conv4 + deconv(mid, c * 4, name="conv7")
        mid = conv2 + deconv(mid, c * 2, name="conv9")
        mid = conv0 + deconv(mid, c, name="conv11")
        return ConvND(1, 3, padding=1, use_bias=False, ndim=3, name="prob")(mid)


class PixelwiseNet(nn.Module):
    """Per-source-view visibility weight from the similarity volume.

    [B, D, H, W, 1] -> [B, H, W, 1] via 1×1×1 convs, sigmoid, max over D.
    """

    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        an = self.axis_name
        x = ConvBnReLU(
            16, kernel_size=1, padding=0, ndim=3, axis_name=an, name="conv0"
        )(x, train)
        x = ConvBnReLU(
            8, kernel_size=1, padding=0, ndim=3, axis_name=an, name="conv1"
        )(x, train)
        x = ConvND(1, 1, padding=0, ndim=3, name="conv2")(x)
        x = jax.nn.sigmoid(x)
        return jnp.max(x, axis=1)  # over D
