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
import numpy as np
from flax import linen as nn

from transmvsnet_tpu.models.blocks import ConvBnReLU, ConvND


class CostRegNet(nn.Module):
    base_channels: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: [B, D, H, W, C_in] -> [B, D, H, W, 1]."""
        c = self.base_channels

        def conv(feat, features, stride=1, name=""):
            return ConvBnReLU(
                features,
                kernel_size=3,
                strides=stride,
                padding=1,
                ndim=3,
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


def _depth_band(
    D_in: int, D_out: int, mode: str
) -> np.ndarray:
    """Depth-axis coupling selector S[kd, d_in, d_out] for kernel size 3.

    Folding the depth axis of a 3-D convolution into the channel dimension
    turns it into a 2-D convolution with a block-banded weight; S encodes
    which (d_in, d_out) pairs each depth tap kd connects (zero padding in
    depth falls out of the band edges).

    Modes: "same" (stride 1, pad 1): d_in = d_out + kd - 1;
    "down" (stride 2, pad 1): d_in = 2·d_out + kd - 1;
    "up" (transposed, stride 2, pad 1, output_padding 1, in the DeconvND
    convention — kernel stored pre-flipped): 2·d_in = d_out + kd - 1.
    """
    S = np.zeros((3, D_in, D_out), np.float32)
    for kd in range(3):
        for d_out in range(D_out):
            if mode == "same":
                d_in = d_out + kd - 1
            elif mode == "down":
                d_in = 2 * d_out + kd - 1
            elif mode == "up":
                num = d_out + kd - 1
                if num % 2 != 0:
                    continue
                d_in = num // 2
            else:
                raise ValueError(mode)
            if 0 <= d_in < D_in:
                S[kd, d_in, d_out] = 1.0
    return S


class _Conv3DKernel(nn.Module):
    """Holds a 3-D conv kernel param (name-compatible with ConvND)."""

    shape: tuple[int, ...]

    @nn.compact
    def __call__(self) -> jax.Array:
        from transmvsnet_tpu.models.blocks import torch_kernel_init

        return self.param("kernel", torch_kernel_init, self.shape)


class _TiledBN(nn.Module):
    """BatchNorm over channels C applied to a [B, H, W, D·C] layout.

    Param/batch-stats tree matches ``blocks.BatchNorm`` (features=C); the
    per-(d, c) moments are reduced over d so the statistics are identical
    to 3-D BN over (B, D, H, W) per channel.
    """

    features: int
    tile: int  # D
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        C, D = self.features, self.tile
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,)))

        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean_dc = jnp.mean(xf, axis=reduce_axes).reshape(D, C)
            meansq_dc = jnp.mean(jnp.square(xf), axis=reduce_axes).reshape(D, C)
            mean = jnp.mean(mean_dc, axis=0)
            mean_sq = jnp.mean(meansq_dc, axis=0)
            # Cross-replica stat sync is implicit: x is a global array
            # under jit, so the batch-axis mean is already a GSPMD
            # collective when the batch is data-sharded.
            n = float(np.prod([x.shape[a] for a in reduce_axes])) * D
            var = mean_sq - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - jnp.tile(mean, D)) * jnp.tile(
            inv, D
        ) + jnp.tile(bias, D)
        return y.astype(x.dtype)


class _DenseConvBN(nn.Module):
    """One U-Net layer in the depth-as-channels formulation.

    Exactly the math of ConvBnReLU(ndim=3) but expressed as a 2-D conv over
    [B, H, W, D·C] with the block-banded dense weight built from the 3-D
    kernel — MXU-shaped channel counts instead of 8..64-channel 3-D convs.
    Submodule names ("conv", "bn") match ConvBnReLU so the parameter tree is
    checkpoint/converter-compatible with the reference CostRegNet path.
    """

    features: int
    in_ch: int
    D_in: int
    mode: str  # "same" | "down" | "up"
    relu: bool = True
    bn: bool = True

    @property
    def D_out(self) -> int:
        if self.mode == "same":
            return self.D_in
        if self.mode == "down":
            return (self.D_in + 1) // 2
        return self.D_in * 2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        k3 = _Conv3DKernel(
            (3, 3, 3, self.in_ch, self.features), name="conv"
        )()  # [kd, kh, kw, I, O]
        S = jnp.asarray(_depth_band(self.D_in, self.D_out, self.mode))
        w = jnp.einsum("kabio,kde->abdieo", k3, S)
        w2d = w.reshape(
            3, 3, self.D_in * self.in_ch, self.D_out * self.features
        ).astype(x.dtype)

        dn = jax.lax.conv_dimension_numbers(
            x.shape, w2d.shape, ("NHWC", "HWIO", "NHWC")
        )
        if self.mode == "up":
            y = jax.lax.conv_general_dilated(
                x, w2d, window_strides=(1, 1), padding=[(1, 2), (1, 2)],
                lhs_dilation=(2, 2), dimension_numbers=dn,
            )
        else:
            s = 1 if self.mode == "same" else 2
            y = jax.lax.conv_general_dilated(
                x, w2d, window_strides=(s, s), padding=[(1, 1), (1, 1)],
                dimension_numbers=dn,
            )
        if self.bn:
            y = _TiledBN(
                self.features, self.D_out, name="bn"
            )(y, train)
        if self.relu:
            y = nn.relu(y)
        return y


class CostRegNetDense(nn.Module):
    """CostRegNet with the depth axis folded into channels (TPU-fast path).

    Drop-in replacement: same [B, D, H, W, C] interface, identical parameter
    tree, same math (banded-dense weights realize the 3-D convolutions
    exactly, incl. zero padding in depth). Channel counts become D·C
    (e.g. 48·8 = 384 at stage 1), which the MXU tiles efficiently — the
    native 3-D formulation runs at <5% MXU utilization at C=8..64.
    """

    base_channels: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, D, H, W, C_in = x.shape
        c = self.base_channels
        x2d = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, D * C_in)

        def layer(feat, features, in_ch, D_in, mode, name):
            return _DenseConvBN(
                features, in_ch, D_in, mode, name=name
            )(feat, train)

        D2, D4, D8 = (D + 1) // 2, (D + 3) // 4, (D + 7) // 8
        conv0 = layer(x2d, c, C_in, D, "same", "conv0")
        conv2 = layer(
            layer(conv0, c * 2, c, D, "down", "conv1"), c * 2, c * 2, D2,
            "same", "conv2",
        )
        conv4 = layer(
            layer(conv2, c * 4, c * 2, D2, "down", "conv3"), c * 4, c * 4, D4,
            "same", "conv4",
        )
        mid = layer(
            layer(conv4, c * 8, c * 4, D4, "down", "conv5"), c * 8, c * 8, D8,
            "same", "conv6",
        )
        mid = conv4 + layer(mid, c * 4, c * 8, D8, "up", "conv7")
        mid = conv2 + layer(mid, c * 2, c * 4, D4, "up", "conv9")
        mid = conv0 + layer(mid, c, c * 2, D2, "up", "conv11")

        k3 = _Conv3DKernel((3, 3, 3, c, 1), name="prob")()
        S = jnp.asarray(_depth_band(D, D, "same"))
        w2d = (
            jnp.einsum("kabio,kde->abdieo", k3, S)
            .reshape(3, 3, D * c, D)
            .astype(mid.dtype)
        )
        dn = jax.lax.conv_dimension_numbers(
            mid.shape, w2d.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            mid, w2d, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=dn,
        )  # [B, H, W, D]
        return y.transpose(0, 3, 1, 2)[..., None]


class _CFConv1x1(nn.Module):
    """1×1×1 conv applied in a channels-first [B, C, N] layout.

    Parameter names/shapes match ConvND (kernel [1,1,1,I,O], optional bias)
    so checkpoints and the torch converter are unaffected; only the compute
    layout changes: the huge N = D·H·W axis rides the 128-lane dimension
    and the tiny channel count stays on sublanes. Running these as real 3-D
    convs lets XLA pad C∈{1,8,16} to 128 lanes — measured 8-16× HBM
    blowup (4 × 3.75 GB temps) that OOMs the 512×640 train step (see
    PERFORMANCE.md "Training performance").
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from transmvsnet_tpu.models.blocks import torch_bias_init, torch_kernel_init

        in_ch = x.shape[1]
        kernel = self.param(
            "kernel", torch_kernel_init, (1, 1, 1, in_ch, self.features)
        )
        w = kernel[0, 0, 0].astype(x.dtype)  # [I, O]
        y = jnp.einsum("io,bin->bon", w, x)
        if self.use_bias:
            b = self.param("bias", torch_bias_init(in_ch), (self.features,))
            y = y + b.astype(y.dtype)[:, None]
        return y


class _CFBatchNorm(nn.Module):
    """blocks.BatchNorm semantics on the channels-first [B, C, N] layout
    (identical param/batch_stats tree; stats reduce over B and N)."""

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        C = self.features
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,)))

        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 2))
            mean_sq = jnp.mean(jnp.square(xf), axis=(0, 2))
            n = float(x.shape[0] * x.shape[2])
            var = mean_sq - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean[:, None]) * inv[:, None] + bias[
            :, None
        ]
        return y.astype(x.dtype)


class _CFConvBnReLU(nn.Module):
    """ConvBnReLU(kernel 1, ndim 3) in the channels-first layout; submodule
    names ("conv", "bn") match ConvBnReLU for tree compatibility."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = _CFConv1x1(self.features, use_bias=False, name="conv")(x)
        x = _CFBatchNorm(self.features, name="bn")(x, train)
        return nn.relu(x)


class PixelwiseNet(nn.Module):
    """Per-source-view visibility weight from the similarity volume
    (reference models/TransMVSNet.py:10-30).

    [B, D, H, W, 1] -> [B, H, W, 1] via 1×1×1 convs, sigmoid, max over D.
    The pointwise MLP runs channels-first (see _CFConv1x1) — same math and
    parameter tree as the naive Conv3D stack, TPU-safe layouts.
    """

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, D, H, W, C_in = x.shape
        xcf = x.reshape(B, D * H * W, C_in).transpose(0, 2, 1)  # [B, C, N]
        y = _CFConvBnReLU(16, name="conv0")(xcf, train)
        y = _CFConvBnReLU(8, name="conv1")(y, train)
        y = _CFConv1x1(1, name="conv2")(y)
        y = jax.nn.sigmoid(y)  # [B, 1, N]
        return jnp.max(y.reshape(B, D, H, W), axis=1)[..., None]
