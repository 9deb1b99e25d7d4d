"""Neural building blocks with PyTorch-compatible numerics, channel-last.

These reimplement the conv/BN wrapper semantics of the reference
(reference models/module.py:24-231) in flax.linen over raw
``lax.conv_general_dilated``:

- Explicit symmetric padding (torch style) rather than XLA 'SAME', so
  stride-2 convolutions align identically to the reference.
- Transposed convs are expressed as input-dilated convs with kernel layout
  chosen so a converted torch ``ConvTranspose`` weight slots in directly.
- ``BatchNorm`` follows torch: biased batch variance for normalization,
  unbiased for the running update, ``new = (1-m)·old + m·batch`` with
  m=0.1. SyncBatchNorm (reference train.py:363) needs no explicit analog:
  batch arrays are global under single-controller jit, so the batch-axis
  moments already reduce across data-parallel replicas via GSPMD.
- Weight init mirrors torch defaults (kaiming-uniform a=√5, fan-in bias).
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

# torch's default conv/linear weight init: kaiming_uniform(a=sqrt(5)) ==
# uniform(-sqrt(1/fan_in), sqrt(1/fan_in)) == variance 1/(3 fan_in).
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)
xavier_uniform_init = nn.initializers.xavier_uniform()


def torch_bias_init(fan_in: int):
    """torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _tuple(v, n: int) -> tuple[int, ...]:
    if isinstance(v, Sequence):
        assert len(v) == n
        return tuple(v)
    return (v,) * n


class BatchNorm(nn.Module):
    """Torch-semantics batch norm over the trailing channel axis.

    Running stats live in the 'batch_stats' collection as ``mean``/``var``
    (plus torch's eval/update split described in the module docstring).
    """

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis: int = -1  # channel axis (e.g. 2 for the [B, H, C, W] cf trunk)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )

        ax = self.axis % x.ndim
        reduce_axes = tuple(i for i in range(x.ndim) if i != ax)
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            # SyncBatchNorm (reference train.py:363) is implicit: x is a
            # GLOBAL array under single-controller jit, so these batch-axis
            # means already reduce across every data-parallel replica —
            # GSPMD inserts the cross-device collectives.
            n = float(np.prod([x.shape[a] for a in reduce_axes]))
            var = mean_sq - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        bshape = [1] * x.ndim
        bshape[ax] = self.features
        inv = (lax.rsqrt(var + self.epsilon) * scale).reshape(bshape)
        y = (x.astype(jnp.float32) - mean.reshape(bshape)) * inv + bias.reshape(
            bshape
        )
        return y.astype(x.dtype)


class ConvND(nn.Module):
    """N-dim convolution with torch-style explicit padding. Kernel: (*S, I, O)."""

    features: int
    kernel_size: Sequence[int] | int
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 0
    use_bias: bool = True
    ndim: int = 2
    kernel_init: nn.initializers.Initializer = torch_kernel_init
    bias_init: nn.initializers.Initializer | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = self.ndim
        ks = _tuple(self.kernel_size, n)
        strides = _tuple(self.strides, n)
        pads = _tuple(self.padding, n)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (*ks, in_ch, self.features)
        )
        dn = lax.conv_dimension_numbers(
            x.shape,
            kernel.shape,
            (
                ("NHWC", "HWIO", "NHWC")
                if n == 2
                else ("NDHWC", "DHWIO", "NDHWC")
            ),
        )
        y = lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=strides,
            padding=[(p, p) for p in pads],
            dimension_numbers=dn,
        )
        if self.use_bias:
            fan_in = in_ch * int(np.prod(ks))
            init = self.bias_init or torch_bias_init(fan_in)
            b = self.param("bias", init, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class DeconvND(nn.Module):
    """Transposed convolution == conv over the input dilated by ``strides``.

    Kernel stored as (*S, I, O) where the torch ``ConvTranspose`` weight
    [I, O, *S] converts via spatial flip + transpose. Output size matches
    torch: (H-1)*s - 2p + k + output_padding.
    """

    features: int
    kernel_size: Sequence[int] | int
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 0
    output_padding: Sequence[int] | int = 0
    use_bias: bool = True
    ndim: int = 2
    kernel_init: nn.initializers.Initializer = torch_kernel_init

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = self.ndim
        ks = _tuple(self.kernel_size, n)
        strides = _tuple(self.strides, n)
        pads = _tuple(self.padding, n)
        opads = _tuple(self.output_padding, n)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (*ks, in_ch, self.features)
        )
        dn = lax.conv_dimension_numbers(
            x.shape,
            kernel.shape,
            (
                ("NHWC", "HWIO", "NHWC")
                if n == 2
                else ("NDHWC", "DHWIO", "NDHWC")
            ),
        )
        pad_cfg = [
            (k - 1 - p, k - 1 - p + op) for k, p, op in zip(ks, pads, opads)
        ]
        y = lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1,) * n,
            padding=pad_cfg,
            lhs_dilation=strides,
            dimension_numbers=dn,
        )
        if self.use_bias:
            # torch ConvTranspose bias fan_in = out_channels * prod(ks) / groups
            # ... actually uses weight.size(1) * prod(ks) = out_ch * prod(ks).
            fan_in = self.features * int(np.prod(ks))
            b = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + b.astype(y.dtype)
        return y


class ConvBnReLU(nn.Module):
    """conv → BN → ReLU block (reference models/module.py:24-231).

    ``bn=False`` enables the conv bias (matching the reference's
    ``bias=(not bn)``); ``relu=False`` drops the activation.
    """

    features: int
    kernel_size: Sequence[int] | int = 3
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 1
    relu: bool = True
    bn: bool = True
    bn_momentum: float = 0.1
    ndim: int = 2
    transpose: bool = False
    output_padding: Sequence[int] | int = 0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.transpose:
            x = DeconvND(
                self.features,
                self.kernel_size,
                strides=self.strides,
                padding=self.padding,
                output_padding=self.output_padding,
                use_bias=not self.bn,
                ndim=self.ndim,
                name="conv",
            )(x)
        else:
            x = ConvND(
                self.features,
                self.kernel_size,
                strides=self.strides,
                padding=self.padding,
                use_bias=not self.bn,
                ndim=self.ndim,
                name="conv",
            )(x)
        if self.bn:
            x = BatchNorm(
                self.features,
                momentum=self.bn_momentum,
                name="bn",
            )(x, train)
        if self.relu:
            x = nn.relu(x)
        return x


class Linear(nn.Module):
    """Dense layer with torch-default or xavier init. Kernel: [in, out]."""

    features: int
    kernel_init: nn.initializers.Initializer = torch_kernel_init
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_ch, self.features))
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", torch_bias_init(in_ch), (self.features,))
            y = y + b.astype(y.dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm with torch eps=1e-5 (flax default is 1e-6)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype)
