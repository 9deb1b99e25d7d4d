"""Feature pyramid with deformable-conv output heads (ARF).

Re-implements the behavior of the reference FeatureNet
(reference models/module.py:343-422): a 3-level conv pyramid (8→16→32
channels, two stride-2 levels), an FPN top-down pathway with 1x1 lateral
adds, and per-stage output heads of three modulated deformable convolutions
each ("adaptive receptive field", reference models/dcn.py). Channel-last.

Outputs: stage1 [B, H/4, W/4, 32], stage2 [B, H/2, W/2, 16],
stage3 [B, H, W, 8] for base_channels=8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from transmvsnet_tpu.models.blocks import (
    BatchNorm,
    ConvBnReLU,
    ConvND,
    torch_bias_init,
    torch_kernel_init,
)
from transmvsnet_tpu.ops.dcn import deform_conv2d
from transmvsnet_tpu.ops.sampling import upsample_nearest_2x


def _pallas_mode(use_pallas: bool, pallas_interpret: bool):
    """Resolve the kernel dispatch mode: None (XLA), False (compiled
    Pallas on TPU), or True (interpret-mode Pallas on CPU)."""
    if use_pallas:
        if jax.default_backend() == "tpu":
            return False
        if pallas_interpret:
            return True
    return None


def _fused_active(use_pallas: bool, pallas_interpret: bool, dtype) -> bool:
    """Whether the conv-fused bf16 DCN kernel path will be taken (the
    predicate DCN uses for its default 3/1/1 geometry). ARFHead mirrors
    this to decide when the trunk can stay channels-first."""
    return _pallas_mode(use_pallas, pallas_interpret) is not None and (
        dtype == jnp.bfloat16
    )


class _RawConvParams(nn.Module):
    """Declares a ConvND-compatible (kernel, bias) parameter pair without
    running the conv — the conv-fused DCN kernel consumes the raw arrays.
    Param tree matches ConvND exactly, so checkpoints/converted weights are
    interchangeable between the fused and composed paths."""

    kernel_shape: tuple
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.zeros, self.kernel_shape)
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class DCN(nn.Module):
    """Modulated deformable conv layer (DCNv2 with learned offset+mask).

    The offset/mask conv is zero-initialized (reference models/dcn.py:62-64)
    so the layer starts as a plain conv. Offset channels follow torchvision's
    interleaved (Δy, Δx) layout derived from the reference's chunk+cat
    (reference models/dcn.py:67-70): the first half of the concatenated
    offset channels land at even interleaved positions, the second at odd.

    On the bf16 Pallas path the offset conv is computed INSIDE the DCN
    kernel (dcn_onehot.deform_conv2d_onehot_fused): XLA's channel-minor
    relayouts made the 27-channel offset prelude cost ~2x the conv itself
    (~17 ms/layer at eval res — PERFORMANCE.md round 4).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    deformable_groups: int = 1
    use_pallas: bool = False
    pallas_interpret: bool = False
    io_cf: bool = False  # x/out in [B, H, C, W]; requires the fused path

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.deformable_groups == 1
        K = self.kernel_size * self.kernel_size
        in_ch = x.shape[2] if self.io_cf else x.shape[-1]

        interp = _pallas_mode(self.use_pallas, self.pallas_interpret)

        fused = (
            interp is not None
            and x.dtype == jnp.bfloat16
            and self.kernel_size == 3
            and self.stride == 1
            and self.padding == 1
        )
        assert fused or not self.io_cf, (
            "io_cf requires the conv-fused bf16 Pallas path"
        )
        if fused:
            import functools

            from transmvsnet_tpu.ops.pallas.dcn_bwd import deform_conv2d_bwd
            from transmvsnet_tpu.ops.pallas.dcn_onehot import (
                deform_conv2d_onehot_fused,
            )
            from transmvsnet_tpu.ops.pallas.vjp import (
                deform_conv2d_fused_with_vjp,
            )

            k_off, b_off = _RawConvParams(
                (self.kernel_size, self.kernel_size, in_ch, 3 * K),
                3 * K,
                name="conv_offset_mask",
            )()
            weight = self.param(
                "weight", torch_kernel_init, (K, in_ch, self.features)
            )
            bias = self.param(
                "bias", torch_bias_init(in_ch * K), (self.features,)
            )
            fn = deform_conv2d_fused_with_vjp(
                functools.partial(
                    deform_conv2d_onehot_fused,
                    interpret=interp,
                    io_cf=self.io_cf,
                ),
                pallas_bwd=functools.partial(
                    deform_conv2d_bwd, interpret=interp, io_cf=self.io_cf
                ),
                io_cf=self.io_cf,
            )
            return fn(x, k_off, b_off, weight, bias)

        off = ConvND(
            3 * K,
            self.kernel_size,
            strides=self.stride,
            padding=self.padding,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv_offset_mask",
        )(x)
        o1, o2, m = jnp.split(off, 3, axis=-1)
        # The reference concatenates the two offset halves and torchvision
        # reads interleaved (Δy_k, Δx_k) = (offset[2k], offset[2k+1])
        # (reference models/dcn.py:67-70) — so Δy/Δx channels straddle the
        # o1/o2 boundary; replicate that exact channel mapping.
        cat = jnp.concatenate([o1, o2], axis=-1)  # [.., 2K]
        dy = cat[..., 0::2]
        dx = cat[..., 1::2]
        mask = jax.nn.sigmoid(m)

        weight = self.param(
            "weight", torch_kernel_init, (K, in_ch, self.features)
        )
        bias = self.param(
            "bias", torch_bias_init(in_ch * K), (self.features,)
        )
        if interp is not None:
            import functools

            from transmvsnet_tpu.ops.pallas.vjp import deform_conv2d_with_vjp

            pallas_bwd = None
            if x.dtype == jnp.bfloat16:
                # bf16 activations: one-hot MXU kernel (bf16 data path,
                # ~2x the gather kernel; see ops/pallas/dcn_onehot.py),
                # paired with the native Pallas backward (dcn_bwd.py) so
                # training never touches XLA's gather/scatter path.
                from transmvsnet_tpu.ops.pallas.dcn_bwd import (
                    deform_conv2d_bwd,
                )
                from transmvsnet_tpu.ops.pallas.dcn_onehot import (
                    deform_conv2d_onehot as dcn_kernel,
                )

                if self.stride == 1 and self.padding == 1:
                    pallas_bwd = functools.partial(
                        deform_conv2d_bwd, interpret=interp
                    )
            else:
                from transmvsnet_tpu.ops.pallas.dcn_rowsweep import (
                    deform_conv2d_rowsweep as dcn_kernel,
                )

            deform_conv2d_pallas = deform_conv2d_with_vjp(
                functools.partial(
                    lambda x_, dy_, dx_, m_, w_, b_, k, it: k(
                        x_, dy_, dx_, m_, w_, b_,
                        stride=self.stride, padding=self.padding,
                        interpret=it,
                    ),
                    k=dcn_kernel,
                    it=interp,
                ),
                stride=self.stride,
                padding=self.padding,
                pallas_bwd=pallas_bwd,
            )
            return deform_conv2d_pallas(x, dy, dx, mask, weight, bias)
        return deform_conv2d(
            x,
            dy,
            dx,
            mask,
            weight,
            bias,
            stride=self.stride,
            padding=self.padding,
        )


class ARFHead(nn.Module):
    """Output head: lead conv + [DCN, BN, ReLU] x2 + final DCN.

    On the conv-fused bf16 Pallas path the trunk runs channels-first
    ([B, H, C, W] — the DCN kernels' native layout) across all three DCN
    layers: one lane-axis transpose in, one out, instead of one per kernel
    boundary. BatchNorm/ReLU are layout-agnostic; the parameter tree is
    identical, so checkpoints are unaffected (``cf_trunk=False`` restores
    the per-layer NHWC interface — kept for A/B and fallback).
    """

    mid_features: int
    out_features: int
    lead_kernel: int = 3  # 1 for the stage-1 head (reference module.py:363)
    use_pallas: bool = False
    pallas_interpret: bool = False
    cf_trunk: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = (self.lead_kernel - 1) // 2
        x = ConvBnReLU(
            self.mid_features,
            kernel_size=self.lead_kernel,
            padding=pad,
            name="lead",
        )(x, train)
        cf = self.cf_trunk and _fused_active(
            self.use_pallas, self.pallas_interpret, x.dtype
        )
        if cf:
            x = x.transpose(0, 1, 3, 2)  # [B, H, C, W]
        bn_axis = 2 if cf else -1

        def dcn(feat, features, name):
            return DCN(
                features,
                use_pallas=self.use_pallas,
                pallas_interpret=self.pallas_interpret,
                io_cf=cf,
                name=name,
            )(feat)

        x = dcn(x, self.mid_features, "dcn0")
        x = BatchNorm(self.mid_features, axis=bn_axis, name="bn0")(x, train)
        x = nn.relu(x)
        x = dcn(x, self.mid_features, "dcn1")
        x = BatchNorm(self.mid_features, axis=bn_axis, name="bn1")(x, train)
        x = nn.relu(x)
        x = dcn(x, self.out_features, "dcn2")
        if cf:
            x = x.transpose(0, 1, 3, 2)  # back to [B, H, W, C]
        return x


class FeatureNet(nn.Module):
    base_channels: int = 8
    use_pallas: bool = False
    pallas_interpret: bool = False
    cf_trunk: bool = True  # channels-first ARF trunks on the fused path

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> dict[str, jax.Array]:
        bc = self.base_channels

        def seq(feats, specs, name):
            for i, (features, k, s, p) in enumerate(specs):
                feats = ConvBnReLU(
                    features,
                    kernel_size=k,
                    strides=s,
                    padding=p,
                    name=f"{name}_{i}",
                )(feats, train)
            return feats

        conv0 = seq(x, [(bc, 3, 1, 1), (bc, 3, 1, 1)], "conv0")
        conv1 = seq(
            conv0, [(bc * 2, 5, 2, 2), (bc * 2, 3, 1, 1), (bc * 2, 3, 1, 1)], "conv1"
        )
        conv2 = seq(
            conv1, [(bc * 4, 5, 2, 2), (bc * 4, 3, 1, 1), (bc * 4, 3, 1, 1)], "conv2"
        )

        out = {}
        intra = conv2
        out["stage1"] = ARFHead(
            bc * 4, bc * 4, lead_kernel=1,
            use_pallas=self.use_pallas, pallas_interpret=self.pallas_interpret,
            cf_trunk=self.cf_trunk, name="out1"
        )(intra, train)

        intra = upsample_nearest_2x(intra) + ConvND(
            bc * 4, 1, name="inner1"
        )(conv1)
        out["stage2"] = ARFHead(
            bc * 4, bc * 2, use_pallas=self.use_pallas,
            pallas_interpret=self.pallas_interpret, cf_trunk=self.cf_trunk,
            name="out2"
        )(intra, train)

        intra = upsample_nearest_2x(intra) + ConvND(
            bc * 4, 1, name="inner2"
        )(conv0)
        out["stage3"] = ARFHead(
            bc * 4, bc, use_pallas=self.use_pallas,
            pallas_interpret=self.pallas_interpret, cf_trunk=self.cf_trunk,
            name="out3"
        )(intra, train)
        return out
