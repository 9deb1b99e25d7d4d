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

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.deformable_groups == 1
        K = self.kernel_size * self.kernel_size
        in_ch = x.shape[-1]

        interp = None
        if self.use_pallas:
            if jax.default_backend() == "tpu":
                interp = False
            elif self.pallas_interpret:
                interp = True

        fused = (
            interp is not None
            and x.dtype == jnp.bfloat16
            and self.kernel_size == 3
            and self.stride == 1
            and self.padding == 1
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
                functools.partial(deform_conv2d_onehot_fused, interpret=interp),
                pallas_bwd=functools.partial(
                    deform_conv2d_bwd, interpret=interp
                ),
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
    """Output head: lead conv + [DCN, BN, ReLU] x2 + final DCN."""

    mid_features: int
    out_features: int
    lead_kernel: int = 3  # 1 for the stage-1 head (reference module.py:363)
    use_pallas: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = (self.lead_kernel - 1) // 2
        x = ConvBnReLU(
            self.mid_features,
            kernel_size=self.lead_kernel,
            padding=pad,
            name="lead",
        )(x, train)
        x = DCN(self.mid_features, use_pallas=self.use_pallas, pallas_interpret=self.pallas_interpret, name="dcn0")(x)
        x = BatchNorm(self.mid_features, name="bn0")(
            x, train
        )
        x = nn.relu(x)
        x = DCN(self.mid_features, use_pallas=self.use_pallas, pallas_interpret=self.pallas_interpret, name="dcn1")(x)
        x = BatchNorm(self.mid_features, name="bn1")(
            x, train
        )
        x = nn.relu(x)
        return DCN(self.out_features, use_pallas=self.use_pallas, pallas_interpret=self.pallas_interpret, name="dcn2")(x)


class FeatureNet(nn.Module):
    base_channels: int = 8
    use_pallas: bool = False
    pallas_interpret: bool = False

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
            use_pallas=self.use_pallas, pallas_interpret=self.pallas_interpret, name="out1"
        )(intra, train)

        intra = upsample_nearest_2x(intra) + ConvND(
            bc * 4, 1, name="inner1"
        )(conv1)
        out["stage2"] = ARFHead(
            bc * 4, bc * 2, use_pallas=self.use_pallas, pallas_interpret=self.pallas_interpret, name="out2"
        )(intra, train)

        intra = upsample_nearest_2x(intra) + ConvND(
            bc * 4, 1, name="inner2"
        )(conv0)
        out["stage3"] = ARFHead(
            bc * 4, bc, use_pallas=self.use_pallas, pallas_interpret=self.pallas_interpret, name="out3"
        )(intra, train)
        return out
