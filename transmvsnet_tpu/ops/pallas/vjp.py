"""Custom VJPs for the Pallas kernels: fast forward, XLA-recompute backward.

The Pallas TPU kernels (warp-correlation, DCNv2) are forward-only; these
wrappers make them differentiable so training can use them too. The
backward pass linearizes the *XLA reference implementation* at the saved
inputs (ops/warp.py, ops/dcn.py — which match the PyTorch reference per
tests/test_parity.py), so gradients have reference semantics:

- warp-correlation: grads flow to src/ref features only; the sample grid
  is built under no-grad (reference models/module.py:294-316), so the
  projection matrices and depth hypotheses get symbolic zeros.
- DCNv2: grads flow to input, offsets, mask, weight, and bias exactly as
  torchvision's deform_conv2d (reference models/dcn.py:66-80).

The forward values come from the kernel (bf16 data path); the backward is
evaluated around the same inputs via the f32 XLA path — the usual
mixed-precision practice of a slightly-different forward realization with
a straight-through-consistent gradient.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def warp_correlate_with_vjp(pallas_fwd: Callable) -> Callable:
    """Differentiable wrapper for a warp-correlate kernel.

    ``pallas_fwd(src, ref, src_proj, ref_proj, depth_values) -> sim``.
    """
    from transmvsnet_tpu.ops.warp import warp_correlate as warp_xla

    @jax.custom_vjp
    def f(src, ref, src_proj, ref_proj, depth_values):
        return pallas_fwd(src, ref, src_proj, ref_proj, depth_values)

    def fwd(src, ref, src_proj, ref_proj, depth_values):
        out = pallas_fwd(src, ref, src_proj, ref_proj, depth_values)
        return out, (src, ref, src_proj, ref_proj, depth_values)

    def bwd(res, g):
        src, ref, src_proj, ref_proj, depth_values = res
        _, vjp_fn = jax.vjp(
            lambda s, r: warp_xla(s, r, src_proj, ref_proj, depth_values),
            src,
            ref,
        )
        dsrc, dref = vjp_fn(g.astype(src.dtype))
        return (
            dsrc,
            dref,
            jnp.zeros_like(src_proj),
            jnp.zeros_like(ref_proj),
            jnp.zeros_like(depth_values),
        )

    f.defvjp(fwd, bwd)
    return f


def warp_correlate_wsum_with_vjp(pallas_fwd: Callable) -> Callable:
    """Differentiable wrapper for the view-accumulating warp kernel.

    ``pallas_fwd(src_feas, ref, src_projs, ref_proj, depth_values,
    view_weights) -> [B, D, H, W]`` (the Σ_s w_s·sim_s form).
    """
    from transmvsnet_tpu.ops.warp import warp_correlate as warp_xla

    def xla_ref(src_feas, ref, src_projs, ref_proj, depth_values, vw):
        sim = jax.vmap(
            lambda s, p: warp_xla(s, ref, p, ref_proj, depth_values),
            in_axes=(1, 1),
            out_axes=1,
        )(src_feas, src_projs)  # [B, S, D, H, W]
        return jnp.sum(sim * vw[:, :, None], axis=1)

    @jax.custom_vjp
    def f(src_feas, ref, src_projs, ref_proj, depth_values, vw):
        return pallas_fwd(src_feas, ref, src_projs, ref_proj, depth_values, vw)

    def fwd(src_feas, ref, src_projs, ref_proj, depth_values, vw):
        out = pallas_fwd(src_feas, ref, src_projs, ref_proj, depth_values, vw)
        return out, (src_feas, ref, src_projs, ref_proj, depth_values, vw)

    def bwd(res, g):
        src_feas, ref, src_projs, ref_proj, depth_values, vw = res
        _, vjp_fn = jax.vjp(
            lambda s, r, w: xla_ref(
                s, r, src_projs, ref_proj, depth_values, w
            ),
            src_feas,
            ref,
            vw,
        )
        dsrc, dref, dvw = vjp_fn(g.astype(src_feas.dtype))
        return (
            dsrc,
            dref,
            jnp.zeros_like(src_projs),
            jnp.zeros_like(ref_proj),
            jnp.zeros_like(depth_values),
            dvw.astype(vw.dtype),
        )

    f.defvjp(fwd, bwd)
    return f


def deform_conv2d_with_vjp(
    pallas_fwd: Callable,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> Callable:
    """Differentiable wrapper for a DCNv2 kernel.

    ``pallas_fwd(x, dy, dx, mask, weight, bias) -> y``. The geometry
    (stride/padding/dilation) must match what ``pallas_fwd`` implements —
    it parameterizes the XLA backward linearization.
    """
    from transmvsnet_tpu.ops.dcn import deform_conv2d as dcn_xla

    @jax.custom_vjp
    def f(x, dy, dx, mask, weight, bias):
        return pallas_fwd(x, dy, dx, mask, weight, bias)

    def fwd(x, dy, dx, mask, weight, bias):
        out = pallas_fwd(x, dy, dx, mask, weight, bias)
        return out, (x, dy, dx, mask, weight, bias)

    def bwd(res, g):
        x, dy, dx, mask, weight, bias = res
        _, vjp_fn = jax.vjp(
            lambda *a: dcn_xla(
                *a, stride=stride, padding=padding, dilation=dilation
            ),
            x, dy, dx, mask, weight, bias,
        )
        return vjp_fn(g.astype(x.dtype))

    f.defvjp(fwd, bwd)
    return f
