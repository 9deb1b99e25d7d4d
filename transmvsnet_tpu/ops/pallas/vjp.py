"""Custom VJPs for the Pallas kernels.

The Pallas TPU kernels (warp-correlation, DCNv2) come in two
differentiability flavors selected by ``pallas_bwd``:

- **Native Pallas backward** (default in the model): the backward is a
  Pallas kernel too (ops/pallas/warp_bwd.py, ops/pallas/dcn_bwd.py) —
  every gradient an MXU matmul, no XLA gather/scatter anywhere in the
  train step. This is what makes training at the recipe resolution fit
  in HBM and run at kernel speed (PERFORMANCE.md "Training performance").
- **XLA-recompute backward** (``pallas_bwd=None``): linearizes the XLA
  reference implementation (ops/warp.py, ops/dcn.py — which match the
  PyTorch reference per tests/test_parity.py) at the saved inputs. Kept
  for the f32 rowsweep path and as the semantic oracle in tests.

Gradient semantics in both flavors:

- warp-correlation: grads flow to src/ref features only; the sample grid
  is built under no-grad (reference models/module.py:294-316), so the
  projection matrices and depth hypotheses get symbolic zeros.
- DCNv2: grads flow to input, offsets, mask, weight, and bias exactly as
  torchvision's deform_conv2d (reference models/dcn.py:66-80).

The forward values come from the kernel (bf16 data path); the backward is
evaluated around the same inputs — the usual mixed-precision practice of
a slightly-different forward realization with a consistent gradient.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def warp_correlate_with_vjp(
    pallas_fwd: Callable, pallas_bwd: Callable | None = None
) -> Callable:
    """Differentiable wrapper for a warp-correlate kernel.

    ``pallas_fwd(src, ref, src_proj, ref_proj, depth_values) -> sim``;
    ``pallas_bwd(src, ref, src_proj, ref_proj, depth_values, g)
    -> (dsrc, dref)`` or None for the XLA-recompute backward.
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
        if pallas_bwd is not None:
            dsrc, dref = pallas_bwd(
                src, ref, src_proj, ref_proj, depth_values, g
            )
            dsrc = dsrc.astype(src.dtype)
            dref = dref.astype(ref.dtype)
        else:
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


def warp_correlate_wsum_with_vjp(
    pallas_fwd: Callable, pallas_bwd: Callable | None = None
) -> Callable:
    """Differentiable wrapper for the view-accumulating warp kernel.

    ``pallas_fwd(src_feas, ref, src_projs, ref_proj, depth_values,
    view_weights) -> [B, D, H, W]`` (the Σ_s w_s·sim_s form);
    ``pallas_bwd(...same..., g) -> (dsrc, dref, dvw)`` or None for the
    XLA-recompute backward.
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
        if pallas_bwd is not None:
            dsrc, dref, dvw = pallas_bwd(
                src_feas, ref, src_projs, ref_proj, depth_values, vw, g
            )
            dsrc = dsrc.astype(src_feas.dtype)
            dref = dref.astype(ref.dtype)
        else:
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
    pallas_bwd: Callable | None = None,
) -> Callable:
    """Differentiable wrapper for a DCNv2 kernel.

    ``pallas_fwd(x, dy, dx, mask, weight, bias) -> y``. The geometry
    (stride/padding/dilation) must match what ``pallas_fwd`` implements —
    it parameterizes the backward. ``pallas_bwd(x, dy, dx, mask, weight,
    g) -> (dx_in, ddy, ddx, dm, dw)`` or None for the XLA linearization.
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
        if pallas_bwd is not None:
            dx_in, ddy, ddx, dm, dw = pallas_bwd(x, dy, dx, mask, weight, g)
            dbias = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
            return (
                dx_in.astype(x.dtype),
                ddy.astype(dy.dtype),
                ddx.astype(dx.dtype),
                dm.astype(mask.dtype),
                dw.astype(weight.dtype),
                dbias.astype(bias.dtype),
            )
        _, vjp_fn = jax.vjp(
            lambda *a: dcn_xla(
                *a, stride=stride, padding=padding, dilation=dilation
            ),
            x, dy, dx, mask, weight, bias,
        )
        return vjp_fn(g.astype(x.dtype))

    f.defvjp(fwd, bwd)
    return f


def _offset_conv(x, k_off, b_off):
    """The DCN offset/mask conv (reference models/dcn.py:55-64), NHWC."""
    return (
        jax.lax.conv_general_dilated(
            x,
            k_off.astype(x.dtype),
            (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b_off.astype(x.dtype)
    )


def split_offsets(off):
    """Interleaved torch offset layout → (dy, dx, mask), each [..., K]
    (reference models/dcn.py:67-70; channels [o1|o2] read as pairs)."""
    K = off.shape[-1] // 3
    o1, o2, m = jnp.split(off, 3, axis=-1)
    cat = jnp.concatenate([o1, o2], axis=-1)
    return cat[..., 0::2], cat[..., 1::2], jax.nn.sigmoid(m)


def _offset_conv_cf(x, k_off, b_off, x_cf: bool = False):
    """The offset/mask conv as ONE channels-first matmul, off [B, 3K, H, W].

    Channel c equals NHWC channel c of ``_offset_conv`` — same math — but
    expressed as a [3K, 9C] @ [9C, B·H·W] matmul over a channels-first
    im2col of x. One matmul, not nine: profiled on-chip, per-tap dots each
    re-write the [3K, B·H·W] f32 accumulator (8 × ~350 MB of HBM traffic,
    0.64 ms apiece); the packed contraction touches the accumulator once.
    Its autodiff is transposed matmuls of the same shapes, so the
    fused-DCN backward avoids XLA's transposed-layout conv backward and
    the lane-axis interleave/split relayouts (the forward conv runs
    inside the Pallas kernel; this path exists for the backward recompute
    only — see deform_conv2d_fused_with_vjp).
    """
    if x_cf:
        B, H, C, W = x.shape
        xt = x.transpose(2, 0, 1, 3).astype(jnp.bfloat16)  # [C, B, H, W]
    else:
        B, H, W, C = x.shape
        xt = x.transpose(3, 0, 1, 2).astype(jnp.bfloat16)  # [C, B, H, W]
    KK = k_off.shape[-1]  # 3K
    xp = jnp.pad(xt, ((0, 0), (0, 0), (1, 1), (1, 1)))
    if C <= 8:
        # Packed single contraction (measured best at C=8: the 9C=72-row
        # im2col is cheap and the f32 accumulator is touched once).
        cols = jnp.concatenate(
            [
                jax.lax.slice(xp, (0, 0, i, j), (C, B, i + H, j + W))
                for i in range(3)
                for j in range(3)
            ],
            axis=0,
        ).reshape(9 * C, B * H * W)
        # Tap-major rows matching the im2col stack order (dy outer, dx
        # inner).
        wt = (
            k_off.transpose(3, 0, 1, 2)
            .reshape(KK, 9 * C)
            .astype(jnp.bfloat16)
        )
        off = jnp.dot(wt, cols, preferred_element_type=jnp.float32)
    else:
        # Per-tap dots (measured best at C=16/32, where the 9C-row im2col
        # materialization outweighs the repeated accumulator updates).
        off = None
        for i in range(3):
            for j in range(3):
                sl = jax.lax.slice(
                    xp, (0, 0, i, j), (C, B, i + H, j + W)
                ).reshape(C, B * H * W)
                wt = k_off[i, j].transpose(1, 0).astype(jnp.bfloat16)
                part = jnp.dot(wt, sl, preferred_element_type=jnp.float32)
                off = part if off is None else off + part
    off = off.reshape(KK, B, H, W).transpose(1, 0, 2, 3)
    return off + b_off.astype(jnp.float32)[None, :, None, None]


def deform_conv2d_fused_with_vjp(
    pallas_fwd: Callable, pallas_bwd: Callable, io_cf: bool = False
) -> Callable:
    """Differentiable wrapper for the conv-fused DCNv2 kernel.

    ``pallas_fwd(x, k_off, b_off, weight, bias) -> y`` computes the
    offset/mask conv inside the kernel (dcn_onehot.deform_conv2d_onehot_fused,
    stride=dilation=1, pad=1). The backward recomputes the offsets with the
    XLA conv (cheap at training resolution, and its VJP gives the
    offset-conv parameter grads), routes the sampling gradients through the
    native Pallas backward (``pallas_bwd`` = dcn_bwd.deform_conv2d_bwd),
    and sums the two x-gradient paths.

    With ``io_cf`` the primal x / output (and thus g, dx) use the kernel's
    native channels-first [B, H, C, W] layout; ``pallas_fwd``/``pallas_bwd``
    must be bound with the matching ``io_cf=True``.
    """

    @jax.custom_vjp
    def f(x, k_off, b_off, weight, bias):
        return pallas_fwd(x, k_off, b_off, weight, bias)

    def fwd(x, k_off, b_off, weight, bias):
        out = pallas_fwd(x, k_off, b_off, weight, bias)
        return out, (x, k_off, b_off, weight, bias)

    def bwd(res, g):
        x, k_off, b_off, weight, bias = res
        # Channels-first offset recompute + VJP: the interleaved channel
        # split becomes leading-axis row slices ([B, 3K, H, W]; dy_k =
        # channel 2k, dx_k = 2k+1, mask_k = sigmoid(2K + k) — same
        # mapping as split_offsets), and the offsets feed the Pallas
        # backward in its native [B, K, H, W] layout.
        off, conv_vjp = jax.vjp(
            lambda x_, k_, b_: _offset_conv_cf(x_, k_, b_, x_cf=io_cf),
            x, k_off, b_off,
        )
        K = off.shape[1] // 3
        dy = off[:, 0 : 2 * K : 2]
        dx = off[:, 1 : 2 * K : 2]
        mask = jax.nn.sigmoid(off[:, 2 * K :])
        dx_s, ddy, ddx, dm, dw = pallas_bwd(
            x, dy, dx, mask, weight, g, offsets_cf=True
        )
        # d(off): interleave (ddy, ddx) back into pairs on the (small)
        # channel axis and push d(mask) through the sigmoid.
        B = ddy.shape[0]
        dcat = jnp.stack([ddy, ddx], axis=2).reshape(
            B, 2 * K, *ddy.shape[2:]
        )
        dmask_pre = dm * mask * (1.0 - mask)
        doff = jnp.concatenate([dcat, dmask_pre], axis=1).astype(off.dtype)
        dx_c, dk_off, db_off = conv_vjp(doff)
        dbias = jnp.sum(
            g.astype(jnp.float32), axis=(0, 1, 3) if io_cf else (0, 1, 2)
        )
        return (
            (dx_s + dx_c.astype(jnp.float32)).astype(x.dtype),
            dk_off.astype(k_off.dtype),
            db_off.astype(b_off.dtype),
            dw.astype(weight.dtype),
            dbias.astype(bias.dtype),
        )

    f.defvjp(fwd, bwd)
    return f
