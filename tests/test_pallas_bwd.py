"""Native Pallas backward kernels vs the XLA-linearization gradients.

The backward kernels recompute sampling on the bf16 one-hot data path
(warp_bwd.py, dcn_bwd.py), so comparisons against the f32 XLA gradients
use bf16-scale tolerances normalized by each gradient's magnitude.

The zero-offset DCN case is load-bearing: offsets are zero-initialized
(reference models/dcn.py:62-64), so the offset gradient at exactly
integer coordinates must follow the floor two-tap convention
(v_hi − v_lo, like torchvision) — a symmetric hat-derivative convention
would return identically zero there and offsets would never train.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pallas_inputs import make_inputs
from test_pallas_dcn_rowsweep import smooth_offsets
from test_pallas_wsum import _inputs as wsum_inputs

from transmvsnet_tpu.ops.dcn import deform_conv2d as dcn_xla
from transmvsnet_tpu.ops.pallas.dcn_bwd import deform_conv2d_bwd
from transmvsnet_tpu.ops.pallas.dcn_onehot import deform_conv2d_onehot
from transmvsnet_tpu.ops.pallas.vjp import (
    deform_conv2d_with_vjp,
    warp_correlate_with_vjp,
    warp_correlate_wsum_with_vjp,
)
from transmvsnet_tpu.ops.pallas.warp_bwd import (
    warp_correlate_bwd,
    warp_correlate_wsum_bwd,
)
from transmvsnet_tpu.ops.pallas.warp_onehot import (
    warp_correlate_onehot,
    warp_correlate_wsum_onehot,
)
from transmvsnet_tpu.ops.warp import warp_correlate as warp_xla


def _assert_close(got, want, name, atol_frac=2.5e-2, med_frac=5e-3):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = max(np.abs(want).max(), 1e-6)
    np.testing.assert_allclose(
        got / scale, want / scale, rtol=0, atol=atol_frac, err_msg=name
    )
    assert np.median(np.abs(got - want)) < med_frac * scale, name
    assert np.abs(got).max() > 0, f"{name} grad is identically zero"


class TestWarpBwd:
    def test_wsum_grads_match_xla(self):
        src, ref, sp, rp, dv, vw = wsum_inputs()
        S = src.shape[1]
        kern = functools.partial(warp_correlate_wsum_onehot, interpret=True)
        f = warp_correlate_wsum_with_vjp(
            kern,
            pallas_bwd=functools.partial(
                warp_correlate_wsum_bwd, interpret=True
            ),
        )

        def loss(s, r, w):
            return jnp.sum(f(s, r, sp, rp, dv, w) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(src, ref, vw)

        out_k = kern(src, ref, sp, rp, dv, vw)

        def xla_ref(s, r, w):
            sim = jnp.stack(
                [warp_xla(s[:, i], r, sp[:, i], rp, dv) for i in range(S)],
                axis=1,
            )
            return jnp.sum(sim * w[:, :, None], axis=1)

        _, vjp_fn = jax.vjp(xla_ref, src, ref, vw)
        g_ref = vjp_fn((2.0 * out_k).astype(src.dtype))
        for gi, gr, name in zip(g, g_ref, ["dsrc", "dref", "dvw"]):
            _assert_close(gi, gr, name)

    def test_single_view_grads_match_xla(self):
        src, ref, sp, rp, dv, _ = wsum_inputs(S=1)
        src1, sp1 = src[:, 0], sp[:, 0]
        kern = functools.partial(warp_correlate_onehot, interpret=True)
        f = warp_correlate_with_vjp(
            kern,
            pallas_bwd=functools.partial(warp_correlate_bwd, interpret=True),
        )

        def loss(s, r):
            return jnp.sum(f(s, r, sp1, rp, dv) ** 2)

        g = jax.grad(loss, argnums=(0, 1))(src1, ref)
        out_k = kern(src1, ref, sp1, rp, dv)
        _, vjp_fn = jax.vjp(
            lambda s, r: warp_xla(s, r, sp1, rp, dv), src1, ref
        )
        g_ref = vjp_fn((2.0 * out_k).astype(src1.dtype))
        for gi, gr, name in zip(g, g_ref, ["dsrc", "dref"]):
            _assert_close(gi, gr, name)

    def test_proj_and_depth_get_zero_grads(self):
        src, ref, sp, rp, dv, vw = wsum_inputs()
        f = warp_correlate_wsum_with_vjp(
            functools.partial(warp_correlate_wsum_onehot, interpret=True),
            pallas_bwd=functools.partial(
                warp_correlate_wsum_bwd, interpret=True
            ),
        )
        g = jax.grad(
            lambda a, b, c: jnp.sum(f(src, ref, a, b, c, vw) ** 2),
            argnums=(0, 1, 2),
        )(sp, rp, dv)
        for gi in g:
            assert float(jnp.abs(gi).max()) == 0.0


def _dcn_grads(x, dy, dx, mask, w, b, pallas_bwd):
    f = deform_conv2d_with_vjp(
        functools.partial(deform_conv2d_onehot, interpret=True),
        pallas_bwd=pallas_bwd,
    )
    kern = functools.partial(deform_conv2d_onehot, interpret=True)
    g = jax.grad(
        lambda *a: jnp.sum(f(*a) ** 2), argnums=tuple(range(6))
    )(x, dy, dx, mask, w, b)
    out_k = kern(x, dy, dx, mask, w, b)
    _, vjp_fn = jax.vjp(lambda *a: dcn_xla(*a), x, dy, dx, mask, w, b)
    g_ref = vjp_fn((2.0 * out_k).astype(x.dtype))
    return g, g_ref


class TestDCNBwd:
    def test_grads_match_xla_smooth_offsets(self):
        x, dy, dx, mask, w, b = make_inputs(
            B=2, H=32, W=128, C=8, C_out=8, off_scale=0.0
        )
        # Offsets in multiples of 1/8 are bf16-exact, keeping the hat
        # weights exact so the comparison isolates the gradient plumbing.
        dy = jnp.round(smooth_offsets(2, 32, 128, 9, 1.5, seed=1) * 8) / 8
        dx = jnp.round(smooth_offsets(2, 32, 128, 9, 1.5, seed=2) * 8) / 8
        g, g_ref = _dcn_grads(
            x, dy, dx, mask, w, b,
            functools.partial(deform_conv2d_bwd, interpret=True),
        )
        names = ["dx_in", "d_dy", "d_dx", "d_mask", "d_weight", "d_bias"]
        for gi, gr, name in zip(g, g_ref, names):
            _assert_close(gi, gr, name)

    def test_zero_offset_grad_convention(self):
        # Integer coordinates (zero offsets): d_offset must be the floor
        # two-tap difference (nonzero), matching torch and the XLA path.
        x, dy, dx, mask, w, b = make_inputs(
            B=1, H=16, W=128, C=8, C_out=8, off_scale=0.0
        )
        zero = jnp.zeros_like(dy)
        g, g_ref = _dcn_grads(
            x, zero, zero, mask, w, b,
            functools.partial(deform_conv2d_bwd, interpret=True),
        )
        names = ["dx_in", "d_dy", "d_dx", "d_mask", "d_weight", "d_bias"]
        for gi, gr, name in zip(g, g_ref, names):
            _assert_close(gi, gr, name)
        assert float(jnp.abs(g[1]).max()) > 0
        assert float(jnp.abs(g[2]).max()) > 0

    def test_wider_channels(self):
        x, dy, dx, mask, w, b = make_inputs(
            B=1, H=16, W=256, C=32, C_out=16, off_scale=0.0
        )
        dy = jnp.round(smooth_offsets(1, 16, 256, 9, 1.5, seed=3) * 8) / 8
        dx = jnp.round(smooth_offsets(1, 16, 256, 9, 1.5, seed=4) * 8) / 8
        g, g_ref = _dcn_grads(
            x, dy, dx, mask, w, b,
            functools.partial(deform_conv2d_bwd, interpret=True),
        )
        names = ["dx_in", "d_dy", "d_dx", "d_mask", "d_weight", "d_bias"]
        for gi, gr, name in zip(g, g_ref, names):
            _assert_close(gi, gr, name)


class TestFusedDCNVjp:
    def test_fused_grads_match_xla_composition(self):
        """The conv-fused DCN wrapper's gradients == autodiff of the XLA
        composition (offset conv -> interleave -> deform_conv2d) seeded
        with the kernel's output, for every parameter."""
        from transmvsnet_tpu.ops.pallas.dcn_onehot import (
            deform_conv2d_onehot_fused,
        )
        from transmvsnet_tpu.ops.pallas.vjp import (
            _offset_conv,
            deform_conv2d_fused_with_vjp,
            split_offsets,
        )

        rng = np.random.RandomState(11)
        B, H, W, C, C_out = 1, 16, 128, 8, 8
        # Offsets are conv outputs of x, and the kernels' window contract
        # needs them lane-locally smooth — so x must be a smooth field
        # (iid-random x makes iid offsets, which are adversarial to ANY
        # windowed kernel; learned DCN offsets are smooth).
        x = smooth_offsets(B, H, W, C, amplitude=1.0, seed=12)
        # 1/8-quantized weights keep hat weights bf16-exact (cf. TestDCNBwd).
        k_off = jnp.round(
            jnp.asarray(rng.randn(3, 3, C, 27).astype(np.float32)) * 8
        ) / 128
        b_off = jnp.round(
            jnp.asarray(rng.randn(27).astype(np.float32)) * 8
        ) / 16
        w = jnp.asarray(rng.randn(9, C, C_out).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(C_out).astype(np.float32) * 0.1)

        f = deform_conv2d_fused_with_vjp(
            functools.partial(deform_conv2d_onehot_fused, interpret=True),
            pallas_bwd=functools.partial(deform_conv2d_bwd, interpret=True),
        )
        g = jax.grad(
            lambda *a: jnp.sum(f(*a) ** 2), argnums=tuple(range(5))
        )(x, k_off, b_off, w, b)

        out_k = deform_conv2d_onehot_fused(
            x, k_off, b_off, w, b, interpret=True
        )

        def xla_ref(x_, k_, bo_, w_, b_):
            dy, dx, mask = split_offsets(_offset_conv(x_, k_, bo_))
            return dcn_xla(x_, dy, dx, mask, w_, b_)

        _, vjp_fn = jax.vjp(xla_ref, x, k_off, b_off, w, b)
        g_ref = vjp_fn((2.0 * out_k).astype(x.dtype))
        names = ["dx", "dk_off", "db_off", "dw", "db"]
        for gi, gr, name in zip(g, g_ref, names):
            _assert_close(gi, gr, name, atol_frac=4e-2, med_frac=1e-2)
