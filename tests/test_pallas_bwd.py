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
import pytest
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
        # W=128 (was 256; 159 s on the 2-core host): C=32/C_out=16
        # coverage lives here, wide-W windowed coverage in the
        # slow-tier W=384 case.
        x, dy, dx, mask, w, b = make_inputs(
            B=1, H=16, W=128, C=32, C_out=16, off_scale=0.0
        )
        dy = jnp.round(smooth_offsets(1, 16, 128, 9, 1.5, seed=3) * 8) / 8
        dx = jnp.round(smooth_offsets(1, 16, 128, 9, 1.5, seed=4) * 8) / 8
        g, g_ref = _dcn_grads(
            x, dy, dx, mask, w, b,
            functools.partial(deform_conv2d_bwd, interpret=True),
        )
        names = ["dx_in", "d_dy", "d_dx", "d_mask", "d_weight", "d_bias"]
        for gi, gr, name in zip(g, g_ref, names):
            _assert_close(gi, gr, name)


def _lane_keep_mask(W, excl_mod):
    """Boolean [W] keep-mask excluding columns whose (x mod 128) is in
    excl_mod — the chunk-boundary lanes where the 128-aligned x-window
    truncation legitimately drops the +1 tap (see dcn_bwd.py docstring)."""
    cols = np.arange(W)
    return ~np.isin(cols % 128, list(excl_mod))


def _assert_close_cols(got, want, name, keep, atol_frac=2.5e-2,
                       med_frac=5e-3):
    """_assert_close over a W-axis (axis 2) column subset."""
    got = np.asarray(got, np.float32)[:, :, keep]
    want = np.asarray(want, np.float32)[:, :, keep]
    scale = max(np.abs(want).max(), 1e-6)
    np.testing.assert_allclose(
        got / scale, want / scale, rtol=0, atol=atol_frac, err_msg=name
    )
    assert np.median(np.abs(got - want)) < med_frac * scale, name
    assert np.abs(got).max() > 0, f"{name} grad is identically zero"


class TestWindowedBranches:
    """W > XW cases: the production shapes (512x640, 864x1152) run through
    the windowed (XW_ != W) and double-buffered DMA branches that the
    narrow suite shapes never enter (DCN XW=256 -> needs W>256; warp
    XW=384 -> needs W>384). These pin those branches against XLA."""

    def test_warp_wsum_windowed_w512(self):
        # Translation-only geometry: px = x + tx/d shifts every lane by the
        # same sub-pixel amount, so the 384-wide window always covers every
        # tap — full-lane parity with no truncation exclusions, while the
        # kernel runs the windowed + double-buffered branch (W=512 > 384).
        src, ref, sp, rp, dv, vw = wsum_inputs(B=1, S=2, H=16, W=512, C=8, D=1)
        sp = np.asarray(sp).copy()
        for s in range(2):
            sp[:, s, 0, 3] = 150.0 + 80.0 * s  # px shift ~0.17-0.54 px
            sp[:, s, 1, 3] = -90.0 + 60.0 * s
        sp = jnp.asarray(sp)
        S = src.shape[1]
        kern = functools.partial(warp_correlate_wsum_onehot, interpret=True)
        f = warp_correlate_wsum_with_vjp(
            kern,
            pallas_bwd=functools.partial(
                warp_correlate_wsum_bwd, interpret=True
            ),
        )
        out_k = kern(src, ref, sp, rp, dv, vw)

        def xla_ref(s, r, w):
            sim = jnp.stack(
                [warp_xla(s[:, i], r, sp[:, i], rp, dv) for i in range(S)],
                axis=1,
            )
            return jnp.sum(sim * w[:, :, None], axis=1)

        out_x = xla_ref(src, ref, vw)
        scale = float(jnp.abs(out_x).max())
        np.testing.assert_allclose(
            np.asarray(out_k) / scale, np.asarray(out_x) / scale,
            rtol=0, atol=3e-2,
        )

        g = jax.grad(
            lambda s, r, w: jnp.sum(f(s, r, sp, rp, dv, w) ** 2),
            argnums=(0, 1, 2),
        )(src, ref, vw)
        _, vjp_fn = jax.vjp(xla_ref, src, ref, vw)
        g_ref = vjp_fn((2.0 * out_k).astype(src.dtype))
        for gi, gr, name in zip(g, g_ref, ["dsrc", "dref", "dvw"]):
            _assert_close(gi, gr, name)

    @pytest.mark.slow
    def test_dcn_windowed_w384(self):
        # W=384 > XW=256: windowed branch. Slow-tiered (199 s on the
        # 2-core host): the fast suite keeps the 1-s forward twin
        # (test_pallas_onehot) plus the warp windowed fwd+bwd case below;
        # this full five-gradient parity runs in the full suite. Comparisons exclude the
        # chunk-boundary lanes where the snapped x-window drops the
        # +1 tap (output lanes x%128 in {125,126,127}; the scatter
        # targets of those taps, input columns x%128 in {0,1,2}) —
        # the documented truncation contract, not a bug.
        W = 384
        x, dy, dx, mask, w, b = make_inputs(
            B=1, H=16, W=W, C=8, C_out=8, off_scale=0.0
        )
        dy = jnp.round(smooth_offsets(1, 16, W, 9, 1.0, seed=5) * 8) / 8
        dx = jnp.round(smooth_offsets(1, 16, W, 9, 1.0, seed=6) * 8) / 8
        g, g_ref = _dcn_grads(
            x, dy, dx, mask, w, b,
            functools.partial(deform_conv2d_bwd, interpret=True),
        )
        keep_out = _lane_keep_mask(W, (125, 126, 127))
        keep_in = _lane_keep_mask(W, (0, 1, 2))
        _assert_close_cols(g[0], g_ref[0], "dx_in", keep_in)
        for i, name in [(1, "d_dy"), (2, "d_dx"), (3, "d_mask")]:
            _assert_close_cols(g[i], g_ref[i], name, keep_out)
        # d_weight/d_bias sum over all positions; the few truncated taps
        # perturb them by <= ~3/128 of magnitude -> looser tolerance.
        _assert_close(g[4], g_ref[4], "d_weight", atol_frac=4e-2)
        _assert_close(g[5], g_ref[5], "d_bias", atol_frac=4e-2)


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
            if name == "dx":
                # The backward's channels-first offset recompute rounds
                # bf16 slightly differently than the XLA reference conv;
                # where an offset sits on an integer boundary the floor()
                # flips and isolated pixels route their gradient through
                # different taps (same phenomenon as the fused-forward
                # test) — compare by close-fraction.
                ga = np.asarray(gi, np.float32)
                gb = np.asarray(gr, np.float32)
                scale = max(np.abs(gb).max(), 1e-6)
                close = np.isclose(ga / scale, gb / scale, rtol=0, atol=4e-2)
                assert close.mean() > 0.995, close.mean()
                assert np.median(np.abs(ga - gb)) < 1e-2 * scale
            else:
                _assert_close(gi, gr, name, atol_frac=4e-2, med_frac=1e-2)

    def test_fused_io_cf_grads_match_nhwc(self):
        """The channels-first I/O fused path (io_cf: x/out/g in
        [B, H, C, W]) is the same kernels behind transposed wrappers —
        every gradient must match the NHWC path up to reduction order."""
        from transmvsnet_tpu.ops.pallas.dcn_onehot import (
            deform_conv2d_onehot_fused,
        )
        from transmvsnet_tpu.ops.pallas.vjp import (
            deform_conv2d_fused_with_vjp,
        )

        rng = np.random.RandomState(13)
        B, H, W, C, C_out = 1, 16, 128, 8, 8
        x = smooth_offsets(B, H, W, C, amplitude=1.0, seed=14)
        k_off = jnp.round(
            jnp.asarray(rng.randn(3, 3, C, 27).astype(np.float32)) * 8
        ) / 128
        b_off = jnp.round(
            jnp.asarray(rng.randn(27).astype(np.float32)) * 8
        ) / 16
        w = jnp.asarray(rng.randn(9, C, C_out).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(C_out).astype(np.float32) * 0.1)

        def make(io_cf):
            return deform_conv2d_fused_with_vjp(
                functools.partial(
                    deform_conv2d_onehot_fused, interpret=True, io_cf=io_cf
                ),
                pallas_bwd=functools.partial(
                    deform_conv2d_bwd, interpret=True, io_cf=io_cf
                ),
                io_cf=io_cf,
            )

        out_n = make(False)(x, k_off, b_off, w, b)
        out_c = make(True)(x.transpose(0, 1, 3, 2), k_off, b_off, w, b)
        np.testing.assert_allclose(
            np.asarray(out_c.transpose(0, 1, 3, 2), np.float32),
            np.asarray(out_n, np.float32),
            rtol=0, atol=0,
        )

        g_n = jax.grad(
            lambda *a: jnp.sum(make(False)(*a).astype(jnp.float32) ** 2),
            argnums=tuple(range(5)),
        )(x, k_off, b_off, w, b)
        g_c = jax.grad(
            lambda *a: jnp.sum(make(True)(*a).astype(jnp.float32) ** 2),
            argnums=tuple(range(5)),
        )(x.transpose(0, 1, 3, 2), k_off, b_off, w, b)
        names = ["dx", "dk_off", "db_off", "dw", "db"]
        for i, (gn, gc, name) in enumerate(zip(g_n, g_c, names)):
            gc = gc.transpose(0, 1, 3, 2) if name == "dx" else gc
            ga, gb = np.asarray(gc, np.float32), np.asarray(gn, np.float32)
            scale = max(np.abs(gb).max(), 1e-6)
            np.testing.assert_allclose(
                ga / scale, gb / scale, rtol=0, atol=1e-5, err_msg=name
            )


class TestARFHeadCFTrunk:
    def test_cf_trunk_matches_nhwc_trunk(self):
        """ARFHead with the channels-first trunk == the per-layer NHWC
        interface, forward and parameter gradients (same params tree)."""
        from transmvsnet_tpu.models.feature_net import ARFHead

        rng = np.random.RandomState(3)
        x = jnp.asarray(
            rng.randn(1, 16, 128, 8).astype(np.float32) * 0.5
        ).astype(jnp.bfloat16)

        def build(cf_trunk):
            return ARFHead(
                8, 8, use_pallas=True, pallas_interpret=True,
                cf_trunk=cf_trunk,
            )

        head_cf, head_nhwc = build(True), build(False)
        variables = head_nhwc.init(jax.random.PRNGKey(0), x, False)
        out_n = head_nhwc.apply(variables, x, False)
        out_c = head_cf.apply(variables, x, False)
        np.testing.assert_allclose(
            np.asarray(out_c, np.float32),
            np.asarray(out_n, np.float32),
            rtol=0, atol=1e-6,
        )

        def loss(head):
            def f(p):
                return jnp.sum(
                    head.apply(
                        {**variables, "params": p}, x, False
                    ).astype(jnp.float32)
                    ** 2
                )

            return f

        g_n = jax.grad(loss(head_nhwc))(variables["params"])
        g_c = jax.grad(loss(head_cf))(variables["params"])
        flat_n = jax.tree_util.tree_leaves_with_path(g_n)
        flat_c = jax.tree_util.tree_leaves_with_path(g_c)
        for (pn, ln), (pc, lc) in zip(flat_n, flat_c):
            assert pn == pc
            a, b = np.asarray(lc, np.float32), np.asarray(ln, np.float32)
            scale = max(np.abs(b).max(), 1e-6)
            np.testing.assert_allclose(
                a / scale, b / scale, rtol=0, atol=1e-4,
                err_msg=jax.tree_util.keystr(pn),
            )
