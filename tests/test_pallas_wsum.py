"""View-accumulating warp kernel == Σ_s w_s · per-view warp-correlation.

The fused kernel (warp_onehot.warp_correlate_wsum_onehot) revisits its
output block across an innermost source-view grid axis; these interpret-
mode tests pin it to the composition of the per-view kernel, and its VJP
wrapper to the XLA reference gradients.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.ops.pallas.vjp import warp_correlate_wsum_with_vjp
from transmvsnet_tpu.ops.pallas.warp_onehot import (
    warp_correlate_onehot,
    warp_correlate_wsum_onehot,
)
from transmvsnet_tpu.ops.warp import warp_correlate as warp_xla


def _inputs(B=1, S=3, H=16, W=128, C=8, D=4):
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(B, S, H, W, C).astype(np.float32))
    ref = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    sp = np.eye(4, dtype=np.float32)[None, None].repeat(S, 1).repeat(B, 0)
    for s in range(S):
        sp[:, s, 0, 3] = 2.0 + s
        sp[:, s, 1, 3] = -1.0 + 0.5 * s
    rp = np.eye(4, dtype=np.float32)[None].repeat(B, 0)
    dv = jnp.asarray(
        np.broadcast_to(
            np.linspace(425, 900, D, dtype=np.float32)[None, :, None, None],
            (B, D, H, W),
        ).copy()
    )
    vw = jnp.asarray(rng.rand(B, S, H, W).astype(np.float32))
    return src, ref, jnp.asarray(sp), jnp.asarray(rp), dv, vw


def test_wsum_matches_per_view_composition():
    src, ref, sp, rp, dv, vw = _inputs()
    B, S = src.shape[:2]

    fused = warp_correlate_wsum_onehot(src, ref, sp, rp, dv, vw, interpret=True)

    per_view = [
        warp_correlate_onehot(
            src[:, s], ref, sp[:, s], rp, dv, interpret=True
        )
        for s in range(S)
    ]
    ref_sum = sum(vw[:, s, None] * per_view[s] for s in range(S))
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref_sum), rtol=1e-5, atol=1e-5
    )


def test_wsum_vjp_grads_match_xla():
    src, ref, sp, rp, dv, vw = _inputs()
    S = src.shape[1]
    kern = functools.partial(warp_correlate_wsum_onehot, interpret=True)
    f = warp_correlate_wsum_with_vjp(kern)

    def loss(s, r, w):
        return jnp.sum(f(s, r, sp, rp, dv, w) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(src, ref, vw)

    out_k = kern(src, ref, sp, rp, dv, vw)

    def xla_ref(s, r, w):
        sim = jnp.stack(
            [warp_xla(s[:, i], r, sp[:, i], rp, dv) for i in range(S)], axis=1
        )
        return jnp.sum(sim * w[:, :, None], axis=1)

    _, vjp_fn = jax.vjp(xla_ref, src, ref, vw)
    g_ref = vjp_fn((2.0 * out_k).astype(src.dtype))
    for i, (gi, gr) in enumerate(zip(g, g_ref)):
        np.testing.assert_allclose(
            np.asarray(gi), np.asarray(gr), rtol=1e-4, atol=1e-5, err_msg=f"arg {i}"
        )
