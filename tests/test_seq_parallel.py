"""Sequence-parallel FMT and sharded-vs-unsharded model equivalence.

The FMT token axis is sharded over the mesh's "depth" axis (logical name
"seq", see parallel/sharding.py): linear attention's KV/Z sums over tokens
are associative (reference models/FMT.py:29-32), so GSPMD lowers them to
partial-KV einsums + psum — exact sequence parallelism. These tests pin
that exactness on the virtual 8-device CPU mesh, and prove the full
sharded model forward matches the unsharded one (VERDICT round-1 items
5 and 6).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transmvsnet_tpu.config import MeshConfig, ModelConfig
from transmvsnet_tpu.models.fmt import FMT
from transmvsnet_tpu.models.transmvsnet import TransMVSNet
from transmvsnet_tpu.parallel.mesh import make_mesh
from transmvsnet_tpu.parallel.sharding import sharding_rules

from test_model_forward import tiny_batch


class TestSeqParallelFMT:
    @pytest.fixture(scope="class")
    def fmt_and_inputs(self):
        rng = np.random.RandomState(0)
        B, S, H, W, C = 1, 2, 8, 16, 32  # L = 128 tokens, divisible by 8
        ref = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        src = jnp.asarray(rng.randn(B, S, H, W, C).astype(np.float32))
        fmt = FMT(d_model=C, n_heads=8)
        variables = fmt.init(jax.random.PRNGKey(0), ref, src)
        return fmt, variables, ref, src

    def test_seq_sharded_matches_unsharded(self, fmt_and_inputs):
        fmt, variables, ref, src = fmt_and_inputs

        def f(ref, src):
            return fmt.apply(variables, ref, src)

        ref_out, src_out = jax.jit(f)(ref, src)
        mesh = make_mesh(MeshConfig(data=1, view=1, depth=8))
        with mesh, sharding_rules(mesh):
            ref_sh, src_sh = jax.jit(f)(ref, src)
        np.testing.assert_allclose(
            np.asarray(ref_sh), np.asarray(ref_out), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(src_sh), np.asarray(src_out), rtol=2e-5, atol=2e-5
        )

    def test_seq_and_view_sharded(self, fmt_and_inputs):
        """Tokens AND source views sharded at once (depth=4, view=2)."""
        fmt, variables, ref, src = fmt_and_inputs

        def f(ref, src):
            return fmt.apply(variables, ref, src)

        ref_out, src_out = jax.jit(f)(ref, src)
        mesh = make_mesh(MeshConfig(data=1, view=2, depth=4))
        with mesh, sharding_rules(mesh):
            ref_sh, src_sh = jax.jit(f)(ref, src)
        np.testing.assert_allclose(
            np.asarray(ref_sh), np.asarray(ref_out), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(src_sh), np.asarray(src_out), rtol=2e-5, atol=2e-5
        )


class TestShardedModelEquivalence:
    @pytest.mark.slow
    def test_full_forward_sharded_matches_unsharded(self):
        """Full model forward on a (data=2, view=2, depth=2) mesh equals the
        single-device result (VERDICT weak #2)."""
        cfg = ModelConfig(ndepths=(16, 8, 8), base_channels=8)
        model = TransMVSNet(cfg)
        imgs, projs, dv = tiny_batch(B=2, V=5, H=32, W=64)
        variables = model.init(jax.random.PRNGKey(0), imgs, projs, dv, train=False)

        def f(imgs, projs, dv):
            return model.apply(variables, imgs, projs, dv, train=False)

        base = jax.jit(f)(imgs, projs, dv)
        mesh = make_mesh(MeshConfig(data=2, view=2, depth=2))
        with mesh, sharding_rules(mesh):
            sharded = jax.jit(f)(imgs, projs, dv)

        # WTA argmax legitimately tie-flips where the top-2 probabilities are
        # within reduction-reorder noise (random-input prob volumes are
        # nearly flat), and a flipped stage-s depth changes the hypothesis
        # windows of stage s+1 around it. So: compare prob volumes outside
        # the (dilated, upsampled) contamination of earlier-stage flips, and
        # depth wherever additionally the top-2 gap is decisive.
        from scipy.ndimage import binary_dilation

        contaminated = None  # [B, h, w] bool
        for stage in ["stage1", "stage2", "stage3"]:
            p_base = np.asarray(base[stage]["prob_volume"])
            p_sh = np.asarray(sharded[stage]["prob_volume"])
            d_base = np.asarray(base[stage]["depth"])
            d_sh = np.asarray(sharded[stage]["depth"])
            B, D, h, w = p_base.shape
            if contaminated is None:
                clean = np.ones((B, h, w), bool)
            else:
                up = contaminated.repeat(2, axis=1).repeat(2, axis=2)
                # bilinear depth upsampling spreads a flip to neighbors
                clean = ~np.stack(
                    [binary_dilation(m, iterations=2) for m in up]
                )
            frac_clean = clean.mean()
            assert frac_clean > 0.5, f"{stage}: contamination exploded"
            mask4 = np.broadcast_to(clean[:, None], p_base.shape)
            np.testing.assert_allclose(
                p_sh[mask4], p_base[mask4], rtol=1e-4, atol=1e-5, err_msg=stage
            )
            top2 = np.sort(p_base, axis=1)[:, -2:]
            decided = ((top2[:, 1] - top2[:, 0]) > 1e-4) & clean
            np.testing.assert_allclose(
                d_sh[decided], d_base[decided], rtol=1e-5, err_msg=stage
            )
            contaminated = ~clean | (np.abs(d_sh - d_base) > 1e-3 * d_base)
