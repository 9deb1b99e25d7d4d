"""Shape/numerics smoke tests for the full model forward on tiny inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transmvsnet_tpu.config import ModelConfig
from transmvsnet_tpu.models.transmvsnet import TransMVSNet, depth_wta

from test_geometry import make_cameras


def tiny_batch(B=1, V=3, H=32, W=64, num_hyp=48):
    rng = np.random.RandomState(0)
    imgs = rng.rand(B, V, H, W, 3).astype(np.float32)
    cams = make_cameras(rng, n=V)  # [V, 2, 4, 4]
    proj = np.broadcast_to(cams[None], (B, V, 2, 4, 4)).copy()
    # Stage intrinsics scale x1/x2/x4 (reference datasets/dtu_yao.py:174-184).
    projs = {}
    for s, mult in [("stage1", 1.0), ("stage2", 2.0), ("stage3", 4.0)]:
        p = proj.copy()
        p[:, :, 1, :2, :] *= mult
        projs[s] = jnp.asarray(p)
    depth_values = np.broadcast_to(
        np.linspace(4.0, 8.0, num_hyp, dtype=np.float32)[None], (B, num_hyp)
    ).copy()
    return jnp.asarray(imgs), projs, jnp.asarray(depth_values)


@pytest.fixture(scope="module")
def model_and_vars():
    # ndepths must be divisible by 8 (three stride-2 levels in CostRegNet,
    # same constraint as the reference's 48/32/8).
    cfg = ModelConfig(ndepths=(16, 8, 8), base_channels=8)
    model = TransMVSNet(cfg)
    imgs, projs, dv = tiny_batch()
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dv, train=False)
    return model, variables, (imgs, projs, dv)


class TestForward:
    def test_output_shapes(self, model_and_vars):
        model, variables, (imgs, projs, dv) = model_and_vars
        out = model.apply(variables, imgs, projs, dv, train=False)
        B, V, H, W, _ = imgs.shape
        assert out["stage1"]["depth"].shape == (B, H // 4, W // 4)
        assert out["stage2"]["depth"].shape == (B, H // 2, W // 2)
        assert out["stage3"]["depth"].shape == (B, H, W)
        assert out["stage1"]["prob_volume"].shape == (B, 16, H // 4, W // 4)
        assert out["stage3"]["prob_volume"].shape == (B, 8, H, W)
        assert out["depth"].shape == (B, H, W)
        assert out["photo_confidence"].shape == (B, H, W)

    def test_probabilities_normalized_and_finite(self, model_and_vars):
        model, variables, (imgs, projs, dv) = model_and_vars
        out = model.apply(variables, imgs, projs, dv, train=False)
        for s in ["stage1", "stage2", "stage3"]:
            p = np.asarray(out[s]["prob_volume"])
            assert np.all(np.isfinite(p))
            np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-4)
            d = np.asarray(out[s]["depth"])
            assert np.all(np.isfinite(d))

    def test_depth_in_hypothesis_range(self, model_and_vars):
        model, variables, (imgs, projs, dv) = model_and_vars
        out = model.apply(variables, imgs, projs, dv, train=False)
        d1 = np.asarray(out["stage1"]["depth"])
        assert d1.min() >= 4.0 - 1e-3 and d1.max() <= 8.0 + 1e-3

    def test_train_mode_updates_batch_stats(self, model_and_vars):
        model, variables, (imgs, projs, dv) = model_and_vars
        out, updates = model.apply(
            variables, imgs, projs, dv, train=True, mutable=["batch_stats"]
        )
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(updates["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        )
        assert changed

    def test_depth_wta(self):
        p = jnp.asarray(
            np.array([[[[0.1]], [[0.7]], [[0.2]]]], dtype=np.float32)
        )  # [1, 3, 1, 1]
        dv = jnp.asarray(np.array([[[[1.0]], [[2.0]], [[3.0]]]], dtype=np.float32))
        assert float(depth_wta(p, dv)[0, 0, 0]) == 2.0
