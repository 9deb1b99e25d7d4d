"""bf16 compute path: finite outputs, close to the f32 reference path."""

import numpy as np
import jax
import pytest

from transmvsnet_tpu.config import ModelConfig
from transmvsnet_tpu.models.transmvsnet import TransMVSNet

from test_model_forward import tiny_batch


class TestBF16:
    @pytest.fixture(scope="class")
    def data(self):
        return tiny_batch(B=1, V=3, H=32, W=64, num_hyp=48)

    def test_bf16_close_to_f32(self, data):
        imgs, projs, dv = data
        cfg32 = ModelConfig(ndepths=(16, 8, 8))
        cfg16 = ModelConfig(ndepths=(16, 8, 8), compute_dtype="bfloat16")
        m32 = TransMVSNet(cfg32)
        variables = m32.init(jax.random.PRNGKey(0), imgs, projs, dv, train=False)
        out32 = m32.apply(variables, imgs, projs, dv, train=False)
        m16 = TransMVSNet(cfg16)
        out16 = m16.apply(variables, imgs, projs, dv, train=False)

        d32 = np.asarray(out32["depth"])
        d16 = np.asarray(out16["depth"])
        assert d16.dtype == np.float32  # WTA depth stays f32
        assert np.isfinite(d16).all()
        # Depth range spans ~4; WTA flips happen at bin granularity, so
        # compare robustly: most pixels should pick a nearby hypothesis.
        assert np.mean(np.abs(d16 - d32) < 0.6) > 0.9

        p32 = np.asarray(out32["stage1"]["prob_volume"])
        p16 = np.asarray(out16["stage1"]["prob_volume"])
        assert np.isfinite(p16).all()
        np.testing.assert_allclose(p16.sum(1), 1.0, atol=1e-2)
        assert np.mean(np.abs(p16 - p32)) < 0.03
