"""Activation-parity harness: reference torch model (random weights) vs our
model with those weights converted. Pins eval-mode numerics end to end —
features, FMT, warp/correlation, regularization, cascade — before any
training, exactly the weight-converter guarantee SURVEY.md §7 step 3 asks for.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from transmvsnet_tpu.config import ModelConfig
from transmvsnet_tpu.convert.torch_weights import convert_state_dict
from transmvsnet_tpu.models.transmvsnet import TransMVSNet

from reference_oracle import load_reference_model


def dtu_like_inputs(B=1, V=3, H=64, W=96, num_hyp=192, seed=0):
    """Cameras and depth range shaped like DTU so the reference's hard-coded
    [425, 935] clamp is a no-op."""
    rng = np.random.RandomState(seed)
    imgs = rng.rand(B, V, H, W, 3).astype(np.float32)
    pairs = np.zeros((B, V, 2, 4, 4), dtype=np.float32)
    for v in range(V):
        ang = 0.04 * (v - (V - 1) / 2)
        R = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ],
            dtype=np.float32,
        )
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = R
        E[:3, 3] = [30.0 * v, 2.0 * v, 0.0]
        K = np.array(
            [[80.0, 0, W / 8.0], [0, 80.0, H / 8.0], [0, 0, 1]], dtype=np.float32
        )  # stage-1 intrinsics (1/4 res convention)
        pairs[:, v, 0] = E
        pairs[:, v, 1, :3, :3] = K
    projs = {}
    for s, mult in [("stage1", 1.0), ("stage2", 2.0), ("stage3", 4.0)]:
        p = pairs.copy()
        p[:, :, 1, :2, :] *= mult
        projs[s] = p
    dv = np.broadcast_to(
        np.linspace(425.0, 931.45, num_hyp, dtype=np.float32)[None], (B, num_hyp)
    ).copy()
    return imgs, projs, dv


@pytest.fixture(scope="module")
def parity_pair():
    RefModel = load_reference_model()
    torch.manual_seed(0)
    ref_model = RefModel()
    ref_model.eval()
    # Randomize BN running stats so eval-mode BN is a real test, not 0/1.
    with torch.no_grad():
        for m in ref_model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}

    cfg = ModelConfig(depth_clamp=(425.0, 935.0))
    model = TransMVSNet(cfg)
    imgs, projs, dv = dtu_like_inputs()
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(imgs),
        {k: jnp.asarray(v) for k, v in projs.items()},
        jnp.asarray(dv),
        train=False,
    )
    variables = convert_state_dict(sd, jax.tree_util.tree_map(np.asarray, template))
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    return ref_model, model, variables, (imgs, projs, dv)


class TestConversionCoverage:
    def test_strict_conversion_covers_everything(self, parity_pair):
        # The fixture itself would have raised on missing/unconsumed keys.
        ref_model, model, variables, _ = parity_pair
        n_ours = sum(
            np.asarray(x).size for x in jax.tree_util.tree_leaves(variables["params"])
        )
        n_theirs = sum(p.numel() for p in ref_model.parameters())
        assert n_ours == n_theirs


class TestActivationParity:
    @pytest.fixture(scope="class")
    def outputs(self, parity_pair):
        ref_model, model, variables, (imgs, projs, dv) = parity_pair
        with torch.no_grad():
            t_imgs = torch.from_numpy(imgs).permute(0, 1, 4, 2, 3).contiguous()
            t_projs = {k: torch.from_numpy(v) for k, v in projs.items()}
            ref_out = ref_model(t_imgs, t_projs, torch.from_numpy(dv))
        our_out = model.apply(
            variables,
            jnp.asarray(imgs),
            {k: jnp.asarray(v) for k, v in projs.items()},
            jnp.asarray(dv),
            train=False,
        )
        return ref_out, our_out

    @pytest.mark.parametrize("stage", ["stage1", "stage2", "stage3"])
    def test_prob_volume_parity(self, outputs, stage):
        ref_out, our_out = outputs
        ref = ref_out[stage]["prob_volume"].numpy()
        ours = np.asarray(our_out[stage]["prob_volume"])
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)

    @pytest.mark.parametrize("stage", ["stage1", "stage2", "stage3"])
    def test_depth_parity(self, outputs, stage):
        ref_out, our_out = outputs
        ref = ref_out[stage]["depth"].numpy()
        ours = np.asarray(our_out[stage]["depth"])
        # WTA argmax can flip between near-equal bins; compare robustly.
        close = np.isclose(ours, ref, rtol=0, atol=1e-2)
        assert close.mean() > 0.99, f"{stage}: {close.mean()}"

    def test_confidence_parity(self, outputs):
        ref_out, our_out = outputs
        ref = ref_out["photo_confidence"].numpy()
        ours = np.asarray(our_out["photo_confidence"])
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)
