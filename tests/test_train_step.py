"""Train/eval step tests: loss decreases on the synthetic scene; the NaN
guard skips poisoned batches without corrupting state."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transmvsnet_tpu.config import ModelConfig
from transmvsnet_tpu.data.loader import ShardedLoader
from transmvsnet_tpu.data.synthetic import SyntheticDataset
from transmvsnet_tpu.models.transmvsnet import TransMVSNet
from transmvsnet_tpu.models.losses import cascade_loss, entropy_loss
from transmvsnet_tpu.train.schedule import make_optimizer, warmup_multistep
from transmvsnet_tpu.train.step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def make_batch(ds, idxs):
    loader = ShardedLoader(ds, batch_size=len(idxs), num_workers=0)
    return next(iter(loader))


def to_model_batch(batch):
    return {
        "imgs": jnp.asarray(batch["imgs"]),
        "proj_matrices": {
            k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()
        },
        "depth_values": jnp.asarray(batch["depth_values"]),
        "depth": {k: jnp.asarray(v) for k, v in batch["depth"].items()},
        "mask": {k: jnp.asarray(v) for k, v in batch["mask"].items()},
    }


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(ndepths=(16, 8, 8), base_channels=8)
    model = TransMVSNet(cfg)
    # height/width divisible by 32 (stage1 is 1/4 res and the U-Net needs /8),
    # same constraint the reference solves by snapping eval sizes to 32.
    ds = SyntheticDataset(nviews=3, ndepths=48, num_samples=2, height=32, width=64)
    batch = to_model_batch(make_batch(ds, [0, 1]))
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["imgs"],
        batch["proj_matrices"],
        batch["depth_values"],
        train=False,
    )
    optimizer = make_optimizer(warmup_multistep(1e-3, [1000], 0.5, warmup_iters=10))
    state = create_train_state(model, variables, optimizer)
    # One shared jitted step: re-jitting per test recompiles the full train
    # graph (~85 s on the 2-core CI host — measured r5 suite re-tier).
    step = jax.jit(make_train_step(model, optimizer))
    return model, optimizer, state, batch, step


class TestTrainStep:
    def test_loss_decreases(self, setup):
        model, optimizer, state, batch, step = setup
        state, first = step(state, batch)
        losses = [float(first["loss"])]
        for _ in range(8):
            state, scalars = step(state, batch)
            losses.append(float(scalars["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.9, losses

    def test_nan_guard_preserves_state(self, setup):
        model, optimizer, state, batch, step = setup
        state, _ = step(state, batch)  # one good step
        poisoned = dict(batch)
        poisoned["imgs"] = batch["imgs"].at[0, 0, 0, 0, 0].set(jnp.nan)
        new_state, scalars = step(state, poisoned)
        assert float(scalars["skipped_nan"]) == 1.0
        old_leaves = jax.tree_util.tree_leaves(state.params)
        new_leaves = jax.tree_util.tree_leaves(new_state.params)
        for a, b in zip(old_leaves, new_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eval_step_scalars(self, setup):
        model, optimizer, state, batch, _ = setup
        eval_step = jax.jit(make_eval_step(model))
        scalars = eval_step(state, batch)
        for key in ("loss", "abs_depth_error", "thres2mm_error"):
            assert np.isfinite(float(scalars[key])), key


class TestLosses:
    def test_entropy_loss_perfect_prediction_is_small(self):
        B, D, H, W = 1, 8, 6, 6
        dv = np.linspace(1, 8, D, dtype=np.float32)[None]
        gt_idx = np.random.RandomState(0).randint(0, D, size=(B, H, W))
        gt_depth = dv[0][gt_idx]
        prob = np.full((B, D, H, W), 1e-4, dtype=np.float32)
        for b in range(B):
            for i in range(H):
                for j in range(W):
                    prob[b, gt_idx[b, i, j], i, j] = 1.0
        prob /= prob.sum(1, keepdims=True)
        mask = np.ones((B, H, W), dtype=bool)
        loss, wta = entropy_loss(
            jnp.asarray(prob), jnp.asarray(gt_depth), jnp.asarray(mask), jnp.asarray(dv)
        )
        assert float(loss) < 0.01
        np.testing.assert_allclose(np.asarray(wta), gt_depth, atol=1e-5)

    def test_entropy_loss_masks_invalid_pixels(self):
        B, D, H, W = 1, 4, 4, 4
        dv = np.linspace(1, 4, D, dtype=np.float32)[None]
        prob = np.full((B, D, H, W), 1.0 / D, dtype=np.float32)
        gt = np.full((B, H, W), 2.0, dtype=np.float32)
        mask_none = np.zeros((B, H, W), dtype=bool)
        loss, _ = entropy_loss(
            jnp.asarray(prob), jnp.asarray(gt), jnp.asarray(mask_none), jnp.asarray(dv)
        )
        assert float(loss) < 1e-3  # no valid pixels -> ~0

    def test_cascade_loss_weights(self):
        D, H, W = 4, 4, 4
        dv = jnp.asarray(np.linspace(1, 4, D, dtype=np.float32)[None])
        prob = jnp.asarray(np.full((1, D, H, W), 1.0 / D, dtype=np.float32))
        gt = jnp.asarray(np.full((1, H, W), 2.0, dtype=np.float32))
        mask = jnp.asarray(np.ones((1, H, W), dtype=np.float32))
        outputs = {
            f"stage{i}": {"prob_volume": prob, "depth_values": dv, "depth": gt}
            for i in (1, 2, 3)
        }
        gts = {f"stage{i}": gt for i in (1, 2, 3)}
        masks = {f"stage{i}": mask for i in (1, 2, 3)}
        total1, *_ = cascade_loss(outputs, gts, masks, dlossw=(1, 1, 1))
        total2, *_ = cascade_loss(outputs, gts, masks, dlossw=(2, 2, 2))
        np.testing.assert_allclose(float(total2), 2 * float(total1), rtol=1e-6)
