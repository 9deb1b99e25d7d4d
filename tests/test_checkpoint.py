"""Checkpoint save/restore round trips (epoch resume + weights-only load)."""

import numpy as np
import jax
import jax.numpy as jnp

from transmvsnet_tpu.train.checkpoint import (
    CheckpointManager,
    load_weights,
    save_weights,
)
from transmvsnet_tpu.train.schedule import make_optimizer, warmup_multistep
from transmvsnet_tpu.train.step import TrainState, create_train_state


def _tiny_state(seed=0):
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(x)

    model = Tiny()
    params = model.init(jax.random.PRNGKey(seed), jnp.ones((1, 3)))["params"]
    variables = {"params": params, "batch_stats": {"dummy": jnp.zeros((2,))}}
    opt = make_optimizer(warmup_multistep(1e-3, [100], 0.5))
    return create_train_state(model, variables, opt)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        state = _tiny_state()
        state = state.replace(step=jnp.asarray(7, jnp.int32))
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(jax.device_get(state))

        template = _tiny_state(seed=1)  # different values, same structure
        restored, step = mgr.restore_latest(template)
        assert step == 7
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_latest_wins(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        s1 = _tiny_state().replace(step=jnp.asarray(1, jnp.int32))
        s2 = _tiny_state(seed=2).replace(step=jnp.asarray(5, jnp.int32))
        mgr.save(jax.device_get(s1))
        mgr.save(jax.device_get(s2))
        assert mgr.latest_step() == 5

    def test_weights_only(self, tmp_path):
        state = _tiny_state()
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        path = str(tmp_path / "weights")
        save_weights(path, jax.device_get(variables))
        template = _tiny_state(seed=3)
        out = load_weights(
            path, {"params": template.params, "batch_stats": template.batch_stats}
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(out["params"]),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
