"""Multi-device tests on the virtual 8-device CPU mesh: mesh construction,
sharded training step (the driver's dryrun contract), and view-sharded
forward equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transmvsnet_tpu.config import MeshConfig
from transmvsnet_tpu.parallel.mesh import make_mesh
from transmvsnet_tpu.parallel.sharding import (
    constrain,
    replicate,
    shard_batch,
    sharding_rules,
)


def test_eight_virtual_devices():
    assert jax.device_count() == 8


class TestMesh:
    def test_default_mesh_all_data(self):
        mesh = make_mesh()
        assert mesh.shape["data"] == 8
        assert mesh.shape["view"] == 1

    def test_configured_mesh(self):
        mesh = make_mesh(MeshConfig(data=2, view=2, depth=2))
        assert dict(mesh.shape) == {"data": 2, "view": 2, "depth": 2}

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh(MeshConfig(data=16, view=1, depth=1))

    def test_subset_mesh(self):
        mesh = make_mesh(MeshConfig(data=2, view=1, depth=1))
        assert mesh.shape["data"] == 2


class TestConstrain:
    def test_noop_without_rules(self):
        x = jnp.ones((4, 4))
        y = constrain(x, "data", None)
        assert y is x

    def test_constrain_under_mesh(self):
        mesh = make_mesh(MeshConfig(data=4, view=2, depth=1))
        x = jnp.ones((8, 6, 4))
        with sharding_rules(mesh):

            @jax.jit
            def f(x):
                return constrain(x, "data", "view", None) * 2

            y = f(x)
        np.testing.assert_array_equal(np.asarray(y), 2 * np.ones((8, 6, 4)))

    def test_sharded_matches_unsharded_sum(self):
        """A view-axis-sharded associative reduction equals the local one."""
        mesh = make_mesh(MeshConfig(data=1, view=8, depth=1))
        x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 16, 16).astype(np.float32))

        def f(x):
            x = constrain(x, "data", "view", None, None)
            return jnp.sum(x, axis=1)

        expected = np.asarray(jax.jit(f)(x))
        with sharding_rules(mesh), mesh:
            got = np.asarray(jax.jit(f)(x))
        np.testing.assert_allclose(got, expected, rtol=1e-6)


class TestDryrunMultichip:
    @pytest.mark.slow
    def test_dryrun_8(self, capsys):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)
        out = capsys.readouterr().out
        assert "dryrun_multichip OK" in out

    @pytest.mark.slow
    def test_dryrun_2(self, capsys):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(2)
        assert "dryrun_multichip OK" in capsys.readouterr().out
