"""CostRegNetDense == CostRegNet: same params, same outputs, same stats.

The dense depth-as-channels formulation must be a pure re-expression of the
3-D U-Net (reference models/module.py:425-456): identical parameter tree
and identical numerics (up to fp reassociation) in eval and train modes,
for every stage-shaped (D, H, W) the cascade uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmvsnet_tpu.models.cost_reg import CostRegNet, CostRegNetDense


def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        out = []
        for k, v in tree.items():
            out += _tree_paths(v, prefix + (k,))
        return out
    return [(prefix, jnp.shape(tree))]


@pytest.mark.parametrize(
    "D,H,W", [(48, 32, 40), (32, 16, 24), (8, 32, 40), (16, 16, 16)]
)
def test_dense_matches_3d_eval(D, H, W):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, D, H, W, 1).astype(np.float32))
    m3 = CostRegNet(8)
    md = CostRegNetDense(8)
    variables = m3.init(jax.random.PRNGKey(0), x, False)
    # Use non-trivial running stats so eval-mode BN is actually exercised.
    variables = jax.tree.map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        if a.ndim == 1
        else a,
        variables,
    )
    out3 = m3.apply(variables, x, False)
    outd = md.apply(variables, x, False)
    assert out3.shape == outd.shape == (2, D, H, W, 1)
    np.testing.assert_allclose(
        np.asarray(outd), np.asarray(out3), rtol=2e-4, atol=2e-4
    )


def test_same_param_tree():
    x = jnp.zeros((1, 8, 16, 16, 1), jnp.float32)
    v3 = CostRegNet(8).init(jax.random.PRNGKey(0), x, False)
    vd = CostRegNetDense(8).init(jax.random.PRNGKey(0), x, False)
    assert sorted(_tree_paths(v3)) == sorted(_tree_paths(vd))


def test_dense_matches_3d_train_stats():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 16, 24, 1).astype(np.float32))
    m3 = CostRegNet(8)
    md = CostRegNetDense(8)
    variables = m3.init(jax.random.PRNGKey(0), x, False)

    out3, mut3 = m3.apply(variables, x, True, mutable=["batch_stats"])
    outd, mutd = md.apply(variables, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(outd), np.asarray(out3), rtol=2e-4, atol=2e-4
    )
    flat3 = jax.tree_util.tree_leaves_with_path(mut3["batch_stats"])
    flatd = dict(jax.tree_util.tree_leaves_with_path(mutd["batch_stats"]))
    # tree_leaves_with_path returns list of (path, leaf); compare pairwise
    flatd = {p: v for p, v in jax.tree_util.tree_leaves_with_path(mutd["batch_stats"])}
    for p, v3 in flat3:
        np.testing.assert_allclose(
            np.asarray(flatd[p]), np.asarray(v3), rtol=1e-4, atol=1e-5,
            err_msg=str(p),
        )


def test_dense_gradients_flow():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 16, 16, 1).astype(np.float32))
    md = CostRegNetDense(8)
    variables = md.init(jax.random.PRNGKey(0), x, False)

    def loss(params):
        out = md.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x,
            True,
            mutable=["batch_stats"],
        )[0]
        return jnp.sum(out**2)

    grads = jax.grad(loss)(variables["params"])
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(norms))
    assert sum(n > 0 for n in norms) > len(norms) * 0.8


def test_cf_batchnorm_train_mode_matches_blocks():
    """_CFBatchNorm(train=True) == blocks.BatchNorm on the transposed input
    (ADVICE r3: the train-mode branch was only exercised indirectly)."""
    from transmvsnet_tpu.models.blocks import BatchNorm
    from transmvsnet_tpu.models.cost_reg import _CFBatchNorm

    rng = np.random.RandomState(3)
    C, B, N = 8, 2, 64
    x_cl = jnp.asarray(rng.randn(B, N, C).astype(np.float32) * 2 + 0.5)
    x_cf = x_cl.transpose(0, 2, 1)  # [B, C, N]

    ref = BatchNorm(C)
    cf = _CFBatchNorm(C)
    v_ref = ref.init(jax.random.PRNGKey(0), x_cl, True)
    v_cf = cf.init(jax.random.PRNGKey(0), x_cf, True)
    # Non-trivial affine params + running stats so the update path is real.
    params = {
        "scale": jnp.asarray(rng.rand(C).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(C).astype(np.float32)),
    }
    stats = {
        "mean": jnp.asarray(rng.randn(C).astype(np.float32)),
        "var": jnp.asarray(rng.rand(C).astype(np.float32) + 0.5),
    }
    v_ref = {"params": params, "batch_stats": stats}
    v_cf = {"params": params, "batch_stats": stats}

    y_ref, m_ref = ref.apply(v_ref, x_cl, True, mutable=["batch_stats"])
    y_cf, m_cf = cf.apply(v_cf, x_cf, True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(y_cf.transpose(0, 2, 1)), np.asarray(y_ref), rtol=1e-6, atol=1e-6
    )
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(m_cf["batch_stats"][k]),
            np.asarray(m_ref["batch_stats"][k]),
            rtol=1e-6,
            atol=1e-6,
            err_msg=k,
        )
