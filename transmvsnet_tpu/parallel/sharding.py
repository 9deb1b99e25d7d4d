"""Sharding rules: logical-axis annotations threaded through the model.

The model annotates its big intermediates with *logical* axis names
('data', 'view', 'depth'); when a mesh is active (``sharding_rules``
context), ``constrain`` maps those to mesh axes via
``lax.with_sharding_constraint`` and GSPMD inserts the collectives —
psum over 'view' for the cost accumulation, axis softmax over 'depth',
gradient/BN reductions over 'data'. With no active rules the annotations
are no-ops, so single-chip code paths pay nothing.
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
from typing import Any

import jax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class ShardingRules:
    mesh: Mesh


_RULES: contextvars.ContextVar[ShardingRules | None] = contextvars.ContextVar(
    "transmvsnet_sharding_rules", default=None
)


@contextlib.contextmanager
def sharding_rules(mesh: Mesh):
    token = _RULES.set(ShardingRules(mesh))
    try:
        yield
    finally:
        _RULES.reset(token)


def active_mesh() -> Mesh | None:
    rules = _RULES.get()
    return rules.mesh if rules else None


def constrain(x: jax.Array, *logical_axes: str | None) -> jax.Array:
    """Annotate ``x`` with a sharding over the active mesh.

    ``logical_axes`` has one entry per dimension of x; entries are mesh axis
    names or None (unsharded). Axes of size 1 in the mesh are dropped.
    """
    rules = _RULES.get()
    if rules is None:
        return x
    mesh = rules.mesh
    spec = tuple(
        (a if (a is not None and mesh.shape.get(a, 1) > 1) else None)
        for a in logical_axes
    )
    if all(s is None for s in spec):
        return x
    assert len(spec) == x.ndim, (spec, x.shape)
    return lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def batch_spec(batch: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree sharding leading (batch) dims over 'data'."""

    def leaf_spec(leaf):
        return NamedSharding(mesh, P("data"))

    return jax.tree_util.tree_map(leaf_spec, batch)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put a host batch with its leading dim sharded over 'data'."""
    return jax.device_put(batch, batch_spec(batch, mesh))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (parameters/optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
