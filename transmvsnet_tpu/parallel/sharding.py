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


# Logical-axis aliases. "seq" is the FMT token axis: it reuses the mesh's
# "depth" axis because the two are phase-disjoint — FMT runs before any
# depth-hypothesis tensor exists, and by the time depth slabs are live the
# token axis is gone. Sharding tokens over it gives exact sequence-parallel
# linear attention: the KV = Σ_s K_s⊗V_s and Z = Σ_s K_s contractions in
# models/fmt.linear_attention (reference models/FMT.py:29-32) are sums over
# the sharded axis, so GSPMD lowers them to local partial-KV einsums + psum.
_LOGICAL_ALIASES = {"seq": "depth"}


def constrain(x: jax.Array, *logical_axes) -> jax.Array:
    """Annotate ``x`` with a sharding over the active mesh.

    ``logical_axes`` has one entry per dimension of x; entries are logical
    axis names, tuples of names (dimension sharded over several mesh axes),
    or None (unsharded). Mesh axes of size 1 are dropped.
    """
    rules = _RULES.get()
    if rules is None:
        return x
    mesh = rules.mesh

    def resolve(a):
        if a is None:
            return None
        if isinstance(a, tuple):
            names = tuple(n for n in (resolve(n) for n in a) if n is not None)
            if not names:
                return None
            return names if len(names) > 1 else names[0]
        a = _LOGICAL_ALIASES.get(a, a)
        return a if mesh.shape.get(a, 1) > 1 else None

    spec = tuple(resolve(a) for a in logical_axes)
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
    """Host batch -> global array, leading dim sharded over 'data'.

    Single-process: a plain sharded device_put. Multi-process (the
    reference's DDP/DistributedSampler contract, train.py:296-301,377-384):
    each process holds only its local slice of the global batch, so the
    global array is assembled with make_array_from_process_local_data —
    a device_put of host-global data onto a cross-process mesh would fail.
    """
    if jax.process_count() == 1:
        return jax.device_put(batch, batch_spec(batch, mesh))
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda leaf: jax.make_array_from_process_local_data(sharding, leaf),
        batch,
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (parameters/optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
