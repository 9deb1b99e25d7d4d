"""Reliable device timing under asynchronous/remote dispatch.

Plain dispatch + block_until_ready under-reports on remote-execution PJRT
backends (dispatch returns before the work runs). ``timed_ms`` instead
compiles a fori_loop that re-runs the op with a data dependency carried
between iterations (so the compiler cannot hoist it) and forces a
device-to-host fetch of a scalar reduction at the end.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def timed_ms(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 1,
) -> tuple[float, float]:
    """Returns (per-iteration milliseconds, compile seconds).

    ``fn(*args)`` must return an array or pytree of arrays. EVERY floating
    array leaf of ``args`` gets an iteration-dependent epsilon added so no
    part of the body can be hoisted out of the loop or CSE'd. (Perturbing
    only one leaf is not enough: anything not data-dependent on that leaf —
    e.g. the whole feature extractor when the leaf is a cost-reg BN stat —
    gets hoisted and the measurement silently drops it.)
    """
    leaves, treedef = jax.tree_util.tree_flatten(args)
    float_idxs = [
        i
        for i, leaf in enumerate(leaves)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
    ]
    assert float_idxs, "timed_ms needs at least one floating input leaf"

    @jax.jit
    def repeated(leaves):
        def body(i, carry):
            eps = carry * 1e-30
            local = list(leaves)
            for fi in float_idxs:
                local[fi] = local[fi] + eps.astype(local[fi].dtype)
            out = fn(*jax.tree_util.tree_unflatten(treedef, local))
            out_leaves = jax.tree_util.tree_leaves(out)
            s = sum(
                jnp.sum(o).astype(jnp.float32)
                for o in out_leaves
                if jnp.issubdtype(o.dtype, jnp.floating)
            )
            return carry + s * 1e-10

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    t0 = time.time()
    result = repeated(leaves)
    np.asarray(result)  # forces full execution incl. remote completion
    compile_s = time.time() - t0

    times = []
    for _ in range(max(warmup, 1)):
        t0 = time.time()
        np.asarray(repeated(leaves))
        times.append(time.time() - t0)
    best = min(times)
    return best / iters * 1e3, compile_s
