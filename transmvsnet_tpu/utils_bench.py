"""Reliable device timing under asynchronous/remote dispatch.

Plain dispatch + block_until_ready under-reports on remote-execution PJRT
backends (dispatch returns before the work runs). ``timed_ms`` instead
compiles a fori_loop that re-runs the op with a data dependency carried
between iterations (so the compiler cannot hoist it) and forces a
device-to-host fetch of a scalar reduction at the end.

Two hard-won rules are baked in:
- EVERY floating input leaf gets an iteration-dependent epsilon; with a
  single perturbed leaf, XLA hoists anything not data-dependent on it out
  of the loop (measured: a whole 344 ms feature extractor vanished).
- Each fetch carries a fixed ~20-25 ms host/tunnel overhead, so the
  per-iteration time is the SLOPE between an ``iters`` and a ``2*iters``
  run (the loop bound is a traced argument — one compile serves both),
  not total/iters.
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

    ``fn(*args)`` must return an array or pytree of arrays. Per-iteration
    cost is the slope between ``iters`` and ``2*iters`` in-graph runs,
    which cancels the fixed dispatch/fetch overhead of each run.
    """
    leaves, treedef = jax.tree_util.tree_flatten(args)
    float_idxs = [
        i
        for i, leaf in enumerate(leaves)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
    ]
    assert float_idxs, "timed_ms needs at least one floating input leaf"

    @jax.jit
    def repeated(n, leaves):
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

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    n1 = jnp.int32(iters)
    n2 = jnp.int32(2 * iters)

    t0 = time.time()
    np.asarray(repeated(n1, leaves))  # forces full remote completion
    compile_s = time.time() - t0

    t_short, t_long = [], []
    for _ in range(max(warmup, 2)):
        t0 = time.time()
        np.asarray(repeated(n1, leaves))
        t_short.append(time.time() - t0)
        t0 = time.time()
        np.asarray(repeated(n2, leaves))
        t_long.append(time.time() - t0)
    slope = (min(t_long) - min(t_short)) / iters
    if slope <= 0.0:
        raise RuntimeError(
            f"timed_ms: timing noise exceeded signal (slope {slope * 1e3:.3f} ms"
            f" over iters={iters}); increase iters or quiet the host"
        )
    return slope * 1e3, compile_s
