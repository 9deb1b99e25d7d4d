"""Pin the GSPMD lowering of the seq/view sharding axes (VERDICT r3 item 5).

test_seq_parallel.py proves sharded ≡ unsharded (correctness);
probes/bench_sharding_value.py measured the collective traffic once. This
test makes the *lowering* a regression surface: the linear-attention KV/Z
sums must stay psum-of-partial-KV ([B, heads, d, d]-sized all-reduces, KBs)
and the view accumulation one similarity-volume all-reduce — never an
all-gather of token-sized tensors. A JAX/GSPMD upgrade that silently
switched to gathering 62k tokens would turn "essentially free parallelism"
into an ICI flood while every numerical test stayed green; this fails
instead. (Anchor: reference models/FMT.py:29-32 — the KV/Z sums over the
sequence are associative, which is what makes the psum lowering exact.)

Shapes are the real DTU-eval stage-1 shapes (216×288 = 62,208 tokens).
Compile-only on the 8-device CPU mesh; nothing is executed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transmvsnet_tpu.config import MeshConfig
from transmvsnet_tpu.parallel.hlo_analysis import (
    collective_bytes,
    max_collective_bytes,
)
from transmvsnet_tpu.parallel.mesh import make_mesh
from transmvsnet_tpu.parallel.sharding import constrain, sharding_rules


def _partitioned_hlo(fn, args, mesh):
    with mesh, sharding_rules(mesh):
        compiled = jax.jit(fn).lower(*args).compile()
    return compiled.as_text()


@pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh"
)
def test_fmt_seq_sharding_lowers_to_small_psums():
    from transmvsnet_tpu.models.fmt import FMT

    B, S, H, W, C = 1, 4, 216, 288, 32  # DTU-eval stage 1: 62,208 tokens
    rng = np.random.RandomState(0)
    ref = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    src = jnp.asarray(rng.randn(B, S, H, W, C).astype(np.float32))
    fmt = FMT(d_model=C, n_heads=8)
    variables = fmt.init(jax.random.PRNGKey(0), ref, src)

    mesh = make_mesh(MeshConfig(data=1, view=1, depth=8))
    hlo = _partitioned_hlo(
        lambda r, s: fmt.apply(variables, r, s), (ref, src), mesh
    )
    coll = collective_bytes(hlo)
    # Measured lowering (2026-08-21): 23 KB of all-reduce across all 8
    # layers — partial-KV [B, heads, d, d] matrices, not tokens. A
    # token-sized tensor at these shapes is 62208·32·4 ≈ 8 MB; 100 KB
    # sits 3 orders below that and 4× above the measured value.
    assert coll.get("all-reduce", 0) <= 100_000, coll
    # No collective (gather/permute included) may move a token-sized
    # tensor; 1 MB bounds the largest single op well below one.
    assert max_collective_bytes(hlo) <= 1_000_000, coll


@pytest.mark.skipif(
    jax.device_count() < 4, reason="needs a 4-device CPU mesh"
)
def test_view_sharding_lowers_to_one_similarity_allreduce():
    from transmvsnet_tpu.ops.warp import warp_correlate

    B, S, C, D, H, W = 1, 4, 32, 48, 216, 288
    rng = np.random.RandomState(0)
    ref = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    srcs = jnp.asarray(rng.randn(B, S, H, W, C).astype(np.float32))
    ref_proj = jnp.tile(jnp.eye(4)[None], (B, 1, 1)).astype(jnp.float32)
    src_projs = jnp.tile(jnp.eye(4)[None, None], (B, S, 1, 1)).astype(
        jnp.float32
    )
    depth = jnp.asarray(
        np.broadcast_to(
            np.linspace(425.0, 935.0, D, dtype=np.float32)[None, :, None, None],
            (B, D, H, W),
        ).copy()
    )

    def f(ref, srcs, src_projs, ref_proj, depth):
        srcs = constrain(srcs, None, "view", None, None, None)

        def per_view(src, P):
            return warp_correlate(src, ref, P, ref_proj, depth)

        corr = jax.vmap(per_view, in_axes=(1, 1), out_axes=1)(srcs, src_projs)
        corr = constrain(corr, None, "view", None, None, None)
        return jnp.sum(corr, axis=1)

    mesh = make_mesh(MeshConfig(data=1, view=4, depth=1))
    hlo = _partitioned_hlo(
        f, (ref, srcs, src_projs, ref_proj, depth), mesh
    )
    coll = collective_bytes(hlo)
    # Measured lowering (2026-08-21): 11.9 MB — one f32 [D, h, w]
    # similarity volume (48·216·288·4 ≈ 11.9 MB). 20 MB allows layout
    # padding but rejects a per-view gather (4 × the volume, or the
    # [S, H, W, C] features at 32 MB).
    assert coll.get("all-reduce", 0) <= 20_000_000, coll
    assert coll.get("all-gather", 0) <= 1_000_000, coll
