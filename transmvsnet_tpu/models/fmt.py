"""Feature Matching Transformer with linear attention, TPU-batched.

Re-implements the reference FMT (reference models/FMT.py): 8 encoder layers
alternating self/cross attention over the stage-1 (1/4-resolution) feature
tokens, linear attention (elu+1 feature map; KV = Σ K⊗V so the N×N matrix
never materializes, reference models/FMT.py:22-37), 2D sinusoidal position
encoding (reference models/position_encoding.py:23-60), and the
coarse-to-fine feature pathway (reference models/FMT.py:183-230).

TPU-first deviations from the reference's structure (math unchanged):
- All source views are processed as one batch ([B·(V-1), L, C]) instead of
  a Python loop per view — bigger matmuls for the MXU.
- The position encoding is computed closed-form for the actual (H, W)
  instead of slicing a 600×600 buffer.
- The linear-attention KV/Z sums over tokens are associative, which is the
  hook for exact sequence parallelism (psum of partial KV) — see
  transmvsnet_tpu/parallel.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from transmvsnet_tpu.models.blocks import (
    ConvND,
    LayerNorm,
    Linear,
    xavier_uniform_init,
)
from transmvsnet_tpu.ops.sampling import resize_bilinear
from transmvsnet_tpu.parallel.sharding import constrain


def sine_position_encoding(h: int, w: int, d_model: int) -> np.ndarray:
    """2D sinusoidal PE, channel-last [H, W, C]; 1-based positions.

    Matches the reference's temp_bug_fix=True variant
    (reference models/position_encoding.py:39-52).
    """
    y = np.arange(1, h + 1, dtype=np.float32)[:, None, None]  # [H,1,1]
    x = np.arange(1, w + 1, dtype=np.float32)[None, :, None]  # [1,W,1]
    div = np.exp(
        np.arange(0, d_model // 2, 2, dtype=np.float32)
        * (-math.log(10000.0) / (d_model // 2))
    )[None, None, :]  # [1,1,C//4]
    pe = np.zeros((h, w, d_model), dtype=np.float32)
    pe[:, :, 0::4] = np.sin(x * div)
    pe[:, :, 1::4] = np.cos(x * div)
    pe[:, :, 2::4] = np.sin(y * div)
    pe[:, :, 3::4] = np.cos(y * div)
    return pe


def linear_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """O(N·d²) linear attention (reference models/FMT.py:22-37).

    Args: q [N, L, H, D], k/v [N, S, H, D]. Returns [N, L, H, D].
    """
    q = jax.nn.elu(q) + 1.0
    k = jax.nn.elu(k) + 1.0
    kv = jnp.einsum("nshd,nshm->nhmd", k, v, preferred_element_type=jnp.float32)
    z = 1.0 / (
        jnp.einsum(
            "nlhd,nhd->nlh", q, k.sum(axis=1), preferred_element_type=jnp.float32
        )
        + eps
    )
    out = jnp.einsum(
        "nlhd,nhmd,nlh->nlhm", q, kv, z, preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)


class AttentionLayer(nn.Module):
    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, queries: jax.Array, keys: jax.Array, values: jax.Array):
        N, L, _ = queries.shape
        S = keys.shape[1]
        H = self.n_heads
        d = self.d_model // H
        q = Linear(self.d_model, kernel_init=xavier_uniform_init, name="query")(
            queries
        ).reshape(N, L, H, d)
        k = Linear(self.d_model, kernel_init=xavier_uniform_init, name="key")(
            keys
        ).reshape(N, S, H, d)
        v = Linear(self.d_model, kernel_init=xavier_uniform_init, name="value")(
            values
        ).reshape(N, S, H, d)
        out = linear_attention(q, k, v).reshape(N, L, self.d_model)
        return Linear(self.d_model, kernel_init=xavier_uniform_init, name="out")(out)


class EncoderLayer(nn.Module):
    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, x: jax.Array, source: jax.Array) -> jax.Array:
        x = x + AttentionLayer(self.d_model, self.n_heads, name="attention")(
            x, source, source
        )
        y = x = LayerNorm(name="norm1")(x)
        y = nn.relu(
            Linear(2 * self.d_model, kernel_init=xavier_uniform_init, name="linear1")(y)
        )
        y = Linear(self.d_model, kernel_init=xavier_uniform_init, name="linear2")(y)
        return LayerNorm(name="norm2")(x + y)


class FMT(nn.Module):
    d_model: int = 32
    n_heads: int = 8
    layer_names: tuple[str, ...] = ("self", "cross") * 4

    @nn.compact
    def __call__(
        self, ref_feature: jax.Array, src_features: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """Args:
          ref_feature: [B, H, W, C] stage-1 reference features.
          src_features: [B, S, H, W, C] stage-1 source features.

        Returns: (ref_out [B, H, W, C], src_out [B, S, H, W, C]).
        """
        B, H, W, C = ref_feature.shape
        S = src_features.shape[1]
        assert C == self.d_model

        # Cast the (f32 numpy) PE to the feature dtype: promoting features
        # to f32 here would silently push every downstream stage — including
        # the warp kernels' bf16 dispatch — onto the f32 path.
        pe = jnp.asarray(sine_position_encoding(H, W, C))[None].astype(
            ref_feature.dtype
        )
        # Sequence parallelism (SURVEY §5): shard the token axis over the
        # "seq" logical axis. Every op in an encoder layer is token-local
        # except the KV/Z sums in linear_attention, which GSPMD lowers to
        # partial-KV einsums + psum — exact, no ring/Ulysses machinery.
        def cr_ref(x):
            return constrain(x, "data", "seq", None)

        def cr_src(x):
            return constrain(x, ("data", "view"), "seq", None)

        ref = cr_ref((ref_feature + pe).reshape(B, H * W, C))
        src = cr_src((src_features + pe[:, None]).reshape(B * S, H * W, C))

        layers = [
            EncoderLayer(self.d_model, self.n_heads, name=f"layer{i}")
            for i in range(len(self.layer_names))
        ]

        ref_intermediates: list[jax.Array] = []
        for i, name in enumerate(self.layer_names):
            if name == "self":
                ref = cr_ref(layers[i](ref, ref))
                ref_intermediates.append(ref)
                src = cr_src(layers[i](src, src))
            elif name == "cross":
                inter = ref_intermediates[i // 2]
                tiled = cr_src(
                    jnp.broadcast_to(
                        inter[:, None], (B, S, H * W, C)
                    ).reshape(B * S, H * W, C)
                )
                src = cr_src(layers[i](src, tiled))
            else:
                raise ValueError(f"unknown layer kind {name}")

        return ref.reshape(B, H, W, C), src.reshape(B, S, H, W, C)


class FMTWithPathway(nn.Module):
    """FMT on stage-1 features + top-down pathway into stages 2 and 3."""

    base_channels: int = 8
    d_model: int = 32
    n_heads: int = 8
    layer_names: tuple[str, ...] = ("self", "cross") * 4

    @nn.compact
    def __call__(
        self, features: dict[str, jax.Array]
    ) -> dict[str, jax.Array]:
        """Args:
          features: {"stage1": [B, V, h1, w1, 4bc], "stage2": [B, V, h2, w2, 2bc],
                     "stage3": [B, V, h3, w3, bc]} — view 0 is the reference.
        """
        bc = self.base_channels
        s1, s2, s3 = features["stage1"], features["stage2"], features["stage3"]
        B, V = s1.shape[:2]

        ref_out, src_out = FMT(
            self.d_model, self.n_heads, tuple(self.layer_names), name="FMT"
        )(s1[:, 0], s1[:, 1:])
        s1 = jnp.concatenate([ref_out[:, None], src_out], axis=1)

        dim_red1 = ConvND(bc * 2, 1, use_bias=False, name="dim_reduction_1")
        dim_red2 = ConvND(bc, 1, use_bias=False, name="dim_reduction_2")
        smooth1 = ConvND(bc * 2, 3, padding=1, use_bias=False, name="smooth_1")
        smooth2 = ConvND(bc, 3, padding=1, use_bias=False, name="smooth_2")

        def flat(x):  # [B, V, h, w, c] -> [B*V, h, w, c]
            return x.reshape(B * V, *x.shape[2:])

        def unflat(x):
            return x.reshape(B, V, *x.shape[1:])

        s1f, s2f, s3f = flat(s1), flat(s2), flat(s3)
        s2f = smooth1(
            resize_bilinear(dim_red1(s1f), s2f.shape[1:3]) + s2f
        )
        s3f = smooth2(
            resize_bilinear(dim_red2(s2f), s3f.shape[1:3]) + s3f
        )
        return {"stage1": s1, "stage2": unflat(s2f), "stage3": unflat(s3f)}
