"""The TransMVSNet cascade: features → FMT → 3-stage plane sweep.

Re-implements the behavior of the reference top module
(reference models/TransMVSNet.py:33-226): per-stage depth-hypothesis
sampling, per-source-view homography warp + correlation weighted by
PixelwiseNet visibility (computed at stage 1, nearest-upsampled ×2 for
later stages), 3D U-Net regularization, softmax over depth, and
winner-take-all depth with max-probability confidence.

TPU-first notes:
- Channel-last everywhere; views are batched through FeatureNet jointly by
  default (cfg.batch_views_jointly) for MXU utilization.
- The per-view similarity accumulation is associative — under a "view" mesh
  axis it becomes a psum (see transmvsnet_tpu/parallel).
- The final-depth clamp is per-dataset config (cfg.depth_clamp), not the
  reference's hard-coded [425, 935] fork artifact.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from transmvsnet_tpu.config import ModelConfig
from transmvsnet_tpu.models.cost_reg import (
    CostRegNet,
    CostRegNetDense,
    PixelwiseNet,
)
from transmvsnet_tpu.models.feature_net import FeatureNet
from transmvsnet_tpu.models.fmt import FMTWithPathway
from transmvsnet_tpu.ops.geometry import (
    fuse_projection,
    initial_depth_samples,
    refine_depth_samples,
)
from transmvsnet_tpu.ops.sampling import upsample_nearest_2x
from transmvsnet_tpu.ops.warp import warp_correlate
from transmvsnet_tpu.parallel.sharding import constrain


def depth_wta(prob_volume: jax.Array, depth_values: jax.Array) -> jax.Array:
    """Winner-take-all depth (reference models/module.py:474-482).

    Expressed as a one-hot reduction over D (argmax + masked sum) instead of
    ``take_along_axis`` — dynamic gathers are serial on TPU, while this is
    a cheap VPU select-and-reduce. Exact: first-max tie-breaking matches.

    Args: prob_volume, depth_values: [B, D, H, W]. Returns [B, H, W].
    """
    idx = jnp.argmax(prob_volume, axis=1, keepdims=True)  # [B, 1, H, W]
    d_iota = jax.lax.broadcasted_iota(jnp.int32, prob_volume.shape, 1)
    onehot = d_iota == idx  # [B, D, H, W]
    return jnp.sum(jnp.where(onehot, depth_values, 0), axis=1)


class TransMVSNet(nn.Module):
    cfg: ModelConfig = ModelConfig()

    def setup(self):
        cfg = self.cfg
        feat_cls, fmt_cls, pw_cls = FeatureNet, FMTWithPathway, PixelwiseNet
        cost_reg_cls = CostRegNetDense if cfg.dense_cost_reg else CostRegNet
        if cfg.remat:
            # Checkpoint at module granularity: only module outputs stay
            # live between forward and backward ('train' is a static arg).
            feat_cls = nn.remat(FeatureNet, static_argnums=(2,))
            fmt_cls = nn.remat(FMTWithPathway)
            pw_cls = nn.remat(PixelwiseNet, static_argnums=(2,))
            cost_reg_cls = nn.remat(cost_reg_cls, static_argnums=(2,))
        self.feature = feat_cls(
            cfg.base_channels,
            use_pallas=cfg.use_pallas,
            pallas_interpret=cfg.pallas_interpret,
        )
        self.fmt = fmt_cls(
            base_channels=cfg.base_channels,
            d_model=cfg.fmt_d_model,
            n_heads=cfg.fmt_nhead,
            layer_names=tuple(cfg.fmt_layers),
        )
        self.cost_regs = [cost_reg_cls(c) for c in cfg.cr_base_channels]
        self.pixel_wise_net = pw_cls()

    def extract_features(self, imgs: jax.Array, train: bool) -> dict[str, jax.Array]:
        """imgs [B, V, H, W, 3] -> per-stage features [B, V, h, w, C]."""
        imgs = imgs.astype(jnp.dtype(self.cfg.compute_dtype))
        B, V = imgs.shape[:2]
        if self.cfg.batch_views_jointly:
            feats = self.feature(imgs.reshape(B * V, *imgs.shape[2:]), train)
            feats = {k: v.reshape(B, V, *v.shape[1:]) for k, v in feats.items()}
        else:
            per_view = [self.feature(imgs[:, v], train) for v in range(V)]
            feats = {
                k: jnp.stack([f[k] for f in per_view], axis=1)
                for k in per_view[0]
            }
        feats = self.fmt(feats)
        # Defensive: the kernel dispatch keys on dtype, so a silent f32
        # promotion anywhere above would push the warp onto the slow path.
        dt = jnp.dtype(self.cfg.compute_dtype)
        return {k: v.astype(dt) for k, v in feats.items()}

    def depth_stage(
        self,
        features: jax.Array,
        proj: jax.Array,
        depth_values: jax.Array,
        cost_reg: CostRegNet,
        view_weights: jax.Array | None,
        train: bool,
    ) -> tuple[dict[str, jax.Array], jax.Array]:
        """One cascade stage (reference models/TransMVSNet.py:38-109).

        Args:
          features: [B, V, h, w, C] stage features, view 0 = reference.
          proj: [B, V, 2, 4, 4] stage projection pairs.
          depth_values: [B, D, h, w] hypotheses.
          view_weights: [B, V-1, h, w, 1] or None (stage 1 computes them).

        Returns: (outputs dict, view_weights).
        """
        B, V = features.shape[:2]
        S = V - 1
        D = depth_values.shape[1]
        h, w = features.shape[2], features.shape[3]
        ref_fea = features[:, 0]
        fused = fuse_projection(proj)  # [B, V, 4, 4]
        ref_proj, src_projs = fused[:, 0], fused[:, 1:]
        src_feas = constrain(features[:, 1:], "data", "view", None, None, None)

        # Pallas kernel dispatch: real kernels on TPU, interpret mode when
        # cfg.pallas_interpret (keeps the kernel path live in CPU tests and
        # the multichip dryrun — proves kernels × GSPMD compose).
        interp = None
        if self.cfg.use_pallas:
            if jax.default_backend() == "tpu":
                interp = False
            elif self.cfg.pallas_interpret:
                interp = True

        # Stages with precomputed view weights (2-3): fuse the weighted
        # accumulation over source views INTO the warp kernel — the
        # [B, S, D, h, w] per-view volume (127 MB f32 at stages 2-3) is
        # never materialized and ref/depth blocks are read once per
        # (strip, d) instead of per view. The in-kernel view sum is NOT
        # view-axis-associative under GSPMD, so this path is gated off
        # when the active mesh shards views.
        from transmvsnet_tpu.parallel.sharding import active_mesh

        mesh = active_mesh()
        view_sharded = mesh is not None and mesh.shape.get("view", 1) > 1
        if (
            view_weights is not None
            and self.cfg.fused_view_sum
            and not view_sharded
            and interp is not None
            and src_feas.dtype == jnp.bfloat16
        ):
            import functools

            from transmvsnet_tpu.ops.pallas.vjp import (
                warp_correlate_wsum_with_vjp,
            )
            from transmvsnet_tpu.ops.pallas.warp_bwd import (
                warp_correlate_wsum_bwd,
            )
            from transmvsnet_tpu.ops.pallas.warp_onehot import (
                warp_correlate_wsum_onehot,
            )

            fused_warp = warp_correlate_wsum_with_vjp(
                functools.partial(
                    warp_correlate_wsum_onehot, interpret=interp
                ),
                pallas_bwd=functools.partial(
                    warp_correlate_wsum_bwd, interpret=interp
                ),
            )
            vw_flat = view_weights[..., 0]  # [B, S, h, w]
            weighted = fused_warp(
                src_feas, ref_fea, src_projs, ref_proj, depth_values, vw_flat
            )
            similarity = weighted / (
                1e-5 + jnp.sum(vw_flat, axis=1)[:, None]
            )
        else:
            # All source views at once: [B, S, D, h, w]. The accumulation
            # over S below is associative — under a view-sharded mesh it
            # lowers to a psum.
            if interp is not None:
                import functools

                # Flatten views into the kernel's native batch grid (vmap
                # over a pallas_call with an ANY-space operand is
                # unsupported).
                pallas_bwd = None
                if src_feas.dtype == jnp.bfloat16:
                    # bf16 activations: one-hot MXU kernel (warp_onehot.py)
                    # paired with the native Pallas backward (warp_bwd.py).
                    from transmvsnet_tpu.ops.pallas.warp_bwd import (
                        warp_correlate_bwd,
                    )
                    from transmvsnet_tpu.ops.pallas.warp_onehot import (
                        warp_correlate_onehot as warp_kernel,
                    )

                    pallas_bwd = functools.partial(
                        warp_correlate_bwd, interpret=interp
                    )
                else:
                    from transmvsnet_tpu.ops.pallas.warp_rowsweep import (
                        warp_correlate_rowsweep as warp_kernel,
                    )
                from transmvsnet_tpu.ops.pallas.vjp import (
                    warp_correlate_with_vjp,
                )

                warp_fn = warp_correlate_with_vjp(
                    functools.partial(warp_kernel, interpret=interp),
                    pallas_bwd=pallas_bwd,
                )

                Cc = src_feas.shape[-1]
                sim = warp_fn(
                    src_feas.reshape(B * S, h, w, Cc),
                    jnp.broadcast_to(
                        ref_fea[:, None], (B, S, h, w, Cc)
                    ).reshape(B * S, h, w, Cc),
                    src_projs.reshape(B * S, 4, 4),
                    jnp.broadcast_to(ref_proj[:, None], (B, S, 4, 4)).reshape(
                        B * S, 4, 4
                    ),
                    jnp.broadcast_to(
                        depth_values[:, None], (B, S, D, h, w)
                    ).reshape(B * S, D, h, w),
                ).reshape(B, S, D, h, w)
            else:
                sim = jax.vmap(
                    lambda fea, p: warp_correlate(
                        fea, ref_fea, p, ref_proj, depth_values
                    ),
                    in_axes=(1, 1),
                    out_axes=1,
                )(src_feas, src_projs)
            sim = constrain(sim, "data", "view", "depth", None, None)

            if view_weights is None:
                # Reference computes visibility at stage 1 only; gradients
                # flow through the (non-detached) weights used in this
                # stage's sum, while later stages get the detached copies
                # (reference TransMVSNet.py:82-84,107).
                w_used = self.pixel_wise_net(
                    sim.reshape(B * S, D, h, w)[..., None], train
                ).reshape(B, S, h, w, 1)
                view_weights = jax.lax.stop_gradient(w_used)
            else:
                w_used = view_weights

            w_bcast = w_used[..., 0][:, :, None]  # [B, S, 1, h, w]
            similarity = jnp.sum(sim * w_bcast, axis=1) / (
                1e-5 + jnp.sum(w_bcast, axis=1)
            )
        similarity = constrain(similarity, "data", "depth", None, None)

        cost = cost_reg(
            similarity.astype(jnp.dtype(self.cfg.compute_dtype))[..., None],
            train,
        )[..., 0]  # [B, D, h, w]
        prob_volume = jax.nn.softmax(cost.astype(jnp.float32), axis=1)
        depth = depth_wta(prob_volume, depth_values)
        photo_confidence = jax.lax.stop_gradient(jnp.max(prob_volume, axis=1))
        outputs = {
            "depth": depth,
            "photo_confidence": photo_confidence,
            "prob_volume": prob_volume,
            "depth_values": depth_values,
        }
        return outputs, view_weights

    def run_stage(
        self,
        features: jax.Array,
        proj: jax.Array,
        depth_values: jax.Array,
        stage_idx: int,
        view_weights: jax.Array | None,
        train: bool = False,
    ) -> tuple[dict[str, jax.Array], jax.Array]:
        """depth_stage with the per-stage CostRegNet resolved by index.

        Exposed for stage-level profiling/driving via
        ``model.apply(vars, ..., method=TransMVSNet.run_stage)``.
        """
        return self.depth_stage(
            features, proj, depth_values, self.cost_regs[stage_idx],
            view_weights, train,
        )

    def __call__(
        self,
        imgs: jax.Array,
        proj_matrices: dict[str, jax.Array],
        depth_values: jax.Array,
        train: bool = False,
    ) -> dict[str, Any]:
        """Forward pass.

        Args:
          imgs: [B, V, H, W, 3], view 0 is the reference.
          proj_matrices: {"stage1".."stage3": [B, V, 2, 4, 4]}.
          depth_values: [B, Dh] dataset-level hypothesis sweep.

        Returns: {"stageN": {...}, "depth", "photo_confidence", ...} where the
        top-level entries are the final stage's.
        """
        cfg = self.cfg
        B, V, H, W, _ = imgs.shape
        num_hyp = depth_values.shape[1]
        depth_interval = (depth_values[:, -1] - depth_values[:, 0]) / num_hyp  # [B]

        features = self.extract_features(imgs, train)

        outputs: dict[str, Any] = {}
        prev_depth = None
        view_weights = None
        for i in range(cfg.num_stages):
            stage = f"stage{i + 1}"
            scale = cfg.stage_scales[i]
            h, w = H // scale, W // scale

            if prev_depth is None:
                samples = initial_depth_samples(depth_values, cfg.ndepths[i], (h, w))
            else:
                samples = refine_depth_samples(
                    jax.lax.stop_gradient(prev_depth),
                    cfg.ndepths[i],
                    cfg.depth_interval_ratios[i] * depth_interval,
                    (h, w),
                    (H, W),
                )
            if i > 0:
                BV = view_weights.shape[0] * view_weights.shape[1]
                vw = view_weights.reshape(BV, *view_weights.shape[2:])
                vw = upsample_nearest_2x(vw)
                view_weights = vw.reshape(B, V - 1, *vw.shape[1:])

            stage_out, view_weights = self.depth_stage(
                features[stage],
                proj_matrices[stage],
                samples,
                self.cost_regs[i],
                view_weights,
                train,
            )
            prev_depth = stage_out["depth"]
            if cfg.depth_clamp is not None:
                stage_out = dict(stage_out)
                stage_out["depth"] = jnp.clip(
                    prev_depth, cfg.depth_clamp[0], cfg.depth_clamp[1]
                )
            outputs[stage] = stage_out

        outputs.update(outputs[f"stage{cfg.num_stages}"])
        return outputs
