"""Functional train/eval steps with NaN guarding.

The step functions are pure (state, batch) -> (state, scalars) maps meant to
be jit/pjit-compiled over a device mesh; batch-axis sharding makes the
gradient reduction an automatic psum (the DDP-allreduce analog, reference
train.py:364-366). The NaN guard replaces the reference's NanError
skip-batch control flow (reference train.py:154-168) with a jittable
select: a non-finite loss applies a zero update and keeps the previous
parameters, optimizer state, and batch statistics.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from transmvsnet_tpu.models.losses import cascade_loss
from transmvsnet_tpu.train.metrics import standard_eval_metrics


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, variables, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
    )


def _select(pred, new, old):
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), new, old
    )


def _bld_metrics(outputs, batch) -> dict:
    """EPE / <1px / <3px finetune metrics (reference models/module.py:584-590)."""
    from transmvsnet_tpu.models.losses import _masked_mean

    gt = batch["depth"]["stage3"]
    mask = batch["mask"]["stage3"] > 0.5
    scale = (batch["depth_interval"] * (192.0 / 128.0)).reshape(-1, 1, 1)
    err = jnp.abs(gt - outputs["stage3"]["depth"]) / scale
    return {
        "epe": _masked_mean(err, mask),
        "less1": _masked_mean((err < 1.0).astype(jnp.float32), mask),
        "less3": _masked_mean((err < 3.0).astype(jnp.float32), mask),
    }


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    dlossw: Sequence[float] = (1.0, 1.0, 1.0),
    bld_metrics: bool = False,
) -> Callable[[TrainState, Mapping[str, Any]], tuple[TrainState, dict]]:
    def train_step(state: TrainState, batch: Mapping[str, Any]):
        def loss_fn(params):
            outputs, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["imgs"],
                batch["proj_matrices"],
                batch["depth_values"],
                train=True,
                mutable=["batch_stats"],
            )
            loss, depth_loss, total_entropy, wta, per_stage = cascade_loss(
                outputs, batch["depth"], batch["mask"], dlossw
            )
            extra = _bld_metrics(outputs, batch) if bld_metrics else {}
            extra = {**per_stage, **extra}
            conf = outputs["stage3"]["photo_confidence"]
            return loss, (
                updates["batch_stats"], depth_loss, total_entropy, wta, conf, extra,
            )

        (loss, (new_bs, depth_loss, total_entropy, wta, conf, extra)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )

        finite = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)

        new_state = TrainState(
            step=state.step + 1,
            params=_select(finite, new_params, state.params),
            batch_stats=_select(finite, new_bs, state.batch_stats),
            opt_state=_select(finite, new_opt_state, state.opt_state),
        )

        mask3 = batch["mask"]["stage3"] > 0.5
        scalars = {
            "loss": loss,
            "depth_loss": depth_loss,
            "entropy_loss": total_entropy,
            "skipped_nan": (~finite).astype(jnp.float32),
            **standard_eval_metrics(wta, batch["depth"]["stage3"], mask3),
            **extra,
            # Image-sized tensors for TB summaries; the loop strips the "_"
            # keys before metric averaging and only fetches them at log_freq.
            "_depth_est": wta,
            "_confidence": conf,
        }
        return new_state, scalars

    return train_step


def make_eval_step(
    model,
    dlossw: Sequence[float] = (1.0, 1.0, 1.0),
    bld_metrics: bool = False,
) -> Callable[[TrainState, Mapping[str, Any]], dict]:
    def eval_step(state: TrainState, batch: Mapping[str, Any]):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["imgs"],
            batch["proj_matrices"],
            batch["depth_values"],
            train=False,
        )
        loss, depth_loss, total_entropy, wta, per_stage = cascade_loss(
            outputs, batch["depth"], batch["mask"], dlossw
        )
        mask3 = batch["mask"]["stage3"] > 0.5
        extra = _bld_metrics(outputs, batch) if bld_metrics else {}
        extra = {**per_stage, **extra}
        return {
            "loss": loss,
            "depth_loss": depth_loss,
            "entropy_loss": total_entropy,
            **standard_eval_metrics(
                outputs["stage3"]["depth"], batch["depth"]["stage3"], mask3
            ),
            **extra,
            "_depth_est": outputs["stage3"]["depth"],
            "_confidence": outputs["stage3"]["photo_confidence"],
        }

    return eval_step


def make_infer_step(model) -> Callable[[TrainState, Mapping[str, Any]], dict]:
    """Inference: depth + blended confidence (reference test.py:93-144).

    Final confidence = stage3 conf × upsampled stage1 conf × upsampled
    stage2 conf; depth zeroed where the blend is < 0.01.
    """
    from transmvsnet_tpu.ops.sampling import resize_bilinear

    def infer_step(state: TrainState, batch: Mapping[str, Any]):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["imgs"],
            batch["proj_matrices"],
            batch["depth_values"],
            train=False,
        )
        depth = outputs["stage3"]["depth"]
        H, W = depth.shape[-2:]
        conf = outputs["stage3"]["photo_confidence"]
        for s in ("stage1", "stage2"):
            c = outputs[s]["photo_confidence"][..., None]
            conf = conf * resize_bilinear(c, (H, W))[..., 0]
        depth = jnp.where(conf < 0.01, 0.0, depth)
        return {"depth": depth, "confidence": conf}

    return infer_step
