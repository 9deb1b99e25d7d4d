"""Typed configuration shared by every entry point.

The reference scattered hyperparameters across argparse definitions, shell
scripts, and constructor defaults (SURVEY.md §5 "Config / flag system");
here a single frozen dataclass tree is the source of truth. The defaults
are the reference's DTU recipe (reference models/TransMVSNet.py:113-115,
scripts/train.sh:9-24).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    ndepths: Sequence[int] = (48, 32, 8)
    depth_interval_ratios: Sequence[float] = (4.0, 1.0, 0.5)
    cr_base_channels: Sequence[int] = (8, 8, 8)
    base_channels: int = 8
    fmt_d_model: int = 32
    fmt_nhead: int = 8
    fmt_layers: Sequence[str] = ("self", "cross") * 4
    # Final-depth clamp range; None keeps float depth unclamped. The
    # reference hard-codes DTU's (425, 935) (a fork artifact,
    # reference models/TransMVSNet.py:220-221) — here it is per-dataset config.
    depth_clamp: tuple[float, float] | None = None
    # Process all views through FeatureNet as one batch (faster on TPU;
    # changes train-mode BN statistics from per-view to joint).
    batch_views_jointly: bool = True
    # SyncBatchNorm (reference train.py:363) needs no switch here: under
    # single-controller jit the batch arrays are GLOBAL, so BN's
    # batch-axis mean/var are cross-replica reductions by construction —
    # GSPMD inserts the collectives when the batch is sharded over 'data'.
    # Activation compute dtype: "float32" (reference numerics) or
    # "bfloat16" (TPU-native speed; geometry/softmax/losses stay f32).
    compute_dtype: str = "float32"
    # Use the Pallas TPU kernels for the warp/correlation and DCN hot
    # paths (ignored off-TPU). Differentiable: custom VJPs linearize the
    # XLA reference path around the saved inputs (ops/pallas/vjp.py), so
    # training may enable this too.
    use_pallas: bool = False
    # Rematerialize FeatureNet/FMT/CostRegNet/PixelwiseNet activations in
    # the backward pass (jax.checkpoint via nn.remat). Measured at the DTU
    # recipe shape (512x640, 5 views, bf16, Pallas fwd) on one v5e chip:
    # B=1 fits either way (9.04 s/step remat vs 8.87 s/step without, ~2%
    # remat overhead); B=2 exceeds 16 GB HBM even WITH remat (19.3 GB —
    # XLA assigns batch-minor lane-padded layouts to the backward convs).
    # The B=2 recipe therefore needs ≥2 chips (data-parallel) or native
    # backward kernels; see PERFORMANCE.md "Training performance".
    remat: bool = False
    # Run the Pallas kernels in interpret mode off-TPU (slow; testing only).
    # With use_pallas=True on a non-TPU backend this keeps the kernel code
    # path live — e.g. the multichip dryrun proves kernels × GSPMD compose.
    pallas_interpret: bool = False
    # Depth-as-channels CostRegNet (models/cost_reg.CostRegNetDense): the
    # same math and parameter tree, expressed as MXU-shaped 2-D convs.
    dense_cost_reg: bool = True
    # Accumulate the weighted view sum inside the warp kernel at stages
    # with precomputed view weights, never materializing the [B, S, D, h, w]
    # per-view volume. Measured neutral at batch 1 (2.02 vs 2.06 maps/s) but
    # saves ~0.5 GB of HBM transient per stage at the reference's test
    # batch 3 — enable for large batches/resolutions.
    fused_view_sum: bool = False

    @property
    def num_stages(self) -> int:
        return len(self.ndepths)

    @property
    def stage_scales(self) -> Sequence[int]:
        return tuple(2 ** (self.num_stages - 1 - i) for i in range(self.num_stages))


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-3
    lr_decay_epochs: Sequence[int] = (6, 8, 12)
    lr_decay_gamma: float = 0.5
    warmup_iters: int = 500
    warmup_factor: float = 1.0 / 3.0
    weight_decay: float = 1e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    epochs: int = 16
    batch_size: int = 2  # per data-parallel replica
    dlossw: Sequence[float] = (1.0, 1.0, 1.0)
    seed: int = 1
    summary_freq: int = 50
    save_freq: int = 1
    eval_freq: int = 1


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "dtu"
    datapath: str = ""
    trainlist: str = ""
    testlist: str = ""
    nviews: int = 5
    numdepth: int = 192
    interval_scale: float = 1.06
    # Eval-time max image size (snapped to multiples of 32 by the loader).
    max_h: int = 864
    max_w: int = 1152


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    method: str = "dynamic"  # "dynamic" | "native"
    photo_threshold: float = 0.3
    thres_view: int = 3
    num_consistent: int = 3
    disp_threshold: float = 0.25


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axis sizes: data × view × depth sharding."""

    data: int = 1
    view: int = 1
    depth: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    fusion: FusionConfig = dataclasses.field(default_factory=FusionConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    logdir: str = "./checkpoints"
    mode: str = "train"
