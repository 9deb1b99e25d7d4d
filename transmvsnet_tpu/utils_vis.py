"""Visualization helpers: depth colorization and TensorBoard image logging.

The reference colorizes depth maps into 8-bit ranges and writes image
summaries every few steps (reference utils.py:11-21, 98-116); these are the
framework-native equivalents.
"""

from __future__ import annotations

import numpy as np


def depth_to_gray(
    depth: np.ndarray, depth_min: float | None = None, depth_max: float | None = None
) -> np.ndarray:
    """Normalize a depth map to uint8 [0, 255] for visualization."""
    depth = np.asarray(depth, dtype=np.float32)
    valid = np.isfinite(depth) & (depth > 0)
    if depth_min is None:
        depth_min = float(depth[valid].min()) if valid.any() else 0.0
    if depth_max is None:
        depth_max = float(depth[valid].max()) if valid.any() else 1.0
    scaled = (np.clip(depth, depth_min, depth_max) - depth_min) / max(
        depth_max - depth_min, 1e-6
    )
    return (scaled * 255).astype(np.uint8)


def depth_to_color(
    depth: np.ndarray, depth_min: float | None = None, depth_max: float | None = None
) -> np.ndarray:
    """Colormapped uint8 [H, W, 3] depth visualization (jet-like via cv2)."""
    import cv2

    gray = depth_to_gray(depth, depth_min, depth_max)
    return cv2.applyColorMap(gray, cv2.COLORMAP_JET)[:, :, ::-1]  # BGR->RGB


def error_map(
    depth_est: np.ndarray, depth_gt: np.ndarray, mask: np.ndarray, cap: float = 20.0
) -> np.ndarray:
    """Absolute-error visualization, masked, capped at ``cap`` mm."""
    err = np.abs(np.asarray(depth_est) - np.asarray(depth_gt))
    err = np.where(np.asarray(mask) > 0.5, err, 0.0)
    return (np.clip(err / cap, 0, 1) * 255).astype(np.uint8)


def log_depth_images(logger, mode: str, outputs: dict, batch: dict, step: int):
    """Write depth/confidence/error image summaries if TB is available.

    ``logger`` is a train.loop.MetricsLogger; no-ops without TensorBoard.
    """
    tb = getattr(logger, "_tb", None)
    if tb is None or not getattr(logger, "enabled", False):
        return
    depth = np.asarray(outputs["stage3"]["depth"])[0]
    conf = np.asarray(outputs["stage3"]["photo_confidence"])[0]
    tb.add_image(f"{mode}/depth_est", depth_to_gray(depth)[None], step)
    tb.add_image(f"{mode}/confidence", (conf * 255).astype(np.uint8)[None], step)
    if "depth" in batch:
        gt = np.asarray(batch["depth"]["stage3"])[0]
        mask = np.asarray(batch["mask"]["stage3"])[0]
        tb.add_image(f"{mode}/depth_gt", depth_to_gray(gt)[None], step)
        tb.add_image(f"{mode}/error", error_map(depth, gt, mask)[None], step)
