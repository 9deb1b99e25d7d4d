"""Procedural multi-view scene with analytic ground-truth depth.

A textured slanted plane observed by a ring of pinhole cameras. Because
depth is closed-form, this serves as the end-to-end fixture the reference
never had (SURVEY.md §4): geometry round-trips, loss behavior, fusion and
benchmark evaluation are all testable without DTU data on disk.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def _texture(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Smooth, high-frequency-ish RGB texture over world coordinates."""
    r = 0.5 + 0.5 * np.sin(3.1 * x) * np.cos(2.7 * y)
    g = 0.5 + 0.5 * np.sin(1.7 * x + 2.3 * y)
    b = 0.5 + 0.25 * np.sin(5.3 * x) + 0.25 * np.cos(4.1 * y)
    return np.stack([r, g, b], axis=-1).astype(np.float32)


class SyntheticScene:
    """V cameras looking at the plane n·p = c from ~(0,0,0) along +z."""

    def __init__(
        self,
        num_views: int = 5,
        height: int = 64,
        width: int = 96,
        focal: float = 120.0,
        plane_normal=(0.15, -0.1, 1.0),
        plane_offset: float = 6.0,
        seed: int = 0,
    ):
        self.V, self.H, self.W = num_views, height, width
        n = np.asarray(plane_normal, dtype=np.float64)
        self.n = n / np.linalg.norm(n)
        self.c = plane_offset
        self.K = np.array(
            [[focal, 0, width / 2.0], [0, focal, height / 2.0], [0, 0, 1]],
            dtype=np.float64,
        )
        rng = np.random.RandomState(seed)
        self.extrinsics = []
        for v in range(num_views):
            ang = 0.06 * (v - (num_views - 1) / 2)
            tilt = 0.03 * rng.randn()
            Ry = np.array(
                [
                    [np.cos(ang), 0, np.sin(ang)],
                    [0, 1, 0],
                    [-np.sin(ang), 0, np.cos(ang)],
                ]
            )
            Rx = np.array(
                [
                    [1, 0, 0],
                    [0, np.cos(tilt), -np.sin(tilt)],
                    [0, np.sin(tilt), np.cos(tilt)],
                ]
            )
            R = Ry @ Rx
            t = np.array([0.4 * (v - (num_views - 1) / 2), 0.05 * rng.randn(), 0.0])
            E = np.eye(4)
            E[:3, :3] = R
            E[:3, 3] = t
            self.extrinsics.append(E)

    def render(self, view: int) -> tuple[np.ndarray, np.ndarray]:
        """Returns (image [H, W, 3], depth [H, W]) for one camera."""
        E = self.extrinsics[view]
        R, t = E[:3, :3], E[:3, 3]
        u, v = np.meshgrid(np.arange(self.W), np.arange(self.H))
        pix = np.stack([u, v, np.ones_like(u)], axis=-1).astype(np.float64)
        d_cam = pix @ np.linalg.inv(self.K).T  # [H, W, 3], z component == 1
        # world ray: p_w = R^-1 (depth*d - t); plane n·p_w = c
        Rinv = R.T
        d_w = d_cam @ Rinv.T
        o_w = -Rinv @ t
        denom = d_w @ self.n
        depth = (self.c - o_w @ self.n) / np.maximum(denom, 1e-9)
        p_w = o_w[None, None] + depth[..., None] * d_w
        img = _texture(p_w[..., 0], p_w[..., 1])
        return img.astype(np.float32), depth.astype(np.float32)

    def depth_range(self) -> tuple[float, float]:
        depths = [self.render(v)[1] for v in range(self.V)]
        lo = min(float(d.min()) for d in depths)
        hi = max(float(d.max()) for d in depths)
        margin = 0.25 * (hi - lo) + 1e-3
        return lo - margin, hi + margin


class SyntheticDataset:
    """Dataset-contract wrapper over SyntheticScene.

    Emits the training sample contract (depth/mask pyramids) so the train
    step, loss, fusion, and evaluation can run hermetically.
    """

    def __init__(
        self,
        datapath: str = "",
        listfile: str | list[str] = "",
        mode: str = "train",
        nviews: int = 5,
        ndepths: int = 48,
        num_samples: int = 4,
        height: int = 64,
        width: int = 96,
        **kwargs,
    ):
        self.nviews = nviews
        self.ndepths = ndepths
        self.num_samples = num_samples
        self.scenes = [
            SyntheticScene(num_views=nviews, height=height, width=width, seed=i)
            for i in range(num_samples)
        ]

    def __len__(self) -> int:
        return self.num_samples

    def __getitem__(self, idx: int) -> dict[str, Any]:
        import cv2

        scene = self.scenes[idx]
        imgs, depths = zip(*(scene.render(v) for v in range(scene.V)))
        lo, hi = scene.depth_range()
        interval = (hi - lo) / self.ndepths
        depth_values = (lo + np.arange(self.ndepths) * interval).astype(np.float32)

        pairs = []
        for v in range(scene.V):
            pair = np.zeros((2, 4, 4), dtype=np.float32)
            pair[0] = scene.extrinsics[v]
            pair[1, :3, :3] = scene.K / 4.0  # stage-1 intrinsics convention
            pairs.append(pair)
        proj = np.stack(pairs)
        stages = {"stage1": proj}
        for name, mult in [("stage2", 2.0), ("stage3", 4.0)]:
            p = proj.copy()
            p[:, 1, :2, :] = proj[:, 1, :2, :] * mult
            stages[name] = p

        d = depths[0]
        h, w = d.shape
        depth_ms = {
            "stage1": cv2.resize(d, (w // 4, h // 4), interpolation=cv2.INTER_NEAREST),
            "stage2": cv2.resize(d, (w // 2, h // 2), interpolation=cv2.INTER_NEAREST),
            "stage3": d,
        }
        mask_ms = {k: np.ones_like(v) for k, v in depth_ms.items()}
        return {
            "imgs": np.stack(imgs),
            "proj_matrices": stages,
            "depth": depth_ms,
            "mask": mask_ms,
            "depth_values": depth_values,
            "depth_interval": np.float32(interval),
            "filename": f"synth{idx}" + "/{}/" + "00000000{}",
        }

    def materialize(self, outdir: str) -> None:
        """Write DTU-eval-layout files (images/, cams/, pair.txt) for CLI tests."""
        import cv2

        from transmvsnet_tpu.data.cams import write_cam_file

        for idx, scene in enumerate(self.scenes):
            scan_dir = os.path.join(outdir, f"synth{idx}")
            os.makedirs(os.path.join(scan_dir, "images"), exist_ok=True)
            os.makedirs(os.path.join(scan_dir, "cams"), exist_ok=True)
            lo, hi = scene.depth_range()
            interval = (hi - lo) / self.ndepths
            for v in range(scene.V):
                img, _ = scene.render(v)
                cv2.imwrite(
                    os.path.join(scan_dir, f"images/{v:0>8}.jpg"),
                    cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
                )
                pair = np.zeros((2, 4, 4), dtype=np.float32)
                pair[0] = scene.extrinsics[v]
                pair[1, :3, :3] = scene.K  # full-res intrinsics on disk
                write_cam_file(
                    os.path.join(scan_dir, f"cams/{v:0>8}_cam.txt"),
                    pair,
                    depth_line=f"{lo:.6f} {interval:.6f}",
                )
            with open(os.path.join(scan_dir, "pair.txt"), "w") as f:
                f.write(f"{scene.V}\n")
                for v in range(scene.V):
                    others = [o for o in range(scene.V) if o != v]
                    f.write(f"{v}\n")
                    f.write(
                        f"{len(others)} "
                        + " ".join(f"{o} {100.0 - i}" for i, o in enumerate(others))
                        + "\n"
                    )
