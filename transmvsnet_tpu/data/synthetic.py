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


def _texture(
    x: np.ndarray, y: np.ndarray, phase: float = 0.0, freq: float = 1.0
) -> np.ndarray:
    """Smooth, high-frequency-ish RGB texture over world coordinates.

    ``freq`` scales the spatial frequencies: higher values sharpen the
    photometric correlation peak (easier sub-pixel matching) at the cost
    of aliasing risk at coarse pyramid levels — keep the shortest
    wavelength above the stage-1 pixel footprint.
    """
    x = freq * x
    y = freq * y
    r = 0.5 + 0.5 * np.sin(3.1 * x + phase) * np.cos(2.7 * y)
    g = 0.5 + 0.5 * np.sin(1.7 * x + 2.3 * y + 2.0 * phase)
    b = 0.5 + 0.25 * np.sin(5.3 * x + phase) + 0.25 * np.cos(4.1 * y)
    return np.stack([r, g, b], axis=-1).astype(np.float32)


class SyntheticScene:
    """V cameras looking at the plane n·p = c from ~(0,0,0) along +z.

    With ``num_objects > 0``, textured spheres float in front of the plane
    (closed-form ray intersection), giving a multi-object benchmark with
    occlusions and depth discontinuities — the strongest hermetic proxy for
    the DTU accuracy evaluation (see tests/test_accuracy_gate.py).
    """

    def __init__(
        self,
        num_views: int = 5,
        height: int = 64,
        width: int = 96,
        focal: float = 120.0,
        plane_normal=(0.15, -0.1, 1.0),
        plane_offset: float = 6.0,
        seed: int = 0,
        num_objects: int = 0,
        baseline: float = 0.4,
        tex_freq: float = 1.0,
    ):
        """``baseline`` is the per-view camera-center spacing. Depth
        sensitivity is f*B/z^2 pixels of disparity per unit depth — at the
        defaults (f=120, B=0.4, z~6) that is ~1.3 px/unit, so sub-pixel
        matching noise caps depth accuracy at ~0.3-0.5 units; widen the
        ring (baseline 1.0 -> 3.3 px/unit) for accuracy-sensitive
        benchmarks like the gate in tests/test_accuracy_gate.py."""
        self.V, self.H, self.W = num_views, height, width
        n = np.asarray(plane_normal, dtype=np.float64)
        self.n = n / np.linalg.norm(n)
        self.c = plane_offset
        self.K = np.array(
            [[focal, 0, width / 2.0], [0, focal, height / 2.0], [0, 0, 1]],
            dtype=np.float64,
        )
        rng = np.random.RandomState(seed)
        # Spheres parked between the cameras and the plane, inside the
        # shared frustum (the plane sits ~plane_offset along +z).
        self.spheres: list[tuple[np.ndarray, float]] = []
        for i in range(num_objects):
            z = plane_offset * rng.uniform(0.55, 0.8)
            # keep centers within the view cone at depth z
            half_w = 0.35 * z * (width / 2.0) / focal
            half_h = 0.35 * z * (height / 2.0) / focal
            center = np.array(
                [
                    rng.uniform(-half_w, half_w),
                    rng.uniform(-half_h, half_h),
                    z,
                ]
            )
            radius = plane_offset * rng.uniform(0.06, 0.12)
            self.spheres.append((center, radius))
        self.extrinsics = []
        self.tex_freq = tex_freq
        for v in range(num_views):
            # Keep the ring convergent: the camera center is -R^T t, so a
            # camera with extrinsic translation +t sits at -t and must yaw
            # by -ang ≈ -t/plane_offset to keep the plane centered (with
            # +ang the ring DIVERGES: the rotation doubles the image shift
            # instead of cancelling it — measured as neighbor views sharing
            # only ~35% of their frusta, which starved fusion of ≥2-view
            # votes on every synthetic benchmark until round 3).
            ang = -baseline * (v - (num_views - 1) / 2) / plane_offset
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
            t = np.array(
                [baseline * (v - (num_views - 1) / 2), 0.05 * rng.randn(), 0.0]
            )
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
        obj_id = np.zeros(depth.shape, np.int32)  # 0 = plane
        # Spheres: solve ||o + t·d − s||² = r² per pixel; t is camera
        # z-depth because d_cam has unit z. Keep the nearest hit.
        for i, (s, r) in enumerate(self.spheres):
            oc = o_w - s
            a = np.sum(d_w * d_w, axis=-1)
            b = 2.0 * (d_w @ oc)
            cq = oc @ oc - r * r
            disc = b * b - 4.0 * a * cq
            hit = disc > 0
            tq = np.where(
                hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2.0 * a), np.inf
            )
            closer = hit & (tq > 1e-6) & (tq < depth)
            depth = np.where(closer, tq, depth)
            obj_id = np.where(closer, i + 1, obj_id)
        p_w = o_w[None, None] + depth[..., None] * d_w
        img = _texture(p_w[..., 0], p_w[..., 1], freq=self.tex_freq)
        for i, (s, r) in enumerate(self.spheres):
            on = obj_id == i + 1
            if on.any():
                # Texture spheres in their local frame with a per-object
                # phase so surfaces stay photo-consistent across views but
                # distinct between objects.
                local = p_w - s
                tex = _texture(
                    7.0 * local[..., 0] / r,
                    7.0 * local[..., 1] / r,
                    phase=1.7 * (i + 1),
                    freq=self.tex_freq,
                )
                img = np.where(on[..., None], tex, img)
        return img.astype(np.float32), depth.astype(np.float32)

    def surface_points(self, stride: int = 1) -> np.ndarray:
        """Exact surface samples: GT depths from every view unprojected to
        world — the analytic analog of the DTU STL ground-truth cloud."""
        pts = []
        for v in range(self.V):
            E = self.extrinsics[v]
            R, t = E[:3, :3], E[:3, 3]
            _, depth = self.render(v)
            u, vv = np.meshgrid(np.arange(self.W), np.arange(self.H))
            pix = np.stack([u, vv, np.ones_like(u)], axis=-1).astype(np.float64)
            d_cam = pix @ np.linalg.inv(self.K).T
            d_w = d_cam @ R  # R^T per row
            o_w = -R.T @ t
            p = o_w[None, None] + depth[..., None] * d_w
            pts.append(p[::stride, ::stride].reshape(-1, 3))
        return np.concatenate(pts, axis=0).astype(np.float32)

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
        num_objects: int = 0,
        baseline: float = 0.4,
        tex_freq: float = 1.0,
        **kwargs,
    ):
        self.nviews = nviews
        self.ndepths = ndepths
        self.num_samples = num_samples
        self.scenes = [
            SyntheticScene(
                num_views=nviews,
                height=height,
                width=width,
                seed=i,
                num_objects=num_objects,
                baseline=baseline,
                tex_freq=tex_freq,
            )
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
            # Stage-1 intrinsics convention: pixel rows scaled to 1/4
            # resolution, homogeneous row untouched (K[2,2] stays 1 — the
            # read_cam_file contract; dividing the whole 3x3 would silently
            # rescale the projective translation and de-calibrate the scene
            # against cam files written by materialize()).
            pair[1, :3, :3] = scene.K
            pair[1, :2, :] /= 4.0
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
