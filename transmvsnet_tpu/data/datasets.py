"""Dataset layer: DTU / BlendedMVS training, DTU / Tanks-and-Temples eval.

Host-side NumPy/cv2 pipelines producing the model's sample contract
(channel-last):

  {"imgs": [V, H, W, 3] float32,
   "proj_matrices": {"stage1".."stage3": [V, 2, 4, 4]},
   "depth_values": [Dh],
   train-only: "depth"/"mask": {"stageN": [h, w]}, "depth_interval": float,
   eval-only:  "filename": "scan/{}/NNNNNNNN{}"}

Behavioral contracts follow the reference loaders with the fork's debugger
breakpoints removed (SURVEY.md provenance caveat): dtu_yao.py,
bld_train.py, general_eval.py, tnt_eval.py.
"""

from __future__ import annotations

import os
import threading
from typing import Any

import cv2
import numpy as np
from PIL import Image

from transmvsnet_tpu.data.cams import (
    CameraInfo,
    read_cam_file,
    read_pair_file,
    scale_mvs_input,
)
from transmvsnet_tpu.data.pfm import read_pfm


def _read_img(path: str) -> np.ndarray:
    return np.asarray(Image.open(path), dtype=np.float32) / 255.0


def _stage_proj_matrices(pairs: list[np.ndarray]) -> dict[str, np.ndarray]:
    """Per-stage [V, 2, 4, 4]: stage1 K as given; stage2/3 scale K by 2/4
    (reference datasets/dtu_yao.py:174-184)."""
    proj = np.stack(pairs)  # [V, 2, 4, 4]
    out = {"stage1": proj}
    for name, mult in [("stage2", 2.0), ("stage3", 4.0)]:
        p = proj.copy()
        p[:, 1, :2, :] = proj[:, 1, :2, :] * mult
        out[name] = p
    return out


def _pyramid(arr: np.ndarray) -> dict[str, np.ndarray]:
    """stage1 = 1/4, stage2 = 1/2, stage3 = full, nearest (dtu_yao.py:96-122)."""
    h, w = arr.shape
    return {
        "stage1": cv2.resize(arr, (w // 4, h // 4), interpolation=cv2.INTER_NEAREST),
        "stage2": cv2.resize(arr, (w // 2, h // 2), interpolation=cv2.INTER_NEAREST),
        "stage3": arr,
    }


def read_scan_list(path: str) -> list[str]:
    with open(path) as f:
        return [line.rstrip() for line in f if line.strip()]


class DTUTrainDataset:
    """Yao Yao's preprocessed DTU: 49 viewpoints × 7 lights per scan.

    Images 1600×1200 → ÷2 + center-crop to 640×512; hi-res PFM depth and
    >10-intensity visibility masks pyramided per stage
    (reference datasets/dtu_yao.py).
    """

    def __init__(
        self,
        datapath: str,
        listfile: str | list[str],
        mode: str = "train",
        nviews: int = 5,
        ndepths: int = 192,
        interval_scale: float = 1.06,
    ):
        assert mode in ("train", "val", "test")
        self.datapath = datapath
        self.mode = mode
        self.nviews = nviews
        self.ndepths = ndepths
        self.interval_scale = interval_scale
        scans = (
            read_scan_list(listfile) if isinstance(listfile, str) else list(listfile)
        )
        self.metas: list[tuple[str, int, int, list[int]]] = []
        pair_path = os.path.join(datapath, "Cameras/pair.txt")
        pairs = read_pair_file(pair_path)
        for scan in scans:
            for ref_view, src_views in pairs:
                for light_idx in range(7):
                    self.metas.append((scan, light_idx, ref_view, src_views))

    def __len__(self) -> int:
        return len(self.metas)

    @staticmethod
    def prepare_img(hr_img: np.ndarray) -> np.ndarray:
        """1600×1200 → ÷2 → center-crop 640×512 (dtu_yao.py:75-89)."""
        h, w = hr_img.shape[:2]
        ds = cv2.resize(hr_img, (w // 2, h // 2), interpolation=cv2.INTER_NEAREST)
        h, w = ds.shape[:2]
        th, tw = 512, 640
        sh, sw = (h - th) // 2, (w - tw) // 2
        return ds[sh : sh + th, sw : sw + tw]

    def __getitem__(self, idx: int) -> dict[str, Any]:
        scan, light_idx, ref_view, src_views = self.metas[idx]
        view_ids = [ref_view] + src_views[: self.nviews - 1]

        imgs, pairs = [], []
        depth_ms = mask_ms = depth_values = None
        depth_interval = None
        for i, vid in enumerate(view_ids):
            img_path = os.path.join(
                self.datapath,
                f"Rectified/{scan}_train/rect_{vid + 1:0>3}_{light_idx}_r5000.png",
            )
            cam_path = os.path.join(self.datapath, f"Cameras/train/{vid:0>8}_cam.txt")
            cam = read_cam_file(
                cam_path, "dtu_train", interval_scale=self.interval_scale
            )
            imgs.append(self.prepare_img(_read_img(img_path)))
            pairs.append(cam.proj_pair())

            if i == 0:
                mask_path = os.path.join(
                    self.datapath, f"Depths_raw/{scan}/depth_visual_{vid:0>4}.png"
                )
                depth_path = os.path.join(
                    self.datapath, f"Depths_raw/{scan}/depth_map_{vid:0>4}.pfm"
                )
                mask_hr = (
                    np.asarray(Image.open(mask_path), dtype=np.float32) > 10
                ).astype(np.float32)
                mask_ms = _pyramid(self.prepare_img(mask_hr))
                depth_hr = read_pfm(depth_path)[0].astype(np.float32)
                depth_ms = _pyramid(self.prepare_img(depth_hr))
                depth_interval = cam.depth_interval
                depth_max = cam.depth_interval * self.ndepths + cam.depth_min
                depth_values = np.arange(
                    cam.depth_min, depth_max, cam.depth_interval, dtype=np.float32
                )

        return {
            "imgs": np.stack(imgs).astype(np.float32),
            "proj_matrices": _stage_proj_matrices(pairs),
            "depth": depth_ms,
            "mask": mask_ms,
            "depth_values": depth_values,
            "depth_interval": np.float32(depth_interval),
        }


class BlendedTrainDataset:
    """BlendedMVS finetune loader (reference datasets/bld_train.py).

    Depth range from cam line 11 (min, …, max); validity mask = depth within
    [min, min + interval·(ndepths-1)]; 768×576 images.
    """

    def __init__(
        self,
        datapath: str,
        listfile: str | list[str],
        mode: str = "train",
        nviews: int = 4,
        ndepths: int = 192,
        interval_scale: float = 1.0,
    ):
        assert mode in ("train", "val", "test")
        self.datapath = datapath
        self.mode = mode
        self.nviews = nviews
        self.ndepths = ndepths
        scans = (
            read_scan_list(listfile) if isinstance(listfile, str) else list(listfile)
        )
        self.metas: list[tuple[str, int, list[int]]] = []
        for scan in scans:
            pairs = read_pair_file(os.path.join(datapath, f"{scan}/cams/pair.txt"))
            for ref_view, src_views in pairs:
                if len(src_views) < self.nviews - 1:
                    continue
                self.metas.append((scan, ref_view, src_views))

    def __len__(self) -> int:
        return len(self.metas)

    def __getitem__(self, idx: int) -> dict[str, Any]:
        scan, ref_view, src_views = self.metas[idx]
        view_ids = [ref_view] + src_views[: self.nviews - 1]

        imgs, pairs = [], []
        depth_ms = mask_ms = depth_values = None
        depth_interval = None
        for i, vid in enumerate(view_ids):
            img_path = os.path.join(
                self.datapath, f"{scan}/blended_images/{vid:0>8}.jpg"
            )
            cam_path = os.path.join(self.datapath, f"{scan}/cams/{vid:0>8}_cam.txt")
            cam = read_cam_file(cam_path, "bld", ndepths=self.ndepths)
            imgs.append(_read_img(img_path))
            pairs.append(cam.proj_pair())

            if i == 0:
                depth_path = os.path.join(
                    self.datapath, f"{scan}/rendered_depth_maps/{vid:0>8}.pfm"
                )
                depth = read_pfm(depth_path)[0].astype(np.float32)
                depth_end = cam.depth_interval * (self.ndepths - 1) + cam.depth_min
                mask = ((depth >= cam.depth_min) & (depth <= depth_end)).astype(
                    np.float32
                )
                mask_ms = _pyramid(mask)
                depth_ms = _pyramid(depth)
                depth_interval = cam.depth_interval
                depth_max = cam.depth_interval * self.ndepths + cam.depth_min
                depth_values = np.arange(
                    cam.depth_min, depth_max, cam.depth_interval, dtype=np.float32
                )

        return {
            "imgs": np.stack(imgs).astype(np.float32),
            "proj_matrices": _stage_proj_matrices(pairs),
            "depth": depth_ms,
            "mask": mask_ms,
            "depth_values": depth_values,
            "depth_interval": np.float32(depth_interval),
        }


class GeneralEvalDataset:
    """DTU-test-style eval loader (reference datasets/general_eval.py).

    Resizes to fit (max_h, max_w) snapped to multiples of 32, rescales
    intrinsics, keeps a per-sample consistent resolution, pads short
    src-view lists by repeating the best source view.
    """

    def __init__(
        self,
        datapath: str,
        listfile: str | list[str],
        nviews: int = 5,
        ndepths: int = 192,
        interval_scale: float = 1.0,
        max_h: int = 864,
        max_w: int = 1152,
    ):
        self.datapath = datapath
        self.nviews = nviews
        self.ndepths = ndepths
        self.interval_scale = interval_scale
        self.max_h, self.max_w = max_h, max_w
        # Cross-sample resolution pin (the reference's fix_res/fix_wh
        # coupling, general_eval.py:162-180): the first sample's resolution
        # becomes the run's resolution, so batches over mixed-size scans
        # stack cleanly and XLA sees one shape.
        self._run_hw: tuple[int, int] | None = None
        self._run_hw_lock = threading.Lock()
        scans = (
            read_scan_list(listfile) if isinstance(listfile, str) else list(listfile)
        )
        self.metas: list[tuple[str, int, list[int]]] = []
        for scan in scans:
            for ref_view, src_views in read_pair_file(
                os.path.join(datapath, f"{scan}/pair.txt")
            ):
                if len(src_views) < self.nviews:
                    src_views = src_views + [src_views[0]] * (
                        self.nviews - len(src_views)
                    )
                self.metas.append((scan, ref_view, src_views))

    def __len__(self) -> int:
        return len(self.metas)

    def __getitem__(self, idx: int) -> dict[str, Any]:
        scan, ref_view, src_views = self.metas[idx]
        view_ids = [ref_view] + src_views[: self.nviews - 1]

        imgs, pairs = [], []
        depth_values = None
        std_hw = None
        for i, vid in enumerate(view_ids):
            img_path = os.path.join(self.datapath, f"{scan}/images_post/{vid:0>8}.jpg")
            if not os.path.exists(img_path):
                img_path = os.path.join(self.datapath, f"{scan}/images/{vid:0>8}.jpg")
            cam_path = os.path.join(self.datapath, f"{scan}/cams/{vid:0>8}_cam.txt")
            img = _read_img(img_path)
            cam = read_cam_file(
                cam_path,
                "eval",
                interval_scale=self.interval_scale,
                ndepths=self.ndepths,
            )
            img, intr = scale_mvs_input(
                img, cam.intrinsics, self.max_w, self.max_h
            )
            if i == 0:
                with self._run_hw_lock:
                    if self._run_hw is None:
                        self._run_hw = tuple(img.shape[:2])
                std_hw = self._run_hw
            if img.shape[:2] != std_hw:
                sh = std_hw[0] / img.shape[0]
                sw = std_hw[1] / img.shape[1]
                img = cv2.resize(img, (std_hw[1], std_hw[0]))
                intr = intr.copy()
                intr[0, :] *= sw
                intr[1, :] *= sh
            imgs.append(img)
            pairs.append(
                CameraInfo(intr, cam.extrinsics, cam.depth_min, cam.depth_interval)
                .proj_pair()
            )
            if i == 0:
                depth_values = np.arange(
                    cam.depth_min,
                    cam.depth_interval * (self.ndepths - 0.5) + cam.depth_min,
                    cam.depth_interval,
                    dtype=np.float32,
                )

        return {
            "imgs": np.stack(imgs).astype(np.float32),
            "proj_matrices": _stage_proj_matrices(pairs),
            "depth_values": depth_values,
            "filename": scan + "/{}/" + f"{view_ids[0]:0>8}" + "{}",
        }


class TnTEvalDataset:
    """Tanks & Temples eval loader (reference datasets/tnt_eval.py).

    Per-scene native sizes, cams from cams_1/, depth range = (min, max) from
    line 11, optional inverse-depth sampling, nviews clipped to available
    source views.
    """

    IMAGE_SIZES = {
        "Family": (1920, 1080),
        "Francis": (1920, 1080),
        "Horse": (1920, 1080),
        "Lighthouse": (2048, 1080),
        "M60": (2048, 1080),
        "Panther": (2048, 1080),
        "Playground": (1920, 1080),
        "Train": (1920, 1080),
        "Auditorium": (1920, 1080),
        "Ballroom": (1920, 1080),
        "Courtroom": (1920, 1080),
        "Museum": (1920, 1080),
        "Palace": (1920, 1080),
        "Temple": (1920, 1080),
    }

    def __init__(
        self,
        datapath: str,
        listfile: str | list[str],
        nviews: int = 11,
        ndepths: int = 192,
        interval_scale: float = 1.0,
        inverse_depth: bool = False,
        pad_views: bool = True,
        bucket_hw: tuple[int, int] | None = None,
    ):
        """XLA shape bucketing (SURVEY §7 hard part 5): with ``pad_views``
        every sample has exactly ``nviews`` views (short src lists padded by
        repeating the best source view, the general_eval.py:53-57 contract)
        instead of the reference's per-sample clipping — per-sample V
        variance would trigger one TPU recompile per distinct V. With the
        per-scene native sizes the full TnT run then compiles at most one
        graph per distinct (H, W) (two: 1920- and 2048-wide groups);
        ``bucket_hw`` forces a single (max_h, max_w) bucket for all scenes.
        """
        self.datapath = datapath
        self.nviews = nviews
        self.ndepths = ndepths
        self.interval_scale = interval_scale
        self.inverse_depth = inverse_depth
        self.pad_views = pad_views
        self.bucket_hw = bucket_hw
        scans = (
            read_scan_list(listfile) if isinstance(listfile, str) else list(listfile)
        )
        self.metas: list[tuple[str, int, list[int]]] = []
        for scan in scans:
            for ref_view, src_views in read_pair_file(
                os.path.join(datapath, f"{scan}/pair.txt")
            ):
                self.metas.append((scan, ref_view, src_views))

    def __len__(self) -> int:
        return len(self.metas)

    def __getitem__(self, idx: int) -> dict[str, Any]:
        scan, ref_view, src_views = self.metas[idx]
        if self.pad_views:
            if len(src_views) < self.nviews - 1 and src_views:
                src_views = src_views + [src_views[0]] * (
                    self.nviews - 1 - len(src_views)
                )
            nviews = self.nviews
        else:
            nviews = min(self.nviews, len(src_views) + 1)
        view_ids = [ref_view] + src_views[: nviews - 1]
        if self.bucket_hw is not None:
            max_h, max_w = self.bucket_hw
            # Force the exact bucket shape: the per-view resize below is a
            # pure intrinsics rescale, so geometry stays exact even when the
            # aspect ratio changes.
            std_hw = (max_h // 32 * 32, max_w // 32 * 32)
        else:
            max_w, max_h = self.IMAGE_SIZES[scan]
            std_hw = None

        imgs, pairs = [], []
        depth_values = None
        for i, vid in enumerate(view_ids):
            img_path = os.path.join(self.datapath, f"{scan}/images/{vid:0>8}.jpg")
            cam_path = os.path.join(self.datapath, f"{scan}/cams_1/{vid:0>8}_cam.txt")
            img = _read_img(img_path)
            cam = read_cam_file(cam_path, "minmax", ndepths=self.ndepths)
            img, intr = scale_mvs_input(img, cam.intrinsics, max_w, max_h)
            if std_hw is None:
                std_hw = img.shape[:2]
            if img.shape[:2] != std_hw:
                sh = std_hw[0] / img.shape[0]
                sw = std_hw[1] / img.shape[1]
                img = cv2.resize(img, (std_hw[1], std_hw[0]))
                intr = intr.copy()
                intr[0, :] *= sw
                intr[1, :] *= sh
            imgs.append(img)
            pairs.append(
                CameraInfo(intr, cam.extrinsics, cam.depth_min, cam.depth_interval)
                .proj_pair()
            )
            if i == 0:
                if not self.inverse_depth:
                    depth_values = np.arange(
                        cam.depth_min,
                        cam.depth_interval * self.ndepths + cam.depth_min,
                        cam.depth_interval,
                        dtype=np.float32,
                    )[: self.ndepths]
                else:
                    depth_end = cam.depth_max - cam.depth_interval / self.interval_scale
                    inv = np.linspace(
                        1.0 / depth_end, 1.0 / cam.depth_min, self.ndepths,
                        endpoint=False,
                    )
                    depth_values = (1.0 / inv).astype(np.float32)

        return {
            "imgs": np.stack(imgs).astype(np.float32),
            "proj_matrices": _stage_proj_matrices(pairs),
            "depth_values": depth_values,
            "filename": scan + "/{}/" + f"{view_ids[0]:0>8}" + "{}",
        }
