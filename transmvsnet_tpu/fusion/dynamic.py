"""Dynamic geometric-consistency depth-map fusion → point cloud.

Re-implements the reference's "dynamic" fuser behavior (reference
dynamic_fusion.py, originally from AA-RMVSNet): reproject each reference
pixel through every source view and back, then accept a pixel if enough
sources agree under a *dynamic* threshold ladder —

  masks_i = (reproj distance < i/4 px) ∧ (relative depth diff < i/1300),
  accepted ⇔ (#sources with the base mask ≥ thres_view)
             ∨ (∃ i ∈ [2, n]: #sources with masks_i ≥ i)

with the fused depth averaged over agreeing views and unprojected to a
colored world-space point cloud (reference dynamic_fusion.py:134-136,
221-228,253-264). Vectorized NumPy on the host; scans fan out over a
process pool (reference used Pool(8)); per-ref-view work is independent
and is the unit that shards across hosts in the distributed driver.

On-disk contract per scan folder: depth_est/*.pfm, confidence/*.pfm,
cams/*_cam.txt (MVSNet format), images/*.jpg, pair.txt.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from multiprocessing import Pool

import cv2
import numpy as np

from transmvsnet_tpu.data.cams import read_pair_file
from transmvsnet_tpu.data.pfm import read_pfm
from transmvsnet_tpu.fusion.ply import write_ply


@dataclass
class FusionParams:
    photo_threshold: float = 0.3
    thres_view: int = 3
    # Vote-ladder threshold scales. The reference's i/4-px and i/1300
    # relative-depth rungs (dynamic_fusion.py:134-136) are tuned to DTU's
    # quantization (192 bins over ~510 mm → ~0.1% relative steps); scenes
    # with coarser hypothesis grids (e.g. the synthetic benchmark) need the
    # rungs widened proportionally. 1.0 = reference behavior.
    dist_scale: float = 1.0
    rel_diff_scale: float = 1.0
    # "dynamic" = the vote-ladder acceptance above; "normal" = the
    # upstream fixed-threshold filter behind the published 0.314 DTU row
    # (reference README.md:149-152): a pixel is kept iff ≥ thres_view
    # sources agree within geo_pixel_thres px reprojection distance AND
    # geo_depth_thres relative depth difference (the MVSNet-family 1 px /
    # 0.01 convention). The delldu fork dropped this filter; the geometry
    # core (reproject_with_depth) is shared with the dynamic ladder.
    mode: str = "dynamic"
    geo_pixel_thres: float = 1.0
    geo_depth_thres: float = 0.01


def _read_fusion_cam(path: str, scale: float, index: int, flag: int):
    """Camera for fusion: intrinsics rescaled to the confidence grid and
    shifted by the crop offset (reference dynamic_fusion.py:33-49)."""
    with open(path) as f:
        lines = [line.rstrip() for line in f.readlines()]
    extr = np.fromstring(" ".join(lines[1:5]), dtype=np.float32, sep=" ").reshape(4, 4)
    intr = np.fromstring(" ".join(lines[7:10]), dtype=np.float32, sep=" ").reshape(3, 3)
    intr[:2, :] *= scale
    if flag == 0:
        intr[0, 2] -= index
    else:
        intr[1, 2] -= index
    return intr, extr


def reproject_with_depth(
    depth_ref, intr_ref, extr_ref, depth_src, intr_src, extr_src
):
    """Ref→src→ref depth round trip. Returns (depth_reprojected, x_reproj,
    y_reproj, x_src, y_src), all [H, W]."""
    height, width = depth_ref.shape
    x_ref, y_ref = np.meshgrid(np.arange(width), np.arange(height))
    x_ref = x_ref.reshape(-1)
    y_ref = y_ref.reshape(-1)

    xyz_ref = np.linalg.inv(intr_ref) @ (
        np.vstack((x_ref, y_ref, np.ones_like(x_ref))) * depth_ref.reshape(-1)
    )
    xyz_src = (extr_src @ np.linalg.inv(extr_ref)) @ np.vstack(
        (xyz_ref, np.ones_like(x_ref))
    )
    xyz_src = xyz_src[:3]
    k_xyz_src = intr_src @ xyz_src
    xy_src = k_xyz_src[:2] / k_xyz_src[2:3]

    x_src = xy_src[0].reshape(height, width).astype(np.float32)
    y_src = xy_src[1].reshape(height, width).astype(np.float32)
    sampled_depth_src = cv2.remap(
        depth_src, x_src, y_src, interpolation=cv2.INTER_LINEAR
    )

    xyz_src2 = np.linalg.inv(intr_src) @ (
        np.vstack((xy_src, np.ones_like(x_ref))) * sampled_depth_src.reshape(-1)
    )
    xyz_reproj = (extr_ref @ np.linalg.inv(extr_src)) @ np.vstack(
        (xyz_src2, np.ones_like(x_ref))
    )
    xyz_reproj = xyz_reproj[:3]
    depth_reproj = xyz_reproj[2].reshape(height, width).astype(np.float32)
    k_xyz_reproj = intr_ref @ xyz_reproj
    xy_reproj = k_xyz_reproj[:2] / (k_xyz_reproj[2:3] + 1e-12)
    x_reproj = xy_reproj[0].reshape(height, width).astype(np.float32)
    y_reproj = xy_reproj[1].reshape(height, width).astype(np.float32)
    return depth_reproj, x_reproj, y_reproj, x_src, y_src


def check_geometric_consistency(
    depth_ref, intr_ref, extr_ref, depth_src, intr_src, extr_src,
    dist_scale: float = 1.0, rel_diff_scale: float = 1.0,
):
    """Dynamic threshold ladder. Returns (masks list for i=2..10, base mask
    (i=10 rung), depth_reprojected zeroed where inconsistent)."""
    height, width = depth_ref.shape
    x_ref, y_ref = np.meshgrid(np.arange(width), np.arange(height))
    depth_reproj, x_reproj, y_reproj, _, _ = reproject_with_depth(
        depth_ref, intr_ref, extr_ref, depth_src, intr_src, extr_src
    )
    dist = np.sqrt((x_reproj - x_ref) ** 2 + (y_reproj - y_ref) ** 2)
    depth_diff = np.abs(depth_reproj - depth_ref)
    relative = depth_diff / np.maximum(depth_ref, 1e-12)

    masks = []
    mask = None
    for i in range(2, 11):
        mask = np.logical_and(
            dist < dist_scale * i / 4, relative < rel_diff_scale * i / 1300
        )
        masks.append(mask)
    depth_reproj = depth_reproj.copy()
    depth_reproj[~mask] = 0
    return masks, mask, depth_reproj


def check_geometric_consistency_fixed(
    depth_ref, intr_ref, extr_ref, depth_src, intr_src, extr_src,
    pixel_thres: float = 1.0, depth_thres: float = 0.01,
):
    """Fixed-threshold consistency (the upstream "normal" filter's test):
    mask = (reproj dist < pixel_thres px) ∧ (relative depth diff <
    depth_thres). Returns (mask, depth_reprojected zeroed off-mask)."""
    height, width = depth_ref.shape
    x_ref, y_ref = np.meshgrid(np.arange(width), np.arange(height))
    depth_reproj, x_reproj, y_reproj, _, _ = reproject_with_depth(
        depth_ref, intr_ref, extr_ref, depth_src, intr_src, extr_src
    )
    dist = np.sqrt((x_reproj - x_ref) ** 2 + (y_reproj - y_ref) ** 2)
    relative = np.abs(depth_reproj - depth_ref) / np.maximum(depth_ref, 1e-12)
    mask = np.logical_and(dist < pixel_thres, relative < depth_thres)
    depth_reproj = depth_reproj.copy()
    depth_reproj[~mask] = 0
    return mask, depth_reproj


def _fit_image_to_grid(img: np.ndarray, grid_hw: tuple[int, int]):
    """Rescale + center-crop an image onto the confidence/depth grid,
    returning (image, scale, crop index, crop axis flag)
    (reference dynamic_fusion.py:162-176)."""
    gh, gw = grid_hw
    scale = float(gh) / img.shape[0]
    index = int((int(img.shape[1] * scale) - gw) / 2)
    index_p = (int(img.shape[1] * scale) - gw) - index
    flag = 0
    if gw / img.shape[1] > scale:
        scale = float(gw) / img.shape[1]
        index = int((int(img.shape[0] * scale) - gh) / 2)
        index_p = (int(img.shape[0] * scale) - gh) - index
        flag = 1
    img = cv2.resize(img, (int(img.shape[1] * scale), int(img.shape[0] * scale)))
    if flag == 0:
        img = img[:, index : img.shape[1] - index_p, :]
    else:
        img = img[index : img.shape[0] - index_p, :, :]
    return img, scale, index, flag


def fuse_scan(
    scan_folder: str,
    out_ply: str,
    params: FusionParams = FusionParams(),
    pair_path: str | None = None,
    out_mask_folder: str | None = None,
    ref_views: list[int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Fuse one scan's depth maps into a colored point cloud.

    Args:
      scan_folder: folder with depth_est/, confidence/, cams/, images/.
      out_ply: output path ('' to skip writing).
      ref_views: optional subset of reference views (host-sharding hook).

    Returns: (xyz [N, 3], rgb [N, 3]).
    """
    pair_file = pair_path or os.path.join(scan_folder, "pair.txt")
    pair_data = read_pair_file(pair_file)
    if ref_views is not None:
        keep = set(ref_views)
        pair_data = [(r, s) for r, s in pair_data if r in keep]

    vertexs, colors = [], []
    for ref_view, src_views in pair_data:
        ref_img_path = os.path.join(scan_folder, f"images/{ref_view:0>8}.jpg")
        if not os.path.exists(ref_img_path):
            ref_img_path = os.path.join(scan_folder, f"images/{ref_view:0>8}.png")
        ref_img = (
            cv2.cvtColor(cv2.imread(ref_img_path), cv2.COLOR_BGR2RGB).astype(
                np.float32
            )
            / 255.0
        )
        ref_depth = read_pfm(
            os.path.join(scan_folder, f"depth_est/{ref_view:0>8}.pfm")
        )[0]
        confidence = read_pfm(
            os.path.join(scan_folder, f"confidence/{ref_view:0>8}.pfm")
        )[0]

        ref_img, scale, index, flag = _fit_image_to_grid(
            ref_img, confidence.shape[:2]
        )
        intr_ref, extr_ref = _read_fusion_cam(
            os.path.join(scan_folder, f"cams/{ref_view:0>8}_cam.txt"),
            scale,
            index,
            flag,
        )
        photo_mask = confidence > params.photo_threshold

        n = len(src_views) + 1
        geo_mask_sum = np.zeros_like(ref_depth, dtype=np.int32)
        ladder_sums = [
            np.zeros_like(ref_depth, dtype=np.int32) for _ in range(2, n)
        ]
        depth_accum = np.zeros_like(ref_depth)

        for src_view in src_views:
            src_depth = read_pfm(
                os.path.join(scan_folder, f"depth_est/{src_view:0>8}.pfm")
            )[0]
            intr_src, extr_src = _read_fusion_cam(
                os.path.join(scan_folder, f"cams/{src_view:0>8}_cam.txt"),
                scale,
                index,
                flag,
            )
            if params.mode == "normal":
                geo_mask, depth_reproj = check_geometric_consistency_fixed(
                    ref_depth, intr_ref, extr_ref, src_depth, intr_src,
                    extr_src,
                    pixel_thres=params.geo_pixel_thres,
                    depth_thres=params.geo_depth_thres,
                )
            else:
                masks, geo_mask, depth_reproj = check_geometric_consistency(
                    ref_depth, intr_ref, extr_ref, src_depth, intr_src,
                    extr_src,
                    dist_scale=params.dist_scale,
                    rel_diff_scale=params.rel_diff_scale,
                )
                for i in range(2, n):
                    ladder_sums[i - 2] += masks[i - 2].astype(np.int32)
            geo_mask_sum += geo_mask.astype(np.int32)
            depth_accum += depth_reproj

        geo_mask = geo_mask_sum >= params.thres_view
        if params.mode != "normal":
            for i in range(2, n):
                geo_mask = np.logical_or(geo_mask, ladder_sums[i - 2] >= i)

        depth_avg = (depth_accum + ref_depth) / (geo_mask_sum + 1)
        final_mask = np.logical_and(photo_mask, geo_mask)

        if out_mask_folder:
            os.makedirs(out_mask_folder, exist_ok=True)
            for name, m in [
                ("photo", photo_mask),
                ("geo", geo_mask),
                ("final", final_mask),
            ]:
                cv2.imwrite(
                    os.path.join(out_mask_folder, f"{ref_view:0>8}_{name}.png"),
                    m.astype(np.uint8) * 255,
                )

        height, width = depth_avg.shape
        x, y = np.meshgrid(np.arange(width), np.arange(height))
        valid = final_mask
        xv, yv, dv = x[valid], y[valid], depth_avg[valid]
        color = ref_img[valid]
        xyz_ref = np.linalg.inv(intr_ref) @ (
            np.vstack((xv, yv, np.ones_like(xv))) * dv
        )
        xyz_world = np.linalg.inv(extr_ref) @ np.vstack(
            (xyz_ref, np.ones_like(xv))
        )
        vertexs.append(xyz_world[:3].T)
        colors.append((color * 255).astype(np.uint8))

    xyz = (
        np.concatenate(vertexs, axis=0)
        if vertexs
        else np.zeros((0, 3), np.float32)
    )
    rgb = (
        np.concatenate(colors, axis=0) if colors else np.zeros((0, 3), np.uint8)
    )
    if out_ply:
        os.makedirs(os.path.dirname(out_ply) or ".", exist_ok=True)
        write_ply(out_ply, xyz, rgb)
    return xyz, rgb


def _worker(args):
    scan_folder, out_ply, params = args
    fuse_scan(scan_folder, out_ply, params)
    return out_ply


def fuse_scans(
    testpath: str,
    scans: list[str],
    outdir: str,
    params: FusionParams = FusionParams(),
    dataset: str = "dtu",
    num_workers: int = 8,
) -> list[str]:
    """Fuse many scans in parallel (reference dynamic_fusion.py:291-301).

    DTU naming: mvsnet{scanid:03d}_l3.ply (what the DTU evaluator expects,
    reference DTU-MATLAB/BaseEvalMain_web.m:34 `mvsnet%03d_l3.ply`)."""
    from transmvsnet_tpu.eval.dtu_eval import dtu_ply_name

    os.makedirs(outdir, exist_ok=True)
    jobs = []
    for scan in scans:
        if dataset == "dtu" and scan.startswith("scan"):
            out_ply = os.path.join(outdir, dtu_ply_name(int(scan[4:])))
        else:
            out_ply = os.path.join(outdir, f"{scan}.ply")
        jobs.append((os.path.join(testpath, scan), out_ply, params))
    if num_workers <= 1:
        return [_worker(j) for j in jobs]
    with Pool(num_workers) as p:
        return p.map(_worker, jobs)
