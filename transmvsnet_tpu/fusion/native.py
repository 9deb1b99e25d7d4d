"""Python driver for the native C++ fusion tool (the gipuma.py analog).

Builds (once, via CMake) and shells out to ``native/fuser/tpu_fuser`` per
scan — the same process topology as the reference's fusibile hand-off
(reference gipuma.py:7-21), with float PFM depth instead of the fork's
8-bit quantized PNGs.
"""

from __future__ import annotations

import os
import subprocess

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "fuser",
)


def ensure_built(native_dir: str = _NATIVE_DIR) -> str:
    """Return the tpu_fuser binary path, building it if necessary."""
    binary = os.path.join(native_dir, "build", "tpu_fuser")
    if os.path.exists(binary):
        return binary
    subprocess.run(
        ["cmake", "-B", "build", "-S", ".", "-G", "Ninja"],
        cwd=native_dir,
        check=True,
        capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", "build"],
        cwd=native_dir,
        check=True,
        capture_output=True,
    )
    return binary


def ensure_ppm_images(scan_folder: str) -> None:
    """Emit images/NNNNNNNN.ppm next to the pipeline's JPEGs.

    The native fuser reads PPM (no image-codec dependency in the C++
    binary); the inference pipeline writes JPEG (reference test.py:151).
    This bridges the two: converts once, skips files already converted.
    """
    img_dir = os.path.join(scan_folder, "images")
    if not os.path.isdir(img_dir):
        return
    import cv2

    for name in sorted(os.listdir(img_dir)):
        if not name.endswith((".jpg", ".png")):
            continue
        ppm = os.path.join(img_dir, os.path.splitext(name)[0] + ".ppm")
        if os.path.exists(ppm):
            continue
        img = cv2.imread(os.path.join(img_dir, name))
        if img is not None:
            cv2.imwrite(ppm, img)


def native_fuse_scans(
    testpath: str,
    scans: list[str],
    outdir: str,
    disp_threshold: float = 0.25,
    num_consistent: int = 3,
    dataset: str = "dtu",
) -> list[str]:
    """Fuse many scans through the native binary — the gipuma_filter role
    (reference gipuma.py:14-21, test.py:178) with fuse_scans' output naming
    so the DTU evaluator chain works unchanged."""
    from transmvsnet_tpu.eval.dtu_eval import dtu_ply_name

    binary = ensure_built()
    os.makedirs(outdir, exist_ok=True)
    outputs = []
    for scan in scans:
        scan_folder = os.path.join(testpath, scan)
        if dataset == "dtu" and scan.startswith("scan"):
            out_ply = os.path.join(outdir, dtu_ply_name(int(scan[4:])))
        else:
            out_ply = os.path.join(outdir, f"{scan}.ply")
        ensure_ppm_images(scan_folder)
        outputs.append(
            native_fuse_scan(
                scan_folder,
                out_ply,
                disp_threshold=disp_threshold,
                num_consistent=num_consistent,
                binary=binary,
            )
        )
    return outputs


def native_fuse_scan(
    scan_folder: str,
    out_ply: str,
    disp_threshold: float = 0.25,
    num_consistent: int = 3,
    min_depth: float = 0.0,
    max_depth: float = 1e9,
    binary: str | None = None,
) -> str:
    binary = binary or ensure_built()
    os.makedirs(os.path.dirname(out_ply) or ".", exist_ok=True)
    subprocess.run(
        [
            binary,
            scan_folder,
            out_ply,
            "--disp_threshold", str(disp_threshold),
            "--num_consistent", str(num_consistent),
            "--min_depth", str(min_depth),
            "--max_depth", str(max_depth),
        ],
        check=True,
    )
    return out_ply
