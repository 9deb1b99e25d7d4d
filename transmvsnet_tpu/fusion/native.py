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
