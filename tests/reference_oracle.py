"""Load the upstream reference PyTorch model as a numerics oracle.

The reference at /root/reference depends on torchvision (absent here) only
for ``deform_conv2d``; we inject a pure-torch implementation of the
documented torchvision semantics before importing it. The reference code is
imported from its own checkout at test time — nothing is copied into this
repository; it serves purely as the parity oracle for weight conversion
(SURVEY.md §7 step 3).
"""

from __future__ import annotations

import sys
import types

import torch


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _bilinear_zeros(img: torch.Tensor, px: torch.Tensor, py: torch.Tensor):
    """img [B, C, H, W]; px/py [B, Ho, Wo] → [B, C, Ho, Wo], zeros padding."""
    B, C, H, W = img.shape
    x0 = torch.floor(px)
    y0 = torch.floor(py)
    wx = (px - x0).unsqueeze(1)
    wy = (py - y0).unsqueeze(1)
    x0 = x0.long()
    y0 = y0.long()

    def tap(xi, yi):
        valid = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)).unsqueeze(1)
        xc = xi.clamp(0, W - 1)
        yc = yi.clamp(0, H - 1)
        idx = (yc * W + xc).unsqueeze(1).expand(-1, C, -1, -1)
        flat = img.reshape(B, C, H * W)
        vals = torch.gather(flat, 2, idx.reshape(B, C, -1)).reshape(
            B, C, *xi.shape[1:]
        )
        return vals * valid

    return (
        tap(x0, y0) * (1 - wx) * (1 - wy)
        + tap(x0 + 1, y0) * wx * (1 - wy)
        + tap(x0, y0 + 1) * (1 - wx) * wy
        + tap(x0 + 1, y0 + 1) * wx * wy
    )


def deform_conv2d_reference(
    input, offset, weight, bias=None, stride=(1, 1), padding=(0, 0),
    dilation=(1, 1), mask=None,
):
    """Pure-torch modulated deformable conv matching torchvision semantics:
    sample at p = (out·stride - pad) + k·dilation + offset, interleaved
    (Δy, Δx) offset channels, bilinear with zeros padding."""
    B, C, H, W = input.shape
    OC, IC, kh, kw = weight.shape
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    Ho = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    K = kh * kw

    base_y = (torch.arange(Ho, dtype=input.dtype) * sh - ph).view(1, Ho, 1)
    base_x = (torch.arange(Wo, dtype=input.dtype) * sw - pw).view(1, 1, Wo)
    cols = []
    for k in range(K):
        i, j = k // kw, k % kw
        py = base_y + i * dh + offset[:, 2 * k]
        px = base_x + j * dw + offset[:, 2 * k + 1]
        s = _bilinear_zeros(input, px, py)
        if mask is not None:
            s = s * mask[:, k : k + 1]
        cols.append(s)
    col = torch.stack(cols, dim=2)  # [B, IC, K, Ho, Wo]
    out = torch.einsum("bikhw,oik->bohw", col, weight.reshape(OC, IC, K))
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def install_torchvision_stub() -> None:
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.deform_conv2d = deform_conv2d_reference

    class DeformConv2d:  # imported but unused by the reference
        pass

    ops.DeformConv2d = DeformConv2d
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops


def load_reference_model():
    """Import the reference TransMVSNet from /root/reference."""
    install_torchvision_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.TransMVSNet import TransMVSNet as RefTransMVSNet

    return RefTransMVSNet
