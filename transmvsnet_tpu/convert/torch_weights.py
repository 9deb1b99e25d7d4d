"""PyTorch checkpoint → JAX variables converter.

Maps the reference's published checkpoints (``model_dtu.ckpt`` /
``model_bld.ckpt``, reference README.md:125,134) onto this framework's
parameter tree so DTU parity can be verified without retraining
(SURVEY.md §5 checkpoint-compatibility note).

Layout conversions:
  conv2d   OIHW          → HWIO
  conv3d   OIDHW         → DHWIO
  deconv   [I,O,*S]      → spatially flipped [*S,I,O] (transposed convs are
                           computed as input-dilated convs here)
  linear   [out,in]      → [in,out]
  DCN      [O,I,kh,kw]   → tap-major [kh*kw, I, O]
  BN       weight/bias/running_mean/running_var → scale/bias + batch_stats

The converter is strict: every torch key must be consumed and every JAX
leaf filled, so architecture drift fails loudly.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv3d(w):
    return np.flip(w, axis=(2, 3, 4)).transpose(2, 3, 4, 0, 1)


def _deconv2d(w):
    return np.flip(w, axis=(2, 3)).transpose(2, 3, 0, 1)


def _linear(w):
    return np.transpose(w)


def _dcn(w):
    o, i, kh, kw = w.shape
    return np.transpose(w, (2, 3, 1, 0)).reshape(kh * kw, i, o)


def _conv_block(src: str, dst: tuple[str, ...], out: dict, bn: bool = True, conv3d=False, deconv=False):
    """ConvBnReLU wrapper → {conv/kernel, bn/...} entries."""
    if deconv:
        kfn = _deconv3d if conv3d else _deconv2d
    else:
        kfn = _conv3d if conv3d else _conv2d
    entries = [(f"{src}.conv.weight", dst + ("conv", "kernel"), kfn)]
    if bn:
        entries += [
            (f"{src}.bn.weight", dst + ("bn", "scale"), None),
            (f"{src}.bn.bias", dst + ("bn", "bias"), None),
            (f"{src}.bn.running_mean", ("batch_stats",) + dst[1:] + ("bn", "mean"), None),
            (f"{src}.bn.running_var", ("batch_stats",) + dst[1:] + ("bn", "var"), None),
        ]
    else:
        entries.append((f"{src}.conv.bias", dst + ("conv", "bias"), None))
    out["rules"] += entries


def _bare_bn(src: str, dst: tuple[str, ...], out: dict):
    out["rules"] += [
        (f"{src}.weight", dst + ("scale",), None),
        (f"{src}.bias", dst + ("bias",), None),
        (f"{src}.running_mean", ("batch_stats",) + dst[1:] + ("mean",), None),
        (f"{src}.running_var", ("batch_stats",) + dst[1:] + ("var",), None),
    ]


def _dcn_block(src: str, dst: tuple[str, ...], out: dict):
    out["rules"] += [
        (f"{src}.conv_offset_mask.weight", dst + ("conv_offset_mask", "kernel"), _conv2d),
        (f"{src}.conv_offset_mask.bias", dst + ("conv_offset_mask", "bias"), None),
        (f"{src}.weight", dst + ("weight",), _dcn),
        (f"{src}.bias", dst + ("bias",), None),
    ]


def _build_rules(num_stages: int = 3, fmt_layers: int = 8) -> list:
    out = {"rules": []}
    P = ("params",)

    # FeatureNet pyramid.
    for blk, count in [("conv0", 2), ("conv1", 3), ("conv2", 3)]:
        for i in range(count):
            _conv_block(
                f"feature.{blk}.{i}", P + ("feature", f"{blk}_{i}"), out
            )
    # ARF heads: Sequential indices 0=lead conv, 1/4/7=DCN, 2/5=BN.
    for head in ("out1", "out2", "out3"):
        _conv_block(f"feature.{head}.0", P + ("feature", head, "lead"), out)
        _dcn_block(f"feature.{head}.1", P + ("feature", head, "dcn0"), out)
        _bare_bn(f"feature.{head}.2", P + ("feature", head, "bn0"), out)
        _dcn_block(f"feature.{head}.4", P + ("feature", head, "dcn1"), out)
        _bare_bn(f"feature.{head}.5", P + ("feature", head, "bn1"), out)
        _dcn_block(f"feature.{head}.7", P + ("feature", head, "dcn2"), out)
    for inner in ("inner1", "inner2"):
        out["rules"] += [
            (f"feature.{inner}.weight", P + ("feature", inner, "kernel"), _conv2d),
            (f"feature.{inner}.bias", P + ("feature", inner, "bias"), None),
        ]

    # FMT.
    for i in range(fmt_layers):
        base = f"FMT_with_pathway.FMT.layers.{i}"
        dst = P + ("fmt", "FMT", f"layer{i}")
        for proj, name in [
            ("query_projection", "query"),
            ("key_projection", "key"),
            ("value_projection", "value"),
            ("out_projection", "out"),
        ]:
            out["rules"] += [
                (f"{base}.attention.{proj}.weight", dst + ("attention", name, "kernel"), _linear),
                (f"{base}.attention.{proj}.bias", dst + ("attention", name, "bias"), None),
            ]
        for lin in ("linear1", "linear2"):
            out["rules"] += [
                (f"{base}.{lin}.weight", dst + (lin, "kernel"), _linear),
                (f"{base}.{lin}.bias", dst + (lin, "bias"), None),
            ]
        for norm in ("norm1", "norm2"):
            out["rules"] += [
                (f"{base}.{norm}.weight", dst + (norm, "scale"), None),
                (f"{base}.{norm}.bias", dst + (norm, "bias"), None),
            ]
    for name in ("dim_reduction_1", "dim_reduction_2", "smooth_1", "smooth_2"):
        out["rules"].append(
            (f"FMT_with_pathway.{name}.weight", P + ("fmt", name, "kernel"), _conv2d)
        )

    # CostRegNets.
    for s in range(num_stages):
        base = f"cost_regularization.{s}"
        dst_base = P + (f"cost_regs_{s}",)
        for conv in ("conv0", "conv1", "conv2", "conv3", "conv4", "conv5", "conv6"):
            _conv_block(f"{base}.{conv}", dst_base + (conv,), out, conv3d=True)
        for conv in ("conv7", "conv9", "conv11"):
            _conv_block(
                f"{base}.{conv}", dst_base + (conv,), out, conv3d=True, deconv=True
            )
        out["rules"].append(
            (f"{base}.prob.weight", dst_base + ("prob", "kernel"), _conv3d)
        )

    # PixelwiseNet.
    for conv in ("conv0", "conv1"):
        _conv_block(
            f"DepthNet.pixel_wise_net.{conv}",
            P + ("pixel_wise_net", conv),
            out,
            conv3d=True,
        )
    out["rules"] += [
        ("DepthNet.pixel_wise_net.conv2.weight", P + ("pixel_wise_net", "conv2", "kernel"), _conv3d),
        ("DepthNet.pixel_wise_net.conv2.bias", P + ("pixel_wise_net", "conv2", "bias"), None),
    ]
    return out["rules"]


def convert_state_dict(
    torch_state: Mapping[str, np.ndarray],
    template_variables: dict[str, Any],
    num_stages: int = 3,
    fmt_layers: int = 8,
    strict: bool = True,
) -> dict[str, Any]:
    """Convert a torch state_dict (values as numpy arrays) to JAX variables.

    ``template_variables`` supplies the target tree structure and dtypes.
    """
    import jax

    sd = {}
    for k, v in torch_state.items():
        k = k.removeprefix("module.")
        sd[k] = np.asarray(v)

    rules = _build_rules(num_stages, fmt_layers)

    flat: dict[tuple[str, ...], np.ndarray] = {}
    consumed = set()
    for src, dst, fn in rules:
        if src not in sd:
            if strict:
                raise KeyError(f"torch checkpoint missing key {src}")
            continue
        val = sd[src]
        flat[dst] = fn(val) if fn else val
        consumed.add(src)

    leftover = {
        k
        for k in sd
        if k not in consumed
        and not k.endswith("num_batches_tracked")
        and ".pos_encoding." not in k
    }
    if strict and leftover:
        raise KeyError(f"unconsumed torch keys: {sorted(leftover)[:10]} ...")

    # Fill the template tree.
    filled = set()

    def fill(path, leaf):
        key = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        if key in flat:
            filled.add(key)
            src = flat[key]
            if src.shape != leaf.shape:
                raise ValueError(f"shape mismatch at {key}: {src.shape} vs {leaf.shape}")
            return src.astype(np.asarray(leaf).dtype)
        if strict:
            raise KeyError(f"no torch source for JAX leaf {key}")
        return leaf

    result = jax.tree_util.tree_map_with_path(fill, template_variables)
    missing = set(flat) - filled
    if strict and missing:
        raise KeyError(f"converted values with no JAX leaf: {sorted(missing)[:10]}")
    return result


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a torch .ckpt and return the model state_dict as numpy arrays."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
