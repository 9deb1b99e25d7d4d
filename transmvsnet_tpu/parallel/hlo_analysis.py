"""Collective-traffic analysis of GSPMD-partitioned HLO.

Used by probes/bench_sharding_value.py (quantifying what each mesh axis
costs in ICI bytes) and tests/test_sharding_lowering.py (pinning that the
partitioner keeps lowering the FMT/view reductions to small psums instead
of token-sized all-gathers — the property that makes seq/view sharding
"essentially free parallelism", PERFORMANCE.md "When is each sharding
axis worth turning on").
"""

from __future__ import annotations

import re

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}
_SHAPE_RE = re.compile(
    r"(f64|f32|f16|bf16|s64|s32|s16|s8|u64|u32|u16|u8|pred)\[([\d,]*)\]"
)
COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute"
)


def _lhs_bytes(stripped: str, kind: str) -> int:
    lhs = stripped.split(f" {kind}")[0]
    total = 0
    for m in _SHAPE_RE.finditer(lhs):
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[m.group(1)]
    return total


def collective_bytes(hlo_text: str) -> dict[str, int]:
    """Sum output bytes of collective ops in optimized HLO, by op kind."""
    out: dict[str, int] = {}
    for line in hlo_text.splitlines():
        stripped = line.strip()
        for kind in COLLECTIVES:
            # "%x = f32[8,32]{...} all-reduce(..." or tuple/-start variants
            if f" {kind}(" in stripped or f" {kind}-start(" in stripped:
                out[kind] = out.get(kind, 0) + _lhs_bytes(stripped, kind)
    return out


def max_collective_bytes(hlo_text: str) -> int:
    """Largest single collective op output (bytes) in the HLO."""
    worst = 0
    for line in hlo_text.splitlines():
        stripped = line.strip()
        for kind in COLLECTIVES:
            if f" {kind}(" in stripped or f" {kind}-start(" in stripped:
                worst = max(worst, _lhs_bytes(stripped, kind))
    return worst
