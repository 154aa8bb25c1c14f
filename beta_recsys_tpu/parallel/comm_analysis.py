"""Communication-model extraction from compiled HLO.

The virtual CPU mesh can't measure wall-clock meaningfully, but the compiled
HLO's collective ops ARE the communication model: their operand/result bytes
predict ICI traffic on real hardware. ``collective_bytes`` parses a lowered+
compiled jitted function and returns bytes per collective kind — the artifact
the scaling report uses to predict v5e-16 efficiency (BASELINE.json >=80%
scaling target) without a pod.

Byte accounting is per-device per-call: the result shape of each collective
instruction (what one device materializes). Link traffic depends on the
algorithm (ring all-gather moves (n-1)/n of the result per link; all-reduce
~2x that), which `estimate_link_bytes` applies.
"""

import re

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

# HLO opcode -> canonical collective kind
_COLLECTIVE_OPS = {
    "all-reduce": "all_reduce",
    "all-gather": "all_gather",
    "all-to-all": "all_to_all",
    "reduce-scatter": "reduce_scatter",
    "collective-permute": "collective_permute",
}

_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|f8e4m3|f8e5m2|s64|u64|s32|u32|s16|u16|s8|u8|pred)\[([0-9,]*)\]")


def _shape_bytes(shape_str):
    """Total bytes of every tensor literal in an HLO result-shape string."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_bytes(fn, *args, static_argnums=None, **kwargs):
    """Compile ``fn(*args)`` and account its collectives.

    Returns {kind: {"calls": int, "bytes": int}} — bytes are per-device result
    bytes summed over instructions (a collective inside a scan/while counts
    once per compiled instruction, so multiply by trip count for per-step
    models when the loop body is what you measure).
    """
    import jax

    lowered = jax.jit(fn, static_argnums=static_argnums or ()).lower(*args, **kwargs)
    hlo = lowered.compile().as_text()
    out = {}
    for line in hlo.splitlines():
        s = line.strip()
        # instruction lines look like: "%name = <shape> all-reduce(...)" or
        # fused "<shape> all-gather-start(...)"; skip "-done" halves.
        for op, kind in _COLLECTIVE_OPS.items():
            if re.search(rf"\b{op}(-start)?\(", s) and f"{op}-done" not in s:
                lhs = s.split(f" {op}", 1)[0]
                entry = out.setdefault(kind, {"calls": 0, "bytes": 0})
                entry["calls"] += 1
                entry["bytes"] += _shape_bytes(lhs)
                break
    return out


def estimate_link_bytes(counts, axis_size):
    """Per-link byte estimate for a ring of ``axis_size`` devices.

    ring all-gather: result*(n-1)/n per link; all-reduce = reduce-scatter +
    all-gather: 2*(n-1)/n; all-to-all: result*(n-1)/n (each shard except own
    crosses once); collective-permute: full result.
    """
    n = max(axis_size, 1)
    factor = {
        "all_gather": (n - 1) / n,
        "reduce_scatter": (n - 1) / n,
        "all_reduce": 2 * (n - 1) / n,
        "all_to_all": (n - 1) / n,
        "collective_permute": 1.0,
    }
    return {
        kind: int(v["bytes"] * factor.get(kind, 1.0)) for kind, v in counts.items()
    }
