"""Attribute HBM traffic in a compiled HLO dump to model source lines.

Parses post-optimization HLO text: for every top-level instruction in the
entry computation (fusions, convolutions, dots, copies), sums output +
operand bytes and attributes them to the op_name metadata. Crude (ignores
VMEM reuse) but ranks traffic hogs well.

Usage: python tools/hlo_traffic.py /tmp/hlo.txt [top_n]
"""

from __future__ import annotations

import collections
import re
import sys

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}

SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|pred|s8|u8|f64|s64|u64)\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    total = 0
    for m in SHAPE_RE.finditer(text):
        dt, dims = m.groups()
        els = 1
        for d in dims.split(","):
            if d:
                els *= int(d)
        total += els * DTYPE_BYTES[dt]
    return total


def main(path: str, top_n: int = 30) -> None:
    by_line: collections.Counter = collections.Counter()
    by_kind: collections.Counter = collections.Counter()
    in_entry = False
    for line in open(path):
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if not in_entry:
            continue
        s = line.strip()
        m = re.match(r"%?\S+ = (\S+) (fusion|convolution|dot|copy|custom-call|"
                     r"transpose|reshape|reduce|concatenate|dynamic-slice)\(", s)
        # HLO prints "= TYPE op(" - capture via a generic pattern instead
        m = re.match(r"%?\S+ = .*?\b(fusion|convolution|dot|copy|custom-call|"
                     r"concatenate|transpose)\(", s)
        if not m:
            continue
        kind = m.group(1)
        # output shape: first shape on the line; operands: shapes in arg list
        b = shape_bytes(s.split(" metadata=")[0])
        src = re.search(r'op_name="([^"]+)"', s)
        name = src.group(1) if src else kind
        # collapse per-block indices for aggregation
        name = re.sub(r"block_\d+_\d+", "block_*", name)
        name = re.sub(r"_(p[12])_\d+", r"_\1_*", name)
        name = re.sub(r"/(jit\(fwd\)/)?", "/", name)[:120]
        by_line[name] += b
        by_kind[kind] += b
    total = sum(by_kind.values())
    print(f"total accounted bytes: {total/1e9:.2f} GB")
    for k, v in by_kind.most_common():
        print(f"  {k:14s} {v/1e9:8.2f} GB")
    print("top sources:")
    for name, v in by_line.most_common(top_n):
        print(f"  {v/1e9:7.2f} GB  {name}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
