"""Summarize a JAX profiler trace: per-op device time, top-K, lane gaps.

Usage: python tools/trace_ops.py /tmp/trace_fwd [topk]

Reads the newest plugins/profile/*/\\*.trace.json.gz under the given logdir,
sums X-event durations on the device lane grouped by a normalized op name
(fusion indices stripped), and prints:
  * total device busy time vs lane span (gap fraction = dispatch stalls)
  * top-K ops by summed duration with % of busy time
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_trace(logdir: str) -> dict:
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace under {logdir}")
    with gzip.open(paths[-1]) as f:
        return json.load(f)


def norm_name(name: str) -> str:
    name = re.sub(r"\.\d+", "", name)          # fusion.123 -> fusion
    name = re.sub(r"_\d+(?=$|/)", "_*", name)  # block_3_7 -> block_*
    name = re.sub(r"\(\d+\)", "", name)        # jit_fwd(123..) -> jit_fwd
    return name


def main(logdir: str, topk: int = 30) -> None:
    tr = load_trace(logdir)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = [p for p, n in pids.items()
                if "TPU" in str(n) or "/device" in str(n)]
    if not dev_pids:
        raise SystemExit(f"no device lane; lanes: {pids}")
    xs = [e for e in ev if e.get("ph") == "X" and e["pid"] in dev_pids]
    # module-level events (jit_<fn>(fingerprint)) duplicate their child ops'
    # time on a separate lane; split them out by name
    modules = [e for e in xs if re.match(r"jit_", e["name"])]
    leaves = [e for e in xs if not re.match(r"jit_", e["name"])]

    busy = sum(e["dur"] for e in leaves)
    t0 = min(e["ts"] for e in leaves)
    t1 = max(e["ts"] + e["dur"] for e in leaves)
    span = t1 - t0
    print(f"device lanes: {[pids[p] for p in dev_pids]}")
    print(f"leaf ops: {len(leaves)}  busy {busy/1e3:.2f} ms  "
          f"span {span/1e3:.2f} ms  gap {(span-busy)/span*100:.1f}%")
    for m in sorted(modules, key=lambda e: -e["dur"])[:3]:
        print(f"module: {m['name']} {m['dur']/1e3:.2f} ms")

    agg = collections.Counter()
    cnt = collections.Counter()
    for e in leaves:
        k = norm_name(e["name"])
        agg[k] += e["dur"]
        cnt[k] += 1
    print(f"\n{'us total':>10} {'%busy':>6} {'count':>6}  op")
    for k, v in agg.most_common(topk):
        print(f"{v:10.0f} {v/busy*100:6.1f} {cnt[k]:6d}  {k[:120]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
