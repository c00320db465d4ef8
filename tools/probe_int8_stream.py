"""Probe: does int8 stream storage actually halve HBM traffic on this stack?

Design facts the AVMOE_INT8_STREAM path depends on (measured, not assumed):

  1. dequant fuses into elementwise/reduce consumers (read int8, not bf16)
  2. quantize fuses into producer epilogues (write int8, not bf16)
  3. a dot whose operand is convert(int8->bf16): does XLA fuse the convert
     into the dot read, or materialize a bf16 copy first? (decides whether
     GEMM consumers of the stream need native int8 dots)
  4. lax.map chunk bodies with an int8 operand + in-body dequant/requant
     beat the same body with a bf16 operand (the chunked-attention seam)

METHODOLOGY: device-trace timing via jax.profiler, NOT wall-clock loops.
Two earlier designs of this probe produced garbage: (a) reading back the
carried stream (~17 MB/s tunnel) swamped the kernels 1000x, and (b) in-jit
fori_loops around loop-invariant bodies get HOISTED by XLA, so the "bf16
baselines" measured pure dispatch RTT (~30 ms/call) while the int8 bodies
(round/clip chains) resisted simplification - an apples-to-RTT comparison.
The profiler's device lane gives per-op execution times that cannot be
faked: each variant is its own named jit function dispatched REPS times
inside one trace, and we sum module-event durations attributed to it.
"""
import collections
import glob
import gzip
import json
import os
import re
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20
# stage-1 visual stream shape, scaled up so bytes dominate per-op overhead
B, L, C = 64, 2304, 192
BYTES_BF16 = B * L * C * 2


def _named(name, f):
    f.__name__ = name
    return jax.jit(f)


def build_cases():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32)).astype(jnp.bfloat16)
    s = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    sb = s.astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) * 256), -127, 127).astype(jnp.int8)
    x2, q2d, s2d = x.reshape(B * L, C), q.reshape(B * L, C), sb.reshape(B * L, 1)
    F = 8
    xc = x.reshape(F, B // F, L, C)
    qc, sc = q.reshape(F, B // F, L, C), sb.reshape(F, B // F, L, 1)

    def requant(y):
        s2 = jnp.max(jnp.abs(y).astype(jnp.float32), axis=-1, keepdims=True) / 127.0
        q2 = jnp.round(y.astype(jnp.float32) / s2).astype(jnp.int8)
        return q2, s2.astype(jnp.bfloat16)

    cases = [
        ("red_bf16", _named("red_bf16", lambda x: jnp.sum(x, dtype=jnp.float32)),
         (x,), BYTES_BF16),
        ("red_int8", _named("red_int8",
                            lambda q, s: jnp.sum(q.astype(jnp.float32) * s,
                                                 dtype=jnp.float32)),
         (q, s), BYTES_BF16 // 2),
        ("pass_bf16", _named("pass_bf16", lambda x: x * jnp.bfloat16(1.0001)),
         (x,), 2 * BYTES_BF16),
        ("pass_int8", _named("pass_int8",
                             lambda q, sb: requant(q.astype(jnp.bfloat16) * sb
                                                   * jnp.bfloat16(1.0001))),
         (q, sb), BYTES_BF16),
        ("dot_bf16", _named("dot_bf16", lambda x2, w: x2 @ w),
         (x2, w), BYTES_BF16),
        ("dot_cvt_int8", _named("dot_cvt_int8",
                                lambda q2d, s2d, w: (q2d.astype(jnp.bfloat16) @ w)
                                * s2d),
         (q2d, s2d, w), BYTES_BF16 // 2),
        ("dot_i8_native", _named(
            "dot_i8_native",
            lambda q2d, s2d, wq: jax.lax.dot_general(
                q2d, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32) * s2d),
         (q2d, s2d, wq), BYTES_BF16 // 2),
        ("map_bf16", _named(
            "map_bf16",
            lambda xc: jax.lax.map(
                lambda t: t * jnp.bfloat16(1.0001) + jnp.bfloat16(0.0001), xc)),
         (xc,), 2 * BYTES_BF16),
        ("map_int8", _named(
            "map_int8",
            lambda qc, sc: jax.lax.map(
                lambda a: requant(a[0].astype(jnp.bfloat16) * a[1]
                                  * jnp.bfloat16(1.0001)), (qc, sc))),
         (qc, sc), BYTES_BF16),
    ]
    return cases


def device_times(logdir):
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = [p for p, n in pids.items()
                if "TPU" in str(n) or "/device" in str(n)]
    xs = [e for e in ev if e.get("ph") == "X" and e["pid"] in dev_pids]
    # module lane: jit_<name>(...) events carry the per-dispatch total
    agg, cnt = collections.Counter(), collections.Counter()
    for e in xs:
        m = re.match(r"jit_([a-z0-9_]+)\(", e["name"]) or \
            re.match(r"jit_([a-z0-9_]+)$", e["name"])
        if m:
            agg[m.group(1)] += e["dur"]
            cnt[m.group(1)] += 1
    return agg, cnt


def main():
    cases = build_cases()
    for name, fn, args, _ in cases:  # compile outside the trace
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0].reshape(-1)[:1])
    logdir = tempfile.mkdtemp(prefix="int8probe_")
    with jax.profiler.trace(logdir):
        for name, fn, args, _ in cases:
            outs = [fn(*args) for _ in range(REPS)]
            np.asarray(jax.tree_util.tree_leaves(outs[-1])[0].reshape(-1)[:1])
    agg, cnt = device_times(logdir)
    print(f"{'case':16s} {'us/call':>9} {'GB/s eff':>9}  (calls)")
    for name, fn, args, nbytes in cases:
        if cnt[name] == 0:
            print(f"{name:16s}   -- no module event in trace --")
            continue
        us = agg[name] / cnt[name]
        print(f"{name:16s} {us:9.1f} {nbytes / (us * 1e-6) / 1e9:9.0f}"
              f"  ({cnt[name]})", flush=True)
    print(f"peak HBM 819 GB/s; bf16 stream = {BYTES_BF16 / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
