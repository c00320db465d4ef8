"""Probe: why do the per-token LayerNorm stat reduces run ~10x their byte
roofline, and which formulation is fast?

trace_by_module round 4: `convert_reduce_fusion` on the MLP path costs
13.35 ms/fwd across 31 ops (~430 us each) where a stream read costs ~43 us -
the norm2 row stats (f32 mean/var over the channel axis) are the single
biggest non-attention time sink. This probe times formulations of the same
math on stage-1 stream shapes with the profiler (device lane), the only
timing method that survives XLA's loop hoisting (see probe_int8_stream.py).

Variants:
  stats_f32     - ops/norm.py _moments today: convert->f32, two reduces
  stats_onepass - single fused pass: sum + sum-of-squares in one reduce call
  stats_bf16    - bf16 accumulation (accuracy loss, diagnosis only)
  stats_dot     - row sums via MXU: x @ ones and row dot einsum('nc,nc->n')
  ln_full       - full LayerNorm (stats + apply): today's two-pass pattern
  ln_map        - LayerNorm via lax.map chunks (stats+apply VMEM-resident)
  ln_dotstats   - LayerNorm with MXU-computed stats feeding the apply pass
"""
import collections
import glob
import gzip
import json
import re
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20
B, L, C = 40, 2304, 192  # stage-1 visual stream (batch 4 x 10 frames)
BYTES = B * L * C * 2
EPS = 1e-5


def _named(name, f):
    f.__name__ = name
    return jax.jit(f)


def stats_f32(x):
    s = jnp.sum(x.astype(jnp.float32), axis=-1)
    ss = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)
    mean = s / C
    var = jnp.maximum(ss / C - jnp.square(mean), 0.0)
    return mean, var


def stats_onepass(x):
    xf = x.astype(jnp.float32)
    both = jnp.stack([xf, jnp.square(xf)], axis=-1)
    s = jnp.sum(both, axis=-2)
    mean = s[..., 0] / C
    var = jnp.maximum(s[..., 1] / C - jnp.square(mean), 0.0)
    return mean, var


def stats_bf16(x):
    s = jnp.sum(x, axis=-1)
    ss = jnp.sum(jnp.square(x), axis=-1)
    mean = s.astype(jnp.float32) / C
    var = jnp.maximum(ss.astype(jnp.float32) / C - jnp.square(mean), 0.0)
    return mean, var


def stats_dot(x):
    ones = jnp.ones((C, 1), jnp.bfloat16)
    x2 = x.reshape(-1, C)
    s = jax.lax.dot_general(x2, ones, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)[:, 0]
    ss = jnp.einsum("nc,nc->n", x2, x2, preferred_element_type=jnp.float32)
    mean = s / C
    var = jnp.maximum(ss / C - jnp.square(mean), 0.0)
    return mean.reshape(x.shape[:-1]), var.reshape(x.shape[:-1])


def _apply(x, mean, var):
    inv = jax.lax.rsqrt(var + EPS)
    return ((x.astype(jnp.bfloat16) - mean[..., None].astype(jnp.bfloat16))
            * inv[..., None].astype(jnp.bfloat16))


def ln_full(x):
    mean, var = stats_f32(x)
    return _apply(x, mean, var)


def ln_dotstats(x):
    mean, var = stats_dot(x)
    return _apply(x, mean, var)


def ln_map(x):
    def body(xc):
        mean, var = stats_f32(xc)
        return _apply(xc, mean, var)

    return jax.lax.map(body, x.reshape(8, B // 8, L, C)).reshape(x.shape)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32)).astype(jnp.bfloat16)
    cases = [
        ("stats_f32", _named("stats_f32", stats_f32), BYTES),
        ("stats_onepass", _named("stats_onepass", stats_onepass), BYTES),
        ("stats_bf16", _named("stats_bf16", stats_bf16), BYTES),
        ("stats_dot", _named("stats_dot", stats_dot), BYTES),
        ("ln_full", _named("ln_full", ln_full), 3 * BYTES),
        ("ln_dotstats", _named("ln_dotstats", ln_dotstats), 3 * BYTES),
        ("ln_map", _named("ln_map", ln_map), 2 * BYTES),
    ]
    for name, fn, _ in cases:
        np.asarray(jax.tree_util.tree_leaves(fn(x))[0].reshape(-1)[:1])
    logdir = tempfile.mkdtemp(prefix="rowstats_")
    with jax.profiler.trace(logdir):
        for name, fn, _ in cases:
            outs = [fn(x) for _ in range(REPS)]
            np.asarray(jax.tree_util.tree_leaves(outs[-1])[0].reshape(-1)[:1])
    paths = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p for p, n in pids.items() if "TPU" in str(n)]
    agg, cnt = collections.Counter(), collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or e["pid"] not in dev:
            continue
        m = re.match(r"jit_([a-z0-9_]+)[\(.]", e["name"] + "(")
        if m:
            agg[m.group(1)] += e["dur"]
            cnt[m.group(1)] += 1
    print(f"{'case':14s} {'us/call':>9} {'GB/s eff':>9}")
    for name, fn, nbytes in cases:
        if cnt[name] == 0:
            print(f"{name:14s}  -- missing --")
            continue
        us = agg[name] / cnt[name]
        print(f"{name:14s} {us:9.1f} {nbytes / (us * 1e-6) / 1e9:9.0f}")
    print(f"stream = {BYTES / 1e6:.1f} MB; roofline read = "
          f"{BYTES / 819e9 * 1e6:.0f} us")


if __name__ == "__main__":
    main()
