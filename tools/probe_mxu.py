"""MXU matmul-rate probe with loop-carried dependence (v5e, through the tunnel).

The original probe (tools/probe_int8.py) looped a dot over loop-INVARIANT
operands inside jit; XLA hoists the dot out of the fori_loop, so every shape
measured the same ~650 us dispatch+readback floor and the derived "rates"
were garbage (that floor is where round 2's "int8 shows no advantage" came
from). This probe:

  * chains iterations: one element of iteration i's result is written into
    iteration i+1's LHS via dynamic_update_slice (tiny traffic, real
    dependence — the dots cannot be hoisted or overlapped away);
  * times two iteration counts and reports the SLOPE (per-iteration cost),
    canceling any fixed dispatch/readback overhead;
  * prints achieved T/s for bf16 vs int8 on a big square GEMM (MXU ceiling)
    and on the model's actual hot shapes (AVE flagship: Swin-V2-L stage-1/3
    MLP and qkv, window attention QK/PV batched dots).

Usage: python tools/probe_mxu.py            (runs on whatever jax exposes)
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.utils import enable_compilation_cache

enable_compilation_cache()

I_LO, I_HI = 8, 72


def _timed(run, x, w, iters):
    r = run(x, w, iters)
    float(np.asarray(r).sum())  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(x, w, iters)
        float(np.asarray(r).sum())
        best = min(best, time.perf_counter() - t0)
    return best


def rate(make_dot, x, w, flops):
    """Per-iteration seconds via two-point fit; dots are loop-carried."""

    def run(x, w, iters):
        def body(i, carry):
            x_, acc = carry
            r = make_dot(x_, w)
            # consume ALL of r (a full reduce fuses into the dot epilogue —
            # consuming a single element lets XLA slice the GEMM down to one
            # output row/col) and chain the scalar back into x_: the dots can
            # be neither hoisted nor dead-code-eliminated nor overlapped.
            s = r.sum()
            upd = s.astype(x_.dtype).reshape((1,) * x_.ndim)
            x_ = jax.lax.dynamic_update_slice(x_, upd, (0,) * x_.ndim)
            return x_, acc + s.astype(jnp.float32)
        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc

    run_lo = jax.jit(lambda x, w: run(x, w, I_LO))
    run_hi = jax.jit(lambda x, w: run(x, w, I_HI))
    t_lo = _timed(lambda x, w, _: run_lo(x, w), x, w, I_LO)
    t_hi = _timed(lambda x, w, _: run_hi(x, w), x, w, I_HI)
    per_iter = (t_hi - t_lo) / (I_HI - I_LO)
    return per_iter, flops / max(per_iter, 1e-12) / 1e12


def main() -> None:
    print("device:", jax.devices()[0], flush=True)
    shapes = [
        ("4096^3 bf16", (4096, 4096), (4096, 4096), jnp.bfloat16, jnp.float32),
        ("4096^3 int8", (4096, 4096), (4096, 4096), jnp.int8, jnp.int32),
        ("mlp s1 fc1 (92160,192)x(192,768) bf16",
         (92160, 192), (192, 768), jnp.bfloat16, jnp.float32),
        ("mlp s1 fc1 int8", (92160, 192), (192, 768), jnp.int8, jnp.int32),
        ("mlp s3 fc1 (5760,768)x(768,3072) bf16",
         (5760, 768), (768, 3072), jnp.bfloat16, jnp.float32),
        ("mlp s3 fc1 int8", (5760, 768), (768, 3072), jnp.int8, jnp.int32),
        ("qkv s1 (92160,192)x(192,576) bf16",
         (92160, 192), (192, 576), jnp.bfloat16, jnp.float32),
        ("qkv s3 (5760,768)x(768,2304) bf16",
         (5760, 768), (768, 2304), jnp.bfloat16, jnp.float32),
    ]
    for name, sx, sw, dt_in, dt_out in shapes:
        if dt_in == jnp.int8:
            x = jnp.ones(sx, dt_in)
            w = jnp.ones(sw, dt_in)
        else:
            x = jnp.full(sx, 0.01, dt_in)
            w = jnp.full(sw, 0.01, dt_in)
        mk = lambda x, w: jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=dt_out)
        t, r = rate(mk, x, w, 2 * sx[0] * sx[1] * sw[1])
        print(f"{name}: {t * 1e6:.0f}us/iter = {r:.1f} T/s", flush=True)

    # batched window-attention dots (stage-1 geometry, batch 4 clips)
    GB, Nw, D = 3840, 144, 32
    q = jnp.full((GB, Nw, D), 0.01, jnp.bfloat16)
    k = jnp.full((GB, Nw, D), 0.01, jnp.bfloat16)
    mk = lambda q, k: jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    t, r = rate(mk, q, k, 2 * GB * Nw * Nw * D)
    print(f"winQK (3840,144,32) bf16: {t * 1e6:.0f}us/iter = {r:.1f} T/s",
          flush=True)
    p = jnp.full((GB, Nw, Nw), 0.01, jnp.bfloat16)
    v = jnp.full((GB, Nw, D), 0.01, jnp.bfloat16)
    mk = lambda p, v: jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    t, r = rate(mk, p, v, 2 * GB * Nw * Nw * D)
    print(f"winPV: {t * 1e6:.0f}us/iter = {r:.1f} T/s", flush=True)


if __name__ == "__main__":
    main()
