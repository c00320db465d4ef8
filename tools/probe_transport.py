"""Measure the tunnel transport floor: readback RTT vs payload size.

The round-4 bench split batch-1 AVE latency into 15.5 ms device + 48.0 ms
transport. This probe decomposes the transport term: per-readback RTT for
payloads from 4 B to 16 MB, one readback vs two sequential readbacks (the
bench `_sync` reads two outputs), and a device-side-packed single output
(argmax + score packed into one small array — the smallest payload an AVE
eval consumer can use). Decides VERDICT r4 item 7: shrink the payload, or
document the per-call floor.

Usage: python tools/probe_transport.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.utils import enable_compilation_cache

enable_compilation_cache()

ITERS = 30


def p50(fn):
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1e3


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # FRESH-result readback RTT vs payload size. (A device_put array keeps a
    # cached host buffer, so np.asarray on it is free and measures nothing —
    # each iteration must read back a freshly computed on-device result.)
    for nbytes in (4, 1024, 64 * 1024, 1024 * 1024, 16 * 1024 * 1024):
        x = jax.device_put(np.zeros(nbytes // 4, np.float32), dev)
        f = jax.jit(lambda x: x + 1.0)
        np.asarray(f(x))  # warm/compile
        ms = p50(lambda: np.asarray(f(x)))
        print(f"fresh readback {nbytes:>9d} B: p50 {ms:7.2f} ms "
              f"({nbytes / ms * 1e3 / 2**20:8.1f} MiB/s)", flush=True)

    # one tiny dispatch + readback (the serving-shaped floor)
    one = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(np.zeros((4,), np.float32), dev)
    np.asarray(one(x))
    print(f"dispatch+readback 16 B: p50 {p50(lambda: np.asarray(one(x))):7.2f} ms",
          flush=True)

    # two fresh readbacks vs one packed fresh readback (bench _sync reads the
    # two AVE outputs sequentially; does the second cost another full RTT?)
    a = jax.device_put(np.zeros((10,), np.float32), dev)
    b = jax.device_put(np.zeros((29,), np.float32), dev)
    two_f = jax.jit(lambda a, b: (a + 1.0, b + 1.0))
    r = two_f(a, b); np.asarray(r[0]), np.asarray(r[1])
    def _two():
        r = two_f(a, b)
        np.asarray(r[0]); np.asarray(r[1])
    two = p50(_two)
    pack = jax.jit(lambda a, b: jnp.concatenate([a + 1.0, b + 1.0]))
    np.asarray(pack(a, b))
    one_rb = p50(lambda: np.asarray(pack(a, b)))
    print(f"two fresh readbacks (10+29 f32): p50 {two:7.2f} ms | "
          f"packed single: p50 {one_rb:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
