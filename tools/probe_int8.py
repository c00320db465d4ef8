"""Probe v5e matmul rates with in-jit loops (dispatch overhead excluded)."""
import time
import jax, jax.numpy as jnp, numpy as np
from functools import partial

ITERS = 50

def rate(make_dot, x, w, flops):
    @jax.jit
    def run(x, w):
        def body(i, acc):
            r = make_dot(x, w)
            return acc + r.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
    float(np.asarray(run(x, w)))  # compile+warm
    t0 = time.perf_counter()
    float(np.asarray(run(x, w)))
    dt = (time.perf_counter() - t0) / ITERS
    return dt, flops / dt / 1e12

shapes = [("4096^3 bf16", (4096,4096), (4096,4096), jnp.bfloat16, jnp.float32),
          ("4096^3 int8", (4096,4096), (4096,4096), jnp.int8, jnp.int32),
          ("mlp s1 fc1 (92160,192)x(192,768) bf16", (92160,192), (192,768), jnp.bfloat16, jnp.float32),
          ("mlp s1 fc1 int8", (92160,192), (192,768), jnp.int8, jnp.int32),
          ("mlp s3 fc1 (5760,768)x(768,3072) bf16", (5760,768), (768,3072), jnp.bfloat16, jnp.float32),
          ("mlp s3 fc1 int8", (5760,768), (768,3072), jnp.int8, jnp.int32),
          ("qkv s1 (92160,192)x(192,576) bf16", (92160,192), (192,576), jnp.bfloat16, jnp.float32)]
for name, sx, sw, dt_in, dt_out in shapes:
    x = jnp.ones(sx, dt_in); w = jnp.ones(sw, dt_in)
    mk = lambda x, w: jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                          preferred_element_type=dt_out)
    t, r = rate(mk, x, w, 2*sx[0]*sx[1]*sw[1])
    print(f"{name}: {t*1e6:.0f}us = {r:.0f} T/s", flush=True)

GB, Nw, D = 3840, 144, 32
q = jnp.ones((GB, Nw, D), jnp.bfloat16); k = jnp.ones((GB, Nw, D), jnp.bfloat16)
mk = lambda q, k: jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)
t, r = rate(mk, q, k, 2*GB*Nw*Nw*D)
print(f"winQK (3840,144,32) bf16: {t*1e6:.0f}us = {r:.1f} T/s", flush=True)
# PV: (GB,N,N)x(GB,N,D)
p = jnp.ones((GB, Nw, Nw), jnp.bfloat16); v = jnp.ones((GB, Nw, D), jnp.bfloat16)
mk = lambda p, v: jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)
t, r = rate(mk, p, v, 2*GB*Nw*Nw*D)
print(f"winPV: {t*1e6:.0f}us = {r:.1f} T/s", flush=True)
