"""Component-level throughput breakdown for the AVE forward (diagnostic).

Benches: swin-only, htsat-only, lockstep w/o adapters, full model.
Prints one JSON line per part. Not run by the driver; used to steer perf work.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.utils import enable_compilation_cache

enable_compilation_cache()

B_CLIPS = 4
ITERS = 10


def timeit(fn, *args):
    def sync(o):
        return float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])

    for _ in range(2):
        sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    from avmoe_tpu.config import AVEConfig, replace, InjectionConfig
    from avmoe_tpu.backbones.swin_v2 import SwinV2Encoder
    from avmoe_tpu.backbones.htsat import HTSATEncoder
    from avmoe_tpu.moe.injection import LockstepEncoder

    cfg = AVEConfig()
    rng = np.random.RandomState(0)
    BT = B_CLIPS * cfg.num_segments
    imgs = jnp.asarray(rng.rand(BT, 192, 192, 3).astype(np.float32))
    wave = jnp.asarray(rng.randn(BT, cfg.audio_len).astype(np.float32) * 0.1)
    results = {}

    swin = SwinV2Encoder(cfg.swin, dtype=jnp.bfloat16)
    sv = jax.jit(swin.init)(jax.random.PRNGKey(0), imgs[:1])
    f = jax.jit(lambda v, x: swin.apply(v, x))
    results["swin_only_s"] = timeit(f, sv, imgs)

    htsat = HTSATEncoder(cfg.htsat, dtype=jnp.bfloat16)
    hv = jax.jit(lambda r, w: htsat.init(r, w))(jax.random.PRNGKey(0), wave[:1])
    f = jax.jit(lambda v, w: htsat.apply(v, w)["clipwise_output"])
    results["htsat_only_s"] = timeit(f, hv, wave)

    no_adapt = replace(cfg, injection=InjectionConfig(
        audio_adapter_p1=False, audio_adapter_p2=False, num_skip=2))
    enc = LockstepEncoder(no_adapt.swin, no_adapt.htsat, no_adapt.moe,
                          no_adapt.injection, dtype=jnp.bfloat16)
    ev = jax.jit(enc.init)(jax.random.PRNGKey(0), wave[:1], imgs[:1])
    f = jax.jit(lambda v, w, x: enc.apply(v, w, x)[0])
    results["lockstep_no_adapters_s"] = timeit(f, ev, wave, imgs)

    enc2 = LockstepEncoder(cfg.swin, cfg.htsat, cfg.moe, cfg.injection,
                           dtype=jnp.bfloat16)
    ev2 = jax.jit(enc2.init)(jax.random.PRNGKey(0), wave[:1], imgs[:1])
    f = jax.jit(lambda v, w, x: enc2.apply(v, w, x)[0])
    results["lockstep_full_s"] = timeit(f, ev2, wave, imgs)

    print(json.dumps({k: round(v * 1000, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
