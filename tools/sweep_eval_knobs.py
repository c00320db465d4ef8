"""Sweep eval-forward env knobs on the real TPU; print clips/s per config.

Each config re-jits the flagship AVE eval forward with different chunking
knobs (env vars are read at trace time), so every row pays one tunnel compile
on first run; the persistent cache makes repeats fast.

Usage: python tools/sweep_eval_knobs.py [idx ...]   (default: all configs)
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

os.environ.setdefault("AVMOE_BF16_LOGITS", "1")
os.environ.setdefault("AVMOE_FUSED_MOE", "1")
os.environ.setdefault("AVMOE_FAST_GELU", "1")

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.utils import enable_compilation_cache

enable_compilation_cache()

CONFIGS = [
    ("base (CHUNK_MB=4, CHUNK_V1=1)", {}),
    ("CHUNK_MB=8", {"AVMOE_CHUNK_MB": "8"}),
    ("CHUNK_MB=16", {"AVMOE_CHUNK_MB": "16"}),
    ("CHUNK_V1=0 (monolithic audio attn)", {"AVMOE_CHUNK_V1": "0"}),
    ("CHUNK_MB=8 + CHUNK_V1=0", {"AVMOE_CHUNK_MB": "8", "AVMOE_CHUNK_V1": "0"}),
    ("CHUNK_ATTN=0 (monolithic all)", {"AVMOE_CHUNK_ATTN": "0"}),
    # round 4: with qkv/proj/norm/residual now in-body, larger chunks cut
    # per-iteration loop machinery AND kernel rereads - re-sweep
    ("UNROLL=2", {"AVMOE_CHUNK_UNROLL": "2"}),
    ("UNROLL=4", {"AVMOE_CHUNK_UNROLL": "4"}),
    ("CHUNK_MB=8 + UNROLL=2",
     {"AVMOE_CHUNK_MB": "8", "AVMOE_CHUNK_UNROLL": "2"}),
    ("CHUNK_MB=16 + UNROLL=2",
     {"AVMOE_CHUNK_MB": "16", "AVMOE_CHUNK_UNROLL": "2"}),
    ("CHUNK_MB=32", {"AVMOE_CHUNK_MB": "32"}),
    ("SCOPED_VMEM=65536", {"AVMOE_SCOPED_VMEM_KIB": "65536"}),
    # round 5: bound the win of window-layout-resident streams (VERDICT r4
    # weak #3). Mode 1 = drop both in-body relayouts (pure-reshape entry/
    # exit: the perf UPPER BOUND of window residency); mode 2 = one composed
    # static gather per block exit (the steady-state cost model). Both are
    # numerics-WRONG perf probes (see ops.swin.relayout_probe_mode).
    ("PROBE_RELAYOUT=1 (no relayout: upper bound)",
     {"AVMOE_PROBE_RELAYOUT": "1"}),
    ("PROBE_RELAYOUT=2 (one composed gather/block)",
     {"AVMOE_PROBE_RELAYOUT": "2"}),
]

B, WARMUP, ITERS = 4, 3, 20


def main() -> None:
    from avmoe_tpu.config import AVEConfig
    from avmoe_tpu.models.ave import AVEModel

    idxs = [int(a) for a in _sys.argv[1:]] or list(range(len(CONFIGS)))
    cfg = AVEConfig()
    model = AVEModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    T = cfg.num_segments
    wave = jnp.asarray(rng.randn(B, T, cfg.audio_len).astype(np.float32) * 0.1)
    imgs = jnp.asarray(
        rng.rand(B, T, cfg.swin.img_size, cfg.swin.img_size, 3).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), wave[:1], imgs[:1])
    print("init done", flush=True)

    for i in idxs:
        name, env = CONFIGS[i]
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            t0 = time.time()
            kib = os.environ.get("AVMOE_SCOPED_VMEM_KIB")
            opts = ({"xla_tpu_scoped_vmem_limit_kib": kib} if kib else None)

            @(lambda f: jax.jit(f, compiler_options=opts))
            def fwd(variables, wave, imgs):
                out = model.apply(variables, wave, imgs, train=False)
                return out["is_event_logits"], out["event_logits"]

            def sync(outs):
                return sum(float(np.asarray(o).sum()) for o in outs)

            for _ in range(WARMUP):
                sync(fwd(variables, wave, imgs))
            compile_s = time.time() - t0
            t0 = time.perf_counter()
            outs = None
            for _ in range(ITERS):
                outs = fwd(variables, wave, imgs)
            sync(outs)
            total = time.perf_counter() - t0
            print(f"[{i}] {name}: {B * ITERS / total:.1f} clips/s "
                  f"(compile+warm {compile_s:.0f}s)", flush=True)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
