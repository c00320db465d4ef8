"""AVE throughput benchmark: clips/sec/chip + p50 per-clip latency.

Runs the flagship AVE model (Swin-V2-L + HTS-AT + MoE adapters, bf16 compute)
in eval mode on whatever accelerator JAX exposes and prints ONE JSON line.

`vs_baseline` is measured against NOMINAL_A100_CLIPS_PER_SEC, a documented
estimate of the PyTorch reference's per-chip A100 forward throughput on the
same config (the reference repo publishes no numbers - BASELINE.md); the
north-star target is 5.0x.
"""

from __future__ import annotations

import json
import os
import time

# fast inference mode: bf16 attention logits (max-subtracted softmax keeps
# bf16 range safe; training default stays fp32 for strict parity)
os.environ.setdefault("AVMOE_BF16_LOGITS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.utils import enable_compilation_cache

enable_compilation_cache()

NOMINAL_A100_CLIPS_PER_SEC = 50.0
BATCH_CLIPS = int(os.environ.get("BENCH_BATCH_CLIPS", "4"))
WARMUP = 3
ITERS = 20


def main() -> None:
    from avmoe_tpu.config import AVEConfig
    from avmoe_tpu.models.ave import AVEModel

    cfg = AVEConfig()
    model = AVEModel(cfg, dtype=jnp.bfloat16)
    T = cfg.num_segments
    rng = np.random.RandomState(0)

    wave = jnp.asarray(rng.randn(BATCH_CLIPS, T, cfg.audio_len).astype(np.float32) * 0.1)
    imgs = jnp.asarray(
        rng.rand(BATCH_CLIPS, T, cfg.swin.img_size, cfg.swin.img_size, 3).astype(np.float32)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), wave[:1], imgs[:1])

    @jax.jit
    def fwd(variables, wave, imgs):
        out = model.apply(variables, wave, imgs, train=False)
        return out["is_event_logits"], out["event_logits"]

    def sync(out):
        # force host readback: on the experimental tunnel transport,
        # block_until_ready can return before execution finishes
        return float(np.asarray(out[0]).sum()) + float(np.asarray(out[1]).sum())

    # warmup / compile
    for _ in range(WARMUP):
        sync(fwd(variables, wave, imgs))

    # throughput: dispatch all iterations, sync once (pipelined)
    t0 = time.perf_counter()
    outs = None
    for _ in range(ITERS):
        outs = fwd(variables, wave, imgs)
    sync(outs)
    total = time.perf_counter() - t0
    clips_per_sec = BATCH_CLIPS * ITERS / total

    # p50 latency: per-call host sync
    times = []
    for _ in range(ITERS):
        t1 = time.perf_counter()
        sync(fwd(variables, wave, imgs))
        times.append(time.perf_counter() - t1)
    times = np.asarray(times)
    p50_ms = float(np.percentile(times, 50)) / BATCH_CLIPS * 1e3

    print(json.dumps({
        "metric": "ave_clips_per_sec_per_chip",
        "value": round(float(clips_per_sec), 3),
        "unit": "clips/s",
        "vs_baseline": round(float(clips_per_sec) / NOMINAL_A100_CLIPS_PER_SEC, 3),
        "p50_per_clip_ms": round(p50_ms, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
