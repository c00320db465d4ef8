"""AVE benchmark: eval throughput + true latency + train throughput, one JSON line.

Runs the flagship AVE model (Swin-V2-L + HTS-AT + MoE adapters, bf16 compute)
on whatever accelerator JAX exposes and prints ONE JSON line:

  * value / vs_baseline   - eval clips/sec/chip at the batch-4 sweet spot
  * p50_batch1_ms         - TRUE per-clip latency (batch-1 call, host-synced)
  * p50_amortized_ms      - batch-4 call time / 4 (the round-1 "p50" metric)
  * train_clips_per_sec   - full train step (loss+grads+optimizer), batch 4
  * train_step_ms         - median step time at that batch

`vs_baseline` divides by NOMINAL_A100_CLIPS_PER_SEC, a roofline-derived
estimate of the PyTorch reference's per-chip A100 forward throughput on the
same config, resolved generously in the reference's favor (derivation in
BASELINE.md); the north-star target is 5.0x.
"""

from __future__ import annotations

import json
import os
import time

# fast inference mode: bf16 attention logits (max-subtracted softmax keeps
# bf16 range safe; training default stays fp32 for strict parity)
os.environ.setdefault("AVMOE_BF16_LOGITS", "1")
# fused bottleneck-rank MoE combine (eval-only exact algebra; parity-tested
# in tests/test_fused_moe.py)
os.environ.setdefault("AVMOE_FUSED_MOE", "1")
# tanh-approx GELU (max rel err ~3e-3, below bf16 stream noise; erf lowering
# costs ~10 ms/forward on the VPU). Train keeps exact GELU by default.
os.environ.setdefault("AVMOE_FAST_GELU", "1")
# unroll 4 chunk bodies per loop iteration: divides the per-iteration loop
# machinery and loop-invariant kernel rereads by 4 (round-4 sweep: 86.0 vs
# 85.3 clips/s base - marginal but free; identical math)
os.environ.setdefault("AVMOE_CHUNK_UNROLL", "4")
# train-step fast mode (round-3 sweep, tools/sweep_train_knobs.py):
# monolithic attention beats chunk+remat at batch 4 (22.1 vs 19.5 clips/s),
# and the fused bottleneck-rank MoE combine now runs in TRAIN too with
# closed-form BatchNorm batch stats (grad-parity tested in
# tests/test_fused_moe.py) - together 26.1 vs 19.5 clips/s
os.environ.setdefault("AVMOE_CHUNK_ATTN_TRAIN", "0")
os.environ.setdefault("AVMOE_FUSED_MOE_TRAIN", "1")

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.utils import enable_compilation_cache

enable_compilation_cache()

NOMINAL_A100_CLIPS_PER_SEC = 50.0  # derivation: BASELINE.md

def _jit(f):
    """jit with optional scoped-VMEM override (env AVMOE_SCOPED_VMEM_KIB):
    larger scoped VMEM lets XLA form bigger fusion islands."""
    kib = os.environ.get("AVMOE_SCOPED_VMEM_KIB")
    if kib:
        import jax as _jax

        return _jax.jit(f, compiler_options={
            "xla_tpu_scoped_vmem_limit_kib": kib})
    import jax as _jax

    return _jax.jit(f)

BATCH_CLIPS = int(os.environ.get("BENCH_BATCH_CLIPS", "4"))
WARMUP = 3
ITERS = 20
TRAIN_ITERS = 10
SKIP_TRAIN = os.environ.get("BENCH_SKIP_TRAIN", "") == "1"


def _sync(outs) -> float:
    # force host readback: on the experimental tunnel transport,
    # block_until_ready can return before execution finishes. ONE readback:
    # every fresh-result read costs a fixed ~28 ms RTT (probe_transport.py).
    return float(np.asarray(outs).sum())


def bench_eval(model, cfg):
    rng = np.random.RandomState(0)
    T = cfg.num_segments
    wave = jnp.asarray(rng.randn(BATCH_CLIPS, T, cfg.audio_len).astype(np.float32) * 0.1)
    imgs = jnp.asarray(
        rng.rand(BATCH_CLIPS, T, cfg.swin.img_size, cfg.swin.img_size, 3).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), wave[:1], imgs[:1])

    @_jit
    def fwd(variables, wave, imgs):
        out = model.apply(variables, wave, imgs, train=False)
        # ONE packed output: each fresh-result readback through the tunnel
        # costs a fixed ~28 ms RTT regardless of payload (tools/
        # probe_transport.py: 2 sequential readbacks 54.0 ms, packed 27.4),
        # so the serving path returns a single (B, T+C) array the consumer
        # splits host-side.
        return jnp.concatenate(
            [out["is_event_logits"].astype(jnp.float32),
             out["event_logits"].astype(jnp.float32)], axis=-1)

    for _ in range(WARMUP):
        _sync(fwd(variables, wave, imgs))

    # throughput: dispatch all iterations, sync once (pipelined)
    t0 = time.perf_counter()
    outs = None
    for _ in range(ITERS):
        outs = fwd(variables, wave, imgs)
    _sync(outs)
    total = time.perf_counter() - t0
    clips_per_sec = BATCH_CLIPS * ITERS / total

    # amortized "latency": batch-N call time / N, per-call host sync
    times = []
    for _ in range(ITERS):
        t1 = time.perf_counter()
        _sync(fwd(variables, wave, imgs))
        times.append(time.perf_counter() - t1)
    p50_amortized_ms = float(np.percentile(times, 50)) / BATCH_CLIPS * 1e3

    # TRUE p50 latency: batch-1 call, per-call host sync (includes the
    # tunnel round-trip - the serving-shaped number on THIS transport)
    w1, i1 = wave[:1], imgs[:1]
    for _ in range(WARMUP):
        _sync(fwd(variables, w1, i1))
    times = []
    for _ in range(ITERS):
        t1 = time.perf_counter()
        _sync(fwd(variables, w1, i1))
        times.append(time.perf_counter() - t1)
    p50_batch1_ms = float(np.percentile(times, 50)) * 1e3

    # DEVICE-side batch-1 step time: saturate the dispatch pipeline and
    # amortize one final sync - the transport RTT overlaps with execution,
    # so the steady-state per-dispatch time is the on-chip cost. The split
    # (p50_batch1_ms - this) is what a local-host deployment would not pay.
    t1 = time.perf_counter()
    outs = None
    for _ in range(ITERS):
        outs = fwd(variables, w1, i1)
    _sync(outs)
    p50_batch1_device_ms = (time.perf_counter() - t1) / ITERS * 1e3

    # bytes/clip from XLA's cost analysis of the SAME compiled program, so
    # every clips/s claim carries its roofline position (BASELINE.md)
    try:
        ca = fwd.lower(variables, wave, imgs).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        bytes_per_clip_gb = float(ca.get("bytes accessed", 0.0)) / BATCH_CLIPS / 2**30
    except Exception:
        bytes_per_clip_gb = None

    del variables
    return (clips_per_sec, p50_batch1_ms, p50_amortized_ms,
            p50_batch1_device_ms, bytes_per_clip_gb)


def bench_train(cfg):
    from avmoe_tpu.config import TrainConfig
    from avmoe_tpu.models.ave import AVEModel, make_ave_loss_fn
    from avmoe_tpu.train.state import create_train_state
    from avmoe_tpu.train.steps import make_train_step

    tcfg = TrainConfig(batch_size=BATCH_CLIPS, accum_steps=1)
    model = AVEModel(cfg, dtype=jnp.bfloat16)
    B, T = BATCH_CLIPS, cfg.num_segments
    rng = np.random.RandomState(0)
    batch = {
        "wave": jnp.asarray(rng.randn(B, T, cfg.audio_len).astype(np.float32) * 0.1),
        "images": jnp.asarray(rng.rand(B, T, 192, 192, 3).astype(np.float32)),
        "labels": jnp.asarray(np.eye(cfg.num_classes + 1, dtype=np.float32)[
            rng.randint(0, cfg.num_classes + 1, (B, T))]),
    }
    variables = jax.jit(lambda r, w, im: model.init(r, w, im, train=True))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "specaug": jax.random.PRNGKey(2)},
        batch["wave"][:1], batch["images"][:1])
    state = create_train_state(model, variables, tcfg)
    # donate: in-place state update removes ~0.5 GB of param copies per step
    # (measured +10% train throughput at batch 8)
    train_step = make_train_step(make_ave_loss_fn(model))

    key = jax.random.PRNGKey(0)
    state, m = train_step(state, batch, key)
    _ = float(m["loss"])  # compile + sync
    state, m = train_step(state, batch, jax.random.fold_in(key, 999))
    _ = float(m["loss"])  # warm
    # PIPELINED timing (one final host sync): a real epoch loop logs loss
    # asynchronously; syncing on the loss every step costs ~45 ms of tunnel
    # RTT per dispatch (measured 267 vs 205 ms/step at batch 4)
    t0 = time.perf_counter()
    for i in range(TRAIN_ITERS):
        state, m = train_step(state, batch, jax.random.fold_in(key, i))
    _ = float(m["loss"])
    step_s = (time.perf_counter() - t0) / TRAIN_ITERS
    return B / step_s, step_s * 1e3


def main() -> None:
    from avmoe_tpu.config import AVEConfig
    from avmoe_tpu.models.ave import AVEModel

    cfg = AVEConfig()
    model = AVEModel(cfg, dtype=jnp.bfloat16)
    clips_per_sec, p50_b1, p50_amort, p50_b1_dev, bpc = bench_eval(model, cfg)

    rec = {
        "metric": "ave_clips_per_sec_per_chip",
        "value": round(float(clips_per_sec), 3),
        "unit": "clips/s",
        "vs_baseline": round(float(clips_per_sec) / NOMINAL_A100_CLIPS_PER_SEC, 3),
        "p50_batch1_ms": round(p50_b1, 3),
        "p50_batch1_device_ms": round(p50_b1_dev, 3),
        "p50_batch1_transport_ms": round(p50_b1 - p50_b1_dev, 3),
        "p50_amortized_ms": round(p50_amort, 3),
        "batch_clips": BATCH_CLIPS,
        "bytes_per_clip_gb": round(bpc, 3) if bpc is not None else None,
        "device": str(jax.devices()[0]),
    }
    if not SKIP_TRAIN:
        train_cps, train_ms = bench_train(cfg)
        rec["train_clips_per_sec"] = round(train_cps, 3)
        rec["train_step_ms"] = round(train_ms, 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
