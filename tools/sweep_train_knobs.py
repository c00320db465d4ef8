"""Sweep train-step knobs on the real TPU; print clips/s per config.

Timing is PIPELINED (dispatch all steps, one final host sync): a production
epoch loop does not read the loss back every step, and the per-step readback
costs ~45 ms of tunnel RTT per dispatch on this transport (measured:
246 ms wall vs 203 ms device at batch 4). Reports both pipelined and
synced-every-step times.

Usage: python tools/sweep_train_knobs.py [idx ...]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

os.environ.setdefault("AVMOE_BF16_LOGITS", "1")
os.environ.setdefault("AVMOE_FAST_GELU", "1")

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.utils import enable_compilation_cache

enable_compilation_cache()

# (name, batch, env, remat_policy)
CONFIGS = [
    ("b4 chunk-attn-train=1 (bench default)", 4,
     {"AVMOE_CHUNK_ATTN_TRAIN": "1"}, None),
    ("b4 chunk-attn-train=0 (monolithic)", 4,
     {"AVMOE_CHUNK_ATTN_TRAIN": "0"}, None),
    ("b8 chunk-attn-train=1", 8, {"AVMOE_CHUNK_ATTN_TRAIN": "1"}, None),
    ("b8 chunk-attn-train=1 remat-dots", 8,
     {"AVMOE_CHUNK_ATTN_TRAIN": "1"}, "dots"),
    ("b8 chunk-attn-train=0 remat-dots", 8,
     {"AVMOE_CHUNK_ATTN_TRAIN": "0"}, "dots"),
    ("b4 chunk=0 fused-moe-train", 4,
     {"AVMOE_CHUNK_ATTN_TRAIN": "0", "AVMOE_FUSED_MOE_TRAIN": "1"}, None),
    ("b4 chunk=1 fused-moe-train", 4,
     {"AVMOE_CHUNK_ATTN_TRAIN": "1", "AVMOE_FUSED_MOE_TRAIN": "1"}, None),
    ("b8 chunk=0 fused-moe-train", 8,
     {"AVMOE_CHUNK_ATTN_TRAIN": "0", "AVMOE_FUSED_MOE_TRAIN": "1"}, None),
    # round 4: save-P chunked attention (mode 2 - softmax probs saved, only
    # the qkv relayout reruns in the backward; the (B,H,N,N) softmax GRADS
    # never materialize at stream size)
    ("b4 chunk=2 save-P fused-moe-train", 4,
     {"AVMOE_CHUNK_ATTN_TRAIN": "2", "AVMOE_FUSED_MOE_TRAIN": "1"}, None),
    ("b8 chunk=2 save-P fused-moe-train", 8,
     {"AVMOE_CHUNK_ATTN_TRAIN": "2", "AVMOE_FUSED_MOE_TRAIN": "1"}, None),
    ("b16 chunk=2 save-P fused-moe-train", 16,
     {"AVMOE_CHUNK_ATTN_TRAIN": "2", "AVMOE_FUSED_MOE_TRAIN": "1"}, None),
]

WARMUP, ITERS = 2, 10


def run_config(name, B, env, remat):
    from avmoe_tpu.config import AVEConfig, TrainConfig, replace
    from avmoe_tpu.models.ave import AVEModel, make_ave_loss_fn
    from avmoe_tpu.train.state import create_train_state
    from avmoe_tpu.train.steps import make_train_step

    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        cfg = AVEConfig()
        if remat:
            cfg = replace(
                cfg, swin=replace(cfg.swin, remat=True, remat_policy=remat),
                htsat=replace(cfg.htsat, remat=True, remat_policy=remat))
        tcfg = TrainConfig(batch_size=B, accum_steps=1)
        model = AVEModel(cfg, dtype=jnp.bfloat16)
        T = cfg.num_segments
        rng = np.random.RandomState(0)
        batch = {
            "wave": jnp.asarray(
                rng.randn(B, T, cfg.audio_len).astype(np.float32) * 0.1),
            "images": jnp.asarray(
                rng.rand(B, T, 192, 192, 3).astype(np.float32)),
            "labels": jnp.asarray(np.eye(cfg.num_classes + 1, dtype=np.float32)[
                rng.randint(0, cfg.num_classes + 1, (B, T))]),
        }
        variables = jax.jit(lambda r, w, im: model.init(r, w, im, train=True))(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "specaug": jax.random.PRNGKey(2)},
            batch["wave"][:1], batch["images"][:1])
        state = create_train_state(model, variables, tcfg)
        del variables
        train_step = make_train_step(make_ave_loss_fn(model))  # donated state
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        for i in range(WARMUP):
            state, m = train_step(state, batch, jax.random.fold_in(key, i))
            _ = float(m["loss"])
        compile_s = time.time() - t0

        # synced-every-step (the old bench metric)
        times = []
        for i in range(4):
            t0 = time.perf_counter()
            state, m = train_step(state, batch, jax.random.fold_in(key, 10 + i))
            _ = float(m["loss"])
            times.append(time.perf_counter() - t0)
        synced_ms = float(np.percentile(times, 50)) * 1e3

        # pipelined (one final sync)
        t0 = time.perf_counter()
        for i in range(ITERS):
            state, m = train_step(state, batch, jax.random.fold_in(key, 20 + i))
        _ = float(m["loss"])
        total = time.perf_counter() - t0
        print(f"{name}: pipelined {B * ITERS / total:.2f} clips/s "
              f"({total / ITERS * 1e3:.1f} ms/step) | synced {synced_ms:.1f} ms "
              f"({B / synced_ms * 1e3:.2f} clips/s) | compile+warm {compile_s:.0f}s",
              flush=True)
    except Exception as e:  # noqa: BLE001 - report OOM/compile failures per row
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main() -> None:
    idxs = [int(a) for a in _sys.argv[1:]] or list(range(len(CONFIGS)))
    for i in idxs:
        name, B, env, remat = CONFIGS[i]
        run_config(f"[{i}] {name}", B, env, remat)


if __name__ == "__main__":
    main()
