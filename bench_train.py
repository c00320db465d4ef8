"""AVE full-config TRAINING-step benchmark (diagnostic, single chip).

Measures the jitted train step (fwd + adapter grads + optimizer + BN updates)
at the reference's batch size. Prints one JSON line."""

import json
import os
import time

os.environ.setdefault("AVMOE_BF16_LOGITS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.utils import enable_compilation_cache

enable_compilation_cache()

BATCH_CLIPS = int(os.environ.get("BENCH_BATCH_CLIPS", "2"))
ITERS = 10


def main():
    from avmoe_tpu.config import AVEConfig, TrainConfig
    from avmoe_tpu.models.ave import AVEModel, make_ave_loss_fn
    from avmoe_tpu.train.state import create_train_state
    from avmoe_tpu.train.steps import make_train_step

    cfg = AVEConfig()
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
    train_step = make_train_step(make_ave_loss_fn(model), donate=False)

    key = jax.random.PRNGKey(0)
    state, m = train_step(state, batch, key)
    _ = float(m["loss"])  # compile + sync
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, m = train_step(state, batch, jax.random.fold_in(key, i))
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({
        "metric": "ave_train_clips_per_sec_per_chip",
        "value": round(BATCH_CLIPS / dt, 3),
        "unit": "clips/s",
        "step_ms": round(dt * 1e3, 1),
        "batch_clips": BATCH_CLIPS,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
