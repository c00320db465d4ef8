"""Train-step throughput across remat configs (batch 4/8, full/dots)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, sys, time, json
os.environ.setdefault("AVMOE_BF16_LOGITS", "1")
import jax, jax.numpy as jnp, numpy as np
from avmoe_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from avmoe_tpu.config import AVEConfig, TrainConfig, replace
from avmoe_tpu.models.ave import AVEModel, make_ave_loss_fn
from avmoe_tpu.train.state import create_train_state
from avmoe_tpu.train.steps import make_train_step

variant = sys.argv[1] if len(sys.argv) > 1 else "b4"
B = int(variant[1])
if "chunk" in variant:
    os.environ["AVMOE_CHUNK_ATTN_TRAIN"] = "1"
DONATE = "donate" in variant
cfg = AVEConfig()
if "remat" in variant:
    pol = "dots" if "dots" in variant else "full"
    cfg = replace(cfg, swin=replace(cfg.swin, remat=True, remat_policy=pol),
                  htsat=replace(cfg.htsat, remat=True, remat_policy=pol))
tcfg = TrainConfig(batch_size=B, accum_steps=1)
model = AVEModel(cfg, dtype=jnp.bfloat16)
T = cfg.num_segments
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
train_step = make_train_step(make_ave_loss_fn(model), donate=DONATE)
key = jax.random.PRNGKey(0)
t0 = time.time()
state, m = train_step(state, batch, key)
print("compile+first", time.time() - t0, "loss", float(m["loss"]), flush=True)
times = []
for i in range(8):
    t0 = time.perf_counter()
    state, m = train_step(state, batch, jax.random.fold_in(key, i))
    _ = float(m["loss"])
    times.append(time.perf_counter() - t0)
step = float(np.percentile(times, 50))
print(json.dumps({"variant": variant, "batch": B,
                  "clips_per_sec": round(B / step, 2),
                  "step_ms": round(step * 1e3, 1)}), flush=True)
