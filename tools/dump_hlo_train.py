"""Dump optimized HLO + cost analysis for the AVE train step (current env
toggles). Pair with tools/trace_by_module.py for a per-module device-time
split of the backward. PROF_BATCH sets the batch (default 4)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
os.environ.setdefault("AVMOE_BF16_LOGITS", "1")
os.environ.setdefault("AVMOE_FAST_GELU", "1")
os.environ.setdefault("AVMOE_FUSED_MOE_TRAIN", "1")
os.environ.setdefault("AVMOE_CHUNK_ATTN_TRAIN", "0")
import time
import jax, jax.numpy as jnp, numpy as np
from avmoe_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from avmoe_tpu.config import AVEConfig, TrainConfig
from avmoe_tpu.models.ave import AVEModel, make_ave_loss_fn
from avmoe_tpu.train.state import create_train_state
from avmoe_tpu.train.steps import make_train_step

B = int(os.environ.get("PROF_BATCH", "4"))
cfg = AVEConfig()
tcfg = TrainConfig(batch_size=B, accum_steps=1)
model = AVEModel(cfg, dtype=jnp.bfloat16)
T = cfg.num_segments
batch = {
    "wave": jnp.zeros((B, T, cfg.audio_len), jnp.float32),
    "images": jnp.zeros((B, T, 192, 192, 3), jnp.float32),
    "labels": jnp.zeros((B, T, cfg.num_classes + 1), jnp.float32),
}
variables = jax.jit(lambda r, w, im: model.init(r, w, im, train=True))(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
     "specaug": jax.random.PRNGKey(2)},
    batch["wave"][:1], batch["images"][:1])
state = create_train_state(model, variables, tcfg)
train_step = make_train_step(make_ave_loss_fn(model), donate=False)
t0 = time.time()
compiled = train_step.lower(state, batch, jax.random.PRNGKey(0)).compile()
print("compile", time.time() - t0, flush=True)
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print(f"flops: {float(ca.get('flops', 0)):.4g}  "
      f"bytes: {float(ca.get('bytes accessed', 0)):.4g}  "
      f"(per clip: {float(ca.get('flops', 0)) / B:.4g} F, "
      f"{float(ca.get('bytes accessed', 0)) / B / 2**30:.2f} GiB)", flush=True)
out = os.environ.get("HLO_OUT", "/tmp/hlo_train.txt")
with open(out, "w") as f:
    f.write(compiled.as_text())
print("dumped", out, flush=True)
