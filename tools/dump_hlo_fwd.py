"""Dump optimized HLO for the AVE eval forward (current env toggles)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
os.environ.setdefault("AVMOE_BF16_LOGITS", "1")
os.environ.setdefault("AVMOE_FUSED_MOE", "1")
os.environ.setdefault("AVMOE_FAST_GELU", "1")
import time
import jax, jax.numpy as jnp, numpy as np
from avmoe_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from avmoe_tpu.config import AVEConfig
from avmoe_tpu.models.ave import AVEModel

cfg = AVEConfig()
model = AVEModel(cfg, dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
B, T = 4, cfg.num_segments
wave = jnp.zeros((B, T, cfg.audio_len), jnp.float32)
imgs = jnp.zeros((B, T, cfg.swin.img_size, cfg.swin.img_size, 3), jnp.float32)
t0 = time.time()
variables = jax.jit(model.init)(jax.random.PRNGKey(0), wave[:1], imgs[:1])

def fwd(variables, wave, imgs):
    out = model.apply(variables, wave, imgs, train=False)
    return out["is_event_logits"], out["event_logits"]

compiled = jax.jit(fwd).lower(variables, wave, imgs).compile()
print("compile", time.time() - t0, flush=True)
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print("flops:", ca.get("flops"), "bytes:", ca.get("bytes accessed"), flush=True)
out = os.environ.get("HLO_OUT", "/tmp/hlo_unfused.txt")
with open(out, "w") as f:
    f.write(compiled.as_text())
print("dumped", out, flush=True)
