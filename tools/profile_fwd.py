"""Profile the AVE eval forward on the real TPU, dump per-op device times."""
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
wave = jnp.asarray(rng.randn(B, T, cfg.audio_len).astype(np.float32) * 0.1)
imgs = jnp.asarray(rng.rand(B, T, cfg.swin.img_size, cfg.swin.img_size, 3).astype(np.float32))
t0 = time.time()
variables = jax.jit(model.init)(jax.random.PRNGKey(0), wave[:1], imgs[:1])

@jax.jit
def fwd(variables, wave, imgs):
    out = model.apply(variables, wave, imgs, train=False)
    return out["is_event_logits"], out["event_logits"]

def sync(outs):
    return sum(float(np.asarray(o).sum()) for o in outs)

sync(fwd(variables, wave, imgs))
print("warm", time.time() - t0, flush=True)
import jax.profiler
jax.profiler.start_trace(os.environ.get("TRACE_DIR", "/tmp/trace_fwd"))
for _ in range(3):
    r = fwd(variables, wave, imgs)
sync(r)
jax.profiler.stop_trace()
print("done", flush=True)
