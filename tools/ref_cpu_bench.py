"""CPU sanity anchor for BASELINE.md: the reference's own torch HTS-AT
forward vs the avmoe_tpu flax HTS-AT forward, same host CPU, same input.

This is a like-for-like *implementation-overhead* comparison (eager torch vs
jitted XLA on identical math), NOT an accelerator benchmark - it anchors the
claim that the A100 roofline estimate in BASELINE.md is generous to the
reference (an eager-mode implementation does not reach its own roofline).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/ref_cpu_bench.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "tests"))

import json
import time

import numpy as np


def main():
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    import torch

    from reference_harness import REF_ROOT, load_ref_module

    htsat_mod = load_ref_module(f"{REF_ROOT}/AVE", "nets.htsat")
    esc = load_ref_module(f"{REF_ROOT}/AVE", "nets.esc_config")
    esc.sample_rate, esc.hop_size, esc.classes_num = 32000, 320, 527
    esc.loss_type = "clip_bce"
    torch.manual_seed(0)
    ref = htsat_mod.HTSAT_Swin_Transformer(
        spec_size=esc.htsat_spec_size, patch_size=esc.htsat_patch_size,
        in_chans=1, num_classes=esc.classes_num,
        window_size=esc.htsat_window_size, config=esc,
        depths=esc.htsat_depth, embed_dim=esc.htsat_dim,
        patch_stride=esc.htsat_stride, num_heads=esc.htsat_num_head)
    ref.eval()

    rng = np.random.RandomState(0)
    wave = (rng.randn(4, 32000) * 0.1).astype(np.float32)
    tw = torch.from_numpy(wave)

    with torch.no_grad():
        ref(tw)  # warm
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            ref(tw)
        torch_s = (time.perf_counter() - t0) / iters

    from avmoe_tpu.backbones.htsat import HTSATEncoder
    from avmoe_tpu.checkpoint.convert import (convert_htsat,
                                              torch_state_dict_to_numpy)
    from avmoe_tpu.config import HTSATConfig

    enc = HTSATEncoder(HTSATConfig())
    params, batch_stats = convert_htsat(
        torch_state_dict_to_numpy(ref.state_dict()))
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def fwd(variables, wave):
        return enc.apply(variables, wave, train=False)

    jw = jnp.asarray(wave)
    np.asarray(jax.tree_util.tree_leaves(fwd(variables, jw))[0])  # compile
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fwd(variables, jw)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    flax_s = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "host": "cpu", "batch": 4, "iters": iters,
        "ref_torch_eager_s": round(torch_s, 3),
        "avmoe_flax_xla_s": round(flax_s, 3),
        "speedup": round(torch_s / flax_s, 2),
    }))


if __name__ == "__main__":
    main()
