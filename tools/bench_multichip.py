"""Multi-chip dp scaling evidence on the virtual CPU mesh.

Real multi-chip TPU hardware is not reachable from this host (one v5e chip
through a tunnel), so the multi-chip throughput story is built from what IS
measurable here:

  1. the COMMUNICATION STRUCTURE of the compiled program per dp degree -
     which collectives XLA inserts, over which shapes, and how many bytes
     they move per step (parsed from the compiled HLO);
  2. numerical invariance (dryrun_multichip + tests/test_multidevice.py);
  3. the flagship model's trainable-gradient volume (jax.eval_shape - no
     compile needed), which bounds the per-step all-reduce traffic that dp
     scaling must hide.

Step wall times on the host CPU mesh are printed for completeness but carry
no projection weight (1 physical core timeshares all 8 virtual devices).

Replaces: the reference scales with nn.DataParallel
(/root/reference/AVMOE/AVVP/main.py:420-421) - single-process replicated
torch, gradient sync via host gather. Here dp is a jax.sharding Mesh axis
and XLA emits one fused all-reduce over the trainable grads.

Output: one JSON line per dp degree + a summary block to paste into
BASELINE.md. Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python
tools/bench_multichip.py  (CPU-only; ~10 min cold, cached after).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import re
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}

# '%all-reduce.1 = f32[1234]{0} all-reduce(' and tuple-shaped variants
_COLL_RE = re.compile(
    r"=\s*(\(?[a-z0-9]+\[[^=]*?)\s*"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)\(")
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")


def collective_stats(hlo_text: str):
    """{op_kind: {'count': n, 'bytes': total_output_bytes}} from HLO text."""
    out = {}
    for m in _COLL_RE.finditer(hlo_text):
        shapes, kind = m.group(1), m.group(2)
        nbytes = 0
        for dt, dims in _SHAPE_RE.findall(shapes):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * DTYPE_BYTES.get(dt, 4)
        rec = out.setdefault(kind, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += nbytes
    return out


def main() -> None:
    from avmoe_tpu.config import TrainConfig, replace, tiny_ave_config
    from avmoe_tpu.models.ave import AVEModel, make_ave_eval_fn, make_ave_loss_fn
    from avmoe_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from avmoe_tpu.train.state import create_train_state
    from avmoe_tpu.train.steps import make_eval_step, make_train_step

    cfg = tiny_ave_config()
    cfg = replace(cfg,
                  swin=replace(cfg.swin, depths=(2, 2, 2, 2)),
                  htsat=replace(cfg.htsat, depths=(2, 2, 2, 2)))
    model = AVEModel(cfg)
    T = cfg.num_segments
    rng = np.random.RandomState(0)

    def make_batch(B):
        return {
            "wave": rng.randn(B, T, cfg.audio_len).astype(np.float32) * 0.1,
            "images": rng.rand(B, T, cfg.swin.img_size, cfg.swin.img_size,
                               3).astype(np.float32),
            "labels": np.eye(cfg.num_classes + 1, dtype=np.float32)[
                rng.randint(0, cfg.num_classes + 1, (B, T))],
        }

    with jax.disable_jit():
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "specaug": jax.random.PRNGKey(2)},
            jnp.asarray(make_batch(1)["wave"]),
            jnp.asarray(make_batch(1)["images"]), train=True)

    dps = [int(d) for d in os.environ.get("BENCH_MC_DPS", "1,2,4,8").split(",")]
    results = []
    for dp in dps:
        mesh = make_mesh(dp)
        try:
            jax.set_mesh(mesh)
        except Exception:
            pass
        tcfg = TrainConfig(batch_size=dp, accum_steps=1)
        state = replicate(create_train_state(model, variables, tcfg,
                                             steps_per_epoch=8), mesh)
        batch = shard_batch(make_batch(dp), mesh)
        train_step = make_train_step(make_ave_loss_fn(model), donate=False)
        lowered = train_step.lower(state, batch, jax.random.PRNGKey(7))
        compiled = lowered.compile()
        colls = collective_stats(compiled.as_text())
        # execute a few steps for a (CPU-informational) wall time
        state2, m = compiled(state, batch, jax.random.PRNGKey(7))
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for i in range(3):
            state2, m = compiled(state2, batch, jax.random.PRNGKey(8 + i))
        _ = float(m["loss"])
        step_ms = (time.perf_counter() - t0) / 3 * 1e3
        rec = {"mode": "train", "dp": dp, "collectives": colls,
               "cpu_step_ms_informational": round(step_ms, 1),
               "loss_finite": bool(np.isfinite(float(m["loss"])))}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # eval fwd at max dp: dp eval must insert ZERO stream collectives
    dp = max(dps)
    mesh = make_mesh(dp)
    try:
        jax.set_mesh(mesh)
    except Exception:
        pass
    v_rep = replicate(variables, mesh)
    b = shard_batch(make_batch(dp), mesh)

    def fwd(v, w, im):
        out = model.apply({"params": v["params"],
                           "batch_stats": v["batch_stats"]}, w, im, train=False)
        return out["event_logits"]

    compiled = jax.jit(fwd).lower(v_rep, b["wave"], b["images"]).compile()
    ecolls = collective_stats(compiled.as_text())
    rec = {"mode": "eval", "dp": dp, "collectives": ecolls}
    results.append(rec)
    print(json.dumps(rec), flush=True)

    # flagship trainable-gradient volume (shape inference only - no compile)
    from avmoe_tpu.config import AVEConfig
    from avmoe_tpu.train.freeze import partition_params

    fcfg = AVEConfig()
    fmodel = AVEModel(fcfg, dtype=jnp.bfloat16)
    B, T = 1, fcfg.num_segments
    shapes = jax.eval_shape(
        fmodel.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((B, T, fcfg.audio_len), jnp.float32),
        jax.ShapeDtypeStruct((B, T, fcfg.swin.img_size, fcfg.swin.img_size, 3),
                             jnp.float32))
    trainable, frozen = partition_params(shapes["params"])
    tbytes = sum(np.prod(l.shape) * 4 for l in
                 jax.tree_util.tree_leaves(trainable))
    fbytes = sum(np.prod(l.shape) * 4 for l in
                 jax.tree_util.tree_leaves(frozen))
    summary = {
        "flagship_trainable_grad_mb": round(float(tbytes) / 2**20, 1),
        "flagship_frozen_param_mb": round(float(fbytes) / 2**20, 1),
        "train_allreduce_bytes_tiny": max(
            r["collectives"].get("all-reduce", {}).get("bytes", 0)
            for r in results if r["mode"] == "train"),
        "note": ("dp train inserts one grad all-reduce over TRAINABLE params "
                 "only (frozen backbones contribute no gradient traffic); "
                 "dp eval inserts zero stream collectives - per-chip "
                 "throughput is communication-free. Projection math: "
                 "BASELINE.md 'v5e-8 scaling'."),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
