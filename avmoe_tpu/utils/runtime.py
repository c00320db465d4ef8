"""Runtime utilities: compilation cache, param counting, profiling hooks."""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax


def apply_platform_override() -> None:
    """Honor AVMOE_PLATFORM=cpu|tpu before any device use.

    The host's sitecustomize registers the axon TPU plugin in every python
    process and overrides JAX_PLATFORMS from the environment, so the only
    reliable way to force CPU (e.g. for dress-rehearsal CLI runs) is
    jax.config.update inside the process. Called at the top of every CLI."""
    plat = os.environ.get("AVMOE_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)


def enable_compilation_cache(directory: Optional[str] = None) -> None:
    """Persistent XLA compilation cache (first compile is 20-40s on TPU;
    cached reloads are near-instant).

    Precedence: explicit arg > JAX_COMPILATION_CACHE_DIR env (lets tooling
    measure true cold-cache compile walls without touching the repo cache) >
    the repo-local `.jax_cache/`."""
    directory = (directory
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.dirname(os.path.dirname(
                     os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


#: The measured-best perf toggles (round 3-5 sweeps: tools/sweep_eval_knobs,
#: tools/sweep_train_knobs; measurements in BASELINE.md + docs/ROADMAP.md).
#: bench.py sets the same values, so CLI throughput matches the benchmark.
PERF_DEFAULTS = {
    # bf16 attention logits: max-subtracted softmax keeps bf16 range safe;
    # halves logit HBM traffic (+29% eval)
    "AVMOE_BF16_LOGITS": "1",
    # fused bottleneck-rank MoE combine (exact algebra, parity/grad-parity
    # tested in tests/test_fused_moe.py), eval AND train variants
    "AVMOE_FUSED_MOE": "1",
    "AVMOE_FUSED_MOE_TRAIN": "1",
    # tanh-approx GELU: max rel err ~3e-3, below bf16 stream noise; the erf
    # lowering costs ~10 ms/forward on the VPU
    "AVMOE_FAST_GELU": "1",
    # unroll 4 chunk bodies per loop iteration (identical math)
    "AVMOE_CHUNK_UNROLL": "4",
    # monolithic train attention wins at batch 4 (22.1 vs 19.5 clips/s)
    "AVMOE_CHUNK_ATTN_TRAIN": "0",
}


def apply_perf_defaults() -> None:
    """Default the CLI user surface to the measured-best perf configuration
    (PERF_DEFAULTS). setdefault only — any explicitly exported AVMOE_* env
    var wins, and `--precise` (which calls clear_perf_defaults-style exact
    settings) turns the numerics-adjacent toggles off. Must run before the
    first model trace (the toggles are read at trace time)."""
    for k, v in PERF_DEFAULTS.items():
        os.environ.setdefault(k, v)


def apply_precise_mode() -> None:
    """Exact-numerics mode for the CLIs (--precise): fp32 attention logits,
    erf GELU. The fused-MoE combine and chunk unrolling stay on — they are
    bit-exact algebra/scheduling changes, not approximations."""
    os.environ["AVMOE_BF16_LOGITS"] = "0"
    os.environ["AVMOE_FAST_GELU"] = "0"


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def dropout_det(train: bool) -> bool:
    """Deterministic flag for every dropout site: eval is always
    deterministic; TRAIN mode also goes deterministic under
    AVMOE_DETERMINISTIC_TRAIN=1 (cross-framework training-curve parity tests
    and bitwise-reproducibility debugging — dropout is the one train-time
    stochastic op whose masks cannot be matched across frameworks)."""
    return (not train) or os.environ.get("AVMOE_DETERMINISTIC_TRAIN", "0") == "1"


def archive_sources(dst_dir: str, root: Optional[str] = None) -> int:
    """Snapshot the framework's .py sources next to an experiment's outputs
    (ref: avs_s4/train_v2.py:102-114 script self-archival). Returns file count."""
    import shutil

    root = root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    count = 0
    for dirpath, _, files in os.walk(root):
        if "__pycache__" in dirpath:
            continue
        for f in files:
            if f.endswith(".py"):
                src = os.path.join(dirpath, f)
                rel = os.path.relpath(src, root)
                out = os.path.join(dst_dir, "sources", rel)
                os.makedirs(os.path.dirname(out), exist_ok=True)
                shutil.copyfile(src, out)
                count += 1
    return count


def pipelined(fn, iterable, depth: int = 2):
    """Iterate ``(item, fn(item))`` pairs with up to depth+1 dispatches held.

    Through the TPU tunnel every host readback of a step's outputs costs a
    full dispatch round-trip (~45 ms measured), so an eval loop that syncs
    per batch serializes device work behind transport RTT. This generator
    dispatches batch i+depth before yielding batch i — the internal queue
    drains only once it EXCEEDS `depth`, so depth+1 un-yielded dispatches
    are held at steady state — and the consumer's
    ``float()`` / ``np.asarray()`` readback overlaps the device execution of
    the batches still in flight. `fn` must only dispatch (return jax arrays
    or pytrees without forcing a host sync).

    Replaces the per-batch-synced eval loops of the reference drivers
    (ref: AVMOE/AVE/main_trans_v3.py:349-354 test loop).
    """
    from collections import deque

    q = deque()
    for item in iterable:
        q.append((item, fn(item)))
        if len(q) > depth:
            yield q.popleft()
    while q:
        yield q.popleft()


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """jax.profiler trace scope (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def remat_policy(name: str):
    """Resolve a config remat_policy string to a jax.checkpoint policy.

    'full' -> None (recompute everything; minimum memory)
    'dots' -> checkpoint_dots_with_no_batch_dims: save non-batched matmul
              outputs so backward skips GEMM recompute (the right trade for
              the frozen-backbone residual stream, where elementwise ops are
              cheap to redo but the window-attention GEMM chain is not)
    """
    import jax

    if name in (None, "full"):
        return None
    if name == "dots":
        return jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims
    if name == "dots_batch":
        return jax.checkpoint_policies.checkpoint_dots
    raise ValueError(f"unknown remat policy {name!r}")
