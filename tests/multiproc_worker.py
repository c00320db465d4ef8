"""Worker for tests/test_multiprocess.py: one process of a 2-process
jax.distributed CPU run exercising the REAL multi-host data path
(BatchLoader process slicing -> shard_batch_per_host ->
jax.make_array_from_process_local_data -> jitted global-batch eval).

Replaces-the-mock record for the role the reference fills with single-node
nn.DataParallel (ref: AVMOE/AVVP/main.py:420-421).

Usage: multiproc_worker.py <coordinator_port> <process_id> <num_processes>
"""
import os
import sys

# 2 virtual CPU devices per process -> 4 global devices
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
import jax

# the image's sitecustomize overrides JAX_PLATFORMS from the env; force CPU
# at the config level before any backend use
jax.config.update("jax_platforms", "cpu")

port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from avmoe_tpu.data.loader import BatchLoader  # noqa: E402
from avmoe_tpu.parallel.mesh import make_mesh, shard_batch_per_host  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid, jax.process_index()
assert len(jax.devices()) == 2 * nproc, jax.devices()

GLOBAL_BATCH, FEAT = 8, 16


class _DS:
    """Deterministic synthetic dataset: sample i = i + arange(FEAT)/FEAT."""

    def __len__(self):
        return 16

    def __getitem__(self, i):
        return {"x": (i + np.arange(FEAT, dtype=np.float32) / FEAT),
                "y": np.float32(i)}


# each process collates ONLY its contiguous 1/nproc slice of the global batch
loader = BatchLoader(_DS(), GLOBAL_BATCH, shuffle=False, num_workers=0,
                     drop_last=True, process_index=pid, process_count=nproc)
local = next(iter(loader))
assert local["x"].shape[0] == GLOBAL_BATCH // nproc, local["x"].shape

mesh = make_mesh()  # 4 global devices -> ('data'=4, 'model'=1)
global_batch = shard_batch_per_host(local, mesh)
assert global_batch["x"].shape == (GLOBAL_BATCH, FEAT), global_batch["x"].shape

# jitted global eval over the sharded batch: per-sample score + global mean
# (the all-reduce XLA inserts here crosses the process boundary for real)
@jax.jit
def eval_step(b):
    score = b["x"].mean(axis=-1) - b["y"]
    return score, score.mean()

score, mean = eval_step(global_batch)
# fully-replicated outputs are addressable everywhere; check exact values
expect = np.asarray([(i + np.mean(np.arange(FEAT) / FEAT)) - i
                     for i in range(GLOBAL_BATCH)], np.float32)
got = np.asarray(jax.device_get(mean))
np.testing.assert_allclose(got, expect.mean(), rtol=1e-6)
print(f"proc {pid}/{nproc}: devices={len(jax.devices())} "
      f"local_batch={local['x'].shape} global={global_batch['x'].shape} "
      f"mean={float(got):.6f} OK", flush=True)
