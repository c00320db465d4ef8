"""Device mesh + sharding helpers: the framework's distributed substrate.

The reference's only parallelism is single-node nn.DataParallel
(SURVEY.md §2.7). The TPU-native replacement: a `jax.sharding.Mesh` with a
'data' axis; batches shard over it, params replicate, and XLA inserts the
ICI all-reduce for gradients automatically under jit. Expert routing stays
device-local (dense soft MoE), so no all-to-all exists anywhere.

The mesh is built with a 'model' axis too (size 1 by default) so tensor/
sequence sharding can be layered on without re-plumbing callers.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'model') mesh over available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a batch pytree with the leading axis sharded over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def shard_batch_per_host(batch: Any, mesh: Mesh) -> Any:
    """Multi-host batch assembly: each process holds only its LOCAL slice of
    the global batch (see data.loader.BatchLoader process_index/count); this
    builds the global dp-sharded jax.Array without any cross-host gather —
    every host's shard lands directly on its own devices.

    On a single-host mesh this degenerates to shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(put, batch)
