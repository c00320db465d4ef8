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
