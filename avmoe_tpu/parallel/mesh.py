"""Device mesh + sharding helpers: the framework's distributed substrate.

The reference's only parallelism is single-node nn.DataParallel
(SURVEY.md §2.7). The TPU-native replacement: a `jax.sharding.Mesh` with a
'data' axis; batches shard over it, params replicate, and XLA inserts the
ICI all-reduce for gradients automatically under jit. Expert routing stays
device-local (dense soft MoE), so no all-to-all exists anywhere.

The mesh is built with a 'model' axis too (size 1 by default) so tensor/
sequence sharding can be layered on without re-plumbing callers. Two uses of
that axis ship: sequence/token sharding (InjectionConfig.token_shard_axis,
constraint inside the model) and expert parallelism (`expert_sharding` below,
pure parameter placement - no model changes needed).
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


# nn.vmap-stacked expert parameter collections (moe/adapter.py MoEAdapter):
# every leaf under these module names carries a leading expert axis.
EXPERT_STACKS = ("multimodal_experts", "singlemodal_experts")


def expert_sharding(variables: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Expert-parallel (ep) placement: shard the stacked-expert parameter axis.

    The MoE fabric is a DENSE soft mixture - all E experts run on every token
    and the router's softmax weights their outputs (moe/adapter.py) - so the
    TPU-native expert parallelism is not a token all-to-all (there is no
    dispatch; that shape only exists for sparse top-k MoE) but a tensor
    decomposition over the expert axis: each device holds E/n experts' params
    (the `nn.vmap` stacks expose them as a leading axis), computes its experts'
    bottleneck trunks locally, and GSPMD inserts ONE psum over `axis` at the
    gate-weighted combine einsum. Params/batch_stats leaves outside the expert
    stacks (and stacks whose E is not divisible by the axis size, e.g. a
    single cross-modal expert) replicate.

    Pure data placement: composes with dp batch sharding and the sp token
    constraint with no model-code changes. Replaces the reference's
    single-node nn.DataParallel world, where every GPU holds every expert.
    """
    size = mesh.shape[axis]
    rep = NamedSharding(mesh, P())
    ep = NamedSharding(mesh, P(axis))

    def place(path, x):
        p = jax.tree_util.keystr(path)
        if (any(s in p for s in EXPERT_STACKS)
                and getattr(x, "ndim", 0) >= 1 and x.shape[0] % size == 0):
            return jax.device_put(x, ep)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map_with_path(place, variables)


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
