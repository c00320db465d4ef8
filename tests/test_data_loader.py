"""BatchLoader + synthetic dataset behavior."""

import numpy as np
import pytest

from avmoe_tpu.data.ave import SyntheticAVEDataset
from avmoe_tpu.data.loader import BatchLoader


def test_batch_shapes_and_count():
    ds = SyntheticAVEDataset(length=10, num_segments=2, audio_len=100,
                             img_size=8, num_classes=4)
    loader = BatchLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    b = batches[0]
    assert b["wave"].shape == (4, 2, 100)
    assert b["images"].shape == (4, 8, 8, 3) or b["images"].shape == (4, 2, 8, 8, 3)
    assert b["labels"].shape == (4, 2, 5)


def test_shuffle_changes_order_and_is_seeded():
    ds = SyntheticAVEDataset(length=16, num_segments=1, audio_len=10,
                             img_size=4, num_classes=3)
    l1 = BatchLoader(ds, 4, shuffle=True, seed=7, num_workers=1)
    l2 = BatchLoader(ds, 4, shuffle=True, seed=7, num_workers=1)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    # same seed but different epoch counters start at 1 for both -> equal
    np.testing.assert_array_equal(b1["labels"], b2["labels"])


def test_worker_exception_propagates():
    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    loader = BatchLoader(Bad(), 2, num_workers=1)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_determinism_per_index():
    ds = SyntheticAVEDataset(length=4, num_segments=1, audio_len=10,
                             img_size=4, num_classes=3)
    a, b = ds[2], ds[2]
    np.testing.assert_array_equal(a["wave"], b["wave"])


# ------------------------------------------------- multi-host batch slicing


class _IndexDataset:
    """Items carry their index so slices are checkable."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.full((3,), i, np.int64)}


def test_multihost_slices_partition_each_batch():
    """Every host collates a disjoint contiguous 1/process_count slice of the
    SAME seeded global batch (loader.py process_index/count; ref baseline:
    single-node DataParallel split, AVVP/main.py:420-421)."""
    n, global_bs, hosts = 16, 8, 4
    per_host = []
    for pi in range(hosts):
        loader = BatchLoader(_IndexDataset(n), global_bs, shuffle=True, seed=7,
                             num_workers=1, process_index=pi,
                             process_count=hosts)
        per_host.append([b["idx"][:, 0] for b in loader])
    nb = n // global_bs
    local = global_bs // hosts
    for bi in range(nb):
        combined = np.concatenate([per_host[pi][bi] for pi in range(hosts)])
        assert combined.shape == (global_bs,)
        # disjoint cover: the union across hosts is exactly one global batch
        assert len(set(combined.tolist())) == global_bs
        for pi in range(hosts):
            assert per_host[pi][bi].shape == (local,)
    # all hosts see the same number of batches
    assert {len(p) for p in per_host} == {nb}


def test_multihost_requires_drop_last():
    with pytest.raises(AssertionError, match="drop_last"):
        BatchLoader(_IndexDataset(8), 4, drop_last=False,
                    process_index=0, process_count=2)


def test_multihost_global_batch_must_divide():
    with pytest.raises(AssertionError):
        BatchLoader(_IndexDataset(8), 6, process_index=0, process_count=4)


def test_shard_batch_per_host_single_process_degenerates():
    """On a 1-process (CPU test) runtime shard_batch_per_host == shard_batch:
    the global dp-sharded array equals the input batch."""
    import jax

    from avmoe_tpu.parallel.mesh import make_mesh, shard_batch_per_host

    mesh = make_mesh(model=1)
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    out = shard_batch_per_host(batch, mesh)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    assert out["x"].sharding.spec == jax.sharding.PartitionSpec("data")
