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
