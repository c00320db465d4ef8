"""Script self-archival (ref: avs_s4/train_v2.py:102-114 copies the running
scripts into the log dir for reproducibility)."""

import os

from avmoe_tpu.utils.runtime import archive_sources


def test_archive_sources_snapshots_package(tmp_path):
    n = archive_sources(str(tmp_path))
    assert n > 50  # the whole avmoe_tpu package
    # spot-check: the AVS driver that calls this is itself archived
    assert os.path.exists(tmp_path / "sources" / "cli" / "train_avs.py")
    assert os.path.exists(tmp_path / "sources" / "utils" / "runtime.py")
