"""CLI perf-default plumbing (utils.runtime.apply_perf_defaults/_precise_mode).

The training CLIs default the measured-best perf toggles (PERF_DEFAULTS,
same values bench.py sets) so user-surface throughput matches the benchmark;
--precise turns off only the numerics-adjacent approximations (bf16 logits,
tanh GELU) while keeping bit-exact algebra/scheduling toggles on.
"""

import os

import pytest

from avmoe_tpu.utils.runtime import (
    PERF_DEFAULTS,
    apply_perf_defaults,
    apply_precise_mode,
)

_KEYS = sorted(set(PERF_DEFAULTS) | {"AVMOE_BF16_LOGITS", "AVMOE_FAST_GELU"})


@pytest.fixture
def clean_env():
    saved = {k: os.environ.get(k) for k in _KEYS}
    for k in _KEYS:
        os.environ.pop(k, None)
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def test_defaults_applied(clean_env):
    apply_perf_defaults()
    for k, v in PERF_DEFAULTS.items():
        assert os.environ[k] == v


def test_exported_env_wins(clean_env):
    os.environ["AVMOE_BF16_LOGITS"] = "0"
    apply_perf_defaults()
    assert os.environ["AVMOE_BF16_LOGITS"] == "0"
    assert os.environ["AVMOE_FUSED_MOE"] == "1"


def test_precise_mode_keeps_exact_toggles(clean_env):
    apply_perf_defaults()
    apply_precise_mode()
    assert os.environ["AVMOE_BF16_LOGITS"] == "0"
    assert os.environ["AVMOE_FAST_GELU"] == "0"
    # bit-exact algebra/scheduling toggles stay at the perf defaults
    assert os.environ["AVMOE_FUSED_MOE"] == "1"
    assert os.environ["AVMOE_FUSED_MOE_TRAIN"] == "1"
    assert os.environ["AVMOE_CHUNK_UNROLL"] == "4"


def test_cli_parsers_expose_precise():
    for mod in ("train_ave", "train_avqa", "train_avs", "train_avvp"):
        cli = __import__(f"avmoe_tpu.cli.{mod}", fromlist=["parse_args"])
        src = open(cli.__file__).read()
        assert "--precise" in src and "apply_perf_defaults()" in src, mod
