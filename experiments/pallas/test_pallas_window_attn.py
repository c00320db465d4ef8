"""Pallas fused window attention: parity vs the XLA reference path.

Runs in Pallas interpreter mode on CPU (the compiled kernel is exercised on
real TPU by the benchmark with AVMOE_PALLAS_ATTN=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl


def test_fused_window_attention_interpret():
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    import window_attn as wa

    rng = np.random.RandomState(0)
    nW, B, H, N, D = 4, 2, 2, 16, 8
    BW = nW * B
    q = rng.randn(BW, H, N, D).astype(np.float32) * 0.3
    k = rng.randn(BW, H, N, D).astype(np.float32) * 0.3
    v = rng.randn(BW, H, N, D).astype(np.float32)
    bias = rng.randn(nW, H, N, N).astype(np.float32) * 0.2

    expected = wa.reference_window_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        num_windows=nW)

    out = wa.fused_window_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        num_windows=nW, interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)
