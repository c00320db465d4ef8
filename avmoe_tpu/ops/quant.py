"""int8 residual-stream storage for the eval fast path (AVMOE_INT8_STREAM=1).

The AVE eval forward is HBM-bandwidth-bound (BASELINE.md: 8.0 GB/clip at bf16
-> ~102 clips/s cap on a 819 GB/s v5e); every further throughput win must
remove bytes, not math. This module stores the inter-sub-block residual
streams as int8 values with per-token fp32 scales, halving the stream bytes
while ALL compute stays bf16:

  * chunk bodies (chunked_attn_residual) dequantize/requantize on
    VMEM-resident data - the lax.map operand/output simply become int8;
  * elementwise/reduce consumers (LayerNorm stats, residual adds) fuse the
    dequant into the fusion that already read the stream;
  * channel-contraction consumers (the MoE adapter trunk GEMMs, latent-token
    attention logits) commute the per-token scale out of the contraction, so
    the int8 tensor feeds the dot and the scale applies to the rank-reduced
    output.

Per-token (not per-tensor) scales bound the quantization error at 0.5/127 of
each token's max-abs channel; accuracy impact is measured in
tests/test_int8_stream.py and tools/int8_accuracy.py (go/no-go artifact).

This replaces the byte role that fp16/AMP would play in the reference's
torch stack (the reference's GradScaler is dead code; ref:
AVMOE/AVE/main_trans_v3.py). Eval-only: training keeps bf16 streams.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Union

import jax
import jax.numpy as jnp


class QStream(NamedTuple):
    """A quantized residual stream: int8 values + per-token fp32 scales.

    Registered as a pytree (NamedTuple), so it threads through lax.map /
    module calls unchanged. `shape`/`ndim` mirror the logical bf16 tensor so
    shape-only consumers (kernel_only projections, geometry math) work
    without dequantizing.
    """

    q: jax.Array  # int8  (..., C)
    s: jax.Array  # fp32  (..., 1)

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim


StreamLike = Union[jax.Array, QStream]


def use_int8_stream() -> bool:
    """int8 stream storage toggle (env AVMOE_INT8_STREAM, default off)."""
    return os.environ.get("AVMOE_INT8_STREAM", "0") == "1"


def quantize_stream(x: StreamLike) -> QStream:
    """Per-token symmetric int8 quantization over the channel axis.

    s = max|x| / 127 per token, q = round(x / s); |q| <= 127 by construction
    so no clip is needed. The round/scale ops fuse into the producer's
    epilogue - the materialized HBM tensor is the int8 q + tiny scales.
    """
    if isinstance(x, QStream):
        return x
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.round(xf / s).astype(jnp.int8)
    return QStream(q, s)


def dequantize(x: StreamLike, dtype=jnp.bfloat16) -> jax.Array:
    """QStream -> dense tensor in `dtype`; passthrough for plain arrays.

    int8 values are exactly representable in bf16, so the multiply in
    `dtype` loses only the scale's bf16 rounding (~0.2%), below the int8
    quantization noise itself. Consumers that fuse (reduces, adds, chunk
    bodies) never materialize the result; dot-operand consumers should use
    scale commuting instead (see module docstring).
    """
    if not isinstance(x, QStream):
        return x if x.dtype == dtype else x.astype(dtype)
    return x.q.astype(dtype) * x.s.astype(dtype)


def add_to_stream(x: StreamLike, res: jax.Array) -> StreamLike:
    """State update `x + res`, preserving x's representation.

    For a QStream the dequant + add + requantize all fuse into the residual
    producer's epilogue: the only stream-sized HBM traffic is the int8 read
    of x and the int8 write of the result.
    """
    if not isinstance(x, QStream):
        return x + res
    return quantize_stream(dequantize(x, res.dtype) + res)
