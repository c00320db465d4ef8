"""Fused window attention as a Pallas TPU kernel.

Swin window attention materializes (B*nW, H, N, N) logits in HBM between the
QK^T matmul, the bias/mask add + softmax, and the PV matmul. Windows are small
(N = 64..144 tokens) so the whole attention for one window batch fits VMEM;
this kernel fuses QK^T -> (+bias[+mask]) -> softmax -> PV into one program,
eliminating the HBM round-trips of the N^2 intermediates.

Works for both attention flavors:
  * V1 (HTS-AT): pre-scaled q, additive relative-position bias.
  * V2 (Swin-V2): caller pre-normalizes q/k and multiplies by logit scale;
    bias = 16*sigmoid(cpb)[+shift mask], both precomputed per layer.

Grid: one program per (batch-window) x head-group. Inputs:
  q, k, v: (BW, H, N, D)
  bias:    (nW, H, N, N)  - per-window-position bias (mask folded in);
           window w of item b uses bias[bw % nW].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)      # (H, N, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)  # (H, N, N)

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, N, N)
    logits = logits + bias
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, N, D)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_windows", "interpret"))
def fused_window_attention(
    q: jax.Array,      # (BW, H, N, D) pre-scaled (v1) / pre-normalized (v2)
    k: jax.Array,      # (BW, H, N, D)
    v: jax.Array,      # (BW, H, N, D)
    bias: jax.Array,   # (nW, H, N, N) additive bias (+mask), broadcast over batch
    *,
    num_windows: int,
    interpret: bool = False,
) -> jax.Array:
    BW, H, N, D = q.shape
    nW = num_windows
    B = BW // nW
    assert bias.shape == (nW, H, N, N), (bias.shape, (nW, H, N, N))

    # 2-D grid (window, batch) with batch innermost: the bias block index is
    # constant along the inner loop, so Pallas skips its re-fetch - each
    # window's bias is DMA'd once, not once per batch item.
    grid = (nW, B)
    qkv_spec = pl.BlockSpec((1, H, N, D), lambda i, j: (j * nW + i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        qkv_spec, qkv_spec, qkv_spec,
        pl.BlockSpec((1, H, N, N), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, H, N, D), lambda i, j: (j * nW + i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((BW, H, N, D), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BW * H * N * N * D,
            bytes_accessed=4 * BW * H * N * D * 3 + 4 * nW * H * N * N,
            transcendentals=BW * H * N * N,
        ),
    )(q, k, v, bias)


def reference_window_attention(q, k, v, bias, *, num_windows):
    """XLA reference implementation (same contract) for parity tests."""
    BW = q.shape[0]
    reps = BW // num_windows
    full_bias = jnp.tile(bias, (reps, 1, 1, 1))
    logits = jnp.einsum("whnd,whmd->whnm", q.astype(jnp.float32),
                        k.astype(jnp.float32)) + full_bias
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("whnm,whmd->whnd", p, v.astype(jnp.float32)).astype(q.dtype)
