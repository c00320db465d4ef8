"""Fused Swin block-chain megakernel.

The AVE forward is HBM-bandwidth-bound: XLA materializes ~10 stream-sized
intermediates per transformer block (qkv, attention logits, softmax, PV,
proj, MLP hidden, norms, residuals). This kernel runs K consecutive Swin
blocks (or one attention / MLP sub-block at MoE adapter seams) entirely in
VMEM: per grid step it reads one frame-chunk of the residual stream plus the
(resident) chain weights, and writes the chunk back once. HBM traffic per
chain drops from ~10x to ~2x the stream size.

Covers both block flavors used by the framework:
  * v1 (HTS-AT, ref AVMOE/AVE/nets/htsat.py:129-257): pre-norm,
    pre-softmax scaling, learned relative-position-bias (precomputed to a
    (H, N, N) table by the caller).
  * v2 (timm swinv2, ref net_trans_v3.py:688-726): post-norm, cosine
    attention with per-head logit scale, CPB bias (precomputed by caller).

Shifted windows are handled in-kernel with jnp.roll on the VMEM-resident
chunk; the additive shift mask rides in as a (nW, N, N) operand.

Inference-path only (dropout/drop-path fall back to the XLA path); training
integration goes through a custom VJP wrapper (see fused_block_vjp).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class ChainGeom:
    """Static geometry of a fused chain of K same-stage Swin blocks."""

    version: str                  # 'v1' | 'v2'
    H: int                        # token grid height
    W: int                        # token grid width
    C: int                        # channels
    num_heads: int
    window: int                   # effective window (after auto-shrink)
    shifts: Tuple[int, ...]       # per-block shift (len K)
    mlp_hidden: int
    part: str = "full"            # 'full' | 'attn' | 'mlp'
    frame_block: int = 8          # frames per grid step

    @property
    def K(self) -> int:
        return len(self.shifts)

    @property
    def N(self) -> int:
        return self.window * self.window

    @property
    def nW(self) -> int:
        return (self.H // self.window) * (self.W // self.window)


def _layer_norm(x, scale, bias, eps=1e-5):
    """f32-stat LayerNorm applied in x.dtype (matches avmoe_tpu.ops.norm)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
                      - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    return y * scale.astype(x.dtype) + bias.astype(x.dtype)


def _attention(g: ChainGeom, xw, qkv_k, qkv_b, logit_scale, bias, mask, shift):
    """Window attention over partitioned tokens xw: (F*nW, N, C) -> same.

    bias: (nH, N, N) f32; mask: (nW, N, N) f32 or None; logit_scale: (nH,)
    (v2) or scalar python float (v1 scale folded by caller into q).
    """
    G, N, C = xw.shape
    nH = g.num_heads
    D = C // nH
    dt = xw.dtype

    qkv = jax.lax.dot_general(
        xw, qkv_k.astype(dt),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + qkv_b.astype(jnp.float32)                     # (G, N, 3C) f32
    qkv = qkv.reshape(G, N, 3, nH, D)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)            # (G, nH, N, D) f32
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3).astype(dt)

    if g.version == "v2":
        def _rown(t):
            ss = jnp.sum(jnp.square(t), axis=-1, keepdims=True)
            return t * (1.0 / jnp.maximum(jnp.sqrt(ss), 1e-12))
        q = _rown(q)
        k = _rown(k)
        q = q * logit_scale.astype(jnp.float32)[None, :, None, None]
    else:
        q = q * (D ** -0.5)

    logits = jax.lax.dot_general(
        q.astype(dt), k.astype(dt),
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )                                                  # (G, nH, N, N) f32
    logits = logits + bias[None]
    if mask is not None:
        F = G // g.nW
        logits = logits.reshape(F, g.nW, nH, N, N) + mask[None, :, None]
        logits = logits.reshape(G, nH, N, N)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
    out = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )                                                  # (G, nH, N, D)
    return out.transpose(0, 2, 1, 3).reshape(G, N, C).astype(dt)


def _partition(g: ChainGeom, x, shift):
    """(F, H, W, C) -> (F*nW, N, C), rolling by -shift first."""
    F = x.shape[0]
    w = g.window
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    x = x.reshape(F, g.H // w, w, g.W // w, w, g.C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(F * g.nW, w * w, g.C)


def _reverse(g: ChainGeom, xw, shift, F):
    """(F*nW, N, C) -> (F, H, W, C), unrolling by +shift after."""
    w = g.window
    x = xw.reshape(F, g.H // w, g.W // w, w, w, g.C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(F, g.H, g.W, g.C)
    if shift:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    return x


def _attn_sub(g, k_idx, x, refs, train_shift):
    """Attention sub-block residual for block k on (F,H,W,C) x."""
    (n1s, n1b, qkvk, qkvb, lsc, proj_k, proj_b, n2s, n2b,
     fc1k, fc1b, fc2k, fc2b, bias, mask) = refs
    F = x.shape[0]
    shift = g.shifts[k_idx]
    msk = mask[k_idx] if shift else None
    if g.version == "v1":
        h = _layer_norm(x, n1s[k_idx], n1b[k_idx])
        hw = _partition(g, h, shift)
        aw = _attention(g, hw, qkvk[k_idx], qkvb[k_idx], None,
                        bias[k_idx], msk, shift)
        a = _reverse(g, aw, shift, F)
        a = jax.lax.dot_general(
            a, proj_k[k_idx].astype(a.dtype),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(a.dtype) + proj_b[k_idx].astype(a.dtype)
        return a
    # v2 post-norm: attn on raw x, proj, then norm1
    hw = _partition(g, x, shift)
    aw = _attention(g, hw, qkvk[k_idx], qkvb[k_idx], lsc[k_idx],
                    bias[k_idx], msk, shift)
    a = _reverse(g, aw, shift, F)
    a = jax.lax.dot_general(
        a, proj_k[k_idx].astype(a.dtype),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(a.dtype) + proj_b[k_idx].astype(a.dtype)
    return _layer_norm(a, n1s[k_idx], n1b[k_idx])


def _mlp_sub(g, k_idx, x, refs):
    (n1s, n1b, qkvk, qkvb, lsc, proj_k, proj_b, n2s, n2b,
     fc1k, fc1b, fc2k, fc2b, bias, mask) = refs
    dt = x.dtype
    if g.version == "v1":
        h = _layer_norm(x, n2s[k_idx], n2b[k_idx])
    else:
        h = x
    h = jax.lax.dot_general(
        h, fc1k[k_idx].astype(dt),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + fc1b[k_idx].astype(dt)
    h = jax.nn.gelu(h, approximate=False)
    h = jax.lax.dot_general(
        h, fc2k[k_idx].astype(dt),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + fc2b[k_idx].astype(dt)
    if g.version == "v2":
        h = _layer_norm(h, n2s[k_idx], n2b[k_idx])
    return h


def _chain_kernel(g: ChainGeom,
                  x_ref, n1s, n1b, qkvk, qkvb, lsc, proj_k, proj_b,
                  n2s, n2b, fc1k, fc1b, fc2k, fc2b, bias, mask, o_ref):
    refs = (n1s[:], n1b[:], qkvk[:], qkvb[:], lsc[:], proj_k[:], proj_b[:],
            n2s[:], n2b[:], fc1k[:], fc1b[:], fc2k[:], fc2b[:],
            bias[:], mask[:])
    x = x_ref[:]                                  # (F, H, W, C)
    for k in range(g.K):
        if g.part in ("full", "attn"):
            x = x + _attn_sub(g, k, x, refs, None)
        if g.part in ("full", "mlp"):
            x = x + _mlp_sub(g, k, x, refs)
    o_ref[:] = x


def fused_block_chain(
    x: jax.Array,                 # (B, N_tokens, C)
    params: dict,                 # stacked chain params, see below
    geom: ChainGeom,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Run K fused Swin blocks over x.

    params (all leading dim K):
      norm1_scale/bias (K,C), qkv_kernel (K,C,3C), qkv_bias (K,3C),
      logit_scale (K,nH) [v2; pass zeros for v1], proj_kernel (K,C,C),
      proj_bias (K,C), norm2_scale/bias (K,C), fc1_kernel (K,C,Hid),
      fc1_bias (K,Hid), fc2_kernel (K,Hid,C), fc2_bias (K,C),
      bias_table (K,nH,N,N) f32, mask (K,nW,N,N) f32 (zeros when unshifted).
    """
    B, NT, C = x.shape
    g = geom
    assert NT == g.H * g.W and C == g.C, (x.shape, g)
    FB = min(g.frame_block, B)
    while B % FB:
        FB -= 1
    grid = (B // FB,)

    x4 = x.reshape(B, g.H, g.W, C)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    order = ["norm1_scale", "norm1_bias", "qkv_kernel", "qkv_bias",
             "logit_scale", "proj_kernel", "proj_bias",
             "norm2_scale", "norm2_bias", "fc1_kernel", "fc1_bias",
             "fc2_kernel", "fc2_bias", "bias_table", "mask"]
    ops = [params[k] for k in order]
    in_specs = [pl.BlockSpec((FB, g.H, g.W, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [const_spec(a) for a in ops]
    out_spec = pl.BlockSpec((FB, g.H, g.W, C), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    bytes_w = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in ops)
    flops = 2 * B * NT * (3 * C * C + C * C + 2 * C * g.mlp_hidden) * g.K \
        + 4 * B * g.nW * g.num_heads * g.N * g.N * (C // g.num_heads) * g.K

    out = pl.pallas_call(
        functools.partial(_chain_kernel, g),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, g.H, g.W, C), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * x4.size * x4.dtype.itemsize + bytes_w,
            transcendentals=B * NT * (g.N + g.mlp_hidden) * g.K,
        ),
    )(x4, *ops)
    return out.reshape(B, NT, C)


def use_fused_blocks() -> bool:
    """Fused block-chain toggle (env AVMOE_FUSED_BLOCKS=1)."""
    import os

    return os.environ.get("AVMOE_FUSED_BLOCKS", "0") == "1"


# ---------------------------------------------------------------------------
# Flax integration: stack bound SwinBlock params into chain operands
# ---------------------------------------------------------------------------


def _cpb_bias(attn_params, window: Tuple[int, int], pretrained: Tuple[int, int],
              num_heads: int):
    """Recompute the V2 continuous-position bias table -> (nH, N, N) f32."""
    from avmoe_tpu.ops.swin import log_cpb_coords_table, relative_position_index

    coords = jnp.asarray(log_cpb_coords_table(*window, *pretrained))
    h = coords @ attn_params["cpb_fc1"]["kernel"] + attn_params["cpb_fc1"]["bias"]
    h = jax.nn.relu(h)
    t = h @ attn_params["cpb_fc2"]["kernel"]                     # (T, nH)
    idx = relative_position_index(*window)
    N = window[0] * window[1]
    bias = t[jnp.asarray(idx.reshape(-1))].reshape(N, N, num_heads)
    return (16.0 * jax.nn.sigmoid(bias)).transpose(2, 0, 1).astype(jnp.float32)


def _v1_bias(attn_params, window: Tuple[int, int], num_heads: int):
    from avmoe_tpu.ops.swin import relative_position_index

    table = attn_params["relative_position_bias_table"]          # (T, nH)
    idx = relative_position_index(*window)
    N = window[0] * window[1]
    bias = table[jnp.asarray(idx.reshape(-1))].reshape(N, N, num_heads)
    return bias.transpose(2, 0, 1).astype(jnp.float32)


def stack_chain(blocks, part: str = "full", frame_block: int = 0):
    """Stack the params of a list of bound same-stage SwinBlocks into the
    fused-chain operand dict + geometry. Weights are cast to the blocks'
    compute dtype; biases/masks stay f32."""
    from avmoe_tpu.ops.swin import shifted_window_mask

    b0 = blocks[0]
    window, _ = b0._geometry()
    H, W = b0.input_resolution
    geom = ChainGeom(
        version=b0.version, H=H, W=W, C=b0.dim, num_heads=b0.num_heads,
        window=window,
        shifts=tuple(b._geometry()[1] for b in blocks),
        mlp_hidden=int(b0.dim * b0.mlp_ratio),
        part=part,
        frame_block=frame_block or _default_frame_block(H, W, b0.dim),
    )
    dt = b0.dtype
    N = geom.N
    nW = geom.nW
    nH = geom.num_heads

    p_stk = {k: [] for k in [
        "norm1_scale", "norm1_bias", "qkv_kernel", "qkv_bias", "logit_scale",
        "proj_kernel", "proj_bias", "norm2_scale", "norm2_bias",
        "fc1_kernel", "fc1_bias", "fc2_kernel", "fc2_bias",
        "bias_table", "mask"]}
    for b in blocks:
        p = b.variables["params"]
        a = p["attn"]
        p_stk["norm1_scale"].append(p["norm1"]["scale"])
        p_stk["norm1_bias"].append(p["norm1"]["bias"])
        p_stk["norm2_scale"].append(p["norm2"]["scale"])
        p_stk["norm2_bias"].append(p["norm2"]["bias"])
        if b.version == "v2":
            p_stk["qkv_kernel"].append(a["qkv_kernel"])
            qb = a["q_bias"]
            p_stk["qkv_bias"].append(
                jnp.concatenate([qb, jnp.zeros_like(qb), a["v_bias"]]))
            p_stk["logit_scale"].append(
                jnp.exp(jnp.minimum(a["logit_scale"][:, 0, 0],
                                    float(np.log(100.0)))))
            p_stk["bias_table"].append(
                _cpb_bias(a, (window, window),
                          (b.pretrained_window, b.pretrained_window), nH))
        else:
            p_stk["qkv_kernel"].append(a["qkv"]["kernel"])
            p_stk["qkv_bias"].append(
                a["qkv"].get("bias", jnp.zeros((3 * b.dim,))))
            p_stk["logit_scale"].append(jnp.zeros((nH,)))
            p_stk["bias_table"].append(_v1_bias(a, (window, window), nH))
        p_stk["proj_kernel"].append(a["proj"]["kernel"])
        p_stk["proj_bias"].append(a["proj"]["bias"])
        p_stk["fc1_kernel"].append(p["mlp"]["fc1"]["kernel"])
        p_stk["fc1_bias"].append(p["mlp"]["fc1"]["bias"])
        p_stk["fc2_kernel"].append(p["mlp"]["fc2"]["kernel"])
        p_stk["fc2_bias"].append(p["mlp"]["fc2"]["bias"])
        _, shift = b._geometry()
        m = shifted_window_mask(H, W, window, shift)
        p_stk["mask"].append(
            jnp.zeros((nW, N, N), jnp.float32) if m is None else jnp.asarray(m))

    out = {}
    for k, v in p_stk.items():
        arr = jnp.stack(v)
        if k in ("bias_table", "mask"):
            out[k] = arr.astype(jnp.float32)
        elif k == "logit_scale":
            out[k] = arr.astype(jnp.float32)
        else:
            out[k] = arr.astype(dt)
    return out, geom


def _default_frame_block(H: int, W: int, C: int) -> int:
    """Pick frames/grid-step so one bf16 chunk is ~2-4 MB."""
    frame_bytes = H * W * C * 2
    return max(1, int(4 * 1024 * 1024 // frame_bytes))


def run_chain(blocks, x: jax.Array, part: str = "full",
              interpret: Optional[bool] = None) -> jax.Array:
    """Convenience: stack + run a fused chain on (B, N, C) tokens.

    interpret=None auto-selects interpreter mode off-TPU so the same code
    path runs in CPU tests."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    params, geom = stack_chain(blocks, part=part)
    return fused_block_chain(x, params, geom, interpret=interpret)
