"""Fused Swin block megakernel on pre-windowed tokens.

The AVE forward is HBM-bandwidth-bound: XLA materializes ~10 stream-sized
intermediates per transformer block (qkv, attention logits, softmax, PV,
proj, MLP hidden, norms, residuals). This kernel runs one or more consecutive
Swin blocks entirely in VMEM: per grid step it reads one block of windows of
the residual stream plus the (resident) chain weights, and writes the block
back once.

Layout strategy (what TPU Mosaic can actually lower):
  * Window partition/reverse/roll stay OUTSIDE the kernel as XLA ops — they
    are pure layout permutations XLA fuses into a single gather copy. The
    kernel consumes pre-windowed tokens (G, N, C). In-kernel spatial
    reshapes (48 -> 4x12 splits) are NOT tile-aligned (window 12 vs the
    8-sublane tile) and Mosaic rejects them ("unsupported shape cast").
  * Inside the kernel every reshape is tile-safe: (GB, N, C) <-> (GB*N, C)
    merges with N a multiple of 8, and leading-dim splits for the shift
    mask. Heads are processed with an unrolled per-head loop over lane-dim
    slices; the output projection is accumulated per head from pre-split
    (nH, D, C) weights, so no transpose / head reshape ever materializes.
  * Consecutive blocks with identical (window, shift) chain inside ONE
    kernel call with zero HBM round-trips between them. Swin-V2-L stage 3
    (12x12 grid, window 12 => shift forced 0, 18 blocks) chains subject to
    a VMEM weight budget.

Covers both block flavors used by the framework:
  * v1 (HTS-AT, ref AVMOE/AVE/nets/htsat.py:129-257): pre-norm,
    pre-softmax scaling, learned relative-position-bias (precomputed to a
    (nH, N, N) table by the caller).
  * v2 (timm swinv2, ref net_trans_v3.py:688-726): post-norm, cosine
    attention with per-head logit scale, CPB bias (precomputed by caller).

Inference-path only (dropout/drop-path fall back to the XLA path).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget per kernel call (bytes). v5e has 128 MB of VMEM;
# leave headroom for Mosaic's tile padding and double-buffered stream blocks.
VMEM_BUDGET = int(os.environ.get("AVMOE_FUSED_VMEM_MB", "80")) * 1024 * 1024


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


def _erf(x):
    """Abramowitz & Stegun 7.1.26 erf (|err| <= 1.5e-7): Mosaic has no
    erf/erfc primitive, and 1.5e-7 is far below bf16 resolution."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf(xf * 0.7071067811865476))).astype(x.dtype)


def _matmul(x2d, w, bias=None):
    """(R, Cin) @ (Cin, Cout) with f32 accumulate; returns f32."""
    out = jax.lax.dot_general(
        x2d, w.astype(x2d.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def _attn_sub(g: ChainGeom, k_idx: int, x, refs):
    """Attention sub-block output (pre-residual) for block k on windowed
    tokens x: (GB, N, C)."""
    (n1s, n1b, qkvk, qkvb, lsc, projk, projb, n2s, n2b,
     fc1k, fc1b, fc2k, fc2b, bias, mask) = refs
    GB, N, C = x.shape
    nH = g.num_heads
    D = C // nH
    dt = x.dtype

    h = _layer_norm(x, n1s[k_idx], n1b[k_idx]) if g.version == "v1" else x
    qkv = _matmul(h.reshape(GB * N, C), qkvk[k_idx], qkvb[k_idx])
    qkv = qkv.reshape(GB, N, 3 * C)                   # f32

    shifted = g.shifts[k_idx] > 0
    acc = jnp.zeros((GB * N, C), jnp.float32)
    for hh in range(nH):
        q = qkv[:, :, hh * D:(hh + 1) * D]
        k = qkv[:, :, C + hh * D:C + (hh + 1) * D]
        v = qkv[:, :, 2 * C + hh * D:2 * C + (hh + 1) * D].astype(dt)
        if g.version == "v2":
            def _rown(t):
                ss = jnp.sum(jnp.square(t), axis=-1, keepdims=True)
                return t * jax.lax.rsqrt(jnp.maximum(ss, 1e-24))
            # lsc is (K, nH, 1, 1): slicing yields a (1, 1) array that
            # broadcasts over (GB, N, D) — avoids a scalar vector-extract
            q = _rown(q) * lsc[k_idx, hh]
            k = _rown(k)
        else:
            q = q * (D ** -0.5)
        logits = jax.lax.dot_general(
            q.astype(dt), k.astype(dt),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (GB, N, N) f32
        logits = logits + bias[k_idx, hh]
        if shifted:
            F = GB // g.nW
            lm = logits.reshape(F, g.nW, N, N) + mask[:][None]
            logits = lm.reshape(GB, N, N)
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
        pv = jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (GB, N, D)
        acc = acc + jax.lax.dot_general(
            pv.reshape(GB * N, D).astype(dt), projk[k_idx, hh].astype(dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    a = (acc + projb[k_idx].astype(jnp.float32)).astype(dt).reshape(GB, N, C)
    if g.version == "v2":
        a = _layer_norm(a, n1s[k_idx], n1b[k_idx])
    return a


def _mlp_sub(g: ChainGeom, k_idx: int, x, refs):
    """MLP sub-block output (pre-residual); x: (GB, N, C) or (RB, 1, C)."""
    (n1s, n1b, qkvk, qkvb, lsc, projk, projb, n2s, n2b,
     fc1k, fc1b, fc2k, fc2b, bias, mask) = refs
    GB, N, C = x.shape
    dt = x.dtype
    h = _layer_norm(x, n2s[k_idx], n2b[k_idx]) if g.version == "v1" else x
    h = _matmul(h.reshape(GB * N, C), fc1k[k_idx], fc1b[k_idx]).astype(dt)
    h = _gelu_exact(h)
    h = _matmul(h, fc2k[k_idx], fc2b[k_idx]).astype(dt).reshape(GB, N, C)
    if g.version == "v2":
        h = _layer_norm(h, n2s[k_idx], n2b[k_idx])
    return h


def _chain_kernel(g: ChainGeom,
                  x_ref, n1s, n1b, qkvk, qkvb, lsc, projk, projb,
                  n2s, n2b, fc1k, fc1b, fc2k, fc2b, bias, mask, o_ref):
    refs = (n1s[:], n1b[:], qkvk[:], qkvb[:], lsc[:], projk[:], projb[:],
            n2s[:], n2b[:], fc1k[:], fc1b[:], fc2k[:], fc2b[:],
            bias[:], mask)
    x = x_ref[:]                                  # (GB, N, C)
    for k in range(g.K):
        if g.part in ("full", "attn"):
            x = x + _attn_sub(g, k, x, refs)
        if g.part in ("full", "mlp"):
            x = x + _mlp_sub(g, k, x, refs)
    o_ref[:] = x


def _compiler_params():
    """Raise the scoped-VMEM ceiling: the chain kernel's in-register working
    set (f32 qkv + head accumulator + MLP hidden) exceeds the 16 MB default."""
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)


def _pick_win_block(g: ChainGeom, G: int, dt_size: int) -> int:
    """Windows per grid step: a multiple of nW (so the shift mask tiles),
    sized so the in-kernel qkv f32 scratch stays ~<=12 MB."""
    per_win = g.N * 3 * g.C * 4                   # qkv f32 bytes / window
    target = 12 * 1024 * 1024
    f_max = max(1, target // max(per_win * g.nW, 1))
    F = G // g.nW
    f = 1
    for cand in range(1, F + 1):
        if F % cand == 0 and cand <= f_max:
            f = cand
    return g.nW * f


def _vmem_estimate(g: ChainGeom, params: dict, GB: int) -> int:
    w_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                  for a in params.values())
    stream = 2 * GB * g.N * g.C * 2 * 2           # x + out, double-buffered
    qkv = GB * g.N * 3 * g.C * 4
    acc = GB * g.N * g.C * 4
    hidden = GB * g.N * g.mlp_hidden * 4
    pad = 1.3                                     # lane-padding headroom
    return int((w_bytes + stream + qkv + acc + hidden) * pad)


def fused_block_chain(
    x: jax.Array,                 # (B, N_tokens, C) flat tokens
    params: dict,                 # stacked chain params, see stack_chain
    geom: ChainGeom,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Run K fused Swin blocks over flat tokens x.

    All blocks in the chain must share one (window, shift) configuration —
    `run_chain` groups arbitrary block lists into such chains. Window
    partition/reverse (+ shift roll) run as XLA layout ops around ONE
    pallas_call; the kernel loops the K blocks over VMEM-resident operands.
    """
    B, NT, C = x.shape
    g = geom
    assert NT == g.H * g.W and C == g.C, (x.shape, g)
    assert len(set(g.shifts)) == 1, "chain must share one shift"
    shift = g.shifts[0]

    if g.part == "mlp":
        # no windowing needed: process flat tokens, grid over row blocks
        return _run_mlp_only(x, params, g, interpret)

    # XLA-side (shift-)window partition: one fused gather copy
    x4 = x.reshape(B, g.H, g.W, C)
    if shift:
        x4 = jnp.roll(x4, (-shift, -shift), axis=(1, 2))
    xw = x4.reshape(B, g.H // g.window, g.window, g.W // g.window, g.window, C)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(B * g.nW, g.N, C)

    G = B * g.nW
    GB = _pick_win_block(g, G, x.dtype.itemsize)
    grid = (G // GB,)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    order = ["norm1_scale", "norm1_bias", "qkv_kernel", "qkv_bias",
             "logit_scale", "proj_kernel", "proj_bias",
             "norm2_scale", "norm2_bias", "fc1_kernel", "fc1_bias",
             "fc2_kernel", "fc2_bias", "bias_table", "mask"]
    ops = [params[k] for k in order]
    in_specs = [pl.BlockSpec((GB, g.N, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [const_spec(a) for a in ops]
    out_spec = pl.BlockSpec((GB, g.N, C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    bytes_w = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in ops)
    flops = 2 * B * NT * (3 * C * C + C * C + 2 * C * g.mlp_hidden) * g.K \
        + 4 * B * g.nW * g.num_heads * g.N * g.N * (C // g.num_heads) * g.K

    out = pl.pallas_call(
        functools.partial(_chain_kernel, g),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((G, g.N, C), x.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * x.size * x.dtype.itemsize + bytes_w,
            transcendentals=B * NT * (g.N + g.mlp_hidden) * g.K,
        ),
    )(xw, *ops)

    # XLA-side window reverse (+ unroll)
    y = out.reshape(B, g.H // g.window, g.W // g.window, g.window, g.window, C)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, g.H, g.W, C)
    if shift:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    return y.reshape(B, NT, C)


def _run_mlp_only(x, params, g: ChainGeom, interpret: bool):
    """part='mlp' seam: per-token compute on flat 2D (rows, C) blocks — no
    window layout, no in-kernel rank changes (Mosaic rejects (R,1,C)->(R,C)
    sublane-dim rewrites)."""
    B, NT, C = x.shape
    rows = B * NT
    # grid=(rows//RB,) covers every row only when rows is a multiple of the
    # row block; a remainder would leave the output tail unwritten (garbage).
    assert rows % 8 == 0, (
        f"_run_mlp_only requires B*NT ({rows}) to be a multiple of 8")
    target = max(4 * 1024 * 1024 // max(g.mlp_hidden * 4, 1), 8)
    RB = 8
    for cand in range(8, rows + 1, 8):
        if rows % cand == 0 and cand <= target:
            RB = cand
    xr = x.reshape(rows, C)

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    ops = [params[k] for k in ["norm2_scale", "norm2_bias", "fc1_kernel",
                               "fc1_bias", "fc2_kernel", "fc2_bias"]]

    def kernel(x_ref, n2s, n2b, fc1k, fc1b, fc2k, fc2b, o_ref):
        x_blk = x_ref[:]                          # (RB, C)
        dt = x_blk.dtype
        for k in range(g.K):
            h = (_layer_norm(x_blk, n2s[k], n2b[k])
                 if g.version == "v1" else x_blk)
            h = _matmul(h, fc1k[k], fc1b[k]).astype(dt)
            h = _gelu_exact(h)
            h = _matmul(h, fc2k[k], fc2b[k]).astype(dt)
            if g.version == "v2":
                h = _layer_norm(h, n2s[k], n2b[k])
            x_blk = x_blk + h
        o_ref[:] = x_blk

    out = pl.pallas_call(
        kernel,
        grid=(rows // RB,),
        in_specs=[pl.BlockSpec((RB, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [const_spec(a) for a in ops],
        out_specs=pl.BlockSpec((RB, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(xr, *ops)
    return out.reshape(B, NT, C)


def use_fused_blocks() -> bool:
    """Fused block-chain toggle (env AVMOE_FUSED_BLOCKS=1)."""
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


def stack_chain(blocks, part: str = "full"):
    """Stack the params of a list of bound same-(window, shift) SwinBlocks
    into the fused-chain operand dict + geometry. Weights are cast to the
    blocks' compute dtype; biases/masks stay f32. The output projection is
    pre-split per head to (K, nH, D, C) so the kernel can accumulate heads
    without transposes."""
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
    )
    dt = b0.dtype
    N = geom.N
    nW = geom.nW
    nH = geom.num_heads
    D = geom.C // nH

    p_stk = {k: [] for k in [
        "norm1_scale", "norm1_bias", "qkv_kernel", "qkv_bias", "logit_scale",
        "proj_kernel", "proj_bias", "norm2_scale", "norm2_bias",
        "fc1_kernel", "fc1_bias", "fc2_kernel", "fc2_bias",
        "bias_table"]}
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
                                    float(np.log(100.0)))).reshape(nH, 1, 1))
            p_stk["bias_table"].append(
                _cpb_bias(a, (window, window),
                          (b.pretrained_window, b.pretrained_window), nH))
        else:
            p_stk["qkv_kernel"].append(a["qkv"]["kernel"])
            p_stk["qkv_bias"].append(
                a["qkv"].get("bias", jnp.zeros((3 * b.dim,))))
            p_stk["logit_scale"].append(jnp.zeros((nH, 1, 1)))
            p_stk["bias_table"].append(_v1_bias(a, (window, window), nH))
        p_stk["proj_kernel"].append(a["proj"]["kernel"].reshape(nH, D, b.dim))
        p_stk["proj_bias"].append(a["proj"]["bias"])
        p_stk["fc1_kernel"].append(p["mlp"]["fc1"]["kernel"])
        p_stk["fc1_bias"].append(p["mlp"]["fc1"]["bias"])
        p_stk["fc2_kernel"].append(p["mlp"]["fc2"]["kernel"])
        p_stk["fc2_bias"].append(p["mlp"]["fc2"]["bias"])

    out = {}
    for k, v in p_stk.items():
        arr = jnp.stack(v)
        if k in ("bias_table", "logit_scale"):
            out[k] = arr.astype(jnp.float32)
        else:
            out[k] = arr.astype(dt)

    shift = geom.shifts[0]
    m = shifted_window_mask(H, W, window, shift) if shift else None
    out["mask"] = (jnp.zeros((nW, N, N), jnp.float32) if m is None
                   else jnp.asarray(m, jnp.float32))
    return out, geom


def run_chain(blocks, x: jax.Array, part: str = "full",
              interpret: Optional[bool] = None) -> jax.Array:
    """Run a list of bound SwinBlocks over flat tokens (B, NT, C) through
    fused chain kernels. Consecutive blocks sharing one (window, shift)
    config chain inside a single kernel call, subject to the VMEM budget;
    oversized blocks fall back to the module's own XLA path.

    interpret=None auto-selects interpreter mode off-TPU so the same code
    path runs in CPU tests."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    for grp in _chain_groups(blocks):
        params, geom = stack_chain(grp, part=part)
        GB = _pick_win_block(geom, x.shape[0] * geom.nW, x.dtype.itemsize)
        if not interpret and _vmem_estimate(geom, params, GB) > VMEM_BUDGET:
            for b in grp:                         # XLA fallback (stage 4)
                if part == "full":
                    x = b(x, False)
                elif part == "attn":
                    x = x + b.attn_residual(x, False)
                else:
                    x = x + b.mlp_residual(x, False)
            continue
        x = fused_block_chain(x, params, geom, interpret=interpret)
    return x


def _chain_groups(blocks) -> List[list]:
    """Split a block list into maximal same-(window, shift) runs that fit
    the VMEM weight budget."""
    groups: List[list] = []
    for b in blocks:
        win, shift = b._geometry()
        if groups and _group_key(groups[-1][0]) == (win, shift):
            cand = groups[-1] + [b]
            if _weights_bytes(cand) <= VMEM_BUDGET // 2:
                groups[-1] = cand
                continue
        groups.append([b])
    return groups


def _group_key(b):
    return b._geometry()


def _weights_bytes(blocks) -> int:
    b0 = blocks[0]
    C = b0.dim
    hid = int(C * b0.mlp_ratio)
    window, _ = b0._geometry()
    N = window * window
    per = (3 * C * C + C * C + 2 * C * hid) * 2 \
        + b0.num_heads * N * N * 4
    return per * len(blocks)
