"""Swin transformer building blocks, channels-last, adapter-seam aware.

Covers both attention generations the framework needs:

  * V1 (pre-norm, learned relative-position-bias table) - the HTS-AT audio
    backbone (ref: AVMOE/AVE/nets/htsat.py:50-251).
  * V2 (post-norm, cosine attention + continuous position bias MLP) - the
    timm swinv2_large_window12_192 vision backbone the reference consumes
    piecewise (ref: net_trans_v3.py:513, 688-726).

Every block exposes `attn_residual` / `mlp_residual` seams so the MoE
injection engine can weave adapter residuals between the two sub-blocks
exactly where the reference does (net_trans_v3.py:695-720).

TPU notes: window partition/reverse are pure reshapes+transposes (free at the
XLA level); position biases are precomputed-index gathers over tiny tables;
attention is einsum -> MXU. A fused Pallas window-attention kernel can swap in
behind the same module API (retired Pallas kernels + measurements: experiments/pallas/).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import ad_checkpoint

from avmoe_tpu.utils.runtime import dropout_det

from avmoe_tpu.ops.norm import LayerNorm


# ---------------------------------------------------------------------------
# Static host-side geometry helpers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(Wh*Ww, Wh*Ww) int32 index into a (2Wh-1)(2Ww-1) bias table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))  # 2,Wh,Ww
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2,N,N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(h: int, w: int, window: int, shift: int) -> Optional[np.ndarray]:
    """(nW, N, N) additive attention mask (0 / -100) for shifted windows."""
    if shift == 0:
        return None
    img = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // window, window, w // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)  # nW, N
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def log_cpb_coords_table(wh: int, ww: int, pre_wh: int, pre_ww: int) -> np.ndarray:
    """((2Wh-1)(2Ww-1), 2) log-spaced relative coordinates for the Swin-V2
    continuous-position-bias MLP (matches timm's normalization)."""
    ch = np.arange(-(wh - 1), wh, dtype=np.float64)
    cw = np.arange(-(ww - 1), ww, dtype=np.float64)
    table = np.stack(np.meshgrid(ch, cw, indexing="ij"), axis=-1)  # 2Wh-1,2Ww-1,2
    denom_h = (pre_wh - 1) if pre_wh > 0 else (wh - 1)
    denom_w = (pre_ww - 1) if pre_ww > 0 else (ww - 1)
    table[..., 0] /= max(denom_h, 1)
    table[..., 1] /= max(denom_w, 1)
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.reshape(-1, 2).astype(np.float32)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """(B, H, W, C) -> (B * nW, window*window, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, C)


@functools.lru_cache(maxsize=None)
def _shifted_partition_perm(h: int, w: int, window: int, shift: int):
    """Token permutation equal to roll(-shift) + window_partition, and its
    inverse. One gather beats the roll's slice+concat copies + the partition
    transpose copy (measured 313 vs 571 us at the stage-1 shape)."""
    idx = np.arange(h * w).reshape(h, w)
    idx = np.roll(idx, (-shift, -shift), axis=(0, 1))
    idx = idx.reshape(h // window, window, w // window, window)
    idx = idx.transpose(0, 2, 1, 3).reshape(-1)
    inv = np.empty_like(idx)
    inv[idx] = np.arange(idx.size)
    return idx.astype(np.int32), inv.astype(np.int32)


def partition_windows(x: jax.Array, H: int, W: int, window: int,
                      shift: int) -> jax.Array:
    """(B, L, C) tokens -> (B*nW, N, C) (shift-)windowed, single gather when
    shifted."""
    B, L, C = x.shape
    if shift == 0:
        return window_partition(x.reshape(B, H, W, C), window)
    perm, _ = _shifted_partition_perm(H, W, window, shift)
    xw = jnp.take(x, jnp.asarray(perm), axis=1)
    return xw.reshape(-1, window * window, C)


def unpartition_windows(wins: jax.Array, H: int, W: int, window: int,
                        shift: int) -> jax.Array:
    """(B*nW, N, C) -> (B, L, C), inverse of partition_windows."""
    C = wins.shape[-1]
    if shift == 0:
        return window_reverse(wins, window, H, W).reshape(-1, H * W, C)
    _, inv = _shifted_partition_perm(H, W, window, shift)
    nW = (H // window) * (W // window)
    flat = wins.reshape(-1, nW * window * window, C)
    return jnp.take(flat, jnp.asarray(inv), axis=1)


def window_reverse(windows: jax.Array, window: int, h: int, w: int) -> jax.Array:
    """(B * nW, window*window, C) -> (B, H, W, C)."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((h // window) * (w // window))
    x = windows.reshape(B, h // window, w // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h, w, C)


# ---------------------------------------------------------------------------
# Common layers
# ---------------------------------------------------------------------------


def fast_gelu() -> bool:
    """tanh-approximate GELU (env AVMOE_FAST_GELU=1): cheaper VPU lowering
    than the exact-erf default. Opt-in fast-inference mode; the default stays
    exact for torch/timm parity (max |err| of the approximation ~3e-3, below
    bf16 stream noise)."""
    import os

    return os.environ.get("AVMOE_FAST_GELU", "0") == "1"


class Mlp(nn.Module):
    """Transformer MLP (fc -> act -> drop -> fc -> drop)."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    # exact (erf) GELU matches torch/timm defaults bit-for-metric
    act: Callable = staticmethod(lambda x: nn.gelu(x, approximate=False))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, kernels_only: bool = False):
        # PackedQKV == nn.Dense (same param tree / inits / dtype casts) plus
        # a kernel_only mode for the chunked mlp_state body
        fc1 = PackedQKV(self.hidden_dim, dtype=self.dtype, name="fc1")
        fc2 = PackedQKV(self.out_dim, dtype=self.dtype, name="fc2")
        if kernels_only:
            k1, b1 = fc1(x, kernel_only=True)
            k2, b2 = fc2(jnp.zeros((1, self.hidden_dim), self.dtype),
                         kernel_only=True)
            return k1, b1, k2, b2
        x = fc1(x)
        x = nn.gelu(x, approximate=True) if fast_gelu() else self.act(x)
        x = nn.Dropout(self.dropout, deterministic=dropout_det(train))(x)
        x = fc2(x)
        x = nn.Dropout(self.dropout, deterministic=dropout_det(train))(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth on the residual branch (per-sample)."""

    rate: float

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class PatchEmbed(nn.Module):
    """Image -> patch tokens. Channels-last conv, optional LayerNorm.

    ref: AVMOE/AVE/nets/layers.py:56-86 (supports patch_size != stride via
    symmetric padding, as HTS-AT configures).
    """

    embed_dim: int
    patch_size: Tuple[int, int]
    patch_stride: Tuple[int, int]
    use_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ph, pw = self.patch_size
        sh, sw = self.patch_stride
        pad_h = (ph - sh) // 2
        pad_w = (pw - sw) // 2
        x = nn.Conv(
            self.embed_dim, kernel_size=(ph, pw), strides=(sh, sw),
            padding=((pad_h, ph - sh - pad_h), (pad_w, pw - sw - pad_w)),
            dtype=self.dtype, name="proj",
        )(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        if self.use_norm:
            x = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class PatchMergingV1(nn.Module):
    """Swin-V1 downsample: 2x2 concat -> LayerNorm(4C) -> Linear(4C->2C).

    ref: htsat.py:259-295.
    """

    input_resolution: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        # gather 2x2 neighborhoods in the reference's (x0,x1,x2,x3) order:
        # x0=(0,0) x1=(1,0) x2=(0,1) x3=(1,1) over (row, col) offsets
        x = x.transpose(0, 1, 3, 4, 2, 5)  # B, H/2, W/2, colpar, rowpar, C
        x = x.reshape(B, (H // 2) * (W // 2), 4 * C)
        x = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return x


class PatchMergingV2(nn.Module):
    """Swin-V2 downsample: 2x2 concat -> Linear(4C->2C) -> LayerNorm(2C)
    (norm after reduction, matching timm swinv2)."""

    input_resolution: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        H, W = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 4, 2, 5)
        x = x.reshape(B, (H // 2) * (W // 2), 4 * C)
        x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)
        x = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


# ---------------------------------------------------------------------------
# Window attention
# ---------------------------------------------------------------------------


def bf16_attention_logits() -> bool:
    """Keep attention logits in bf16 (env AVMOE_BF16_LOGITS=1): halves the
    N^2 HBM traffic; softmax still max-subtracted so bf16 range is safe.
    Off by default for strict fp32-softmax parity."""
    import os

    return os.environ.get("AVMOE_BF16_LOGITS", "0") == "1"


def use_chunked_block() -> bool:
    """Whole-block chunked execution toggle (env AVMOE_CHUNK_BLOCK; eval path
    only - callers gate on not-train). See SwinBlock.chunked_forward.

    Default OFF: measured 50.9 clips/s vs 64.4 for chunked-attention-only on
    the AVE flagship (v5e) - the seam blocks' dual mid/out stream writes, the
    extra r/mid window copies, and per-block loop overhead outweigh keeping
    the MLP hidden in VMEM. Kept for configs with fewer adapter seams."""
    import os

    return os.environ.get("AVMOE_CHUNK_BLOCK", "0") == "1"


def use_chunked_attn_state() -> bool:
    """Attention-state chunking (env AVMOE_CHUNK_ATTN_STATE): the injection
    engine runs qkv + attention + proj + norm1 + residual (+ p1 adapter
    delta) as ONE mapped body per block (eval path).

    Default OFF: measured 62.2 vs 76.2 clips/s - every extra operand fed into
    a lax.map body pays per-chunk dynamic-slice/copy machinery that costs
    more than the fused LN/residual stream passes it saves. The minimal
    qkv-in/attn-out chunk body is the sweet spot on this stack."""
    import os

    return os.environ.get("AVMOE_CHUNK_ATTN_STATE", "0") == "1"


def attn_remat_threshold_bytes() -> int:
    """TRAIN chunked attention: rematerialize (jax.checkpoint) only blocks
    whose full softmax tensor exceeds this many MB (env AVMOE_ATTN_REMAT_MB,
    default 64). Smaller stages store their chunk intermediates - the memory
    is modest and skipping the backward recompute pass is faster."""
    import os

    return int(os.environ.get("AVMOE_ATTN_REMAT_MB", "64")) * 1024 * 1024


def chunk_v1() -> bool:
    """Chunked attention for v1 (HTS-AT audio) blocks (env AVMOE_CHUNK_V1).
    Audio windows are small (2 MB of logits per frame), so the chunk loop
    runs ~40 tiny iterations per block; monolithic can win there while the
    big vision (v2) logits still want chunking."""
    import os

    return os.environ.get("AVMOE_CHUNK_V1", "1") == "1"


def chunk_attn_train_mode() -> int:
    """Chunked attention in TRAIN (env AVMOE_CHUNK_ATTN_TRAIN):

      0 - off: monolithic attention (round-3 default; backward materializes
          full (B_, H, N, N) softmax-grad streams in HBM).
      1 - full remat: chunked under jax.checkpoint, backward recomputes each
          chunk's logits/softmax from the saved packed qkv (r2 variant -
          saves memory but pays the N^2 recompute).
      2 - save-P: chunked under jax.checkpoint with a save_only_these_names
          policy on the softmax output. Forward stores P (the same bytes the
          monolithic path materializes anyway); backward recomputes only the
          cheap qkv relayout per chunk while dP / dlogits stay chunk-local in
          VMEM instead of streaming through HBM (the round-4 lever: train ran
          at ~55% of its byte roofline with the monolithic backward).
    """
    import os

    return int(os.environ.get("AVMOE_CHUNK_ATTN_TRAIN", "0"))


def chunk_attn_train() -> bool:
    return chunk_attn_train_mode() > 0


def _save_p_policy():
    return ad_checkpoint.checkpoint_policies.save_only_these_names(
        "attn_probs")


def use_chunked_attention() -> bool:
    """Chunked window attention (env AVMOE_CHUNK_ATTN, default on).

    Maps the attention core over window-frame chunks sized so each chunk's
    logits tensor is a few MB: XLA's memory-space assignment then keeps the
    logits / softmax / head-layout intermediates in VMEM instead of streaming
    stage-1/2 (B*, H, N, N) tensors through HBM (measured ~17 ms of the 68 ms
    AVE forward). Identical math and per-element reduction order to the
    unchunked path - only the iteration structure changes."""
    import os

    return os.environ.get("AVMOE_CHUNK_ATTN", "1") == "1"


def _chunk_target_bytes() -> int:
    """Per-chunk logits budget (env AVMOE_CHUNK_MB, default 4)."""
    import os

    return int(os.environ.get("AVMOE_CHUNK_MB", "4")) * 1024 * 1024


def _chunk_unroll() -> int:
    """Chunk-loop unroll factor (env AVMOE_CHUNK_UNROLL, default 1).

    Each while-loop iteration carries ~0.3 ms of fixed machinery cost on
    this stack (measured round 4: +34 loops cost +9.3 ms/fwd); unrolling k
    chunk bodies per iteration divides the loop count by k while each body's
    intermediates still stay VMEM-sized."""
    import os

    return int(os.environ.get("AVMOE_CHUNK_UNROLL", "1"))


def _chunk_map(body, xs):
    """lax.map with the configured unroll factor."""
    u = _chunk_unroll()
    if u <= 1:
        return jax.lax.map(body, xs)
    n = xs.shape[0] if not isinstance(xs, tuple) else xs[0].shape[0]
    while n % u:
        u -= 1
    if u <= 1:
        return jax.lax.map(body, xs)
    _, ys = jax.lax.scan(lambda c, x: (c, body(x)), None, xs, unroll=u)
    return ys


def qkv_in_chunk() -> bool:
    """Compute the packed-qkv GEMM inside the attention chunk body (eval
    path; env AVMOE_QKV_IN_CHUNK, default on): the lax.map's sliced operand
    becomes x (S bytes) instead of qkv (3S), and the stage-sized qkv tensor
    never round-trips HBM - the kernel rides in as a loop-invariant operand
    (no per-chunk slice machinery)."""
    import os

    return os.environ.get("AVMOE_QKV_IN_CHUNK", "1") == "1"


def mlp_in_chunk() -> bool:
    """Fold norm2 + MLP + residual into a frame-chunked body (eval path; env
    AVMOE_MLP_IN_CHUNK, default OFF). The MLP is per-token, so chunking is
    exact; the (B, N, 4C) hidden stream and the norm2/residual passes stay
    in VMEM at the cost of re-reading the fc kernels once per chunk - a
    profitability check (see _plan_mlp_chunks) skips stages where the kernel
    re-reads would exceed the stream savings.

    Default OFF: measured round 4 on v5e — 83.2 clips/s fused vs 85.0
    unfused (the per-while-iteration machinery ~0.27 ms/loop costs more than
    the hidden-stream bytes saved; unroll=4 recovers only to 83.6). The
    byte model in _plan_mlp_chunks is right about HBM traffic but loop
    overhead dominates at these chunk counts."""
    import os

    return os.environ.get("AVMOE_MLP_IN_CHUNK", "0") == "1"


def _mlp_chunk_target_bytes() -> int:
    """Per-chunk hidden-tensor budget (env AVMOE_MLP_CHUNK_MB, default 16 -
    the MLP body has no N^2 logits tensor, so chunks can be much larger than
    the attention body's)."""
    import os

    return int(os.environ.get("AVMOE_MLP_CHUNK_MB", "16")) * 1024 * 1024


def _plan_mlp_chunks(B: int, L: int, C: int, hidden: int,
                     esize: int) -> Optional[int]:
    """Frames per chunk, or None when fusion is unprofitable.

    Saved HBM traffic: the hidden stream's write+read (2*B*L*hidden) plus the
    norm2 + residual stream passes (~2*B*L*C). Cost: the fc kernels re-read
    once per extra chunk iteration (2*C*hidden each)."""
    per_frame = L * hidden * esize
    f = int(max(1, min(B, _mlp_chunk_target_bytes() // max(per_frame, 1))))
    while B % f:
        f -= 1
    iters = B // f
    saved = (2 * B * L * hidden + 2 * B * L * C) * esize
    cost = (iters - 1) * 2 * C * hidden * esize
    return f if cost < saved else None


def chunked_mlp_state(x, *, norm2, k1, b1, k2, b2, version, dtype, f):
    """State update `x + mlp_residual(x)` over f-frame chunks: norm2 (pre for
    v1 / post for v2), fc1 -> GELU -> fc2 and the residual add all run on
    VMEM-resident chunk data. One stream read + one stream write."""
    B, L, C = x.shape
    n2_scale, n2_bias, n2_eps = norm2
    fast = fast_gelu()

    def body(xc):
        h = (_ln_chunk(xc, n2_scale, n2_bias, n2_eps, dtype)
             if version == "v1" else xc.astype(dtype))
        h = h @ k1.astype(dtype) + b1.astype(dtype)
        h = nn.gelu(h, approximate=fast)
        out = h @ k2.astype(dtype) + b2.astype(dtype)
        if version == "v2":
            out = _ln_chunk(out, n2_scale, n2_bias, n2_eps, dtype)
        return (xc + out).astype(x.dtype)

    return _chunk_map(body, x.reshape(B // f, f, L, C)).reshape(B, L, C)


def attn_res_in_chunk() -> bool:
    """Fold norm1 + the residual add + BOTH window (un)partition permutations
    into the attention chunk body (eval path; env AVMOE_ATTN_RES_IN_CHUNK,
    default on).

    The frame-major chunking means a chunk of the PARTITIONED stream (all nW
    windows of f frames) is exactly a contiguous f-frame slab of the RAW
    (B, L, C) stream, so the window permutation can run inside the mapped
    body on VMEM-resident data. The whole attention sub-block then costs one
    stream read + one stream write of HBM traffic: the partition gather, the
    qkv/logits/softmax/pre-proj tensors, the norm1 stream pass, the inverse
    gather, and the residual-add read all stay chunk-local. Single stream
    operand per the round-2/3 lesson (multi-operand lax.map bodies lose to
    slice machinery)."""
    import os

    return os.environ.get("AVMOE_ATTN_RES_IN_CHUNK", "1") == "1"


def relayout_probe_mode() -> int:
    """PERF PROBE ONLY (env AVMOE_PROBE_RELAYOUT, default 0 = off): bound the
    cost of the in-body window relayouts in `chunked_attn_residual` to decide
    whether window-layout-resident streams (keeping the residual stream
    window-partitioned BETWEEN blocks) can pay. Modes:

      1 — drop both relayouts (entry and exit become pure reshapes). This is
          the perf UPPER BOUND of window residency: numerics are WRONG for
          shifted blocks (tokens attend in raster windows instead of rolled
          ones), but shapes/FLOPs/bytes are identical.
      2 — entry is a pure reshape; exit applies ONE composed static gather
          from this block's layout to the alternate-shift layout. This is the
          steady-state COST MODEL of a window-resident stream (each block
          pays exactly one composed relayout at exit). Numerics WRONG.

    Never enable outside perf probes; parity tests run with it unset."""
    import os

    return int(os.environ.get("AVMOE_PROBE_RELAYOUT", "0"))


def _ln_chunk(x, scale, bias, eps, dtype):
    """LayerNorm matching ops.norm.LayerNorm's math (f32 stats, elementwise
    apply in `dtype`) for use inside chunk bodies on VMEM-resident data."""
    C = x.shape[-1]
    s = jnp.sum(x, axis=-1, keepdims=True, dtype=jnp.float32)
    ss = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    mean = s / C
    var = jnp.maximum(ss / C - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    if dtype == jnp.float32:
        y = (x.astype(jnp.float32) - mean) * inv
    else:
        y = (x.astype(dtype) - mean.astype(dtype)) * inv.astype(dtype)
    y = y * scale.astype(dtype) + bias.astype(dtype)
    return y.astype(dtype)


class PackedQKV(nn.Module):
    """Drop-in for nn.Dense (same param paths/inits) that can also hand its
    kernel to the chunked attention body (kernel_only=True). Used for the
    packed qkv projection and the output proj."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, kernel_only: bool = False):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if kernel_only:
            return kernel, bias
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def chunked_window_attention(qkv, bias, mask, num_heads, *, version,
                             logit_scale=None, pet, dtype,
                             target_bytes=None, qkv_kernel=None,
                             qkv_bias=None, proj_kernel=None,
                             proj_bias=None):
    """Attention core over packed qkv (B_, N, 3C) in window-frame chunks.

    bias: (H, N, N); mask: (nW, N, N) or None. Returns (B_, N, C) in `dtype`.
    The packed-qkv layout means the big head-split transpose never happens at
    stream size - each chunk relayouts a few MB inside the mapped body.

    With qkv_kernel (+ optional qkv_bias), the first argument is x (B_, N, C)
    and each chunk computes its own qkv GEMM in VMEM (see qkv_in_chunk).
    With proj_kernel, the output projection runs in the body too (proj is
    per-token, so it commutes exactly with chunk concatenation) - the
    pre-proj attention output never round-trips HBM either.
    """
    if qkv_kernel is not None:
        B_, N, C = qkv.shape
        C3 = 3 * C
    else:
        B_, N, C3 = qkv.shape
        C = C3 // 3
    H = num_heads
    D = C // H
    nW = 1 if mask is None else mask.shape[0]
    F = B_ // nW
    if target_bytes is None:
        target_bytes = _chunk_target_bytes()
    per_frame = nW * H * N * N * (2 if pet != jnp.float32 else 4)
    f = int(max(1, min(F, target_bytes // max(per_frame, 1))))
    while F % f:
        f -= 1
    cb = f * nW
    full_bias = bias[None] if mask is None else bias[None] + mask[:, None]

    def body(qkv_c):
        if qkv_kernel is not None:
            qkv_c = qkv_c.astype(dtype) @ qkv_kernel.astype(dtype)
            if qkv_bias is not None:
                qkv_c = qkv_c + qkv_bias.astype(dtype)
        qkv_ = qkv_c.reshape(cb, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv_[0], qkv_[1], qkv_[2]           # (cb, H, N, D)
        if version == "v2":
            def _rown(t):
                ss = jnp.sum(jnp.square(t.astype(jnp.float32)), axis=-1,
                             keepdims=True)
                inv = 1.0 / jnp.maximum(jnp.sqrt(ss), 1e-12)
                return t * inv.astype(t.dtype)
            q, k = _rown(q), _rown(k)
        else:
            q = q * (D ** -0.5)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=pet)
        if version == "v2":
            attn = attn * logit_scale[None].astype(pet)
        attn = (attn.reshape(f, nW, H, N, N)
                + full_bias[None].astype(pet)).reshape(cb, H, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
        # named for the TRAIN save-P remat policy (chunk_attn_train_mode 2)
        attn = ad_checkpoint.checkpoint_name(attn, "attn_probs")
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(dtype))
        out = out.transpose(0, 2, 1, 3).reshape(cb, N, C).astype(dtype)
        if proj_kernel is not None:
            out = out @ proj_kernel.astype(dtype)
            if proj_bias is not None:
                out = out + proj_bias.astype(dtype)
        return out.astype(dtype)

    out = _chunk_map(body, qkv.reshape(B_ // cb, cb, N, qkv.shape[-1]))
    return out.reshape(B_, N, C)


def chunked_attn_residual(x, *, H, W, window, shift, bias, mask, num_heads,
                          version, norm1, qkv_kernel, qkv_bias, proj_kernel,
                          proj_bias, logit_scale=None, pet, dtype,
                          target_bytes=None):
    """Whole attention sub-block state update `x + res` over frame chunks.

    x: RAW (B, L, C) tokens. Each mapped chunk is a contiguous slab of f
    frames; the window (shift-)partition permutation, norm1 (pre-norm for v1
    / post-norm for v2), qkv + output projections, attention, the inverse
    permutation and the residual add all run on VMEM-resident chunk data -
    the only stream-sized HBM traffic is one read of x and one write of the
    result. norm1 is (scale, bias, eps). Eval path only (dropout inert).

    With a QStream x (int8 stream storage, ops/quant.py) the lax.map operand
    and output are the int8 values + per-token scales: dequant/requant run on
    the VMEM-resident chunk, so the sub-block's stream HBM traffic halves
    again (int8 read + int8 write).
    """
    from avmoe_tpu.ops.quant import QStream

    is_q = isinstance(x, QStream)
    B, L, C = x.shape
    H_heads = num_heads
    D = C // H_heads
    N = window * window
    nW = L // N
    if target_bytes is None:
        target_bytes = _chunk_target_bytes()
    per_frame = nW * H_heads * N * N * (2 if pet != jnp.float32 else 4)
    f = int(max(1, min(B, target_bytes // max(per_frame, 1))))
    while B % f:
        f -= 1
    full_bias = bias[None] if mask is None else bias[None] + mask[:, None]
    n1_scale, n1_bias, n1_eps = norm1
    cb = f * nW

    # in-body (un)partition as pure reshape/transpose/roll: layout ops XLA
    # fuses on VMEM-resident chunks (a take-gather here measured 514 GB/s
    # effective stream bandwidth vs 819 peak - lane-inefficient)
    probe = relayout_probe_mode()

    def _part(t):  # (f, L, C) -> (cb, N, C)
        if probe:  # perf probe: entry becomes a pure reshape (see docstring)
            return t.reshape(cb, N, C)
        t = t.reshape(f, H, W, C)
        if shift:
            t = jnp.roll(t, (-shift, -shift), axis=(1, 2))
        t = t.reshape(f, H // window, window, W // window, window, C)
        return t.transpose(0, 1, 3, 2, 4, 5).reshape(cb, N, C)

    def _unpart(t):  # (cb, N, C) -> (f, L, C)
        if probe == 1:
            return t.reshape(f, L, C)
        if probe == 2:
            # steady-state window-resident cost model: ONE composed static
            # gather from this block's window layout to the alternate-shift
            # layout (what the next block would consume)
            alt = window // 2 if shift == 0 else 0
            _, inv_s = _shifted_partition_perm(H, W, window, shift)
            idx_a, _ = _shifted_partition_perm(H, W, window, alt)
            comp = inv_s[idx_a]
            return jnp.take(t.reshape(f, L, C), jnp.asarray(comp), axis=1)
        t = t.reshape(f, H // window, W // window, window, window, C)
        t = t.transpose(0, 1, 3, 2, 4, 5).reshape(f, H, W, C)
        if shift:
            t = jnp.roll(t, (shift, shift), axis=(1, 2))
        return t.reshape(f, L, C)

    def body(xc):
        if is_q:
            qc, sc = xc
            xc = qc.astype(dtype) * sc.astype(dtype)
        xw = _part(xc)
        if version == "v1":
            h = _ln_chunk(xw, n1_scale, n1_bias, n1_eps, dtype)
        else:
            h = xw.astype(dtype)
        qkv_c = h @ qkv_kernel.astype(dtype)
        if qkv_bias is not None:
            qkv_c = qkv_c + qkv_bias.astype(dtype)
        qkv_ = qkv_c.reshape(cb, N, 3, H_heads, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv_[0], qkv_[1], qkv_[2]           # (cb, H, N, D)
        if version == "v2":
            def _rown(t):
                ss = jnp.sum(jnp.square(t.astype(jnp.float32)), axis=-1,
                             keepdims=True)
                r = 1.0 / jnp.maximum(jnp.sqrt(ss), 1e-12)
                return t * r.astype(t.dtype)
            q, k = _rown(q), _rown(k)
        else:
            q = q * (D ** -0.5)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=pet)
        if version == "v2":
            attn = attn * logit_scale[None].astype(pet)
        attn = (attn.reshape(f, nW, H_heads, N, N)
                + full_bias[None].astype(pet)).reshape(cb, H_heads, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(dtype))
        out = out.transpose(0, 2, 1, 3).reshape(cb, N, C).astype(dtype)
        out = out @ proj_kernel.astype(dtype)
        if proj_bias is not None:
            out = out + proj_bias.astype(dtype)
        if version == "v2":
            out = _ln_chunk(out, n1_scale, n1_bias, n1_eps, dtype)
        out = _unpart(out)
        out = xc + out
        if not is_q:
            return out.astype(x.dtype)
        of = out.astype(jnp.float32)
        amax = jnp.max(jnp.abs(of), axis=-1, keepdims=True)
        s2 = jnp.maximum(amax, 1e-12) / 127.0
        return jnp.round(of / s2).astype(jnp.int8), s2

    if is_q:
        qo, so = _chunk_map(body, (x.q.reshape(B // f, f, L, C),
                                   x.s.reshape(B // f, f, L, 1)))
        return QStream(qo.reshape(B, L, C), so.reshape(B, L, 1))
    return _chunk_map(body, x.reshape(B // f, f, L, C)).reshape(B, L, C)


class WindowAttentionV1(nn.Module):
    """Scaled-dot-product window attention with a learned relative-position
    bias table (ref: htsat.py:50-128)."""

    dim: int
    window: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, *, train: bool = False,
                 monolithic: bool = False, fused_residual: Optional[dict] = None):
        B_, N, C = x.shape
        H = self.num_heads
        D = C // H
        qkv_mod = PackedQKV(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                            name="qkv")

        scale = D ** -0.5
        wh, ww = self.window
        Nw = wh * ww
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wh - 1) * (2 * ww - 1), H),
        )
        idx = jnp.asarray(relative_position_index(wh, ww))
        bias = table[idx.reshape(-1)].reshape(Nw, Nw, H).transpose(2, 0, 1)

        if fused_residual is not None:
            # whole sub-block (norm1 + windowing + attention + proj +
            # residual) over frame chunks; x is RAW (B, L, C) tokens.
            # Caller guarantees the eval chunked path (see SwinBlock.attn_state).
            pet = self.dtype if bf16_attention_logits() else jnp.float32
            kern, qb = qkv_mod(x, kernel_only=True)
            pk, pb = PackedQKV(C, dtype=self.dtype, name="proj")(
                jnp.zeros((1, C), self.dtype), kernel_only=True)
            return chunked_attn_residual(
                x, H=fused_residual["H"], W=fused_residual["W"], window=wh,
                shift=fused_residual["shift"], bias=bias, mask=mask,
                num_heads=H, version="v1", norm1=fused_residual["norm1"],
                qkv_kernel=kern, qkv_bias=qb, proj_kernel=pk, proj_bias=pb,
                pet=pet, dtype=self.dtype)

        no_attn_drop = self.attn_drop == 0.0 or not train
        # eval: plain chunked; train: only with remat (backward through the
        # bare lax.map stacks saved chunk residuals and OOMs the 16 GB HBM)
        use_chunk = (use_chunked_attention() and chunk_v1() and not monolithic
                     and (not train or (no_attn_drop and chunk_attn_train())))
        if use_chunk:
            pet = self.dtype if bf16_attention_logits() else jnp.float32
            proj_mod = PackedQKV(C, dtype=self.dtype, name="proj")
            if not train and qkv_in_chunk():
                kern, qb = qkv_mod(x, kernel_only=True)
                pk, pb = proj_mod(jnp.zeros((1, C), self.dtype),
                                  kernel_only=True)
                out = chunked_window_attention(
                    x, bias, mask, H, version="v1", pet=pet, dtype=self.dtype,
                    qkv_kernel=kern, qkv_bias=qb,
                    proj_kernel=pk, proj_bias=pb)
            else:
                core = lambda qkv_, bias_: chunked_window_attention(
                    qkv_, bias_, mask, H, version="v1", pet=pet,
                    dtype=self.dtype)
                logits_bytes = B_ * H * N * N * (2 if pet != jnp.float32 else 4)
                if train and chunk_attn_train_mode() == 2:
                    core = jax.checkpoint(core, policy=_save_p_policy())
                elif train and logits_bytes > attn_remat_threshold_bytes():
                    core = jax.checkpoint(core)
                out = proj_mod(core(qkv_mod(x), bias))
            return nn.Dropout(self.proj_drop, deterministic=dropout_det(train))(out)

        qkv = qkv_mod(x).reshape(B_, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B_, H, N, D)

        pet = self.dtype if bf16_attention_logits() else jnp.float32
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=pet)
        attn = attn + bias[None].astype(pet)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, H, N, N) + mask[None, :, None].astype(pet)
            attn = attn.reshape(B_, H, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=dropout_det(train))(attn)
        # MXU accumulates fp32 internally; emit bf16 directly to halve
        # the PV-output HBM traffic
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).astype(self.dtype)

        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C).astype(self.dtype)
        out = PackedQKV(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=dropout_det(train))(out)
        return out


class WindowAttentionV2(nn.Module):
    """Swin-V2 cosine window attention with continuous position bias
    (matches timm's swinv2: q/v-only bias, learnable per-head logit scale
    clamped at log(100), 2-layer CPB MLP over log-spaced coords, 16*sigmoid)."""

    dim: int
    window: Tuple[int, int]
    num_heads: int
    pretrained_window: Tuple[int, int] = (0, 0)
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    cpb_hidden: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, *, train: bool = False,
                 monolithic: bool = False, fused_residual: Optional[dict] = None):
        B_, N, C = x.shape
        H = self.num_heads
        D = C // H

        qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.lecun_normal(), (C, 3 * C)
        )
        q_bias = self.param("q_bias", nn.initializers.zeros, (C,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (C,))
        qkv_bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])

        logit_scale = self.param(
            "logit_scale",
            lambda rng, shape: jnp.full(shape, float(np.log(10.0))),
            (H, 1, 1),
        )
        logit_scale = jnp.exp(jnp.minimum(logit_scale, float(np.log(100.0))))

        # continuous position bias
        wh, ww = self.window
        Nw = wh * ww
        pwh, pww = self.pretrained_window
        coords = jnp.asarray(log_cpb_coords_table(wh, ww, pwh, pww))
        cpb = nn.Dense(self.cpb_hidden, name="cpb_fc1")(coords)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(H, use_bias=False, name="cpb_fc2")(cpb)  # (T, H)
        idx = jnp.asarray(relative_position_index(wh, ww))
        bias = cpb[idx.reshape(-1)].reshape(Nw, Nw, H).transpose(2, 0, 1)
        bias = 16.0 * jax.nn.sigmoid(bias)

        if fused_residual is not None:
            # whole sub-block (windowing + attention + proj + post-norm1 +
            # residual) over frame chunks; x is RAW (B, L, C) tokens.
            pet = self.dtype if bf16_attention_logits() else jnp.float32
            pk, pb = PackedQKV(C, dtype=self.dtype, name="proj")(
                jnp.zeros((1, C), self.dtype), kernel_only=True)
            return chunked_attn_residual(
                x, H=fused_residual["H"], W=fused_residual["W"], window=wh,
                shift=fused_residual["shift"], bias=bias, mask=mask,
                num_heads=H, version="v2", norm1=fused_residual["norm1"],
                qkv_kernel=qkv_kernel, qkv_bias=qkv_bias,
                proj_kernel=pk, proj_bias=pb, logit_scale=logit_scale,
                pet=pet, dtype=self.dtype)

        no_attn_drop = self.attn_drop == 0.0 or not train
        # eval: plain chunked; train: only with remat (see V1 note)
        use_chunk = (use_chunked_attention() and not monolithic
                     and (not train or (no_attn_drop and chunk_attn_train())))
        if use_chunk:
            pet = self.dtype if bf16_attention_logits() else jnp.float32
            proj_mod = PackedQKV(C, dtype=self.dtype, name="proj")
            if not train and qkv_in_chunk():
                pk, pb = proj_mod(jnp.zeros((1, C), self.dtype),
                                  kernel_only=True)
                out = chunked_window_attention(
                    x, bias, mask, H, version="v2", logit_scale=logit_scale,
                    pet=pet, dtype=self.dtype,
                    qkv_kernel=qkv_kernel, qkv_bias=qkv_bias,
                    proj_kernel=pk, proj_bias=pb)
            else:
                core = lambda qkv_, bias_, lsc_: chunked_window_attention(
                    qkv_, bias_, mask, H, version="v2", logit_scale=lsc_,
                    pet=pet, dtype=self.dtype)
                logits_bytes = B_ * H * N * N * (2 if pet != jnp.float32 else 4)
                if train and chunk_attn_train_mode() == 2:
                    core = jax.checkpoint(core, policy=_save_p_policy())
                elif train and logits_bytes > attn_remat_threshold_bytes():
                    core = jax.checkpoint(core)
                out = proj_mod(core(
                    x.astype(self.dtype) @ qkv_kernel.astype(self.dtype)
                    + qkv_bias.astype(self.dtype), bias, logit_scale))
            return nn.Dropout(self.proj_drop, deterministic=dropout_det(train))(out)

        qkv = (x.astype(self.dtype) @ qkv_kernel.astype(self.dtype)
               + qkv_bias.astype(self.dtype))
        qkv = qkv.reshape(B_, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        # cosine attention; the row norms are f32-accumulated reductions but
        # q/k themselves stay in the compute dtype (a f32 divide here would
        # materialize fp32 copies of the whole qk stream in HBM)
        def _row_normalize(t):
            ss = jnp.sum(jnp.square(t.astype(jnp.float32)), axis=-1, keepdims=True)
            inv = 1.0 / jnp.maximum(jnp.sqrt(ss), 1e-12)
            return t * inv.astype(t.dtype)

        q = _row_normalize(q)
        k = _row_normalize(k)

        pet = self.dtype if bf16_attention_logits() else jnp.float32
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=pet)
        attn = attn * logit_scale[None].astype(pet)
        attn = attn + bias[None].astype(pet)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, H, N, N) + mask[None, :, None].astype(pet)
            attn = attn.reshape(B_, H, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=dropout_det(train))(attn)
        # MXU accumulates fp32 internally; emit bf16 directly to halve
        # the PV-output HBM traffic
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).astype(self.dtype)

        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C).astype(self.dtype)
        out = PackedQKV(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=dropout_det(train))(out)
        return out


# ---------------------------------------------------------------------------
# Swin block with injection seams
# ---------------------------------------------------------------------------


class SwinBlock(nn.Module):
    """One Swin transformer block over (B, N, C) tokens.

    `version='v1'` is pre-norm (HTS-AT): x + dp(attn(norm1(x))), x + dp(mlp(norm2(x))).
    `version='v2'` is post-norm (timm swinv2): x + dp(norm1(attn(x))), x + dp(norm2(mlp(x))).

    `attn_residual` / `mlp_residual` return just the residual deltas so the MoE
    injection engine can interleave adapter residuals (ref: net_trans_v3.py:702-720).
    Window size / shift auto-shrink when the resolution is smaller than the
    window (ref: htsat.py:164-167; timm _calc_window_shift).
    """

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    version: str = "v1"
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    pretrained_window: int = 0
    dtype: jnp.dtype = jnp.float32

    def _geometry(self) -> Tuple[int, int]:
        window, shift = self.window_size, self.shift_size
        if min(self.input_resolution) <= window:
            window = min(self.input_resolution)
            shift = 0
        return window, shift

    def setup(self):
        window, shift = self._geometry()
        if self.version == "v1":
            self.attn = WindowAttentionV1(
                dim=self.dim, window=(window, window), num_heads=self.num_heads,
                qkv_bias=self.qkv_bias, attn_drop=self.attn_drop, proj_drop=self.drop,
                dtype=self.dtype,
            )
        else:
            self.attn = WindowAttentionV2(
                dim=self.dim, window=(window, window), num_heads=self.num_heads,
                pretrained_window=(self.pretrained_window, self.pretrained_window),
                attn_drop=self.attn_drop, proj_drop=self.drop, dtype=self.dtype,
            )
        self.norm1 = LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.mlp = Mlp(
            hidden_dim=int(self.dim * self.mlp_ratio), out_dim=self.dim,
            dropout=self.drop, dtype=self.dtype,
        )
        self.dp1 = DropPath(self.drop_path)
        self.dp2 = DropPath(self.drop_path)

    def _windowed_attn(self, x, *, train: bool):
        H, W = self.input_resolution
        B, L, C = x.shape
        window, shift = self._geometry()
        wins = partition_windows(x, H, W, window, shift)
        mask_np = shifted_window_mask(H, W, window, shift)
        mask = None if mask_np is None else jnp.asarray(mask_np)
        wins = self.attn(wins, mask=mask, train=train)
        return unpartition_windows(wins, H, W, window, shift)

    def attn_residual(self, x, train: bool = False):
        """Residual delta of the attention sub-block (pre/post-norm aware)."""
        if self.version == "v1":
            return self.dp1(self._windowed_attn(self.norm1(x), train=train), train=train)
        return self.dp1(self.norm1(self._windowed_attn(x, train=train)), train=train)

    def mlp_residual(self, x, train: bool = False):
        """Residual delta of the MLP sub-block."""
        if self.version == "v1":
            return self.dp2(self.mlp(self.norm2(x), train=train), train=train)
        return self.dp2(self.norm2(self.mlp(x, train=train)), train=train)

    def attn_state(self, x, train: bool = False):
        """State update `x + attn_residual(x)`. On the eval chunked path the
        norm1, both window permutations, the qkv/proj GEMMs, attention and
        the residual add all run inside one mapped chunk body (one stream
        read + one stream write of HBM traffic; see chunked_attn_residual);
        otherwise identical math via the unfused sub-block pieces."""
        from avmoe_tpu.ops.quant import QStream, dequantize, quantize_stream

        fused = (not train and attn_res_in_chunk() and use_chunked_attention()
                 and qkv_in_chunk()
                 and (self.version == "v2" or chunk_v1()))
        if not fused:
            if isinstance(x, QStream):
                # keep the stream int8 through the unfused path too, so an
                # AVMOE_INT8_STREAM=1 run with a fused-gate toggle off does
                # not silently revert later sub-blocks to a bf16 stream
                # (would skew byte-accounting experiments)
                xb = dequantize(x, self.dtype)
                # train passed positionally: under cfg.remat the sub-block
                # methods are nn.remat-wrapped with static_argnums, which
                # only sees positional args (a train= keyword raises).
                return quantize_stream(xb + self.attn_residual(xb, train))
            return x + self.attn_residual(x, train)
        H, W = self.input_resolution
        window, shift = self._geometry()
        mask_np = shifted_window_mask(H, W, window, shift)
        mask = None if mask_np is None else jnp.asarray(mask_np)
        scale, bias = self.norm1(jnp.zeros((1, x.shape[-1]), self.dtype),
                                 params_only=True)
        return self.attn(
            x, mask=mask, train=train,
            fused_residual=dict(H=H, W=W, shift=shift,
                                norm1=(scale, bias, self.norm1.epsilon)))

    def mlp_state(self, x, train: bool = False):
        """State update `x + mlp_residual(x)`; norm2 + MLP + residual run in
        one frame-chunked body on the eval path when profitable. A QStream x
        stays int8 in HBM: the dequant fuses into the norm2 stat pass and the
        residual add, the requantize into the fc2 epilogue (ops/quant.py)."""
        from avmoe_tpu.ops.quant import QStream, dequantize, quantize_stream

        B, L, C = x.shape
        is_q = isinstance(x, QStream)
        f = None
        if not train and mlp_in_chunk() and not is_q:
            esize = 2 if self.dtype != jnp.float32 else 4
            f = _plan_mlp_chunks(B, L, C, int(self.dim * self.mlp_ratio),
                                 esize)
        if f is None:
            if is_q:
                xb = dequantize(x, self.dtype)
                # positional train: see attn_state (remat static_argnums)
                return quantize_stream(xb + self.mlp_residual(xb, train))
            return x + self.mlp_residual(x, train)
        k1, b1, k2, b2 = self.mlp(x, kernels_only=True)
        scale, bias = self.norm2(x, params_only=True)
        return chunked_mlp_state(
            x, norm2=(scale, bias, self.norm2.epsilon), k1=k1, b1=b1, k2=k2,
            b2=b2, version=self.version, dtype=self.dtype, f=f)

    def __call__(self, x, train: bool = False):
        x = self.attn_state(x, train=train)
        x = self.mlp_state(x, train=train)
        return x

    def chunked_forward(self, x, r_attn=None, *, train: bool = False,
                        need_mid: bool = False, part: str = "full"):
        """Whole block over window chunks: ONE HBM round-trip for the chunk
        instead of materializing qkv / logits / MLP-hidden / norm streams.

        The body (attention + norms + MLP + residuals) runs under `lax.map`
        with chunk-local intermediates that XLA keeps in VMEM. `r_attn` is an
        extra residual summed into the post-attention state (a p1 MoE-adapter
        delta); with `need_mid` the post-attention state is also returned (the
        p2 adapter's input). Eval-path only: DropPath/dropout must be inert,
        so callers gate on `not train` (or zero rates)."""
        H, W = self.input_resolution
        B, L, C = x.shape
        window, shift = self._geometry()

        def to_windows(t):
            return partition_windows(t, H, W, window, shift)

        def from_windows(tw):
            return unpartition_windows(tw, H, W, window, shift)

        xw = to_windows(x)
        rw = None if r_attn is None else to_windows(r_attn)
        mask_np = shifted_window_mask(H, W, window, shift)
        mask = None if mask_np is None else jnp.asarray(mask_np)
        nW = 1 if mask is None else mask.shape[0]
        B_, N, _ = xw.shape
        F = B_ // nW
        pet_size = 2 if (bf16_attention_logits()
                         and self.dtype != jnp.float32) else 4
        per_frame = nW * self.num_heads * N * N * pet_size
        f = int(max(1, min(F, (4 * 1024 * 1024) // max(per_frame, 1))))
        while F % f:
            f -= 1
        cb = f * nW

        def body(args):
            xc, rc = args
            if self.version == "v1":
                a = self.attn(self.norm1(xc), mask=mask, train=train,
                              monolithic=True)
            else:
                a = self.norm1(self.attn(xc, mask=mask, train=train,
                                         monolithic=True))
            mid = xc + a if rc is None else xc + a + rc
            if part == "attn":
                return mid
            if self.version == "v1":
                m = self.mlp(self.norm2(mid), train=train)
            else:
                m = self.norm2(self.mlp(mid, train=train))
            out = mid + m
            return (mid, out) if need_mid else out

        xc = xw.reshape(B_ // cb, cb, N, C)
        rc = (None,) * (B_ // cb) if rw is None else rw.reshape(B_ // cb, cb, N, C)
        if rw is None:
            res = jax.lax.map(lambda a: body((a, None)), xc)
        else:
            res = jax.lax.map(body, (xc, rc))
        if need_mid:
            mid, out = res
            return (from_windows(mid.reshape(B_, N, C)),
                    from_windows(out.reshape(B_, N, C)))
        return from_windows(res.reshape(B_, N, C))
