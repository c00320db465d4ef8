"""AVMoE adapter experts + soft router - the trainable core of the framework.

TPU-native redesign of the reference's ExpertAdapter / MoEAdapter
(ref: AVMOE/AVE/nets/net_trans_v3.py:296-487; AVVP LB-loss variant
mgn.py:161-224; AVS noisy-router variant avs_s4/model/PVT_AVSModel_v2.py:253-318):

  * Everything stays channels-last (B, N, C); the reference's (B, C, N, 1)
    conv layout becomes grouped einsum matmuls that map straight onto the MXU.
  * All E experts are evaluated densely (soft MoE: the router's softmax
    weights every expert's output; argmax is telemetry only), so expert
    parameters are STACKED and evaluated under one `nn.vmap` - a single
    batched GEMM per layer instead of a Python loop over experts, and no
    all-to-all is ever needed on the mesh.
  * Router noise / load-balance loss reproduce the AVVP/AVS variants behind
    config flags.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.utils.runtime import dropout_det

from avmoe_tpu.config import AdapterConfig, MoEConfig
from avmoe_tpu.ops.norm import BatchNorm, LayerNorm
from avmoe_tpu.ops.swin import bf16_attention_logits


class GroupedDense(nn.Module):
    """Grouped 1x1 projection over the channel axis: equivalent to the
    reference's grouped Conv2d(k=1) bottleneck (net_trans_v3.py:320-324) but
    expressed as a block-diagonal einsum."""

    features: int
    num_groups: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, kernel_only: bool = False):
        in_dim = x.shape[-1]
        g = self.num_groups
        assert in_dim % g == 0 and self.features % g == 0, (in_dim, self.features, g)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (g, in_dim // g, self.features // g)
        )
        if kernel_only:
            # fused-combine support: caller folds this (g, i, o) kernel itself
            return kernel
        xg = x.reshape(x.shape[:-1] + (g, in_dim // g))
        out = jnp.einsum("...gi,gio->...go", xg.astype(self.dtype), kernel.astype(self.dtype))
        out = out.reshape(x.shape[:-1] + (self.features,))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out


class _Bottleneck(nn.Module):
    """down-project -> BN -> [ReLU] -> up-project -> BN (shared by both expert
    flavors; the cross-modal expert activates between the projections, the
    unimodal one does not - matching net_trans_v3.py:395-422).

    setup-style so the experts' fused eval path can fold the preceding
    LayerNorm into `down`'s kernel (`down_kernel`) and continue from a
    bottleneck-rank z (`finish`) without ever materializing their
    (E, B, N, C) trunk streams. Param paths (down/bn1/up/bn2) are unchanged."""

    dim: int
    cfg: AdapterConfig
    use_activation: bool
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        hidden = max(self.dim // self.cfg.downsample, self.cfg.num_conv_group)
        self.down = GroupedDense(hidden, self.cfg.num_conv_group, dtype=self.dtype)
        self.up = GroupedDense(self.dim, self.cfg.num_conv_group, dtype=self.dtype)
        if self.cfg.use_bn:
            self.bn1 = BatchNorm(momentum=0.9, dtype=self.dtype)
            self.bn2 = BatchNorm(momentum=0.9, dtype=self.dtype)

    def down_kernel(self) -> jax.Array:
        """(g, C/g, h/g) down-projection kernel, for LN-folded fused trunks."""
        return self.down(jnp.zeros((1, self.dim), self.dtype), kernel_only=True)

    def __call__(self, x, *, train: bool = False, split_tail: bool = False):
        z = self.down(x)
        if self.cfg.use_bn:
            z = self.bn1(z, use_running_average=not train)
        return self.finish(z, train=train, split_tail=split_tail,
                           apply_bn1=False)

    def finish(self, z, *, train: bool = False, split_tail: bool = False,
               apply_bn1: bool = True):
        """Continue from bottleneck activations z: [bn1] -> [relu] -> tail."""
        if self.cfg.use_bn and apply_bn1:
            z = self.bn1(z, use_running_average=not train)
        if self.use_activation:
            z = nn.relu(z)
        if split_tail:
            # fused gated combine: hand back the bottleneck activations plus
            # the tail's folded affine terms; MoEAdapter contracts the up
            # projection against the gate-weighted z in ONE grouped GEMM
            # instead of materializing E stream-sized expert outputs.
            up_kernel = self.up(z, kernel_only=True)     # (g, h/g, C/g)
            if self.cfg.use_bn:
                if train:
                    # bn2's BATCH stats of o = z @ U in closed form from z's
                    # first/second moments (o itself is never materialized):
                    # mean_c = mean(z) @ U ; E[o_c^2] = u_c^T E[z z^T] u_c
                    g_, i_, _o = up_kernel.shape
                    zf = z.astype(jnp.float32).reshape(-1, g_, i_)
                    rows = zf.shape[0]
                    mz = zf.mean(axis=0)                            # (g, i)
                    mean = jnp.einsum("gi,gio->go", mz, up_kernel).reshape(-1)
                    M = jnp.einsum("rgi,rgj->gij", zf, zf) / rows   # (g, i, i)
                    sq = jnp.einsum("gio,gij,gjo->go", up_kernel, M,
                                    up_kernel).reshape(-1)
                    var = jnp.maximum(sq - jnp.square(mean), 0.0)
                    bn2_w, bn2_b = self.bn2(
                        jnp.zeros((1, self.dim), self.dtype), False,
                        affine_only=True, stats_override=(mean, var))
                else:
                    bn2_w, bn2_b = self.bn2(
                        jnp.zeros((1, self.dim), self.dtype), True,
                        affine_only=True)
            else:
                bn2_w = jnp.ones((self.dim,), jnp.float32)
                bn2_b = jnp.zeros((self.dim,), jnp.float32)
            return z, (up_kernel, bn2_w, bn2_b)
        out = self.up(z)
        if self.cfg.use_bn:
            out = self.bn2(out, use_running_average=not train)
        return out


class CrossModalExpert(nn.Module):
    """Cross-modal adapter expert: learnable latent tokens attend to the other
    modality, re-inject into x, then bottleneck (ref: net_trans_v3.py:313-403)."""

    dim: int
    cfg: AdapterConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, other: jax.Array, train: bool = False,
                 split_tail: bool = False) -> jax.Array:
        B, N, C = x.shape
        T = self.cfg.num_tokens
        tokens = self.param("latent_tokens", nn.initializers.uniform(1.0), (T, C))
        gate_av = self.param("gate_av", nn.initializers.zeros, (1,))

        pet = self.dtype if bf16_attention_logits() else jnp.float32
        rep = jnp.broadcast_to(tokens[None], (B, T, C)).astype(self.dtype)
        # latent tokens <- other modality
        att_o2t = jax.nn.softmax(
            jnp.einsum("btc,bmc->btm", rep, other.astype(self.dtype),
                       preferred_element_type=pet),
            axis=-1,
        ).astype(self.dtype)
        rep = rep + jnp.einsum("btm,bmc->btc", att_o2t, other.astype(self.dtype))
        # x <- latent tokens
        att_logits = jnp.einsum("bnc,btc->bnt", x.astype(self.dtype), rep,
                                preferred_element_type=pet)
        att_t2x = jax.nn.softmax(att_logits, axis=-1).astype(self.dtype)
        bottleneck = _Bottleneck(self.dim, self.cfg, use_activation=True,
                                 dtype=self.dtype, name="bottleneck")
        if split_tail:
            # fused trunk: the gated latent-attention delta and ln_before fold
            # into the down projection (see _fused_trunk_z) — the per-expert
            # (B, N, C) trunk stream never hits HBM
            z = _fused_trunk_z(self, bottleneck, x,
                               delta_attn=(rep, att_t2x, att_logits, gate_av),
                               dtype=self.dtype)
            z, tail = bottleneck.finish(z, train=train, split_tail=True)
            return _tail_dict(self, z, tail, self.dim, self.dtype)
        x = x + gate_av.astype(self.dtype) * jnp.einsum("bnt,btc->bnc", att_t2x, rep)

        if self.cfg.before_layernorm:
            x = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_before")(x)
        out = bottleneck(x, train=train)
        if self.cfg.post_layernorm:
            out = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(out)
        if self.cfg.use_gate:
            out = self.param("gate", nn.initializers.zeros, (1,)).astype(self.dtype) * out
        return out


class UnimodalExpert(nn.Module):
    """Unimodal adapter expert: optional self-attention, then bottleneck
    without inner activation (ref: net_trans_v3.py:337-363, 405-422)."""

    dim: int
    cfg: AdapterConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, other: jax.Array, train: bool = False,
                 split_tail: bool = False) -> jax.Array:
        del other  # unimodal: the other modality is ignored
        bottleneck = _Bottleneck(self.dim, self.cfg, use_activation=False,
                                 dtype=self.dtype, name="bottleneck")
        if split_tail and self.cfg.self_attention == "none":
            # fused trunk (eval): ln_before folds into the down kernel; the
            # per-expert LN'd (B, N, C) stream never hits HBM (the row stats
            # of the shared x stay unbatched under nn.vmap)
            z = _fused_trunk_z(self, bottleneck, x, dtype=self.dtype)
            z, tail = bottleneck.finish(z, train=train, split_tail=True)
            return _tail_dict(self, z, tail, self.dim, self.dtype)
        if self.cfg.self_attention == "mha":
            # The reference feeds (B', N, C) into a default (batch_first=False)
            # torch MultiheadAttention (PVT_AVSModel_v2.py:210-214), so torch
            # reads it as (seq=frames B', batch=tokens N, embed): the expert
            # attends ACROSS the frame/batch axis at each token index, not
            # over tokens. Replicated faithfully via a transpose. NOTE: this
            # mixes samples across the batch — exactly as the reference does —
            # so eval outputs depend on batch composition: exact-reproducible
            # AVS eval needs a fixed batch size (BatchLoader never pads, so a
            # smaller final batch is still all-real samples, merely a
            # different mixing set than a full batch would be; see
            # docs/PARITY.md "mha expert batch dependence").
            x_t = x.transpose(1, 0, 2)  # (N, B', C)
            x_t = nn.MultiHeadDotProductAttention(
                num_heads=4, dropout_rate=0.2, deterministic=dropout_det(train),
                dtype=self.dtype, name="self_attention",
            )(x_t, x_t)
            x = x_t.transpose(1, 0, 2)
        elif self.cfg.self_attention == "bmm":
            # AVVP-style gated dot-product self-attention (mgn.py:132-146):
            # att[i,j] = softmax_j(x_i . x_j); res_j = sum_i att[i,j] x_i
            gate_av = self.param("gate_av", nn.initializers.zeros, (1,))
            att = jax.nn.softmax(
                jnp.einsum("bic,bjc->bij", x.astype(self.dtype), x.astype(self.dtype),
                           preferred_element_type=(
                               self.dtype if bf16_attention_logits() else jnp.float32)),
                axis=-1,
            ).astype(self.dtype)
            x = x + gate_av.astype(self.dtype) * jnp.einsum("bij,bic->bjc", att, x)
        elif self.cfg.self_attention == "token":
            # MS3 "v2" latent-token self-attention (avs_ms3/model/
            # PVT_AVSModel_v2.py:397-411): same two-hop latent attention as the
            # cross-modal expert, but attending to x itself, gated by gate_self
            B, N, C = x.shape
            T = self.cfg.num_tokens
            tokens = self.param("latent_tokens", nn.initializers.uniform(1.0), (T, C))
            gate_self = self.param("gate_self", nn.initializers.zeros, (1,))
            rep = jnp.broadcast_to(tokens[None], (B, T, C)).astype(self.dtype)
            pet = self.dtype if bf16_attention_logits() else jnp.float32
            att_x2t = jax.nn.softmax(
                jnp.einsum("btc,bnc->btn", rep, x.astype(self.dtype),
                           preferred_element_type=pet), axis=-1
            ).astype(self.dtype)
            rep = rep + jnp.einsum("btn,bnc->btc", att_x2t, x.astype(self.dtype))
            att_logits = jnp.einsum("bnc,btc->bnt", x.astype(self.dtype), rep,
                                    preferred_element_type=pet)
            att_t2x = jax.nn.softmax(att_logits, axis=-1).astype(self.dtype)
            if split_tail:
                # same latent-attention trunk algebra as the cross-modal expert
                z = _fused_trunk_z(
                    self, bottleneck, x,
                    delta_attn=(rep, att_t2x, att_logits, gate_self),
                    dtype=self.dtype)
                z, tail = bottleneck.finish(z, train=train, split_tail=True)
                return _tail_dict(self, z, tail, self.dim, self.dtype)
            x = x + gate_self.astype(self.dtype) * jnp.einsum("bnt,btc->bnc", att_t2x, rep)
        if self.cfg.before_layernorm:
            x = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_before")(x)
        if split_tail:
            z, tail = bottleneck(x, train=train, split_tail=True)
            return _tail_dict(self, z, tail, self.dim, self.dtype)
        out = bottleneck(x, train=train)
        if self.cfg.post_layernorm:
            out = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(out)
        if self.cfg.use_gate:
            out = self.param("gate", nn.initializers.zeros, (1,)).astype(self.dtype) * out
        return out


def _fused_trunk_z(module, bottleneck: _Bottleneck, x: jax.Array, *,
                   delta_attn=None, dtype) -> jax.Array:
    """Bottleneck-rank trunk (eval): z = down(ln_before(x + delta)) computed
    WITHOUT materializing the per-expert (B, N, C) trunk stream.

    delta_attn: None (plain trunk, delta = 0) or (rep, A, P, gate) describing
    a gated latent-token attention delta  d = gate * A @ rep  with
    A = softmax(P), P = x . rep^T  (the cross-modal / 'token' expert trunks).

    Algebra: with LN params (s, b) and grouped down kernel D,
      down(LN(x + d)) = inv ⊙ [ (x + d) @ (s∘D) - mu (s @ D) ] + b @ D
    where (x + d) @ (s∘D) = x @ (s∘D) + gate * A @ (rep @ (s∘D))  — rank-T —
    and the LN row stats (mu, inv) come from closed-form moments:
      sum_c d   = gate * A @ rowsum(rep)
      sum_c x d = gate * sum_t A ⊙ P
      sum_c d^2 = gate^2 * A G A^T rows,  G = rep rep^T  (rank-T^2)
    Under nn.vmap the x-only pieces (x sums, x @ ...) stay unbatched and are
    shared across experts; only rank-h/T tensors carry the expert axis."""
    B, N, C = x.shape
    eps = 1e-5
    D = bottleneck.down_kernel()                        # (g, i, oh) f32 param
    g_, i_, oh = D.shape
    if module.cfg.before_layernorm:
        s, b = LayerNorm(epsilon=eps, dtype=dtype, name="ln_before")(
            jnp.zeros((1, C), dtype), params_only=True)
        Dw = (D * s.reshape(g_, i_)[..., None]).astype(dtype)
        zb = jnp.einsum("gi,gio->go", b.reshape(g_, i_).astype(jnp.float32),
                        D).reshape(-1)                  # (h,) f32
        sD = jnp.einsum("gi,gio->go", s.reshape(g_, i_).astype(jnp.float32),
                        D).reshape(-1)                  # (h,) f32
    else:
        Dw = D.astype(dtype)
    xg = x.astype(dtype).reshape(B, N, g_, i_)
    xD = jnp.einsum("bngi,gio->bngo", xg, Dw).reshape(B, N, g_ * oh)

    if delta_attn is None:
        if not module.cfg.before_layernorm:
            return xD
        sx = jnp.sum(x, -1, dtype=jnp.float32)
        sx2 = jnp.sum(jnp.square(x.astype(jnp.float32)), -1)
        mu = sx / C
        var = jnp.maximum(sx2 / C - jnp.square(mu), 0.0)
        inv = jax.lax.rsqrt(var + eps)
        z = (xD.astype(jnp.float32) - mu[..., None] * sD) * inv[..., None] + zb
        return z.astype(dtype)

    rep, A, P, gate = delta_attn
    ga = gate.astype(jnp.float32).reshape(())
    Tt = rep.shape[1]
    repg = rep.astype(dtype).reshape(B, Tt, g_, i_)
    repD = jnp.einsum("btgi,gio->btgo", repg, Dw).reshape(B, Tt, g_ * oh)
    attn_term = ga.astype(dtype) * jnp.einsum(
        "bnt,bth->bnh", A.astype(dtype), repD)
    if not module.cfg.before_layernorm:
        return (xD + attn_term).astype(dtype)
    A32 = A.astype(jnp.float32)
    rep32 = rep.astype(jnp.float32)
    sx = jnp.sum(x, -1, dtype=jnp.float32)
    sx2 = jnp.sum(jnp.square(x.astype(jnp.float32)), -1)
    mu = (sx + ga * jnp.einsum("bnt,bt->bn", A32, rep32.sum(-1))) / C
    xdot = jnp.einsum("bnt,bnt->bn", A32, P.astype(jnp.float32))
    G = jnp.einsum("btc,buc->btu", rep32, rep32)        # (B, T, T)
    quad = jnp.einsum("bnt,btu,bnu->bn", A32, G, A32)
    sq = (sx2 + 2.0 * ga * xdot + jnp.square(ga) * quad) / C
    var = jnp.maximum(sq - jnp.square(mu), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    z = ((xD + attn_term).astype(jnp.float32)
         - mu[..., None] * sD) * inv[..., None] + zb
    return z.astype(dtype)


def _tail_dict(module, z, tail, dim: int, dtype) -> dict:
    """Assemble the split-tail payload of one expert: bottleneck activations
    plus the folded tail affine params (identity-filled for disabled flags) so
    the vmapped call stacks everything along the expert axis."""
    up_kernel, bn2_w, bn2_b = tail
    if module.cfg.post_layernorm:
        lnp_scale, lnp_bias = LayerNorm(
            epsilon=1e-5, dtype=dtype, name="ln_post")(
            jnp.zeros((1, dim), dtype), params_only=True)
    else:
        lnp_scale = jnp.ones((dim,), jnp.float32)
        lnp_bias = jnp.zeros((dim,), jnp.float32)
    gate = (module.param("gate", nn.initializers.zeros, (1,))
            if module.cfg.use_gate else jnp.ones((1,), jnp.float32))
    return {"z": z, "up_kernel": up_kernel, "bn2_w": bn2_w, "bn2_b": bn2_b,
            "lnp_scale": lnp_scale, "lnp_bias": lnp_bias, "gate": gate}


def fused_gated_combine(t: dict, probs: jax.Array, *, post_layernorm: bool,
                        eps: float = 1e-5, dtype=jnp.bfloat16) -> jax.Array:
    """Gate-weighted expert mixture contracted at BOTTLENECK rank (eval path).

    Computes exactly  sum_e p_be * gate_e * ln_post_e(bn2_e(z_e @ U_e))  without
    ever materializing the (E, B, N, C) per-expert up-projections in HBM:
    bn2 (running-stats affine) folds into the up kernel, ln_post row stats come
    from closed-form moments of the affine output (cheap bottleneck-rank
    quadratic forms), and the final mixture is ONE grouped GEMM over the
    (expert x bottleneck) axis plus rank-E epilogue terms.

    t: stacked split-tail payload - z (E,B,N,h), up_kernel (E,g,i,o) with
    h = g*i and C = g*o, bn2_w/b (E,C), lnp_scale/bias (E,C), gate (E,1).
    probs: (B, E) router gates.
    """
    z = t["z"].astype(jnp.float32)                     # (E, B, N, h)
    U = t["up_kernel"].astype(jnp.float32)             # (E, g, i, o)
    E, B, N, h = z.shape
    _, g, i, o = U.shape
    C = g * o
    w2 = t["bn2_w"].reshape(E, g, o)                   # bn2 scale (f32)
    b2 = t["bn2_b"]                                    # (E, C) f32
    gp = t["lnp_scale"].reshape(E, g, o)
    bp = t["lnp_bias"]                                 # (E, C)
    ga = t["gate"].reshape(E)                          # (E,)
    pe = probs.astype(jnp.float32) * ga[None, :]       # (B, E) p*gate
    zg = z.reshape(E, B, N, g, i)

    Uw = U * w2[:, :, None, :]                         # bn2-folded kernel
    if not post_layernorm:
        # out = sum_e p_e ga_e [ (z U) w2 + b2 ]
        zw = zg * pe.T[:, :, None, None, None]         # (E,B,N,g,i)
        out = jnp.einsum("ebngi,egio->bngo", zw.astype(dtype),
                         Uw.astype(dtype)).reshape(B, N, C)
        out = out + (pe @ b2)[:, None, :].astype(dtype)
        return out.astype(dtype)

    # closed-form ln_post row stats of o_e = (z U) w2 + b2
    Usum = Uw.sum(axis=3)                              # (E, g, i)
    mu = (jnp.einsum("ebngi,egi->ebn", zg, Usum)
          + b2.sum(-1)[:, None, None]) / C             # (E, B, N)
    # sum_c o^2 via per-group quadratic forms
    Q = jnp.einsum("egio,egjo->egij", Uw, Uw)          # (E, g, i, i)
    quad = jnp.einsum("ebngi,egij,ebngj->ebn", zg, Q, zg)
    Ub2 = jnp.einsum("egio,ego->egi", Uw, b2.reshape(E, g, o))
    cross = 2.0 * jnp.einsum("ebngi,egi->ebn", zg, Ub2)
    sq = (quad + cross + jnp.square(b2).sum(-1)[:, None, None]) / C
    var = jnp.maximum(sq - jnp.square(mu), 0.0)
    inv = jax.lax.rsqrt(var + eps)                     # (E, B, N)

    a = pe.T[:, :, None] * inv                         # (E, B, N)
    Ug = Uw * gp[:, :, None, :]                        # fold lnp scale
    zw = zg * a[:, :, :, None, None]
    out = jnp.einsum("ebngi,egio->bngo", zw.astype(dtype),
                     Ug.astype(dtype)).reshape(B, N, C)
    # rank-3E epilogue in ONE einsum (separate terms each materialized a
    # stream-sized tensor): + a*b2g - (a*mu)*gp + pe*bp
    b2g = (b2.reshape(E, g, o) * gp).reshape(E, C)     # bn2 bias thru lnp scale
    coeffs = jnp.concatenate(
        [a, -a * mu, jnp.broadcast_to(pe.T[:, :, None], (E, B, N))], axis=0)
    vecs = jnp.concatenate([b2g, gp.reshape(E, C), bp], axis=0)
    out = out + jnp.einsum("ebn,ec->bnc", coeffs, vecs).astype(dtype)
    return out.astype(dtype)


def use_fused_moe() -> bool:
    """Eval-time fused expert combine (env AVMOE_FUSED_MOE=1; bench default)."""
    import os

    return os.environ.get("AVMOE_FUSED_MOE", "0") == "1"


def use_fused_moe_train() -> bool:
    """TRAIN-time fused expert combine (env AVMOE_FUSED_MOE_TRAIN=1): the same
    bottleneck-rank algebra; BatchNorm BATCH statistics (bn2 over the never
    -materialized up-projection) come from closed-form second moments of z,
    with the usual running-average updates. Gradients flow through the stats
    exactly as in the materialized path (value+grad parity tested in
    tests/test_fused_moe.py)."""
    import os

    return os.environ.get("AVMOE_FUSED_MOE_TRAIN", "0") == "1"


def _vmap_experts(module_cls, num: int, **kwargs):
    """Stack `num` expert instances along a leading parameter axis; inputs are
    broadcast, outputs stacked -> one batched GEMM per expert layer."""
    return nn.vmap(
        module_cls,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=None,
        out_axes=0,
        axis_size=num,
        methods=["__call__"],
    )(**kwargs)


class MoEAdapter(nn.Module):
    """Router + dense soft mixture over cross-modal and unimodal experts.

    Forward contract (ref: net_trans_v3.py:468-487):
      1. project the other modality into this modality's token/channel shape
         (token-axis dense == the reference's `conv_adapter`, channel dense == `fc`);
      2. route on mean-pooled features of both modalities;
      3. weight all experts' outputs by softmax gates (dense soft MoE).

    Returns (output, aux) where aux carries expert telemetry and the optional
    KL-to-uniform load-balance loss (ref: mgn.py:213-224).
    """

    dim: int              # this modality's channel dim
    other_dim: int        # other modality's channel dim
    num_tokens: int       # this modality's token count N
    other_num_tokens: int  # other modality's token count M
    cfg: MoEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, other: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, dict]:
        B, N, C = x.shape
        assert N == self.num_tokens and C == self.dim, (x.shape, self.num_tokens, self.dim)

        # --- project other modality into this modality's shape --------------
        # Reference order: token-axis conv (M->N tokens, + per-token bias) THEN
        # channel fc (C_other->C, + bias) (net_trans_v3.py:469-471). The two
        # linear maps commute, so we pick the cheaper contraction order per
        # adapter (narrow the channel dim first iff dim < other_dim) and fold
        # the token bias through the fc column sums - exactly the same
        # function, up to ~2.8x fewer FLOPs on the big token matmul.
        token_kernel = self.param(
            "token_proj_kernel", nn.initializers.lecun_normal(),
            (self.num_tokens, self.other_num_tokens),
        )
        token_bias = self.param("token_proj_bias", nn.initializers.zeros, (self.num_tokens,))
        fc_kernel = self.param(
            "fc_kernel", nn.initializers.lecun_normal(), (self.other_dim, self.dim))
        fc_bias = self.param("fc_bias", nn.initializers.zeros, (self.dim,))
        if self.dim < self.other_dim:
            other_c = jnp.einsum(
                "bmo,oc->bmc", other.astype(self.dtype), fc_kernel.astype(self.dtype))
            other_proj = jnp.einsum(
                "bmc,nm->bnc", other_c, token_kernel.astype(self.dtype))
        else:
            other_tok = jnp.einsum(
                "bmo,nm->bno", other.astype(self.dtype), token_kernel.astype(self.dtype))
            other_proj = jnp.einsum(
                "bno,oc->bnc", other_tok, fc_kernel.astype(self.dtype))
        other_proj = other_proj + (
            token_bias[:, None] * fc_kernel.sum(axis=0)[None, :] + fc_bias[None, :]
        )[None].astype(self.dtype)

        # --- router ---------------------------------------------------------
        pooled = jnp.concatenate([x.mean(axis=1), other_proj.mean(axis=1)], axis=-1)
        h = pooled.astype(jnp.float32)
        for i, width in enumerate(self.cfg.router_hidden):
            h = nn.relu(nn.Dense(width, name=f"router_fc{i}")(h))
        logits = nn.Dense(self.cfg.num_experts, name="router_out")(h)  # (B, E)
        if train and self.cfg.router_noise_std > 0:
            logits = logits + self.cfg.router_noise_std * jax.random.normal(
                self.make_rng("router"), logits.shape
            )
        probs = jax.nn.softmax(logits, axis=-1)

        # --- dense expert mixture -------------------------------------------
        fused = not self.is_initializing() and (
            use_fused_moe_train() if train else use_fused_moe())
        outs = []
        if self.cfg.num_multimodal_experts > 0:
            mm = _vmap_experts(
                CrossModalExpert, self.cfg.num_multimodal_experts,
                dim=self.dim, cfg=self.cfg.adapter, dtype=self.dtype,
                name="multimodal_experts",
            )
            outs.append(mm(x, other_proj, train, fused))  # (Em, B, N, C) | dict
        if self.cfg.num_singlemodal_experts > 0:
            sm = _vmap_experts(
                UnimodalExpert, self.cfg.num_singlemodal_experts,
                dim=self.dim, cfg=self.cfg.adapter, dtype=self.dtype,
                name="singlemodal_experts",
            )
            outs.append(sm(x, other_proj, train, fused))
        if fused:
            t = {k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]}
            out = fused_gated_combine(
                t, probs, post_layernorm=self.cfg.adapter.post_layernorm,
                dtype=self.dtype)
        else:
            expert_out = jnp.concatenate(outs, axis=0)  # (E, B, N, C)
            out = jnp.einsum("ebnc,be->bnc", expert_out,
                             probs.astype(expert_out.dtype))

        aux = {
            "gating_probs": probs,                        # (B, E)
            "expert_index": jnp.argmax(probs, axis=-1),   # (B,)
        }
        if self.cfg.load_balance_loss:
            # Default: corrected KL(uniform || mean gate probs). The
            # reference's compute_load_balancing_loss (ref: mgn.py:213-224)
            # keeps mean_p as shape (1, E), so its `uniform = 1/size(0)` is
            # 1.0 and 'batchmean' divides by 1 - it effectively computes
            # -sum(log mean_p), not a KL. cfg.lb_loss_compat=True reproduces
            # that reference-exact magnitude (for replicating published
            # configs); False keeps the intended regularizer.
            E = self.cfg.num_experts
            mean_p = jnp.clip(probs.mean(axis=0), 1e-9, 1.0)  # (E,)
            if self.cfg.lb_loss_compat:
                aux["lb_loss"] = -jnp.sum(jnp.log(mean_p))
            else:
                u = 1.0 / E
                aux["lb_loss"] = jnp.sum(u * (jnp.log(u) - jnp.log(mean_p))) / E
        return out, aux
