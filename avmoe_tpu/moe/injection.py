"""Lock-step dual-backbone encoder with MoE adapter injection.

Runs the frozen Swin-V2 vision backbone and HTS-AT audio backbone
block-by-block in lock-step, weaving trainable MoE adapter residuals around
the attention (p1) and MLP (p2) sub-blocks of both modalities - the exact
injection schedule of the reference (ref: net_trans_v3.py:639-759):

  * stages whose (index+1) % num_skip == 0 run WITHOUT adapters
    (ref: :573-574, :687-692);
  * when the visual stage is deeper than the audio stage (Swin-V2-L 18 vs
    HTS-AT 6 in stage 3), audio blocks fire every ratio-th visual block at
    offset ratio-1 (ref interleave: :678-681);
  * p1 adapters read the PRE-block features of both modalities; the visual
    block is split at its attention/MLP seam while the audio block runs
    whole between them (ref: :695-720).

All adapters are independent modules (one per site, matching the reference's
per-block ModuleLists :599-637) and their router telemetry is stacked into
(site, batch, expert) arrays for the expert-usage telemetry API.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.backbones.htsat import HTSATEncoder
from avmoe_tpu.backbones.swin_v2 import SwinV2Encoder
from avmoe_tpu.config import HTSATConfig, InjectionConfig, MoEConfig, SwinV2Config
from avmoe_tpu.moe.adapter import MoEAdapter


@dataclass(frozen=True)
class AdapterSite:
    """One injection site: a (visual block, audio block) pair in a non-skipped stage."""

    site_index: int
    stage: int
    vis_block: int   # flat index into swin blocks
    aud_block: int   # flat index into htsat blocks
    vis_dim: int
    aud_dim: int
    vis_tokens: int
    aud_tokens: int


def plan_injection(
    swin_cfg: SwinV2Config, htsat_cfg: HTSATConfig, inj: InjectionConfig
) -> List[AdapterSite]:
    """Static injection plan mirroring the reference's construction scan
    (net_trans_v3.py:571-590) + forward pairing (:674-681)."""
    from avmoe_tpu.backbones.geometry import stage_boundaries, swin_stage_specs

    v_specs = swin_stage_specs(
        swin_cfg.embed_dim, swin_cfg.depths, swin_cfg.num_heads,
        swin_cfg.patches_resolution, swin_cfg.window_size,
    )
    a_specs = swin_stage_specs(
        htsat_cfg.embed_dim, htsat_cfg.depths, htsat_cfg.num_heads,
        htsat_cfg.patches_resolution, htsat_cfg.window_size,
    )
    v_ranges = stage_boundaries(swin_cfg.depths)
    a_ranges = stage_boundaries(htsat_cfg.depths)

    sites: List[AdapterSite] = []
    for stage in range(len(swin_cfg.depths)):
        if inj.num_skip > 1 and (stage + 1) % inj.num_skip == 0:
            continue
        vlo, vhi = v_ranges[stage]
        alo, ahi = a_ranges[stage]
        pairs = pair_stage_blocks(vhi - vlo, ahi - alo)
        for v_off, a_off in pairs:
            if a_off is None:
                continue
            vs = v_specs[vlo + v_off]
            as_ = a_specs[alo + a_off]
            sites.append(
                AdapterSite(
                    site_index=len(sites),
                    stage=stage,
                    vis_block=vlo + v_off,
                    aud_block=alo + a_off,
                    vis_dim=vs.dim,
                    aud_dim=as_.dim,
                    vis_tokens=vs.num_tokens,
                    aud_tokens=as_.num_tokens,
                )
            )
    return sites


def pair_stage_blocks(n_vis: int, n_aud: int) -> List[Tuple[int, Optional[int]]]:
    """[(vis_offset, aud_offset-or-None)] pairing within one stage.

    Equal depths pair 1:1; otherwise audio block k rides visual block
    r*k + (r-1) where r = n_vis // n_aud (the reference's hardcoded
    [None, None, a0, None, None, a1, ...] for 18 vs 6)."""
    if n_vis == n_aud:
        return [(i, i) for i in range(n_vis)]
    assert n_vis % n_aud == 0, (n_vis, n_aud)
    r = n_vis // n_aud
    out: List[Tuple[int, Optional[int]]] = []
    for i in range(n_vis):
        out.append((i, i // r if i % r == r - 1 else None))
    return out


class LockstepEncoder(nn.Module):
    """Dual-backbone lock-step encoder with per-site MoE adapters.

    __call__ consumes flattened frame batches:
      wave   (B', L)           - B' = clips * segments
      images (B', H, W, 3)
    and returns (f_v (B', C_v), f_a (B', C_a), telemetry dict).
    """

    swin_cfg: SwinV2Config
    htsat_cfg: HTSATConfig
    moe_cfg: MoEConfig
    injection_cfg: InjectionConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.swin = SwinV2Encoder(self.swin_cfg, dtype=self.dtype, name="swin")
        self.htsat = HTSATEncoder(self.htsat_cfg, dtype=self.dtype, name="htsat")
        self.sites = plan_injection(self.swin_cfg, self.htsat_cfg, self.injection_cfg)

        adapter_cls = MoEAdapter
        if self.swin_cfg.remat:
            from avmoe_tpu.utils.runtime import remat_policy

            # rematerialize adapters together with the backbone blocks
            adapter_cls = nn.remat(
                MoEAdapter, static_argnums=(3,),
                policy=remat_policy(self.swin_cfg.remat_policy))

        def make_adapters(prefix: str, audio_side: bool):
            # vis-side adapters keep their own gate flag: the reference
            # hardcodes use_gate=True there while audio follows is_gate
            # (net_trans_v3.py:604/614, net_avst_v2.py:580/589)
            moe_cfg = self.moe_cfg
            if not audio_side and (moe_cfg.adapter.vis_use_gate
                                   != moe_cfg.adapter.use_gate):
                import dataclasses

                moe_cfg = dataclasses.replace(
                    moe_cfg, adapter=dataclasses.replace(
                        moe_cfg.adapter,
                        use_gate=moe_cfg.adapter.vis_use_gate))
            return [
                adapter_cls(
                    dim=s.aud_dim if audio_side else s.vis_dim,
                    other_dim=s.vis_dim if audio_side else s.aud_dim,
                    num_tokens=s.aud_tokens if audio_side else s.vis_tokens,
                    other_num_tokens=s.vis_tokens if audio_side else s.aud_tokens,
                    cfg=moe_cfg,
                    dtype=self.dtype,
                    name=f"{prefix}_{s.site_index}",
                )
                for s in self.sites
            ]

        inj = self.injection_cfg
        if inj.audio_adapter_p1:
            self.audio_moe_p1 = make_adapters("audio_moe_p1", True)
            self.vis_moe_p1 = make_adapters("vis_moe_p1", False)
        if inj.audio_adapter_p2:
            self.audio_moe_p2 = make_adapters("audio_moe_p2", True)
            self.vis_moe_p2 = make_adapters("vis_moe_p2", False)

    def __call__(
        self,
        wave: jax.Array,
        images: jax.Array,
        *,
        train: bool = False,
        mixup_lambda: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, Dict]:
        """Pooled features: (f_v (B', C_v), f_a (B', C_a), telemetry)."""
        f_v, f_a, telemetry = self.forward_tokens(
            wave, images, train=train, mixup_lambda=mixup_lambda)
        # ref pools visual after final norm, audio without norm (:732-734)
        return f_v.mean(axis=1), f_a.mean(axis=1), telemetry

    def forward_tokens(
        self,
        wave: jax.Array,
        images: jax.Array,
        *,
        train: bool = False,
        mixup_lambda: Optional[jax.Array] = None,
        collect_stages: bool = False,
    ) -> Tuple[jax.Array, jax.Array, Dict]:
        """Token-level outputs: f_v (B', N_last, C_v) after the final visual
        norm, f_a (B', M_last, C_a) un-normed (ref: net_trans_v3.py:732-734);
        AVQA consumes the visual grid for spatial grounding.

        With collect_stages=True, telemetry['stage_tokens'] holds each stage's
        visual tokens BEFORE downsampling (last stage normed) - the AVS
        multi-scale capture (ref: avs_s4/model/PVT_AVSModel_v2.py:873-877)."""
        inj = self.injection_cfg
        stage_tokens: List[jax.Array] = []

        def shard_tokens(x):
            """Sequence-parallel constraint: token axis over the configured
            mesh axis (no-op when unset or no mesh is active)."""
            if inj.token_shard_axis is None:
                return x
            from jax.sharding import PartitionSpec as P

            try:
                return jax.lax.with_sharding_constraint(
                    x, P(None, inj.token_shard_axis, None))
            except Exception:
                return x
        f_v = shard_tokens(self.swin.embed(images))
        f_a = shard_tokens(
            self.htsat.embed(wave, train=train, mixup_lambda=mixup_lambda))

        tele: Dict[str, List] = {"audio_p1": [], "audio_p2": [], "video_p1": [], "video_p2": []}
        lb_losses: List[jax.Array] = []
        site_idx = 0

        def run_adapter(adapters, x, other):
            nonlocal lb_losses
            out, aux = adapters[site_idx](dq(x), dq(other), train)
            if "lb_loss" in aux:
                lb_losses.append(aux["lb_loss"])
            return out, aux

        from avmoe_tpu.ops.swin import use_chunked_attn_state, use_chunked_block

        # Whole-block lax.map chunking (eval): attention + norms + MLP +
        # residuals per window chunk, VMEM-resident. Adapter seams are served
        # by passing the p1 residual into the body and reading back the
        # mid-block state for p2 (the adapter branches are data-parallel with
        # the backbone sub-blocks; see VERDICT round-2 perf notes).
        chunked = (
            use_chunked_block() and not train and not self.is_initializing()
        )
        # Attention-state chunking (eval default): qkv + attention + proj +
        # norm1 + residual (+ p1 delta) in ONE mapped body per block - a
        # single stream output, so none of the whole-block seam regression -
        # while the MLP keeps the efficient full-batch XLA GEMMs.
        attn_state = (
            use_chunked_attn_state() and not chunked
            and not train and not self.is_initializing()
        )
        # int8 stream storage (eval fast path; ops/quant.py): the residual
        # streams live in HBM as int8 + per-token scales between sub-blocks.
        # Chunk bodies and fusing consumers dequantize in VMEM; adapters
        # receive a lazily-dequantized view (XLA duplicates the cheap convert
        # into each consuming fusion). Stage boundaries re-quantize after the
        # downsample GEMM.
        from avmoe_tpu.ops.quant import (
            add_to_stream, dequantize, quantize_stream, use_int8_stream)

        q8 = (use_int8_stream() and not train and not self.is_initializing()
              and not chunked and not attn_state)

        def qs(x):
            return quantize_stream(x) if q8 else x

        def dq(x):
            return dequantize(x, self.dtype) if q8 else x

        f_v = qs(f_v)
        f_a = qs(f_a)

        def v_block(f_v, idx):
            if chunked:
                return self.swin.blocks[idx].chunked_forward(f_v, train=train)
            if attn_state:
                blk = self.swin.blocks[idx]
                mid = blk.chunked_forward(f_v, train=train, part="attn")
                return blk.mlp_state(mid, train)
            return self.swin.blocks[idx](f_v, train)

        def v_part(f_v, idx, part):
            """Apply one visual sub-block (attn|mlp), returning the NEW state
            (x + residual). The attn part routes through attn_state so the
            fused-residual chunk body serves the eval default."""
            blk = self.swin.blocks[idx]
            if part == "attn":
                return blk.attn_state(f_v, train)
            return blk.mlp_state(f_v, train)

        def a_block(f_a, idx):
            if chunked:
                return self.htsat.blocks[idx].chunked_forward(f_a, train=train)
            if attn_state:
                blk = self.htsat.blocks[idx]
                mid = blk.chunked_forward(f_a, train=train, part="attn")
                return blk.mlp_state(mid, train)
            return self.htsat.blocks[idx](f_a, train)

        for stage in range(len(self.swin_cfg.depths)):
            vlo, vhi = self.swin.stage_ranges[stage]
            alo, ahi = self.htsat.stage_ranges[stage]
            skipped = inj.num_skip > 1 and (stage + 1) % inj.num_skip == 0
            for v_off, a_off in pair_stage_blocks(vhi - vlo, ahi - alo):
                blk_v = self.swin.blocks[vlo + v_off]
                blk_a = None if a_off is None else self.htsat.blocks[alo + a_off]
                if blk_a is None:
                    f_v = v_block(f_v, vlo + v_off)
                elif skipped:
                    f_v = v_block(f_v, vlo + v_off)
                    f_a = a_block(f_a, alo + a_off)
                elif chunked:
                    # --- p1: adapters on PRE-block features -------------------
                    f_v_res = None
                    if inj.audio_adapter_p1:
                        f_a_res, aux_a = run_adapter(self.audio_moe_p1, f_a, f_v)
                        f_v_res, aux_v = run_adapter(self.vis_moe_p1, f_v, f_a)
                        tele["audio_p1"].append(aux_a["gating_probs"])
                        tele["video_p1"].append(aux_v["gating_probs"])
                    # whole visual block in one chunked pass; the p1 residual
                    # rides into the body, the post-attention mid state comes
                    # back for the p2 adapters (MLP does not depend on p2)
                    if inj.audio_adapter_p2:
                        mid_v, out_v = blk_v.chunked_forward(
                            f_v, f_v_res, train=train, need_mid=True)
                    else:
                        mid_v = None
                        out_v = blk_v.chunked_forward(f_v, f_v_res, train=train)
                    f_a = a_block(f_a, alo + a_off)
                    if inj.audio_adapter_p1:
                        f_a = f_a + f_a_res
                    # --- p2: adapters on the mid-block visual state -----------
                    if inj.audio_adapter_p2:
                        f_a_res2, aux_a2 = run_adapter(self.audio_moe_p2, f_a, mid_v)
                        f_v_res2, aux_v2 = run_adapter(self.vis_moe_p2, mid_v, f_a)
                        tele["audio_p2"].append(aux_a2["gating_probs"])
                        tele["video_p2"].append(aux_v2["gating_probs"])
                        f_v = out_v + f_v_res2
                        f_a = f_a + f_a_res2
                    else:
                        f_v = out_v
                    site_idx += 1
                elif attn_state:
                    # --- p1: adapters on PRE-block features -------------------
                    f_v_res = None
                    if inj.audio_adapter_p1:
                        f_a_res, aux_a = run_adapter(self.audio_moe_p1, f_a, f_v)
                        f_v_res, aux_v = run_adapter(self.vis_moe_p1, f_v, f_a)
                        tele["audio_p1"].append(aux_a["gating_probs"])
                        tele["video_p1"].append(aux_v["gating_probs"])
                    # attention sub-block + p1 delta in one mapped body
                    f_v = blk_v.chunked_forward(f_v, f_v_res, train=train,
                                                part="attn")
                    f_a = a_block(f_a, alo + a_off)
                    if inj.audio_adapter_p1:
                        f_a = f_a + f_a_res
                    # --- p2: adapters around the visual MLP sub-block ----------
                    if inj.audio_adapter_p2:
                        f_a_res2, aux_a2 = run_adapter(self.audio_moe_p2, f_a, f_v)
                        f_v_res2, aux_v2 = run_adapter(self.vis_moe_p2, f_v, f_a)
                        tele["audio_p2"].append(aux_a2["gating_probs"])
                        tele["video_p2"].append(aux_v2["gating_probs"])
                    f_v = blk_v.mlp_state(f_v, train)
                    if inj.audio_adapter_p2:
                        f_v = f_v + f_v_res2
                        f_a = f_a + f_a_res2
                    site_idx += 1
                else:
                    # --- p1: adapters on PRE-block features -------------------
                    if inj.audio_adapter_p1:
                        f_a_res, aux_a = run_adapter(self.audio_moe_p1, f_a, f_v)
                        f_v_res, aux_v = run_adapter(self.vis_moe_p1, f_v, f_a)
                        tele["audio_p1"].append(aux_a["gating_probs"])
                        tele["video_p1"].append(aux_v["gating_probs"])
                        f_v = v_part(f_v, vlo + v_off, "attn")
                        f_v = add_to_stream(f_v, f_v_res)
                    else:
                        f_v = v_part(f_v, vlo + v_off, "attn")
                    f_a = a_block(f_a, alo + a_off)  # whole audio block between seams
                    if inj.audio_adapter_p1:
                        f_a = add_to_stream(f_a, f_a_res)
                    # --- p2: adapters around the visual MLP sub-block ----------
                    if inj.audio_adapter_p2:
                        f_a_res2, aux_a2 = run_adapter(self.audio_moe_p2, f_a, f_v)
                        f_v_res2, aux_v2 = run_adapter(self.vis_moe_p2, f_v, f_a)
                        tele["audio_p2"].append(aux_a2["gating_probs"])
                        tele["video_p2"].append(aux_v2["gating_probs"])
                    f_v = v_part(f_v, vlo + v_off, "mlp")
                    if inj.audio_adapter_p2:
                        f_v = add_to_stream(f_v, f_v_res2)
                        f_a = add_to_stream(f_a, f_a_res2)
                    site_idx += 1
            if collect_stages:
                is_last = stage == len(self.swin_cfg.depths) - 1
                stage_tokens.append(self.swin.norm(dq(f_v)) if is_last
                                    else dq(f_v))
            if stage < len(self.swin.downsamples):
                f_v = qs(shard_tokens(self.swin.downsamples[stage](dq(f_v))))
            if stage < len(self.htsat.downsamples):
                f_a = qs(shard_tokens(self.htsat.downsamples[stage](dq(f_a))))

        f_v = self.swin.norm(dq(f_v))
        f_a = dq(f_a)

        telemetry = {
            k: jnp.stack(v, axis=0) if v else jnp.zeros((0,)) for k, v in tele.items()
        }
        telemetry["lb_loss"] = (
            jnp.sum(jnp.stack(lb_losses)) if lb_losses else jnp.zeros(())
        )
        if collect_stages:
            telemetry["stage_tokens"] = stage_tokens
        return f_v, f_a, telemetry
