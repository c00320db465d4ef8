"""Legacy AVE models: the pre-MoE generations the reference ships alongside
the v3 flagship.

  * MMILNetV1 - DG-SCT single adapters (dual-guided channel+spatial
    attention) woven through the Swin-V2 x HTS-AT lock-step, spatial-
    attention-map pooling, TemporalAttention + CMBS head
    (ref: AVMOE/AVE/nets/net_trans.py:809-1048, driver main_trans.py).
  * MMILNetV2 - the LAVisH baseline: ONE shared Swin-V2 backbone consumes
    both modalities (audio as a 3-channel kaldi-fbank image), latent-token
    LAVisH adapters at every block, mean-pool + concat + 2-layer classifier
    (ref: net_trans.py:1051-1241, driver main_trans_lavish.py).

Both reuse the frozen backbone encoders, the injection-plan geometry and the
adapter bottleneck machinery of the v3 path; only the adapter flavor and the
head differ.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.backbones.htsat import HTSATEncoder
from avmoe_tpu.backbones.swin_v2 import SwinV2Encoder
from avmoe_tpu.config import AdapterConfig, AVEConfig, SwinV2Config
from avmoe_tpu.heads.ave import CMBSHead, TemporalAttention
from avmoe_tpu.moe.adapter import _Bottleneck
from avmoe_tpu.moe.dgsct_adapter import DGSCTAdapter
from avmoe_tpu.moe.injection import pair_stage_blocks, plan_injection


class LAVisHAdapter(nn.Module):
    """LAVisH adapter (ref: net_trans.py:668-807 VisualAdapter_lavish):
    latent-token cross attention into the other modality (same dims - both
    streams share one backbone) followed by the grouped bottleneck. No
    channel/spatial guidance (that is the DG-SCT addition)."""

    dim: int
    cfg: AdapterConfig
    use_gate: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, other: jax.Array, *,
                 train: bool = False) -> jax.Array:
        B, N, C = x.shape
        T = self.cfg.num_tokens
        # torch.rand init (net_trans.py:689)
        tokens = self.param("latent_tokens", nn.initializers.uniform(scale=1.0),
                            (T, C))
        gate_av = self.param("gate_av", nn.initializers.zeros, (1,))
        rep = jnp.broadcast_to(tokens[None], (B, T, C)).astype(self.dtype)
        ot = other.astype(self.dtype)
        a1 = jax.nn.softmax(jnp.einsum("btc,bmc->btm", rep, ot), axis=-1)
        rep = rep + jnp.einsum("btm,bmc->btc", a1, ot)
        a2 = jax.nn.softmax(jnp.einsum("bnc,btc->bnt", x.astype(self.dtype),
                                       rep), axis=-1)
        x = x + gate_av * jnp.einsum("bnt,btc->bnc", a2, rep)

        if self.cfg.before_layernorm:
            x = nn.LayerNorm(epsilon=1e-5, name="ln_before")(x)
        out = _Bottleneck(self.dim, self.cfg, use_activation=True,
                          dtype=self.dtype, name="bottleneck")(x, train=train)
        if self.cfg.post_layernorm:
            out = nn.LayerNorm(epsilon=1e-5, name="ln_post")(out)
        if self.use_gate:
            out = self.param("gate", nn.initializers.zeros, (1,)) * out
        return out


class DGSCTLockstepEncoder(nn.Module):
    """Swin-V2 x HTS-AT lock-step with ONE DG-SCT adapter per site (the
    MMIL_Net v1 fabric; the MoE LockstepEncoder generalizes this to expert
    mixtures). Every stage is adapted (no num_skip scan in the v1 ctor,
    ref: net_trans.py:905-944), and the LAST p2 adapters' spatial attention
    maps pool the final streams (ref: :1029-1032)."""

    swin_cfg: SwinV2Config
    htsat_cfg: object
    adapter_cfg: AdapterConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        import dataclasses

        from avmoe_tpu.config import InjectionConfig

        self.swin = SwinV2Encoder(self.swin_cfg, dtype=self.dtype, name="swin")
        self.htsat = HTSATEncoder(self.htsat_cfg, dtype=self.dtype, name="htsat")
        self.sites = plan_injection(self.swin_cfg, self.htsat_cfg,
                                    InjectionConfig(num_skip=1))
        a_cfg = self.adapter_cfg
        # vis adapters hardcode use_gate=True; audio follows is_gate
        # (net_trans.py:913/921)
        vis_cfg = dataclasses.replace(a_cfg, use_gate=True)

        def make(prefix, audio_side):
            cfg = a_cfg if audio_side else vis_cfg
            return [
                DGSCTAdapter(
                    dim=s.aud_dim if audio_side else s.vis_dim,
                    other_dim=s.vis_dim if audio_side else s.aud_dim,
                    num_tokens=s.aud_tokens if audio_side else s.vis_tokens,
                    other_num_tokens=s.vis_tokens if audio_side else s.aud_tokens,
                    cfg=cfg, tokens_init="uniform", dtype=self.dtype,
                    name=f"{prefix}_{s.site_index}")
                for s in self.sites
            ]

        self.audio_adapter_p1 = make("audio_adapter_p1", True)
        self.vis_adapter_p1 = make("vis_adapter_p1", False)
        self.audio_adapter_p2 = make("audio_adapter_p2", True)
        self.vis_adapter_p2 = make("vis_adapter_p2", False)

    def __call__(self, wave, images, *, train: bool = False,
                 mixup_lambda: Optional[jax.Array] = None):
        """(f_v (B',1,C_v) s-map pooled, f_a (B',1,C_a) s-map pooled)."""
        f_v = self.swin.embed(images)
        f_a = self.htsat.embed(wave, train=train, mixup_lambda=mixup_lambda)

        site = 0
        v_maps = a_maps = None
        for stage in range(len(self.swin_cfg.depths)):
            vlo, vhi = self.swin.stage_ranges[stage]
            alo, ahi = self.htsat.stage_ranges[stage]
            for v_off, a_off in pair_stage_blocks(vhi - vlo, ahi - alo):
                blk_v = self.swin.blocks[vlo + v_off]
                if a_off is None:
                    f_v = blk_v(f_v, train)
                    continue
                blk_a = self.htsat.blocks[alo + a_off]
                f_a_res, a_maps = self.audio_adapter_p1[site](f_a, f_v,
                                                              train=train)
                f_v_res, v_maps = self.vis_adapter_p1[site](f_v, f_a,
                                                            train=train)
                f_v = blk_v.attn_state(f_v, train) + f_v_res
                f_a = blk_a(f_a, train) + f_a_res
                f_a_res, a_maps = self.audio_adapter_p2[site](f_a, f_v,
                                                              train=train)
                f_v_res, v_maps = self.vis_adapter_p2[site](f_v, f_a,
                                                            train=train)
                f_v = blk_v.mlp_state(f_v, train) + f_v_res
                f_a = f_a + f_a_res
                site += 1
            if stage < len(self.swin.downsamples):
                f_v = self.swin.downsamples[stage](f_v)
            if stage < len(self.htsat.downsamples):
                f_a = self.htsat.downsamples[stage](f_a)

        f_v = self.swin.norm(f_v)
        # spatial-attention pooling with the LAST p2 adapters' maps
        # (ref: net_trans.py:1029-1032; audio stream stays un-normed)
        f_v = jnp.einsum("bon,bnc->boc", v_maps.astype(f_v.dtype), f_v)
        f_a = jnp.einsum("bon,bnc->boc", a_maps.astype(f_a.dtype), f_a)
        return f_v, f_a


class MMILNetV1(nn.Module):
    """MMIL_Net (v1): DG-SCT encoder + TemporalAttention + CMBS
    (ref: net_trans.py:809-1048). Same I/O contract as AVEModel."""

    cfg: AVEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = DGSCTLockstepEncoder(
            c.swin, c.htsat, c.moe.adapter, dtype=self.dtype, name="encoder")
        self.temporal_attn = TemporalAttention(
            video_input_dim=c.swin.num_features,
            audio_input_dim=c.htsat.num_features,
            d_model=c.d_model, name="temporal_attn")
        self.cmbs = CMBSHead(num_classes=c.num_classes, d_model=c.d_model,
                             inter=c.is_inter_in_cmbs, name="cmbs")

    def __call__(self, wave, images, *, train: bool = False,
                 mixup_lambda: Optional[jax.Array] = None) -> Dict:
        B, T = wave.shape[0], wave.shape[1]
        f_v, f_a = self.encoder(
            wave.reshape(B * T, -1),
            images.reshape((B * T,) + images.shape[2:]),
            train=train, mixup_lambda=mixup_lambda)
        f_v = f_v.reshape(B, T, -1)
        f_a = f_a.reshape(B, T, -1)
        visual, audio, av_gate = self.temporal_attn(f_v, f_a, train=train)
        is_event_logits, event_logits, av_score = self.cmbs(
            visual, audio, train=train)
        return {
            "is_event_logits": is_event_logits,
            "event_logits": event_logits,
            "av_score": av_score,
            # (B, T) gate values; the reference driver feeds these sigmoid
            # OUTPUTS to BCEWithLogitsLoss (main_trans.py:121) - kept verbatim
            "av_gate": av_gate[..., 0],
            "telemetry": {},
        }


class MMILNetV2(nn.Module):
    """MMIL_Net_v2 - the LAVisH baseline (ref: net_trans.py:1051-1241).

    One shared (frozen) Swin-V2 backbone for both modalities; the audio
    input is a kaldi-fbank spectrogram image (B, T, S, S) repeated to 3
    channels. LAVisH adapters p1/p2 at every block; mean-pool + concat +
    Linear(2C->512)->Linear(512->num_classes+1), softmax output (the driver
    then applies BCEWithLogitsLoss ON the softmax - replicated faithfully in
    make_mmil_v2_loss_fn)."""

    cfg: AVEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.swin = SwinV2Encoder(c.swin, dtype=self.dtype, name="swin")
        n_blocks = sum(c.swin.depths)
        a_cfg = c.moe.adapter

        def make(prefix, use_gate_flag):
            from avmoe_tpu.backbones.geometry import swin_stage_specs

            specs = swin_stage_specs(
                c.swin.embed_dim, c.swin.depths, c.swin.num_heads,
                c.swin.patches_resolution, c.swin.window_size)
            return [LAVisHAdapter(dim=specs[i].dim, cfg=a_cfg,
                                  use_gate=use_gate_flag, dtype=self.dtype,
                                  name=f"{prefix}_{i}")
                    for i in range(n_blocks)]

        self.audio_adapter_p1 = make("audio_adapter_p1", a_cfg.use_gate)
        self.vis_adapter_p1 = make("vis_adapter_p1", True)
        self.audio_adapter_p2 = make("audio_adapter_p2", a_cfg.use_gate)
        self.vis_adapter_p2 = make("vis_adapter_p2", True)
        self.mlp_class = nn.Dense(512, name="mlp_class")
        self.mlp_class_2 = nn.Dense(c.num_classes + 1, name="mlp_class_2")

    def __call__(self, audio_spec, images, *, train: bool = False) -> Dict:
        """audio_spec (B, T, S, S) fbank images; images (B, T, S, S, 3)."""
        B, T = audio_spec.shape[0], audio_spec.shape[1]
        spec = audio_spec.reshape((B * T,) + audio_spec.shape[2:])
        spec = jnp.repeat(spec[..., None], 3, axis=-1)
        imgs = images.reshape((B * T,) + images.shape[2:])

        f_v = self.swin.embed(imgs)
        f_a = self.swin.embed(spec)

        idx = 0
        for stage in range(len(self.cfg.swin.depths)):
            lo, hi = self.swin.stage_ranges[stage]
            for b in range(lo, hi):
                blk = self.swin.blocks[b]
                f_a_res = self.audio_adapter_p1[idx](f_a, f_v, train=train)
                f_v_res = self.vis_adapter_p1[idx](f_v, f_a, train=train)
                f_v = blk.attn_state(f_v, train) + f_v_res
                f_a = blk.attn_state(f_a, train) + f_a_res
                f_a_res = self.audio_adapter_p2[idx](f_a, f_v, train=train)
                f_v_res = self.vis_adapter_p2[idx](f_v, f_a, train=train)
                f_v = blk.mlp_state(f_v, train) + f_v_res
                f_a = blk.mlp_state(f_a, train) + f_a_res
                idx += 1
            if stage < len(self.swin.downsamples):
                f_v = self.swin.downsamples[stage](f_v)
                f_a = self.swin.downsamples[stage](f_a)

        f_v = self.swin.norm(f_v).mean(axis=1)
        f_a = self.swin.norm(f_a).mean(axis=1)
        out_av = jnp.concatenate([f_v, f_a], axis=-1)
        p_av = self.mlp_class_2(self.mlp_class(out_av))
        # the reference softmaxes the logits before its BCEWithLogitsLoss
        # (net_trans.py:1171-1173) - replicate, exposing both
        return {"event_probs": jax.nn.softmax(p_av, axis=-1),
                "event_logits": p_av, "telemetry": {}}


def make_mmil_v1_loss_fn(model: MMILNetV1, mixup_alpha: float = 0.5):
    """The v1 driver's composite loss (main_trans.py:118-127):
    BCE(is_event) + BCE(gate) + CE(event) + CE(cas)."""
    from avmoe_tpu.losses.ave import ave_labels, ave_loss
    from avmoe_tpu.losses.classification import binary_cross_entropy_with_logits
    from avmoe_tpu.metrics.ave import ave_accuracy

    def loss_fn(variables, batch, rngs):
        mixup_lambda = batch.get("mixup_lambda")
        if mixup_lambda is None and mixup_alpha > 0 and "mixup" in rngs:
            B, T = batch["wave"].shape[0], batch["wave"].shape[1]
            mixup_lambda = jax.random.beta(
                rngs["mixup"], mixup_alpha, mixup_alpha, (B * T,)
            ).astype(jnp.float32)
        model_rngs = {k: v for k, v in rngs.items() if k != "mixup"}
        out, upd = model.apply(
            variables, batch["wave"], batch["images"], train=True,
            mixup_lambda=mixup_lambda, rngs=model_rngs,
            mutable=["batch_stats"])
        loss, aux = ave_loss(out, batch["labels"], 0.0)
        labels_bce, _ = ave_labels(batch["labels"])
        loss_gate = binary_cross_entropy_with_logits(out["av_gate"], labels_bce)
        loss = loss + loss_gate
        aux["loss_gate"] = loss_gate
        aux["accuracy"] = ave_accuracy(
            out["is_event_logits"], out["event_logits"], batch["labels"])
        return loss, (aux, upd.get("batch_stats", {}))

    return loss_fn


def make_mmil_v2_loss_fn(model: MMILNetV2):
    """LAVisH driver loss (main_trans_lavish.py:106): BCEWithLogits applied
    to the SOFTMAXED class scores vs the flattened (B*T, cls) one-hot GT."""
    import optax

    def loss_fn(variables, batch, rngs):
        out, upd = model.apply(
            variables, batch["audio_spec"], batch["images"], train=True,
            rngs=rngs, mutable=["batch_stats"])
        gt = batch["labels"].reshape(-1, batch["labels"].shape[-1])
        loss = optax.sigmoid_binary_cross_entropy(
            out["event_probs"].astype(jnp.float32), gt).mean()
        acc = (jnp.argmax(out["event_probs"], -1) == jnp.argmax(gt, -1)
               ).mean()
        return loss, ({"accuracy": acc}, upd.get("batch_stats", {}))

    return loss_fn
