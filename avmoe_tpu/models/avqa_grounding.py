"""AVQA stage A: grounding-gen pretraining model.

Re-creation of AVQA_AVatt_Grounding (ref: AVMOE/AVQA/grounding_gen/
nets_grd_gen.py:39-170): FROZEN Swin-V2 + HTS-AT full forwards (no adapters),
audio-guided spatial grounding and a pos/neg matching head. Its trained
fc_a1/fc_a2/fc_gl/fc1..fc4 weights are handed to the main AVQA model
(checkpoint surgery ref: main_avst_v2.py:339-351) via
CheckpointManager.load_partial with a rename map.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from avmoe_tpu.backbones.htsat import HTSATEncoder
from avmoe_tpu.backbones.swin_v2 import SwinV2Encoder
from avmoe_tpu.config import AVQAConfig


class AVQAGroundingModel(nn.Module):
    cfg: AVQAConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        d = c.d_feat
        self.swin = SwinV2Encoder(c.swin, dtype=self.dtype, name="swin")
        self.htsat = HTSATEncoder(c.htsat, dtype=self.dtype, name="htsat")
        self.fc_a1 = nn.Dense(d, name="fc_a1")
        self.fc_a2 = nn.Dense(d, name="fc_a2")
        self.fc_gl = nn.Dense(d, name="fc_gl")
        self.match_mlp = [
            nn.Dense(512, name="fc1"), nn.Dense(256, name="fc2"),
            nn.Dense(128, name="fc3"), nn.Dense(2, name="fc4"),
        ]

    def _ground_and_match(self, audio_feat, grid):
        before = grid.mean(axis=1)
        v = grid / jnp.maximum(jnp.linalg.norm(grid, axis=-1, keepdims=True), 1e-12)
        a = audio_feat / jnp.maximum(
            jnp.linalg.norm(audio_feat, axis=-1, keepdims=True), 1e-12)
        att = jax.nn.softmax(jnp.einsum("bpc,bc->bp", v, a), axis=-1)
        after = jnp.einsum("bp,bpc->bc", att, v)
        grd = self.fc_gl(jnp.tanh(jnp.concatenate([before, after], axis=-1)))
        feat = jnp.concatenate([audio_feat, grd], axis=-1)
        for i, layer in enumerate(self.match_mlp):
            feat = layer(feat)
            if i < len(self.match_mlp) - 1:
                feat = nn.relu(feat)
        return feat

    def __call__(
        self,
        wave: jax.Array,     # (B, L) one segment per sample
        posi: jax.Array,     # (B, H, W, 3)
        nega: jax.Array,     # (B, H, W, 3)
        *,
        train: bool = False,
    ) -> Dict:
        # Frozen backbones: gradients blocked at the feature boundary, but
        # the modules run in the CALLER's train mode — the reference's
        # stage-1 loop calls model.train() with requires_grad=False on
        # swin/htsat (main_grd_gen.py:30,271-275 + nets_grd_gen.py:125-146),
        # so bn0 normalizes with BATCH stats (and updates its running
        # stats) during pretraining. The final htsat norm is skipped, as in
        # the reference path (nets_grd_gen.py:141-157 loops layers only).
        f_a = jax.lax.stop_gradient(
            self.htsat.forward_features(self.htsat.embed(wave, train=train),
                                        train=train)).mean(axis=1)
        grids = []
        for imgs in (posi, nega):
            g = jax.lax.stop_gradient(
                self.swin.forward_features(self.swin.embed(imgs), train=train))
            grids.append(g)

        audio_feat = self.fc_a2(nn.relu(self.fc_a1(f_a)))
        out_posi = self._ground_and_match(audio_feat, grids[0])
        out_nega = self._ground_and_match(audio_feat, grids[1])
        return {"match_posi": out_posi, "match_nega": out_nega}


def make_grounding_loss_fn(model: AVQAGroundingModel):
    """CE over interleaved posi(1)/nega(0) pairs (ref: main_grd_gen.py:29-130)."""
    import optax

    def loss_fn(variables, batch, rngs):
        out, upd = model.apply(
            variables, batch["wave"], batch["posi"], batch["nega"],
            train=True, rngs=rngs, mutable=["batch_stats"],
        )
        logits = jnp.concatenate([out["match_posi"], out["match_nega"]], axis=0)
        labels = jnp.concatenate([
            jnp.ones(out["match_posi"].shape[0], jnp.int32),
            jnp.zeros(out["match_nega"].shape[0], jnp.int32)])
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        acc = (jnp.argmax(logits, -1) == labels).mean() * 100.0
        return loss, ({"accuracy": acc}, upd.get("batch_stats", {}))

    return loss_fn
