"""Diagnose train-mode forward divergence for the curve-parity test.

Compares, at converted identical weights:
  1. torch eval() vs ours train=False (sanity: should match - known parity)
  2. torch train() vs ours train=True (the failing case), with intermediate
     hooks on the pooled features entering temporal_attn to localize.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tests/diag_train_mode.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["AVMOE_DETERMINISTIC_TRAIN"] = "1"

import numpy as np
import torch

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


class MP:
    """minimal monkeypatch stand-in for direct runs"""
    def setattr(self, obj, name, val, raising=True):
        setattr(obj, name, val)
    def setenv(self, k, v):
        os.environ[k] = v


def main():
    from test_reference_parity import make_tiny_ref_mmil
    from test_training_parity import _zero_torch_stochastic
    from avmoe_tpu.checkpoint.convert import (
        convert_mmil_net, torch_state_dict_to_numpy)
    from avmoe_tpu.config import replace, tiny_ave_config
    from avmoe_tpu.models.ave import AVEModel

    cfg = replace(tiny_ave_config(), d_model=256)
    model_t = make_tiny_ref_mmil(MP(), cfg)
    _zero_torch_stochastic(model_t)

    B, T = 2, 10
    rng = np.random.RandomState(7)
    wave = (rng.randn(B, T, cfg.audio_len) * 0.1).astype(np.float32)
    imgs = rng.rand(B, T, cfg.swin.img_size, cfg.swin.img_size, 3).astype(np.float32)

    params, batch_stats = convert_mmil_net(
        torch_state_dict_to_numpy(model_t.state_dict()),
        n_sites=8, swin_depths=cfg.swin.depths, htsat_depths=cfg.htsat.depths)
    variables = {"params": params, "batch_stats": batch_stats}
    ave = AVEModel(cfg)

    pooled = {}
    model_t.temporal_attn.register_forward_hook(
        lambda m, inp, out: pooled.update(fv=inp[0].detach().clone(),
                                          fa=inp[1].detach().clone()))

    wave_t = torch.from_numpy(wave)
    imgs_t = torch.from_numpy(imgs.transpose(0, 1, 4, 2, 3).copy())

    def run_torch(train):
        model_t.train(train)
        with torch.no_grad():
            is_e, ev, av, _ = model_t([wave_t], imgs_t)
        return (is_e.detach().numpy(), ev.detach().numpy(), av.detach().numpy(),
                pooled["fv"].numpy().copy(), pooled["fa"].numpy().copy())

    def run_jax(train):
        def f(v, w, im):
            if train:
                out, _ = ave.apply(v, w, im, train=True,
                                   rngs={"dropout": jax.random.PRNGKey(0),
                                         "specaug": jax.random.PRNGKey(1)},
                                   mutable=["batch_stats"])
            else:
                out = ave.apply(v, w, im, train=False)
            return out["is_event_logits"], out["event_logits"], out["av_score"]

        def enc(v, w, im):
            kw = {}
            if train:
                kw = dict(rngs={"dropout": jax.random.PRNGKey(0),
                                "specaug": jax.random.PRNGKey(1)},
                          mutable=["batch_stats"])
            r = ave.apply(v, w.reshape(B * T, -1),
                          im.reshape((B * T,) + im.shape[2:]), train=train,
                          method=lambda m, w_, im_, train: m.encoder(
                              w_, im_, train=train), **kw)
            return r[0] if train else r

        out = jax.jit(f)(variables, jnp.asarray(wave), jnp.asarray(imgs))
        fv, fa, _ = jax.jit(enc)(variables, jnp.asarray(wave), jnp.asarray(imgs))
        return tuple(np.asarray(x, np.float32) for x in out) + (
            np.asarray(fv, np.float32), np.asarray(fa, np.float32))

    for train in (False, True):
        rt = run_torch(train)
        rj = run_jax(train)
        names = ["is_event", "event", "av", "pooled_fv", "pooled_fa"]
        print(f"--- train={train}")
        for n, t, j in zip(names, rt, rj):
            t = np.asarray(t, np.float32)
            if n == "is_event":
                t = np.squeeze(t, -1).T if t.ndim == 3 else t
            if n.startswith("pooled"):
                t = t.reshape(j.shape)
            err = np.max(np.abs(t - j)) / max(np.max(np.abs(t)), 1e-9)
            print(f"  {n:10s} rel_err {err:.5f} (|ref| max {np.max(np.abs(t)):.3f})",
                  flush=True)


if __name__ == "__main__":
    main()
