"""int8 stream storage accuracy go/no-go (AVMOE_INT8_STREAM; ops/quant.py).

Two measurements, written for the round-4 verdict artifact:

1. ACTIVATION ERROR at full model size: the flagship AVE eval forward
   (Swin-V2-L + HTS-AT + 48 MoE adapters, random converter-scale init) run
   with the bf16 fast path vs the same path + int8 streams, on identical
   inputs. Reports relative logit error and segment top-1 agreement.
   (fp32-vs-bf16 is also reported as the noise floor already accepted by
   the bf16 fast path.)

2. TASK-METRIC DELTA on a trainable tiny config: train the synthetic
   class-correlated AVE task (tools/learning_sanity.py recipe; frozen
   random backbones, adapters+heads learn), then evaluate the SAME trained
   params with and without int8 streams - the deployment scenario (train
   bf16, serve int8). Reports accuracy with each path.

Usage: python tools/int8_accuracy.py [--tiny] [--skip-train] [--epochs N]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def activation_error(tiny: bool) -> dict:
    from avmoe_tpu.config import AVEConfig, tiny_ave_config
    from avmoe_tpu.models.ave import AVEModel

    cfg = tiny_ave_config() if tiny else AVEConfig()
    model = AVEModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    B, T = 2, cfg.num_segments
    wave = jnp.asarray(rng.randn(B, T, cfg.audio_len).astype(np.float32) * 0.1)
    imgs = jnp.asarray(rng.rand(
        B, T, cfg.swin.img_size, cfg.swin.img_size, 3).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), wave[:1], imgs[:1])

    def run():
        out = jax.jit(lambda v, w, i: model.apply(v, w, i, train=False))(
            variables, wave, imgs)
        return np.asarray(out["event_logits"], np.float32)

    prior = os.environ.get("AVMOE_INT8_STREAM")
    try:
        os.environ["AVMOE_INT8_STREAM"] = "0"
        ref = run()
        os.environ["AVMOE_INT8_STREAM"] = "1"
        got = run()
    finally:
        if prior is None:
            os.environ.pop("AVMOE_INT8_STREAM", None)
        else:
            os.environ["AVMOE_INT8_STREAM"] = prior

    scale = np.abs(ref).max()
    rel = np.abs(got - ref) / max(scale, 1e-9)
    agree = float((got.argmax(-1) == ref.argmax(-1)).mean())
    res = {"logit_rel_err_max": float(rel.max()),
           "logit_rel_err_mean": float(rel.mean()),
           "segment_top1_agreement": agree}
    print(f"[activation] size={'tiny' if tiny else 'full'} "
          f"rel_err max {res['logit_rel_err_max']:.4f} "
          f"mean {res['logit_rel_err_mean']:.5f} "
          f"top1 agree {agree * 100:.1f}%", flush=True)
    return res


def task_metric_delta(epochs: int) -> dict:
    from avmoe_tpu.config import TrainConfig, replace, tiny_ave_config
    from avmoe_tpu.data.ave import SyntheticAVEDataset
    from avmoe_tpu.data.loader import BatchLoader
    from avmoe_tpu.models.ave import AVEModel, make_ave_loss_fn
    from avmoe_tpu.train.state import create_train_state
    from avmoe_tpu.train.steps import make_train_step

    num_classes = 4
    cfg = replace(tiny_ave_config(), num_classes=num_classes)
    tcfg = TrainConfig(batch_size=4, accum_steps=1, lr=2e-3)
    ds = SyntheticAVEDataset(
        length=32, num_segments=cfg.num_segments, audio_len=cfg.audio_len,
        img_size=cfg.swin.img_size, num_classes=num_classes, learnable=True,
        sample_rate=cfg.htsat.frontend.sample_rate)
    model = AVEModel(cfg)
    loader = BatchLoader(ds, 4, shuffle=True, num_workers=2, seed=0)
    sample = ds[0]
    variables = jax.jit(lambda r, w, im: model.init(r, w, im, train=True))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "specaug": jax.random.PRNGKey(2)},
        jnp.asarray(sample["wave"][None]), jnp.asarray(sample["images"][None]))
    state = create_train_state(model, variables, tcfg, len(loader))
    step = make_train_step(make_ave_loss_fn(model, mixup_alpha=0.0))
    rng = jax.random.PRNGKey(0)
    for epoch in range(epochs):
        for batch in loader:
            rng, k = jax.random.split(rng)
            state, m = step(state, {k2: jnp.asarray(v) for k2, v in batch.items()}, k)
        if epoch % 10 == 0:
            print(f"[task] epoch {epoch}: loss {float(m['loss']):.3f} "
                  f"acc {float(m['accuracy']):.1f}", flush=True)

    eval_vars = {"params": state.params, "batch_stats": state.batch_stats}

    def eval_acc():
        from avmoe_tpu.metrics.ave import ave_accuracy

        fwd = jax.jit(lambda v, w, i: model.apply(v, w, i, train=False))
        accs, weights = [], []
        for batch in BatchLoader(ds, 4, shuffle=False, num_workers=0):
            out = fwd(eval_vars, jnp.asarray(batch["wave"]),
                      jnp.asarray(batch["images"]))
            acc = ave_accuracy(out["is_event_logits"], out["event_logits"],
                               jnp.asarray(batch["labels"]))
            accs.append(float(acc))
            weights.append(len(batch["labels"]))
        return float(np.average(accs, weights=weights))

    prior = os.environ.get("AVMOE_INT8_STREAM")
    try:
        os.environ["AVMOE_INT8_STREAM"] = "0"
        acc_bf16 = eval_acc()
        os.environ["AVMOE_INT8_STREAM"] = "1"
        acc_int8 = eval_acc()
    finally:
        if prior is None:
            os.environ.pop("AVMOE_INT8_STREAM", None)
        else:
            os.environ["AVMOE_INT8_STREAM"] = prior
    print(f"[task] trained synthetic AVE acc: bf16 {acc_bf16:.1f}% "
          f"int8-stream {acc_int8:.1f}% (delta {acc_int8 - acc_bf16:+.1f})",
          flush=True)
    return {"acc_bf16": acc_bf16, "acc_int8": acc_int8}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()
    activation_error(args.tiny)
    if not args.skip_train:
        task_metric_delta(args.epochs)


if __name__ == "__main__":
    main()
