"""AVE training driver: `python -m avmoe_tpu.cli.train_ave [--synthetic] ...`

Replaces the reference's main_trans_v3.py + train.sh combo
(ref: AVMOE/AVE/train.sh hyperparameters; driver flow main_trans_v3.py:234-354):
build model -> partition frozen/trainable -> Adam + StepLR + grad-accum ->
epoch loop with eval, best-checkpoint saving, early stop, expert telemetry.
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.config import AVEConfig, TrainConfig, replace, tiny_ave_config, mini_ave_config
from avmoe_tpu.data.ave import AVEDataset, SyntheticAVEDataset
from avmoe_tpu.data.loader import BatchLoader
from avmoe_tpu.models.ave import AVEModel, make_ave_eval_fn, make_ave_loss_fn
from avmoe_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from avmoe_tpu.train.freeze import param_report
from avmoe_tpu.train.loop import train_and_evaluate
from avmoe_tpu.train.state import create_train_state
from avmoe_tpu.train.steps import make_eval_step, make_train_step
from avmoe_tpu.checkpoint.manager import CheckpointManager
from avmoe_tpu.telemetry.experts import ExpertUsageTracker
from avmoe_tpu.utils import apply_platform_override, enable_compilation_cache, pipelined
from avmoe_tpu.utils.runtime import apply_perf_defaults, apply_precise_mode


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["v3", "v1", "lavish"], default="v3",
                   help="v3: MoE flagship (main_trans_v3); v1: DG-SCT MMIL_Net"
                        " (main_trans); lavish: MMIL_Net_v2 shared-backbone"
                        " baseline (main_trans_lavish)")
    p.add_argument("--mode", choices=["train", "test"], default="train",
                   help="test = restore checkpoint and evaluate (ref test.sh)")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true", help="random AVE-shaped data")
    p.add_argument("--tiny", action="store_true", help="tiny model (CI smoke)")
    p.add_argument("--mini", action="store_true",
                   help="tiny dims + real dataset geometry (dress rehearsal)")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--accum_itr", type=int, default=8)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--lr_mlp", type=float, default=5e-6,
                   help="classifier-head LR (ref train.sh --lr_mlp)")
    p.add_argument("--decay", type=float, default=0.35)
    p.add_argument("--decay_epoch", type=int, default=3)
    p.add_argument("--early_stop", type=int, default=20)
    p.add_argument("--seed", type=int, default=999)
    p.add_argument("--model_save_dir", type=str, default="checkpoints/ave")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint (full train state incl. "
                        "optimizer and step) before training")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--precise", action="store_true",
                   help="exact numerics: fp32 attention logits + erf GELU"
                        " (default: measured-best perf toggles, see"
                        " utils.runtime.PERF_DEFAULTS)")
    return p.parse_args()


def main():
    apply_platform_override()
    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s", force=True)
    args = parse_args()
    # measured-best perf toggles (setdefault: exported env wins); must
    # run before the first model trace
    apply_perf_defaults()
    if args.precise:
        apply_precise_mode()
    cfg = mini_ave_config() if args.mini else tiny_ave_config() if args.tiny else AVEConfig()
    tcfg = TrainConfig(
        batch_size=args.batch_size, accum_steps=args.accum_itr, epochs=args.epochs,
        lr=args.lr, lr_mlp=args.lr_mlp, decay=args.decay, decay_epoch=args.decay_epoch,
        early_stop=args.early_stop, seed=args.seed,
    )

    if args.synthetic or args.data_root is None:
        train_ds = SyntheticAVEDataset(
            length=8 * args.batch_size, num_segments=cfg.num_segments,
            audio_len=cfg.audio_len, img_size=cfg.swin.img_size,
            num_classes=cfg.num_classes,
        )
        val_ds = SyntheticAVEDataset(
            length=2 * args.batch_size, num_segments=cfg.num_segments,
            audio_len=cfg.audio_len, img_size=cfg.swin.img_size,
            num_classes=cfg.num_classes, seed=1,
        )
    else:
        train_ds = AVEDataset(args.data_root, "train", img_size=cfg.swin.img_size)
        val_ds = AVEDataset(args.data_root, "test", img_size=cfg.swin.img_size)

    if args.model == "lavish":
        # MMIL_Net_v2 consumes kaldi-fbank images through the shared swin
        # backbone; spectrogram side length = the swin input size
        from avmoe_tpu.data.ave import LAVisHView
        sr = cfg.htsat.frontend.sample_rate
        train_ds = LAVisHView(train_ds, sample_rate=sr, size=cfg.swin.img_size)
        val_ds = LAVisHView(val_ds, sample_rate=sr, size=cfg.swin.img_size)

    mesh = make_mesh()
    put = lambda b: shard_batch(b, mesh)
    train_loader = BatchLoader(train_ds, tcfg.batch_size, shuffle=True,
                               num_workers=args.num_workers, seed=tcfg.seed,
                               device_put=put)
    val_loader = BatchLoader(val_ds, tcfg.batch_size, shuffle=False,
                             drop_last=False,  # eval covers every sample
                             num_workers=args.num_workers, device_put=put)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    sample = train_ds[0]
    init_rngs = {"params": jax.random.PRNGKey(tcfg.seed),
                 "dropout": jax.random.PRNGKey(1), "specaug": jax.random.PRNGKey(2)}
    if args.model == "v3":
        model = AVEModel(cfg, dtype=dtype)
        loss_fn, eval_fn = make_ave_loss_fn(model), make_ave_eval_fn(model)
        a_key = "wave"
    elif args.model == "v1":
        from avmoe_tpu.metrics.ave import ave_accuracy
        from avmoe_tpu.models.ave_legacy import MMILNetV1, make_mmil_v1_loss_fn

        model = MMILNetV1(cfg, dtype=dtype)
        loss_fn = make_mmil_v1_loss_fn(model)

        def eval_fn(variables, batch):
            out = model.apply(variables, batch["wave"], batch["images"],
                              train=False)
            return {"accuracy": ave_accuracy(
                out["is_event_logits"], out["event_logits"], batch["labels"]),
                "telemetry": out["telemetry"]}
        a_key = "wave"
    else:
        from avmoe_tpu.models.ave_legacy import MMILNetV2, make_mmil_v2_loss_fn

        model = MMILNetV2(cfg, dtype=dtype)
        loss_fn = make_mmil_v2_loss_fn(model)

        def eval_fn(variables, batch):
            out = model.apply(variables, batch["audio_spec"], batch["images"],
                              train=False)
            gt = batch["labels"].reshape(-1, batch["labels"].shape[-1])
            acc = (jnp.argmax(out["event_probs"], -1)
                   == jnp.argmax(gt, -1)).mean()
            return {"accuracy": acc, "telemetry": out["telemetry"]}
        a_key = "audio_spec"
    variables = jax.jit(lambda r, w, im: model.init(r, w, im, train=True))(
        init_rngs,
        jnp.asarray(sample[a_key][None]),
        jnp.asarray(sample["images"][None]),
    )
    report = param_report(variables["params"])
    logging.info("params: trainable %.4f%% additional %.4f%% total %.1fM",
                 report["trainable_pct"], report["additional_pct"],
                 report["total"] / 1e6)

    state = create_train_state(model, variables, tcfg,
                               steps_per_epoch=len(train_loader))
    state = replicate(state, mesh)

    train_step = make_train_step(loss_fn)
    eval_step = make_eval_step(eval_fn)
    ckpts = CheckpointManager(args.model_save_dir)
    tracker = ExpertUsageTracker(cfg.moe.num_experts)

    if args.resume and ckpts.latest_step() is not None:
        state = ckpts.restore(state)
        logging.info("resumed from step %d", int(state.step))

    if args.mode == "test":
        # restore best checkpoint and evaluate (ref: main_trans_v3.py:349-354)
        state = ckpts.restore(state, params_only=True)
        accs = []
        # double-buffered dispatch: batch i's host readback overlaps batch
        # i+1/i+2 on device (the per-batch sync costs a ~45 ms tunnel RTT)
        for _, metrics in pipelined(lambda b: eval_step(state, b), val_loader):
            tracker.update(metrics.pop("telemetry", {}))
            accs.append(float(metrics["accuracy"]))
        tracker.save(args.model_save_dir)
        logging.info("test accuracy: %.2f over %d batches",
                     float(np.mean(accs)), len(accs))
        return

    state, best = train_and_evaluate(
        state=state, train_step=train_step, eval_step=eval_step,
        train_loader=train_loader, eval_loader=val_loader,
        epochs=tcfg.epochs, seed=tcfg.seed, early_stop=tcfg.early_stop,
        checkpoints=ckpts, expert_tracker=tracker,
    )
    tracker.save(args.model_save_dir)
    logging.info("best val accuracy: %.2f", best)


if __name__ == "__main__":
    main()
