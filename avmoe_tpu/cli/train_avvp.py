"""AVVP training driver (ref: AVMOE/AVVP/train.sh + main.py:255-536).

`python -m avmoe_tpu.cli.train_avvp [--synthetic|--data_root ...]`
Evaluates with the segment/event-level F1 suite; best checkpoint selected on
Segment-level Type@Avg F1 (the reference's val criterion).
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.checkpoint.manager import CheckpointManager
from avmoe_tpu.config import AVVPConfig, TrainConfig, tiny_avvp_config, mini_avvp_config
from avmoe_tpu.data.avvp import LLPDataset, SyntheticAVVPDataset, parse_eval_annotations
from avmoe_tpu.data.loader import BatchLoader
from avmoe_tpu.metrics.avvp import AVVPEvaluator
from avmoe_tpu.models.avvp import MGNModel, make_avvp_loss_fn
from avmoe_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from avmoe_tpu.telemetry.experts import ExpertUsageTracker
from avmoe_tpu.telemetry.meters import AverageMeter
from avmoe_tpu.train.freeze import merge_params, param_report
from avmoe_tpu.train.state import create_train_state
from avmoe_tpu.train.steps import make_train_step
from avmoe_tpu.utils import apply_platform_override, enable_compilation_cache, pipelined
from avmoe_tpu.utils.runtime import apply_perf_defaults, apply_precise_mode

log = logging.getLogger("avmoe_tpu.avvp")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "test"], default="train")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--label_train", type=str, default="data/AVVP/AVVP_train.csv")
    p.add_argument("--label_val", type=str, default="data/AVVP/AVVP_val_pd.csv")
    p.add_argument("--eval_audio_csv", type=str, default="data/AVVP/AVVP_eval_audio.csv")
    p.add_argument("--eval_visual_csv", type=str, default="data/AVVP/AVVP_eval_visual.csv")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--mini", action="store_true",
                   help="tiny dims + real dataset geometry (dress rehearsal)")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--accum_itr", type=int, default=8)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--model_save_dir", type=str, default="checkpoints/avvp")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint (full train state incl. "
                        "optimizer/step) before training")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--precise", action="store_true",
                   help="exact numerics: fp32 attention logits + erf GELU"
                        " (default: measured-best perf toggles, see"
                        " utils.runtime.PERF_DEFAULTS)")
    return p.parse_args()


def evaluate(model, state, loader, gt_audio, gt_visual, num_segments=10,
             tracker: ExpertUsageTracker | None = None) -> dict:
    """Run the F1 suite over a loader; gt_* map clip_index -> (25,10) grids."""
    variables = {"params": merge_params(state.trainable, state.frozen),
                 "batch_stats": state.batch_stats}

    @jax.jit
    def fwd(variables, wave, images, video_st):
        out = model.apply(variables, wave, images, video_st, train=False)
        return (out["global_prob"], out["a_frame_prob"], out["v_frame_prob"],
                out["telemetry"])

    evaluator = AVVPEvaluator()
    # double-buffered dispatch: the per-clip F1 bookkeeping on host overlaps
    # the next batches' device execution (per-batch sync costs ~45 ms RTT)
    for batch, (gp, ap, vp, telemetry) in pipelined(
            lambda b: fwd(variables, b["wave"], b["images"], b["video_st"]),
            loader):
        if tracker is not None:
            tracker.update(telemetry)
        gp, ap, vp = np.asarray(gp), np.asarray(ap), np.asarray(vp)
        for i, clip in enumerate(np.asarray(batch["clip_index"])):
            ga = gt_audio.get(int(clip), np.zeros((25, num_segments), np.int64))
            gv = gt_visual.get(int(clip), np.zeros((25, num_segments), np.int64))
            evaluator.add_clip(gp[i], ap[i], vp[i], ga, gv)
    return evaluator.summary()


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
    cfg = mini_avvp_config() if args.mini else tiny_avvp_config() if args.tiny else AVVPConfig()
    tcfg = TrainConfig(batch_size=args.batch_size, accum_steps=args.accum_itr,
                       epochs=args.epochs, lr=args.lr, lr_mlp=args.lr,
                       seed=args.seed)

    if args.synthetic or args.data_root is None:
        train_ds = SyntheticAVVPDataset(
            length=8 * args.batch_size, num_segments=cfg.num_segments,
            audio_len=cfg.audio_len, img_size=cfg.swin.img_size, st_dim=cfg.st_dim)
        val_ds = SyntheticAVVPDataset(
            length=2 * args.batch_size, num_segments=cfg.num_segments,
            audio_len=cfg.audio_len, img_size=cfg.swin.img_size, st_dim=cfg.st_dim,
            seed=1)
        # synthetic GT: derive grids from weak labels (event spans full clip)
        gt_audio, gt_visual = {}, {}
        for i in range(len(val_ds)):
            lab = val_ds[i]["labels"]
            grid = np.repeat(lab[:, None].astype(np.int64), cfg.num_segments, axis=1)
            gt_audio[i] = grid
            gt_visual[i] = grid
    else:
        train_ds = LLPDataset(args.data_root, args.label_train, cfg.swin.img_size)
        val_ds = LLPDataset(args.data_root, args.label_val, cfg.swin.img_size)
        a_by_name = parse_eval_annotations(args.eval_audio_csv)
        v_by_name = parse_eval_annotations(args.eval_visual_csv)
        gt_audio = {i: a_by_name.get(val_ds.df.iloc[i]["filename"],
                                     np.zeros((25, 10), np.int64))
                    for i in range(len(val_ds))}
        gt_visual = {i: v_by_name.get(val_ds.df.iloc[i]["filename"],
                                      np.zeros((25, 10), np.int64))
                     for i in range(len(val_ds))}

    mesh = make_mesh()
    put = lambda b: shard_batch(b, mesh)
    train_loader = BatchLoader(train_ds, tcfg.batch_size, shuffle=True,
                               num_workers=args.num_workers, seed=tcfg.seed,
                               device_put=put)
    val_loader = BatchLoader(val_ds, tcfg.batch_size, shuffle=False,
                             drop_last=False,  # eval covers every sample
                             num_workers=args.num_workers, device_put=put)

    model = MGNModel(cfg, dtype=jnp.bfloat16)
    sample = train_ds[0]
    variables = jax.jit(lambda r, w, im, st: model.init(r, w, im, st, train=True))(
        {"params": jax.random.PRNGKey(tcfg.seed),
         "dropout": jax.random.PRNGKey(1), "specaug": jax.random.PRNGKey(2),
         "gumbel": jax.random.PRNGKey(3)},
        jnp.asarray(sample["wave"][None]), jnp.asarray(sample["images"][None]),
        jnp.asarray(sample["video_st"][None]),
    )
    report = param_report(variables["params"])
    log.info("params: trainable %.4f%% total %.1fM",
             report["trainable_pct"], report["total"] / 1e6)

    state = create_train_state(model, variables, tcfg, len(train_loader))
    state = replicate(state, mesh)
    train_step = make_train_step(make_avvp_loss_fn(model))
    ckpts = CheckpointManager(args.model_save_dir)
    tracker = ExpertUsageTracker(cfg.moe.num_experts)

    if args.resume and ckpts.latest_step() is not None:
        state = ckpts.restore(state)
        log.info("resumed from step %d", int(state.step))

    if args.mode == "test":
        state = ckpts.restore(state, params_only=True)
        summary = evaluate(model, state, val_loader, gt_audio, gt_visual,
                           cfg.num_segments, tracker=tracker)
        tracker.save(args.model_save_dir)
        log.info("test F1 suite: %s", {k: round(v, 2) for k, v in summary.items()})
        return

    rng = jax.random.PRNGKey(tcfg.seed)
    best = -np.inf
    for epoch in range(1, tcfg.epochs + 1):
        meter = AverageMeter()
        for batch in train_loader:
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(state, batch, step_rng)
            meter.add(loss=float(metrics["loss"]))
        tracker.reset()
        summary = evaluate(model, state, val_loader, gt_audio, gt_visual,
                           cfg.num_segments, tracker=tracker)
        val = summary["seg_type_avg"]
        log.info("epoch %d: loss %.4f seg Type@Avg %.2f Event@Avg %.2f "
                 "event Type@Avg %.2f", epoch, meter.get("loss"), val,
                 summary["seg_event_avg"], summary["event_type_avg"])
        if val >= best:
            best = val
            ckpts.save_if_best(int(state.step), state, val)
    tracker.save(args.model_save_dir)
    log.info("best seg Type@Avg: %.2f", best)


if __name__ == "__main__":
    main()
