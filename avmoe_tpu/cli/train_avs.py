"""AVS training driver, S4 / MS3 (ref: avs_{s4,ms3}/train_v2.sh + train_v2.py).

`python -m avmoe_tpu.cli.train_avs --setting s4 [--synthetic|--data_root ...]`
Evaluates mIoU + F-measure per epoch; saves best by mIoU."""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.checkpoint.manager import CheckpointManager
from avmoe_tpu.config import AVSConfig, TrainConfig, replace, tiny_avs_config, mini_avs_config
from avmoe_tpu.data.avs import MS3Dataset, S4Dataset, SyntheticAVSDataset
from avmoe_tpu.data.loader import BatchLoader
from avmoe_tpu.metrics.avs import eval_fmeasure, mask_iou
from avmoe_tpu.models.avs import AVSModel, make_avs_loss_fn
from avmoe_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from avmoe_tpu.telemetry.meters import AverageMeter
from avmoe_tpu.train.freeze import merge_params, param_report
from avmoe_tpu.train.state import create_train_state
from avmoe_tpu.train.steps import make_train_step
from avmoe_tpu.utils import apply_platform_override, enable_compilation_cache, pipelined
from avmoe_tpu.utils.runtime import apply_perf_defaults, apply_precise_mode

log = logging.getLogger("avmoe_tpu.avs")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "test"], default="train",
                   help="test = restore ckpt, eval, save predicted masks "
                        "(ref test_v2.py incl. mask saving)")
    p.add_argument("--save_pred_mask", action="store_true")
    p.add_argument("--setting", choices=["s4", "ms3"], default="s4")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--mini", action="store_true",
                   help="tiny dims + real dataset geometry (dress rehearsal)")
    p.add_argument("--train_batch_size", type=int, default=2)
    p.add_argument("--accum_itr", type=int, default=4)
    p.add_argument("--max_epoches", type=int, default=50)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tpavi_stages", type=int, nargs="*", default=[0, 1, 2, 3])
    p.add_argument("--sa_loss_flag", action="store_true",
                   help="force the masked-AV term on (it is ON by default"
                        " for ms3, per its published recipe)")
    p.add_argument("--no_sa_loss", action="store_true",
                   help="force the masked-AV term off")
    p.add_argument("--lambda_1", type=float, default=None,
                   help="masked-AV weight; default mirrors the published"
                        " recipe (s4: 0, ms3: 0.5 — avs_ms3/train_v2.sh)")
    p.add_argument("--sa_loss_kind", choices=["cosine", "euclidean", "kl"],
                   default=None, help="masked-AV flavor (default s4: cosine,"
                   " ms3: kl per --kl_flag in its train_v2.sh; ref"
                   " avs_ms3/loss.py:23-75)")
    p.add_argument("--sa_norm_fea", type=int, default=None,
                   help="normalize a/v features in the masked-AV term"
                        " (default s4: 1 — hardcoded in its loss, ms3: 0 —"
                        " recipe leaves --norm_fea_flag unset)")
    p.add_argument("--sa_threshold", type=int, default=None,
                   help="threshold pooled masks at 0.5 in the masked-AV term"
                        " (default s4: 1, ms3: 0 — same provenance as"
                        " --sa_norm_fea)")
    p.add_argument("--masked_av_stages", type=int, nargs="*", default=None,
                   help="stages the masked-AV term covers (ref train_v2.py"
                        " --masked_av_stages; the ms3 recipe passes 0 1 2 3)."
                        " Default: all --tpavi_stages when the term is on")
    p.add_argument("--closer_loss", action="store_true",
                   help="nearest-audio pairing (ref avs_ms3/loss.py:76-131)")
    p.add_argument("--load_balancing_loss_weight", type=float, default=None,
                   help="LB weight in the train total; default mirrors the"
                        " published recipe per setting (s4: 0 — off, ms3:"
                        " 0.01; ref train_v2.sh + base_options"
                        " --use_load_balacing_loss)")
    p.add_argument("--model_save_dir", type=str, default="checkpoints/avs")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint (full train state incl. "
                        "optimizer/step) before training")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--precise", action="store_true",
                   help="exact numerics: fp32 attention logits + erf GELU"
                        " (default: measured-best perf toggles, see"
                        " utils.runtime.PERF_DEFAULTS)")
    return p.parse_args()


def build_config(args) -> AVSConfig:
    """Resolve the AVSConfig from CLI args with per-setting recipe defaults.

    S4 (avs_s4/train_v2.sh): masked-AV off entirely, LB off; its loss
    hardcodes norm_fea/threshold True (avs_s4/loss.py:30-78).
    MS3 (avs_ms3/train_v2.sh): --masked_av_flag --lambda_1 0.5 --kl_flag
    --masked_av_stages 0 1 2 3 (norm/threshold flags unset), LB on at 0.01,
    latent-token "v2" expert self-attention, temporal gate gamma=0.1."""
    cfg = mini_avs_config() if args.mini else tiny_avs_config() if args.tiny else AVSConfig()
    ms3 = args.setting == "ms3"
    sa_on = (args.sa_loss_flag or ms3) and not args.no_sa_loss
    cfg = replace(cfg, setting=args.setting,
                  tpavi_stages=tuple(args.tpavi_stages),
                  sa_loss_flag=sa_on,
                  lambda_1=(args.lambda_1 if args.lambda_1 is not None
                            else 0.5 if ms3 else 0.0),
                  sa_loss_kind=args.sa_loss_kind or ("kl" if ms3 else "cosine"),
                  sa_norm_fea=(bool(args.sa_norm_fea)
                               if args.sa_norm_fea is not None else not ms3),
                  sa_threshold=(bool(args.sa_threshold)
                                if args.sa_threshold is not None else not ms3),
                  closer_loss=args.closer_loss,
                  sa_loss_stages=(tuple(args.masked_av_stages)
                                  if args.masked_av_stages is not None
                                  else tuple(args.tpavi_stages)) if sa_on
                                 else ())
    if ms3:
        import dataclasses as _dc

        cfg = replace(
            cfg, temporal_gamma=0.1, lb_loss_weight=0.01,
            moe=_dc.replace(cfg.moe, adapter=_dc.replace(
                cfg.moe.adapter, self_attention="token")))
    if args.load_balancing_loss_weight is not None:
        cfg = replace(cfg, lb_loss_weight=args.load_balancing_loss_weight)
    return cfg


def main():
    apply_platform_override()
    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s",
                        force=True)
    args = parse_args()
    # measured-best perf toggles (setdefault: exported env wins); must
    # run before the first model trace
    apply_perf_defaults()
    if args.precise:
        apply_precise_mode()
    cfg = build_config(args)
    tcfg = TrainConfig(batch_size=args.train_batch_size, accum_steps=args.accum_itr,
                       epochs=args.max_epoches, lr=args.lr, lr_mlp=args.lr,
                       seed=args.seed)

    if args.synthetic or args.data_root is None:
        mk = lambda split, n, s: SyntheticAVSDataset(
            length=n, num_segments=cfg.num_segments, audio_len=cfg.audio_len,
            img_size=cfg.img_size, mask_size=cfg.mask_size,
            setting=args.setting, split=split, seed=s)
        train_ds = mk("train", 4 * tcfg.batch_size, 0)
        val_ds = mk("val", 2 * tcfg.batch_size, 1)
    else:
        ds_cls = S4Dataset if args.setting == "s4" else MS3Dataset
        train_ds = ds_cls(args.data_root, "train", cfg.img_size, cfg.mask_size)
        val_ds = ds_cls(args.data_root, "val", cfg.img_size, cfg.mask_size)

    mesh = make_mesh()
    put = lambda b: shard_batch(
        {k: v for k, v in b.items() if k not in ("category", "video")}, mesh)
    train_loader = BatchLoader(train_ds, tcfg.batch_size, shuffle=True,
                               num_workers=args.num_workers, seed=tcfg.seed,
                               device_put=put)
    val_loader = BatchLoader(val_ds, tcfg.batch_size, shuffle=False,
                             drop_last=False,  # eval covers every sample
                             num_workers=args.num_workers, device_put=put)

    model = AVSModel(cfg, dtype=jnp.bfloat16)
    sample = train_ds[0]
    variables = jax.jit(lambda r, im, w: model.init(r, im, w, train=True))(
        {"params": jax.random.PRNGKey(tcfg.seed), "dropout": jax.random.PRNGKey(1),
         "specaug": jax.random.PRNGKey(2), "router": jax.random.PRNGKey(3)},
        jnp.asarray(sample["images"][None]), jnp.asarray(sample["wave"][None]),
    )
    # S4's reference freeze scan only matches 'ViT'/'swin' names, so its
    # HTS-AT audio backbone TRAINS (avs_s4/train_v2.py:146-163, no htsat
    # branch); MS3 freezes both (avs_ms3/train_v2.py:128-131)
    frozen_scopes = ("swin",) if args.setting == "s4" else ("swin", "htsat")
    report = param_report(variables["params"], frozen_scopes)
    log.info("params: trainable %.4f%% total %.1fM",
             report["trainable_pct"], report["total"] / 1e6)

    state = create_train_state(model, variables, tcfg, len(train_loader),
                               frozen_scopes=frozen_scopes)
    state = replicate(state, mesh)
    train_step = make_train_step(make_avs_loss_fn(model))
    ckpts = CheckpointManager(args.model_save_dir)

    if args.resume and ckpts.latest_step() is not None:
        state = ckpts.restore(state)
        log.info("resumed from step %d", int(state.step))

    @jax.jit
    def predict(variables, images, wave):
        out = model.apply(variables, images, wave, train=False)
        return out["mask_logits"], out["telemetry"]

    if args.mode == "test":
        from avmoe_tpu.metrics.avs import save_mask
        from avmoe_tpu.telemetry.experts import ExpertUsageTracker

        tracker = ExpertUsageTracker(cfg.moe.num_experts)
        state = ckpts.restore(state, params_only=True)
        variables_eval = {"params": merge_params(state.trainable, state.frozen),
                          "batch_stats": state.batch_stats}
        ious, preds, gts = [], [], []
        # double-buffered dispatch: mask readback/IoU on host overlaps the
        # next batches' device execution (per-batch sync costs ~45 ms RTT)
        for (bi, batch), (logits, telemetry) in pipelined(
                lambda t: predict(variables_eval, t[1]["images"], t[1]["wave"]),
                enumerate(val_loader)):
            tracker.update(telemetry)
            mask = batch["mask"].reshape((-1,) + batch["mask"].shape[-2:])
            ious.append(float(mask_iou(logits, mask)))
            preds.append(np.asarray(logits))
            gts.append(np.asarray(mask))
            if args.save_pred_mask:
                names = [f"batch{bi}_{j}" for j in range(logits.shape[0])]
                save_mask(np.asarray(logits),
                          f"{args.model_save_dir}/pred_masks", names)
        fscore = float(eval_fmeasure(jnp.asarray(np.concatenate(preds)),
                                     jnp.asarray(np.concatenate(gts))))
        tracker.save(args.model_save_dir)  # expert-usage .npy dumps (ref test_v2)
        log.info("test miou %.4f F %.4f", float(np.mean(ious)), fscore)
        return

    from avmoe_tpu.telemetry.experts import ExpertUsageTracker
    from avmoe_tpu.utils.runtime import archive_sources

    # snapshot the running sources next to the run's checkpoints for
    # reproducibility (ref: avs_s4/train_v2.py:102-114 script self-archival)
    n_archived = archive_sources(args.model_save_dir)
    log.info("archived %d source files to %s/sources", n_archived,
             args.model_save_dir)

    tracker = ExpertUsageTracker(cfg.moe.num_experts)
    rng = jax.random.PRNGKey(tcfg.seed)
    best = -np.inf
    for epoch in range(1, tcfg.epochs + 1):
        meter = AverageMeter()
        for batch in train_loader:
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(state, batch, step_rng)
            meter.add(loss=float(metrics["loss"]),
                      iou_loss=float(metrics["iou_loss"]))
        # eval: all 5 masks per clip
        variables_eval = {"params": merge_params(state.trainable, state.frozen),
                          "batch_stats": state.batch_stats}
        tracker.reset()
        ious, preds, gts = [], [], []
        for batch, (logits, telemetry) in pipelined(
                lambda b: predict(variables_eval, b["images"], b["wave"]),
                val_loader):
            tracker.update(telemetry)
            mask = batch["mask"]
            mask = mask.reshape((-1,) + mask.shape[-2:])
            ious.append(float(mask_iou(logits, mask)))
            preds.append(np.asarray(logits))
            gts.append(np.asarray(mask))
        miou = float(np.mean(ious))
        fscore = float(eval_fmeasure(jnp.asarray(np.concatenate(preds)),
                                     jnp.asarray(np.concatenate(gts))))
        log.info("epoch %d: loss %.4f miou %.4f F %.4f",
                 epoch, meter.get("loss"), miou, fscore)
        if miou >= best:
            best = miou
            ckpts.save_if_best(int(state.step), state, miou)
    tracker.save(args.model_save_dir)
    log.info("best miou: %.4f", best)


if __name__ == "__main__":
    main()
