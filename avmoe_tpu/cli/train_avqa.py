"""AVQA training driver, two-stage (ref: AVMOE/AVQA/train_v2.sh +
net_grd_avst/main_avst_v2.py:310-445; grounding_gen/main_grd_gen.py).

Stage A (`--stage grounding`): pretrain the audio-visual grounding heads on
frozen backbones. Stage B (default): main AVST training; optionally loads
stage-A heads via checkpoint surgery (`--grounding_ckpt`)."""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.checkpoint.manager import CheckpointManager
from avmoe_tpu.config import AVQAConfig, TrainConfig, tiny_avqa_config, mini_avqa_config
from avmoe_tpu.data.avqa import AVQADataset, SyntheticAVQADataset
from avmoe_tpu.data.loader import BatchLoader
from avmoe_tpu.metrics.avqa import AVQAAccuracy
from avmoe_tpu.models.avqa import AVQAFusionModel, make_avqa_loss_fn
from avmoe_tpu.models.avqa_grounding import AVQAGroundingModel, make_grounding_loss_fn
from avmoe_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from avmoe_tpu.telemetry.meters import AverageMeter
from avmoe_tpu.train.freeze import merge_params, param_report
from avmoe_tpu.train.state import create_train_state
from avmoe_tpu.train.steps import make_train_step
from avmoe_tpu.utils import apply_platform_override, enable_compilation_cache, pipelined
from avmoe_tpu.utils.runtime import apply_perf_defaults, apply_precise_mode

log = logging.getLogger("avmoe_tpu.avqa")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["grounding", "avst"], default="avst")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--label_train", type=str, default="json/avqa-train.json")
    p.add_argument("--label_val", type=str, default="json/avqa-val.json")
    p.add_argument("--ques_vocab", type=str, default=None,
                   help="ques_vocab.txt (one token/line, ref data/AVQA asset); "
                        "auto-detected under data_root when present")
    p.add_argument("--ans_vocab", type=str, default=None,
                   help="ans_vocab.txt (one answer/line); auto-detected under "
                        "data_root when present")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--mini", action="store_true",
                   help="tiny dims + real dataset geometry (dress rehearsal)")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--accum_itr", type=int, default=4)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--model_save_dir", type=str, default="checkpoints/avqa")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint (full train state incl. "
                        "optimizer/step) before training")
    p.add_argument("--grounding_ckpt", type=str, default=None,
                   help="stage-A checkpoint to graft heads from")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--precise", action="store_true",
                   help="exact numerics: fp32 attention logits + erf GELU"
                        " (default: measured-best perf toggles, see"
                        " utils.runtime.PERF_DEFAULTS)")
    return p.parse_args()


def build_datasets(args, cfg):
    if args.synthetic or args.data_root is None:
        mk = lambda n, s: SyntheticAVQADataset(
            length=n, num_segments=cfg.num_segments, audio_len=cfg.audio_len,
            img_size=cfg.swin.img_size, qst_vocab=cfg.qst_vocab,
            max_qst_len=cfg.max_qst_len, answer_vocab=cfg.answer_vocab, seed=s)
        return mk(8 * args.batch_size, 0), mk(2 * args.batch_size, 1)
    import os
    train_json = os.path.join(args.data_root, args.label_train)

    def _vocab(flag, name):
        if flag:
            return flag
        cand = os.path.join(args.data_root, name)
        return cand if os.path.exists(cand) else None

    vk = dict(ques_vocab_file=_vocab(args.ques_vocab, "ques_vocab.txt"),
              ans_vocab_file=_vocab(args.ans_vocab, "ans_vocab.txt"))
    if vk["ques_vocab_file"] or vk["ans_vocab_file"]:
        log.info("AVQA vocab files: ques=%s ans=%s",
                 vk["ques_vocab_file"], vk["ans_vocab_file"])
    return (AVQADataset(args.data_root, train_json, train_json,
                        cfg.swin.img_size, **vk),
            AVQADataset(args.data_root, os.path.join(args.data_root, args.label_val),
                        train_json, cfg.swin.img_size, **vk))


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
    cfg = mini_avqa_config() if args.mini else tiny_avqa_config() if args.tiny else AVQAConfig()
    tcfg = TrainConfig(batch_size=args.batch_size, accum_steps=args.accum_itr,
                       epochs=args.epochs, lr=args.lr, lr_mlp=args.lr,
                       seed=args.seed)
    train_ds, val_ds = build_datasets(args, cfg)

    mesh = make_mesh()
    put = lambda b: shard_batch({k: v for k, v in b.items() if k != "qtype_str"}, mesh)

    def collate_keep_types(ds, **kw):
        return BatchLoader(ds, tcfg.batch_size, device_put=None, **kw)

    train_loader = collate_keep_types(train_ds, shuffle=True,
                                      num_workers=args.num_workers, seed=tcfg.seed)
    val_loader = collate_keep_types(val_ds, shuffle=False, drop_last=False,
                                    num_workers=args.num_workers)

    if args.stage == "grounding":
        model = AVQAGroundingModel(cfg, dtype=jnp.bfloat16)
        sample = train_ds[0]
        variables = jax.jit(lambda r, w, p_, n: model.init(r, w, p_, n, train=True))(
            {"params": jax.random.PRNGKey(tcfg.seed), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(sample["wave"][:1]),
            jnp.asarray(sample["visual_posi"][:1]),
            jnp.asarray(sample["visual_nega"][:1]),
        )
        loss_fn = make_grounding_loss_fn(model)

        def to_batch(b):
            T = cfg.num_segments
            return shard_batch({
                "wave": b["wave"].reshape(-1, b["wave"].shape[-1]),
                "posi": b["visual_posi"].reshape((-1,) + b["visual_posi"].shape[2:]),
                "nega": b["visual_nega"].reshape((-1,) + b["visual_nega"].shape[2:]),
            }, mesh)
    else:
        model = AVQAFusionModel(cfg, dtype=jnp.bfloat16)
        sample = train_ds[0]
        variables = jax.jit(lambda r, w, p_, n, q: model.init(r, w, p_, n, q, train=True))(
            {"params": jax.random.PRNGKey(tcfg.seed), "dropout": jax.random.PRNGKey(1),
             "specaug": jax.random.PRNGKey(2)},
            jnp.asarray(sample["wave"][None]),
            jnp.asarray(sample["visual_posi"][None]),
            jnp.asarray(sample["visual_nega"][None]),
            jnp.asarray(sample["question"][None]),
        )
        if args.grounding_ckpt:
            # stage handoff: graft fc_a1/fc_a2/fc_gl/fc1..4 (ref surgery
            # main_avst_v2.py:339-351) from the grounding checkpoint
            import orbax.checkpoint as ocp
            donor = ocp.StandardCheckpointer().restore(args.grounding_ckpt)
            variables = dict(variables)
            variables["params"] = CheckpointManager.load_partial(
                variables["params"], donor.get("trainable", donor),
                include=r"^(fc_a1|fc_a2|fc_gl|fc1|fc2|fc3|fc4)/")
        loss_fn = make_avqa_loss_fn(model)
        to_batch = lambda b: shard_batch(
            {k: v for k, v in b.items() if k != "qtype_str"}, mesh)

    report = param_report(variables["params"])
    log.info("params: trainable %.4f%% total %.1fM",
             report["trainable_pct"], report["total"] / 1e6)
    state = create_train_state(model, variables, tcfg, len(train_loader))
    state = replicate(state, mesh)
    train_step = make_train_step(loss_fn)
    ckpts = CheckpointManager(args.model_save_dir)

    if args.resume and ckpts.latest_step() is not None:
        state = ckpts.restore(state)
        log.info("resumed from step %d", int(state.step))

    @jax.jit
    def predict(variables, wave, posi, nega, question):
        out = model.apply(variables, wave, posi, nega, question, train=False)
        return (jnp.argmax(out["qa_logits"][:, : cfg.answer_vocab], axis=-1),
                out["telemetry"])

    from avmoe_tpu.telemetry.experts import ExpertUsageTracker

    tracker = ExpertUsageTracker(cfg.moe.num_experts)
    rng = jax.random.PRNGKey(tcfg.seed)
    best = -np.inf
    for epoch in range(1, tcfg.epochs + 1):
        meter = AverageMeter()
        for b in train_loader:
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(state, to_batch(b), step_rng)
            meter.add(loss=float(metrics["loss"]))
        if args.stage == "grounding":
            val = -meter.get("loss")
            log.info("epoch %d: grounding loss %.4f", epoch, meter.get("loss"))
        else:
            acc = AVQAAccuracy()
            variables_eval = {"params": merge_params(state.trainable, state.frozen),
                              "batch_stats": state.batch_stats}
            # double-buffered dispatch: host-side accuracy bookkeeping for
            # batch i overlaps batches i+1/i+2 on device
            for b, (pred, telemetry) in pipelined(
                    lambda b: predict(variables_eval, jnp.asarray(b["wave"]),
                                      jnp.asarray(b["visual_posi"]),
                                      jnp.asarray(b["visual_nega"]),
                                      jnp.asarray(b["question"])),
                    val_loader):
                tracker.update(telemetry)
                acc.update(np.asarray(pred), b["answer"], list(b["qtype_str"]))
            summary = acc.summary()
            val = summary["overall"]
            log.info("epoch %d: loss %.4f acc %.2f per-type %s",
                     epoch, meter.get("loss"), val,
                     {k: round(v, 1) for k, v in summary.items()})
        if val >= best:
            best = val
            ckpts.save_if_best(int(state.step), state, val)
    tracker.save(args.model_save_dir)  # expert-usage dumps (ref main_avst_v2)
    log.info("best: %.4f", best)


if __name__ == "__main__":
    main()
