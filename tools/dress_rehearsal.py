"""Real-data dress rehearsal: drive all four task CLIs from on-disk datasets
in the exact reference formats (VERDICT r1 item 6).

Generates miniature datasets with tools/make_mini_datasets.py, then runs each
CLI train -> test as a subprocess with --mini (tiny model dims, real clip
geometry) and asserts the artifacts: per-epoch metrics in the logs, orbax
checkpoints + best.json, expert-telemetry .npy dumps, AVS mask PNGs.

Runs on CPU by default (AVMOE_PLATFORM=cpu) so it does not need the TPU
tunnel; pass --tpu to exercise the real chip. Serializes everything (1-core
host).

Usage: python tools/dress_rehearsal.py [--root /tmp/mini_datasets] [--tpu]
                                       [--task ave|avvp|avqa|avs_s4|avs_ms3]
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, env, log_path):
    print("::", " ".join(cmd), flush=True)
    with open(log_path, "w") as f:
        r = subprocess.run(cmd, env=env, stdout=f, stderr=subprocess.STDOUT,
                           cwd=REPO, timeout=3600)
    if r.returncode != 0:
        print(open(log_path).read()[-4000:])
        raise SystemExit(f"FAILED ({r.returncode}): {' '.join(cmd)}; log {log_path}")


def check(cond, msg):
    if not cond:
        raise SystemExit(f"ARTIFACT CHECK FAILED: {msg}")
    print(f"   ok: {msg}")


def grep_log(log_path, needle):
    return needle in open(log_path).read()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/mini_datasets")
    ap.add_argument("--work", default="/tmp/dress_rehearsal")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--task", default=None,
                    choices=[None, "ave", "avvp", "avqa", "avs_s4", "avs_ms3"])
    args = ap.parse_args()

    env = dict(os.environ)
    if not args.tpu:
        env["AVMOE_PLATFORM"] = "cpu"
        # don't let the sitecustomize claim the (single-client) TPU tunnel
        # from CPU-only subprocesses - it starves concurrent TPU jobs
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("PYTHONPATH", REPO)

    if not os.path.isdir(os.path.join(args.root, "AVE")):
        subprocess.run([sys.executable, "tools/make_mini_datasets.py",
                        args.root], check=True, cwd=REPO)
    shutil.rmtree(args.work, ignore_errors=True)
    os.makedirs(args.work, exist_ok=True)
    py = [sys.executable, "-m"]
    E = str(args.epochs)

    def ckpt_dir_ok(d):
        check(os.path.isfile(os.path.join(d, "best.json")), f"{d}/best.json")
        steps = [p for p in glob.glob(os.path.join(d, "*"))
                 if os.path.basename(p).isdigit()]
        check(steps, f"orbax checkpoint steps in {d}")

    tasks = {
        "ave": dict(
            train=py + ["avmoe_tpu.cli.train_ave", "--mini",
                        "--data_root", f"{args.root}/AVE",
                        "--epochs", E, "--batch_size", "2", "--accum_itr", "1",
                        "--num_workers", "2",
                        "--model_save_dir", f"{args.work}/ave"],
            test=py + ["avmoe_tpu.cli.train_ave", "--mini", "--mode", "test",
                       "--data_root", f"{args.root}/AVE",
                       "--batch_size", "2", "--num_workers", "2",
                       "--model_save_dir", f"{args.work}/ave"],
            dir=f"{args.work}/ave"),
        "avvp": dict(
            train=py + ["avmoe_tpu.cli.train_avvp", "--mini",
                        "--data_root", f"{args.root}/LLP",
                        "--label_train", f"{args.root}/LLP/train.csv",
                        "--label_val", f"{args.root}/LLP/val.csv",
                        "--eval_audio_csv", f"{args.root}/LLP/AVVP_eval_audio.csv",
                        "--eval_visual_csv", f"{args.root}/LLP/AVVP_eval_visual.csv",
                        "--epochs", E, "--batch_size", "2", "--accum_itr", "1",
                        "--num_workers", "2",
                        "--model_save_dir", f"{args.work}/avvp"],
            test=py + ["avmoe_tpu.cli.train_avvp", "--mini", "--mode", "test",
                       "--data_root", f"{args.root}/LLP",
                       "--label_train", f"{args.root}/LLP/train.csv",
                       "--label_val", f"{args.root}/LLP/test.csv",
                       "--eval_audio_csv", f"{args.root}/LLP/AVVP_eval_audio.csv",
                       "--eval_visual_csv", f"{args.root}/LLP/AVVP_eval_visual.csv",
                       "--batch_size", "2", "--num_workers", "2",
                       "--model_save_dir", f"{args.work}/avvp"],
            dir=f"{args.work}/avvp"),
        "avqa": dict(
            train=py + ["avmoe_tpu.cli.train_avqa", "--mini",
                        "--data_root", f"{args.root}/MUSIC-AVQA",
                        "--label_train", "avqa-train.json",
                        "--label_val", "avqa-val.json",
                        "--epochs", E, "--batch_size", "2", "--accum_itr", "1",
                        "--num_workers", "2",
                        "--model_save_dir", f"{args.work}/avqa"],
            test=None,
            dir=f"{args.work}/avqa"),
        "avs_s4": dict(
            train=py + ["avmoe_tpu.cli.train_avs", "--mini", "--setting", "s4",
                        "--data_root", f"{args.root}/AVSBench_s4",
                        "--max_epoches", E, "--train_batch_size", "2",
                        "--accum_itr", "1", "--num_workers", "2",
                        "--model_save_dir", f"{args.work}/avs_s4"],
            test=py + ["avmoe_tpu.cli.train_avs", "--mini", "--setting", "s4",
                       "--mode", "test", "--save_pred_mask",
                       "--data_root", f"{args.root}/AVSBench_s4",
                       "--train_batch_size", "2", "--num_workers", "2",
                       "--model_save_dir", f"{args.work}/avs_s4"],
            dir=f"{args.work}/avs_s4"),
        "avs_ms3": dict(
            train=py + ["avmoe_tpu.cli.train_avs", "--mini", "--setting", "ms3",
                        "--data_root", f"{args.root}/AVSBench_ms3",
                        "--max_epoches", E, "--train_batch_size", "2",
                        "--accum_itr", "1", "--num_workers", "2",
                        "--model_save_dir", f"{args.work}/avs_ms3"],
            test=None,
            dir=f"{args.work}/avs_ms3"),
    }

    selected = [args.task] if args.task else list(tasks)
    for name in selected:
        t = tasks[name]
        print(f"== {name}: train ==", flush=True)
        run(t["train"], env, f"{args.work}/{name}_train.log")
        ckpt_dir_ok(t["dir"])
        stats = glob.glob(os.path.join(t["dir"], "expert_stats*.npy")) \
            + glob.glob(os.path.join(t["dir"], "**", "expert_stats*.npy"),
                        recursive=True)
        check(stats, f"expert telemetry dumps for {name}")
        if t["test"]:
            print(f"== {name}: test ==", flush=True)
            run(t["test"], env, f"{args.work}/{name}_test.log")
        if name == "avs_s4":
            masks = glob.glob(os.path.join(t["dir"], "**", "*.png"),
                              recursive=True)
            check(masks, "AVS predicted mask PNGs")
        print(f"== {name}: PASS ==", flush=True)

    print(json.dumps({"dress_rehearsal": "PASS", "tasks": selected}))


if __name__ == "__main__":
    main()
