#!/usr/bin/env python
"""Run the FULL reference training schedule end-to-end on the chip.

The reference trains each stage for 100 epochs (config/*.json `Train.epochs`,
trainer/Trainer.py:232-267): body-VQ and the pixel prior at batch 128 over
stride-6 88-frame windows, the face stage at batch 1 over whole clips, plus
the body-AE FGD feature extractor.  This orchestrator drives the REAL CLI
(scripts/train.py) — the same path a user takes — for all four trainables in
dependency order on a structured synthetic SHOW-shaped dataset
(scripts/make_synthetic_show.py), then runs the full eval battery
(scripts/eval_full_schedule.py) and publishes:

  * per-stage loss curves + throughput  -> docs/r04_schedule/<stage>.history.json
  * loss-curve plot                     -> docs/r04_schedule/curves.png
  * eval metrics incl. self-trained FGD vs a random-init baseline
                                        -> EVAL_r04.json (repo root)

    python scripts/train_full_schedule.py                 # full (hours)
    python scripts/train_full_schedule.py --smoke         # 2-epoch sanity
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REF_CFG = "/root/reference/config"


def run(cmd: list[str], log_path: str) -> float:
    """Run a subprocess, teeing output to log_path; returns wall seconds."""
    t0 = time.time()
    print(f"[schedule] $ {' '.join(cmd)}", flush=True)
    with open(log_path, "a") as lf:
        lf.write(f"\n$ {' '.join(cmd)}\n")
        lf.flush()
        p = subprocess.run(cmd, stdout=lf, stderr=subprocess.STDOUT, cwd=REPO)
    dt = time.time() - t0
    if p.returncode != 0:
        print(f"[schedule] FAILED ({dt:.0f}s): see {log_path}", flush=True)
        sys.exit(p.returncode)
    print(f"[schedule] done in {dt:.0f}s", flush=True)
    return dt


def derived_config(src: str, dst: str, **model_overrides) -> str:
    """Reference config with Model.* overrides (e.g. the body-AE stage,
    which the reference trains from the body_vq envelope —
    nets/body_ae.py has no dedicated config json)."""
    with open(src) as f:
        cfg = json.load(f)
    cfg["Model"].update(model_overrides)
    cfg["Log"]["name"] = model_overrides.get("model_name", "derived")
    with open(dst, "w") as f:
        json.dump(cfg, f, indent=1)
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="experiments/r04_data")
    ap.add_argument("--run_root", default="experiments/r04_schedule")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override the reference 100-epoch envelope")
    ap.add_argument("--smoke", action="store_true", help="2 epochs per stage")
    ap.add_argument("--stages", nargs="+",
                    default=["body_vq", "body_pixel", "face", "body_ae",
                             "eval"])
    ap.add_argument("--tag", default="r05",
                    help="round tag: publishes docs/<tag>_schedule and "
                         "EVAL_<tag>.json")
    ap.add_argument("--smplx_npz", default="experiments/smplx_synthetic.npz",
                    help="SMPL-X npz for the eval battery's joint/vertex "
                         "metrics (auto-generated synthetically if missing)")
    args = ap.parse_args()
    epochs = 2 if args.smoke else args.epochs   # None -> config (100)

    os.makedirs(args.run_root, exist_ok=True)
    status_path = os.path.join(args.run_root, "status.json")
    status = {"started": time.time(), "stages": {}}

    def mark(stage, **kv):
        status["stages"].setdefault(stage, {}).update(kv)
        with open(status_path, "w") as f:
            json.dump(status, f, indent=1)

    if not os.path.isdir(args.data_root):
        run([sys.executable, "scripts/make_synthetic_show.py",
             "--root", args.data_root],
            os.path.join(args.run_root, "data.log"))

    py = sys.executable
    ep = ([] if epochs is None else ["--epochs", str(epochs)])

    def cfg_epochs(cfg_path: str) -> int:
        """Train.epochs from the stage config — never assume 100."""
        with open(cfg_path) as f:
            return int(json.load(f)["Train"]["epochs"])

    def stage_last_epoch(cfg_path: str) -> int:
        return (epochs if epochs is not None else cfg_epochs(cfg_path)) - 1

    def train(stage, cfg, extra):
        rd = os.path.join(args.run_root, stage)
        mark(stage, state="running", t0=time.time())
        dt = run([py, "scripts/train.py", "--config_file", cfg,
                  "--data_root", args.data_root, "--run_dir", rd] + ep + extra,
                 os.path.join(args.run_root, f"{stage}.log"))
        mark(stage, state="done", wall_s=round(dt, 1))
        return rd

    if "body_vq" in args.stages:
        train("body_vq", f"{REF_CFG}/body_vq.json", [])
    if "body_pixel" in args.stages:
        vq_ckpt = os.path.join(
            args.run_root, "body_vq",
            f"ckpt-{stage_last_epoch(f'{REF_CFG}/body_vq.json')}")
        train("body_pixel", f"{REF_CFG}/body_pixel.json",
              ["--vq_ckpt", vq_ckpt, "--bf16"])
    if "face" in args.stages:
        train("face", f"{REF_CFG}/face.json", ["--face_bucket", "30", "--bf16"])
    if "body_ae" in args.stages:
        cfg = derived_config(f"{REF_CFG}/body_vq.json",
                             os.path.join(args.run_root, "body_ae.json"),
                             model_name="s2g_body_ae")
        train("body_ae", cfg, [])
    if "ls3dcg" in args.stages:   # optional 5th trainable (GAN baseline)
        train("ls3dcg", f"{REF_CFG}/LS3DCG.json", [])

    if "eval" in args.stages:
        if args.smplx_npz and not os.path.exists(args.smplx_npz):
            run([py, "scripts/make_synthetic_smplx.py",
                 "--out", args.smplx_npz],
                os.path.join(args.run_root, "eval.log"))
        mark("eval", state="running", t0=time.time())
        dt = run([py, "scripts/eval_full_schedule.py",
                  "--data_root", args.data_root,
                  "--run_root", args.run_root,
                  "--last_epoch",
                  str(stage_last_epoch(f"{REF_CFG}/body_pixel.json")),
                  "--smplx_npz", args.smplx_npz,
                  "--cache_tag", args.tag,
                  "--out", os.path.join(REPO, f"EVAL_{args.tag}.json")],
                 os.path.join(args.run_root, "eval.log"))
        mark("eval", state="done", wall_s=round(dt, 1))

    # ---- publish committed artifacts ----
    pub = os.path.join(REPO, "docs", f"{args.tag}_schedule")
    os.makedirs(pub, exist_ok=True)
    for stage in ("body_vq", "body_pixel", "face", "body_ae", "ls3dcg"):
        h = os.path.join(args.run_root, stage, "history.json")
        if os.path.exists(h):
            shutil.copy(h, os.path.join(pub, f"{stage}.history.json"))
    try:
        plot_curves(args.run_root, os.path.join(pub, "curves.png"))
    except Exception as e:  # plotting must never fail the schedule
        print(f"[schedule] curve plot skipped: {e}")
    status["finished"] = time.time()
    with open(status_path, "w") as f:
        json.dump(status, f, indent=1)
    print("[schedule] complete", flush=True)


#: stage -> headline loss key in history.json
CURVE_KEYS = {"body_vq": "body_rec", "body_pixel": "ce_loss",
              "face": "loss", "body_ae": "rec_loss",
              "ls3dcg": "body_loss"}


def plot_curves(run_root: str, out_png: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    present = [(s, k) for s, k in CURVE_KEYS.items()
               if os.path.exists(os.path.join(run_root, s, "history.json"))]
    fig, axes = plt.subplots(1, max(1, len(present)),
                             figsize=(4 * max(1, len(present)), 3.2))
    axes = axes if hasattr(axes, "__len__") else [axes]
    for ax, (stage, key) in zip(axes, present):
        h = os.path.join(run_root, stage, "history.json")
        hist = json.load(open(h))
        ys = [e.get(key) for e in hist if e.get(key) is not None]
        ax.plot(range(len(ys)), ys)
        ax.set_title(f"{stage}: {key}")
        ax.set_xlabel("epoch")
        ax.set_yscale("log")
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    print(f"[schedule] wrote {out_png}")


if __name__ == "__main__":
    main()
