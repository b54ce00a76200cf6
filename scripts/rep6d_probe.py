#!/usr/bin/env python
"""Prove the convert_to_6d representation end-to-end through the REAL CLI.

The reference supports a 6d-rotation variant of the body stack: poses packed
as (T, 330), conv channels 258 (body 78 / hand 180, c_index_6d), and a
bigger prior (dim 512, 10 layers — /root/reference/nets/smplx_body_pixel.py
:49-53).  Our rep6d branches (steps.py / dataset.py / pose.py) are
unit-tested; this probe exercises them through scripts/train.py on the real
synthetic SHOW tree: a short body-VQ run, then the 512/10 prior on its
frozen codes, then an eval pass (6d VQ round-trip capacity + a generation
through the XLA sampler — the fused kernel correctly declines non-canonical
priors via supports_fused).

Writes docs/<tag>_schedule/rep6d.json; scripts/eval_full_schedule.py merges
it into EVAL_<tag>.json when present.

    python scripts/rep6d_probe.py --epochs 5
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
REF_CFG = "/root/reference/config"


def derived_6d_config(src: str, dst: str) -> str:
    with open(src) as f:
        cfg = json.load(f)
    cfg["Data"]["pose"]["convert_to_6d"] = True
    # distinct cache name: the pickle cache holds converted poses
    cfg["Data"]["pklname"] = "_6d_mfcc.pkl"
    cfg["Log"]["name"] = cfg["Log"]["name"] + "_6d"
    with open(dst, "w") as f:
        json.dump(cfg, f, indent=1)
    return dst


def run(cmd, log_path):
    t0 = time.time()
    print(f"[rep6d] $ {' '.join(cmd)}", flush=True)
    with open(log_path, "a") as lf:
        lf.write(f"\n$ {' '.join(cmd)}\n")
        lf.flush()
        p = subprocess.run(cmd, stdout=lf, stderr=subprocess.STDOUT, cwd=REPO)
    if p.returncode != 0:
        print(open(log_path).read()[-3000:])
        sys.exit(p.returncode)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="experiments/r04_data")
    ap.add_argument("--run_root", default="experiments/rep6d")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--tag", default="r05")
    args = ap.parse_args()

    os.makedirs(args.run_root, exist_ok=True)
    log = os.path.join(args.run_root, "rep6d.log")
    py = sys.executable

    cfg_vq = derived_6d_config(f"{REF_CFG}/body_vq.json",
                               os.path.join(args.run_root, "body_vq_6d.json"))
    cfg_px = derived_6d_config(f"{REF_CFG}/body_pixel.json",
                               os.path.join(args.run_root, "body_pixel_6d.json"))

    vq_dir = os.path.join(args.run_root, "body_vq")
    px_dir = os.path.join(args.run_root, "body_pixel")
    wall_vq = run([py, "scripts/train.py", "--config_file", cfg_vq,
                   "--data_root", args.data_root, "--run_dir", vq_dir,
                   "--epochs", str(args.epochs)], log)
    wall_px = run([py, "scripts/train.py", "--config_file", cfg_px,
                   "--data_root", args.data_root, "--run_dir", px_dir,
                   "--epochs", str(args.epochs),
                   "--vq_ckpt", os.path.join(vq_dir, f"ckpt-{args.epochs - 1}")],
                  log)

    # ---- eval pass: 6d capacity + one generation through the 512/10 prior
    import numpy as np
    import jax

    from talkshow_tpu.config import Config
    from talkshow_tpu.data.dataset import ShowDataset
    from talkshow_tpu.eval.runners import eval_vq_capacity
    from talkshow_tpu.models.body import BodyModels, generate_conv_poses
    from talkshow_tpu.models.pixelcnn import GatedPixelCNN
    from talkshow_tpu.models.vqvae import VQVAE, AudioEncoder
    from talkshow_tpu.train import steps as tsteps
    from talkshow_tpu.train.trainer import load_checkpoint

    cfg = Config.from_reference_json(cfg_px)
    W = cfg.data.pose.generate_length
    rng = jax.random.PRNGKey(0)

    def restore(path, like):
        return load_checkpoint(path, {"state": like, "epoch": 0,
                                      "global_step": 0})["state"]

    vq_body = VQVAE(in_dim=78, num_hiddens=cfg.model.vq_num_hiddens,
                    embedding_dim=cfg.model.vq_embedding_dim)
    vq_hand = VQVAE(in_dim=180, num_hiddens=cfg.model.vq_num_hiddens,
                    embedding_dim=cfg.model.vq_embedding_dim)
    init_vq, _ = tsteps.make_body_vq_step(vq_body, vq_hand, rep6d=True)
    st1 = restore(os.path.join(vq_dir, f"ckpt-{args.epochs - 1}"),
                  init_vq(rng, window=W))
    frozen_vars = {k: {"params": st1.params[k],
                       "batch_stats": st1.batch_stats[k]}
                   for k in ("body", "hand")}

    prior = GatedPixelCNN(input_dim=cfg.model.code_num, dim=512, n_layers=10,
                          n_classes=cfg.model.num_speakers,
                          bh_model=cfg.model.bh_model)
    audio_enc = AudioEncoder(num_hiddens=256)
    init_px, _ = tsteps.make_body_pixel_step(
        prior, audio_enc, vq_body, vq_hand, frozen_vars, st1.vq, rep6d=True)
    st2 = restore(os.path.join(px_dir, f"ckpt-{args.epochs - 1}"),
                  init_px(rng, window=W))

    ds = ShowDataset.from_root(
        args.data_root, ["oliver", "chemistry", "seth", "conan"], "test",
        feat="mfcc", convert_to_6d=True,
        cache_pkl=os.path.join(args.data_root,
                               f"test_eval_{args.tag}_6d_mfcc.pkl"),
        generate_length=W)

    cap = eval_vq_capacity(vq_body, vq_hand, frozen_vars, st1.vq, ds)

    body = BodyModels(vq_body, vq_hand,
                      frozen_vars["body"], frozen_vars["hand"],
                      st1.vq["body"], st1.vq["hand"],
                      audio_enc,
                      {"params": st2.params["audio"],
                       "batch_stats": st2.batch_stats["audio"]},
                      prior, {"params": st2.params["prior"]})
    clip = next(iter(ds.whole_clips()))
    t = clip["aud_feat"].shape[0] - clip["aud_feat"].shape[0] % 4
    feat = jax.numpy.asarray(clip["aud_feat"][None, :t])
    conv, _ = generate_conv_poses(body, feat, jax.numpy.zeros((1,), "int32"),
                                  jax.random.PRNGKey(3))
    gen_ok = bool(np.isfinite(np.asarray(conv)).all()
                  and conv.shape == (1, t, 258))

    def hist_span(run_dir, key):
        h = json.load(open(os.path.join(run_dir, "history.json")))
        ys = [e[key] for e in h if key in e]
        return {"first": round(ys[0], 5), "last": round(ys[-1], 5),
                "epochs": len(ys), "improved": bool(ys[-1] < ys[0])}

    out = {
        "epochs": args.epochs,
        "body_vq": dict(hist_span(vq_dir, "body_rec"),
                        wall_s=round(wall_vq, 1)),
        "body_pixel": dict(hist_span(px_dir, "ce_loss"),
                           wall_s=round(wall_px, 1)),
        "vq_capacity_6d": cap,
        "generation_shape_ok": gen_ok,
        "prior": "dim512_layers10",
    }
    pub = os.path.join(REPO, "docs", f"{args.tag}_schedule")
    os.makedirs(pub, exist_ok=True)
    with open(os.path.join(pub, "rep6d.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
