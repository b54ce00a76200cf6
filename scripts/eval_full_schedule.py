#!/usr/bin/env python
"""Post-training eval battery for the full-schedule run (EVAL_r05.json).

Loads the checkpoints produced by scripts/train_full_schedule.py (body-VQ,
body-pixel prior, face, body-AE, and — when trained — the LS3DCG baseline)
at the reference widths, and on the held-out test split computes the
reference's FULL metric suite (scripts/test_vq.py / test_body.py /
test_face.py semantics via talkshow_tpu.eval.runners):

  * VQ round-trip capacity L1
  * FGD (with the SELF-TRAINED body-AE extractor), feature MAE, L2,
    diversity for the trained pipeline AND for a random-init prior baseline
    (same frozen VQs) — the trained pipeline must beat the baseline
  * SMPL-X-space metrics through the real `smplx_forward_talkshow` LBS
    path when --smplx_npz is given: LVD over the first 22 joints and
    beat consistency for the body (test_body.py:157-194), vertex-space
    face LVD (test_face.py:148-160).  The licensed SMPLX_NEUTRAL_2020.npz
    is not bundled; scripts/make_synthetic_smplx.py writes a synthetic
    rig in the same schema so these metrics publish real numbers.
  * face jaw-L1 / expression-MSE, vs a random-init face baseline
  * LS3DCG per-part L1/MSE + FGD via the shared AE, vs random init

plus a training-run summary read from each stage's history.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_CFG = "/root/reference/config"


def summarize_history(run_root: str) -> dict:
    keys = {"body_vq": "body_rec", "body_pixel": "ce_loss",
            "face": "loss", "body_ae": "rec_loss", "ls3dcg": "body_loss"}
    out = {}
    for stage, key in keys.items():
        path = os.path.join(run_root, stage, "history.json")
        if not os.path.exists(path):
            continue
        hist = json.load(open(path))
        ys = [e[key] for e in hist if key in e]
        if not ys:   # partially-written / mismatched run: skip, don't crash
            continue
        secs = [e.get("epoch_seconds", 0.0) for e in hist]
        skips = [e.get("nonfinite_skips", 0.0) for e in hist]
        n = len(ys)
        out[stage] = {
            "epochs": n,
            "first": round(ys[0], 5), "last": round(ys[-1], 5),
            "min": round(min(ys), 5),
            "improved": bool(ys[-1] < ys[0]),
            # convergence: last-quartile mean vs first-quartile mean
            "late_over_early": round(
                (sum(ys[-max(1, n // 4):]) / max(1, n // 4))
                / max(1e-9, sum(ys[:max(1, n // 4)]) / max(1, n // 4)), 4),
            "nonfinite_skips_final": int(skips[-1]) if skips else 0,
            "total_wall_s": round(sum(secs), 1),
            "mean_epoch_s": round(sum(secs) / max(1, n), 2),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="experiments/r04_data")
    ap.add_argument("--run_root", default="experiments/r04_schedule")
    ap.add_argument("--last_epoch", type=int, default=99)
    ap.add_argument("--num_samples", type=int, default=4)
    ap.add_argument("--smplx_npz", default="experiments/smplx_synthetic.npz",
                    help="SMPL-X model npz enabling the joint/vertex-space "
                         "metrics (LVD, BC, face LVD); '' disables")
    ap.add_argument("--cache_tag", default="r05",
                    help="eval-split pickle-cache tag (bump when the test "
                         "split grows so stale caches are never reused)")
    ap.add_argument("--rep6d_json", default="",
                    help="rep6d probe json to inline (default: "
                         "docs/r05_schedule/rep6d.json next to --out)")
    ap.add_argument("--out", default="EVAL_r05.json")
    args = ap.parse_args()

    import numpy as np
    import jax

    from talkshow_tpu.config import Config
    from talkshow_tpu.data.dataset import ShowDataset
    from talkshow_tpu.eval.fgd import paired_fgd_gap
    from talkshow_tpu.eval.metrics import paired_clip_gap
    from talkshow_tpu.eval.runners import (eval_body, eval_face,
                                           eval_ls3dcg, eval_vq_capacity)
    from talkshow_tpu.models.body import BodyModels
    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.models.pixelcnn import GatedPixelCNN
    from talkshow_tpu.models.vqvae import AE, VQVAE, AudioEncoder
    from talkshow_tpu.ops.smplx_lbs import load_smplx_npz
    from talkshow_tpu.train import steps as tsteps
    from talkshow_tpu.train.trainer import load_checkpoint

    speakers = ["oliver", "chemistry", "seth", "conan"]
    cfg = Config.from_reference_json(f"{REF_CFG}/body_pixel.json")

    smplx_model = None
    if args.smplx_npz and os.path.exists(args.smplx_npz):
        smplx_model = load_smplx_npz(args.smplx_npz)
        print(f"SMPL-X metrics ON ({args.smplx_npz}: "
              f"{smplx_model.v_template.shape[0]} verts)")
    else:
        print("SMPL-X metrics OFF (no npz)")

    def restore(stage: str, like):
        path = os.path.join(args.run_root, stage, f"ckpt-{args.last_epoch}")
        if not os.path.isdir(path):   # fall back to the newest checkpoint
            cands = [d for d in os.listdir(os.path.join(args.run_root, stage))
                     if d.startswith("ckpt-")]
            # numeric sort: lexicographic puts ckpt-9 after ckpt-10..89
            newest = max(cands, key=lambda d: int(d.split("-")[1]))
            path = os.path.join(args.run_root, stage, newest)
        return load_checkpoint(path, {"state": like, "epoch": 0,
                                      "global_step": 0})["state"]

    rng = jax.random.PRNGKey(0)
    W = cfg.data.pose.generate_length

    # ---- stage models at the exact widths scripts/train.py builds ----
    vq_body = VQVAE(in_dim=39, num_hiddens=cfg.model.vq_num_hiddens,
                    embedding_dim=cfg.model.vq_embedding_dim)
    vq_hand = VQVAE(in_dim=90, num_hiddens=cfg.model.vq_num_hiddens,
                    embedding_dim=cfg.model.vq_embedding_dim)
    init_vq, _ = tsteps.make_body_vq_step(vq_body, vq_hand)
    st1 = restore("body_vq", init_vq(rng, window=W))
    frozen_vars = {k: {"params": st1.params[k],
                       "batch_stats": st1.batch_stats[k]}
                   for k in ("body", "hand")}

    prior = GatedPixelCNN(input_dim=cfg.model.code_num,
                          dim=cfg.model.pixelcnn_dim,
                          n_layers=cfg.model.pixelcnn_layers,
                          n_classes=cfg.model.num_speakers,
                          bh_model=cfg.model.bh_model)
    audio_enc = AudioEncoder(num_hiddens=256)
    init_pix, _ = tsteps.make_body_pixel_step(
        prior, audio_enc, vq_body, vq_hand, frozen_vars, st1.vq)
    st2 = restore("body_pixel", init_pix(rng, window=W))

    ae = AE(in_dim=129, num_hiddens=cfg.model.vq_num_hiddens)
    init_ae, _ = tsteps.make_body_ae_step(ae)
    st3 = restore("body_ae", init_ae(rng, window=W))
    ae_vars = {"params": st3.params, "batch_stats": st3.batch_stats}

    face = FaceGenerator()
    init_face, _ = tsteps.make_face_step(face, window=W)
    stf = restore("face", init_face(rng, window=W))

    # ---- datasets (test split; mfcc for body, raw for face) ----
    ds = ShowDataset.from_root(
        args.data_root, speakers, "test", feat="mfcc",
        cache_pkl=os.path.join(args.data_root,
                               f"test_eval_{args.cache_tag}_mfcc.pkl"),
        generate_length=W)
    ds_raw = ShowDataset.from_root(
        args.data_root, speakers, "test", feat="raw",
        cache_pkl=os.path.join(args.data_root,
                               f"test_eval_{args.cache_tag}_raw.pkl"),
        generate_length=W)
    print(f"test clips: {len(ds.clips)}")

    def body_models(prior_vars, audio_vars):
        return BodyModels(vq_body, vq_hand,
                          frozen_vars["body"], frozen_vars["hand"],
                          st1.vq["body"], st1.vq["hand"],
                          audio_enc, audio_vars, prior, prior_vars)

    trained = body_models({"params": st2.params["prior"]},
                          {"params": st2.params["audio"],
                           "batch_stats": st2.batch_stats["audio"]})
    st2r = init_pix(jax.random.PRNGKey(123), window=W)   # random-init prior
    baseline = body_models({"params": st2r.params["prior"]},
                           {"params": st2r.params["audio"],
                            "batch_stats": st2r.batch_stats["audio"]})

    results = {"train_summary": summarize_history(args.run_root),
               "num_test_clips": len(ds.clips),
               "num_samples": args.num_samples,
               "smplx": bool(smplx_model is not None)}

    results["vq_capacity"] = eval_vq_capacity(
        vq_body, vq_hand, frozen_vars, st1.vq, ds)
    print("capacity:", results["vq_capacity"], flush=True)

    results["body_trained"] = eval_body(trained, ae, ae_vars, ds,
                                        num_samples=args.num_samples,
                                        smplx_model=smplx_model)
    print("body trained:", results["body_trained"], flush=True)
    results["body_random_prior"] = eval_body(baseline, ae, ae_vars, ds,
                                             num_samples=args.num_samples,
                                             smplx_model=smplx_model)
    print("body random:", results["body_random_prior"], flush=True)
    results["fgd_trained_beats_random"] = bool(
        results["body_trained"]["fgd"] < results["body_random_prior"]["fgd"])
    if "fgd_ci" in results["body_trained"]:
        # paired gaps — same seed + clip walk in both arms, so the shared
        # which-clips variance cancels and the gap CI is tight where the
        # marginal CIs overlap
        gaps = {"fgd": paired_fgd_gap(
            results["body_trained"]["fgd_ci"],
            results["body_random_prior"]["fgd_ci"])}
        for key in ("l2", "lvd"):
            a = results["body_trained"]["per_clip"].get(key)
            b = results["body_random_prior"]["per_clip"].get(key)
            if a and b:
                gaps[key] = paired_clip_gap(a, b)
        results["body_gap_trained_minus_random"] = gaps
        print("body gaps (trained - random):", gaps, flush=True)

    results["face_trained"] = eval_face(face, {"params": stf.params}, ds_raw,
                                        smplx_model=smplx_model)
    stf_r = init_face(jax.random.PRNGKey(7), window=W)
    results["face_random_init"] = eval_face(face, {"params": stf_r.params},
                                            ds_raw, smplx_model=smplx_model)
    results["face_trained_beats_random"] = bool(
        results["face_trained"]["jaw_l1"]
        < results["face_random_init"]["jaw_l1"])
    if "per_clip" in results["face_trained"]:
        results["face_gap_trained_minus_random"] = {
            "jaw_l1": paired_clip_gap(
                results["face_trained"]["per_clip"]["jaw_l1"],
                results["face_random_init"]["per_clip"]["jaw_l1"])}

    # ---- LS3DCG baseline (when its schedule stage ran) ----
    if os.path.isdir(os.path.join(args.run_root, "ls3dcg")):
        from talkshow_tpu.models.ls3dcg import (LS3DCGDiscriminator,
                                                LS3DCGGenerator)
        gen, disc = LS3DCGGenerator(), LS3DCGDiscriminator()
        init_ls, _ = tsteps.make_ls3dcg_step(gen, disc, window=W)
        stl = restore("ls3dcg", init_ls(rng, window=W))
        gv = {"params": stl.g_params, "batch_stats": stl.g_stats}
        results["ls3dcg_trained"] = eval_ls3dcg(gen, gv, ae, ae_vars, ds)
        print("ls3dcg trained:", results["ls3dcg_trained"], flush=True)
        stl_r = init_ls(jax.random.PRNGKey(21), window=W)
        gvr = {"params": stl_r.g_params, "batch_stats": stl_r.g_stats}
        results["ls3dcg_random_init"] = eval_ls3dcg(gen, gvr, ae, ae_vars, ds)
        print("ls3dcg random:", results["ls3dcg_random_init"], flush=True)
        results["ls3dcg_trained_beats_random"] = bool(
            results["ls3dcg_trained"]["body_l1"]
            < results["ls3dcg_random_init"]["body_l1"]
            and results["ls3dcg_trained"]["fgd"]
            < results["ls3dcg_random_init"]["fgd"])
        if "fgd_ci" in results["ls3dcg_trained"]:
            results["ls3dcg_gap_trained_minus_random"] = {
                "fgd": paired_fgd_gap(
                    results["ls3dcg_trained"]["fgd_ci"],
                    results["ls3dcg_random_init"]["fgd_ci"]),
                "body_l1": paired_clip_gap(
                    results["ls3dcg_trained"]["per_clip"]["body_l1"],
                    results["ls3dcg_random_init"]["per_clip"]["body_l1"])}

    # ---- rep6d probe results (scripts/rep6d_probe.py), when present ----
    # default path derives the round tag from --out (EVAL_<tag>.json ->
    # docs/<tag>_schedule/rep6d.json) so a future round never silently
    # inlines a stale earlier-round probe
    out_stem = os.path.splitext(os.path.basename(args.out))[0]
    tag = out_stem[len("EVAL_"):] if out_stem.startswith("EVAL_") else out_stem
    rep6d_path = args.rep6d_json or os.path.join(
        os.path.dirname(os.path.abspath(args.out)),
        "docs", f"{tag}_schedule", "rep6d.json")
    if os.path.exists(rep6d_path):
        results["rep6d"] = json.load(open(rep6d_path))

    # raw bootstrap draws served their purpose (the paired gaps above);
    # keep the published JSON to summary stats
    for sec in results.values():
        if isinstance(sec, dict) and isinstance(sec.get("fgd_ci"), dict):
            sec["fgd_ci"].pop("draws", None)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
