#!/usr/bin/env python
"""Full-loop smoke: train all stages on synthetic data -> generate -> eval.

Trains tiny-but-real models for a few epochs each (stage 1 VQ, stage 2
prior, body-AE, face) on a synthetic ShowDataset, then runs the generation
pipeline with the trained weights and computes the full metric suite.
Exercises the exact path a user takes with the real SHOW dataset.

    python scripts/smoke_e2e.py          # ~2-4 min on CPU
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np

    from talkshow_tpu.config import body_vq_config
    from talkshow_tpu.data.dataset import synthetic_dataset
    from talkshow_tpu.eval.runners import eval_body, eval_vq_capacity
    from talkshow_tpu.models.body import BodyModels
    from talkshow_tpu.models.pixelcnn import GatedPixelCNN
    from talkshow_tpu.models.vqvae import AE, VQVAE, AudioEncoder
    from talkshow_tpu.train import steps as tsteps
    from talkshow_tpu.train.trainer import Trainer

    W = 16
    ds = synthetic_dataset(num_clips=3, frames=160, seed=0)
    ds.generate_length = W

    cfg = body_vq_config()
    cfg.train.batch_size = 8
    cfg.train.epochs = 3
    cfg.log.print_every = 50
    cfg.log.save_every = 100
    cfg.data.pose.generate_length = W

    # ---- stage 1: VQ ----
    vq_body = VQVAE(in_dim=39, num_hiddens=64)
    vq_hand = VQVAE(in_dim=90, num_hiddens=64)
    init1, step1 = tsteps.make_body_vq_step(vq_body, vq_hand, 1e-3)
    tr1 = Trainer(cfg, ds, init1, lambda s, b: step1(s, b), needs_rng=False,
                  run_dir="/tmp/e2e/vq").setup()
    st1 = tr1.train()
    rec_first = tr1.history[0]["body_rec"]
    rec_last = tr1.history[-1]["body_rec"]
    print(f"stage1 body_rec: {rec_first:.4f} -> {rec_last:.4f}")
    assert rec_last < rec_first

    # ---- stage 2: prior over frozen VQ ----
    prior = GatedPixelCNN(input_dim=2048, dim=32, n_layers=4, audio=True,
                          audio_channels=64)
    audio_enc = AudioEncoder(num_hiddens=64)
    frozen_vars = {k: {"params": st1.params[k], "batch_stats": st1.batch_stats[k]}
                   for k in ("body", "hand")}
    init2, step2 = tsteps.make_body_pixel_step(
        prior, audio_enc, vq_body, vq_hand, frozen_vars, st1.vq, 1e-3)
    tr2 = Trainer(cfg, ds, init2, step2, needs_rng=True,
                  run_dir="/tmp/e2e/pixel").setup()
    st2 = tr2.train()
    ce_first = tr2.history[0]["ce_loss"]
    ce_last = tr2.history[-1]["ce_loss"]
    print(f"stage2 ce: {ce_first:.4f} -> {ce_last:.4f}")
    assert ce_last < ce_first

    # ---- body-AE (FGD extractor) ----
    ae = AE(in_dim=129, num_hiddens=64)
    init3, step3 = tsteps.make_body_ae_step(ae, 1e-3)
    tr3 = Trainer(cfg, ds, init3, lambda s, b: step3(s, b), needs_rng=False,
                  run_dir="/tmp/e2e/ae").setup()
    st3 = tr3.train()

    # ---- generation + eval with the trained weights ----
    body = BodyModels(
        vq_body, vq_hand,
        frozen_vars["body"], frozen_vars["hand"], st1.vq["body"], st1.vq["hand"],
        audio_enc, {"params": st2.params["audio"],
                    "batch_stats": st2.batch_stats["audio"]},
        prior, {"params": st2.params["prior"]},
    )
    cap = eval_vq_capacity(vq_body, vq_hand, frozen_vars, st1.vq, ds)
    res = eval_body(body, ae,
                    {"params": st3.params, "batch_stats": st3.batch_stats},
                    ds, num_samples=2)
    res.get("fgd_ci", {}).pop("draws", None)   # raw resamples: noise here
    out = {**cap, **res,
           "stage1_rec_improved": bool(rec_last < rec_first),
           "stage2_ce_improved": bool(ce_last < ce_first)}
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))
    assert np.isfinite(res["fgd"])


if __name__ == "__main__":
    main()
