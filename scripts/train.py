#!/usr/bin/env python
"""Train any TalkSHOW-TPU stage.

Mirror of the reference entry point (scripts/train.py + trainer/options.py):

    python scripts/train.py --config_file config/body_vq.json \
        --data_root /path/to/ExpressiveWholeBodyDatasetv1.0 \
        --speakers oliver seth conan chemistry \
        --run_dir experiments/body-vq

Stages are selected by the config's Model.model_name
(s2g_body_vq | s2g_body_pixel | s2g_face | s2g_body_ae | s2g_LS3DCG).
The body-pixel stage needs --vq_ckpt pointing at a trained stage-1
checkpoint (reference: config Model.vq_path).
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True,
                   help="reference-format JSON config (config/*.json)")
    p.add_argument("--data_root", default=None)
    p.add_argument("--speakers", nargs="+",
                   default=["oliver", "chemistry", "seth", "conan"])
    p.add_argument("--run_dir", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--resume", default=None, help="checkpoint dir to resume")
    p.add_argument("--vq_ckpt", default=None,
                   help="stage-1 checkpoint for s2g_body_pixel")
    p.add_argument("--face_bucket", type=int, default=0,
                   help="face stage: round clip lengths up to multiples of "
                        "this many frames (compile O(#buckets) programs) "
                        "and batch same-bucket clips")
    p.add_argument("--face_batch_size", type=int, default=1)
    p.add_argument("--no_token_cache", action="store_true",
                   help="body-pixel stage: disable the per-window cache of "
                        "frozen-VQ token grids (cache is numerically "
                        "identical; epochs 2+ skip the frozen encode)")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision training for the pixel/face stages: "
                        "bf16 compute (f32 master params, f32 softmax/CE and "
                        "norm accumulation); other stages ignore the flag")
    p.add_argument("--synthetic", action="store_true",
                   help="use a synthetic dataset (smoke runs)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    args = parse_args()

    import jax
    from talkshow_tpu.config import Config
    from talkshow_tpu.data.dataset import ShowDataset, synthetic_dataset
    from talkshow_tpu.train import steps as tsteps
    from talkshow_tpu.train.trainer import Trainer, load_checkpoint

    cfg = Config.from_reference_json(args.config_file)
    if args.data_root:
        cfg.data.data_root = args.data_root
    cfg.train.seed = args.seed
    name = cfg.model.model_name
    batch_mode = "windows"
    run_dir = args.run_dir or os.path.join("experiments", cfg.log.name)

    feat = "raw" if cfg.model.encoder_choice == "faceformer" else "mfcc"
    if args.synthetic:
        ds = synthetic_dataset(num_clips=4, frames=240)
        ds.generate_length = cfg.data.pose.generate_length
        if feat == "raw":
            import numpy as np
            rng0 = np.random.default_rng(0)
            if args.face_bucket:
                # varied lengths: bucketing handles the compile count
                for i, c in enumerate(ds.clips):
                    t = c.poses.shape[0] - 7 * i
                    c.poses = c.poses[:t]
                    c.expression = c.expression[:t]
                    n = t * 16000 // 30
                    c.aud_feat = rng0.standard_normal((n, 1)).astype(np.float32)
            else:
                # equal-length clips -> a single jit compilation for the
                # whole-clip face stage
                tmin = min(c.poses.shape[0] for c in ds.clips)
                for c in ds.clips:
                    c.poses = c.poses[:tmin]
                    c.expression = c.expression[:tmin]
                    n = tmin * 16000 // 30
                    c.aud_feat = rng0.standard_normal((n, 1)).astype(np.float32)
    else:
        cache = os.path.join(cfg.data.data_root or ".",
                             "train" + cfg.data.pklname)
        ds = ShowDataset.from_root(cfg.data.data_root, args.speakers, "train",
                                   feat=feat, cache_pkl=cache,
                                   generate_length=cfg.data.pose.generate_length,
                                   convert_to_6d=cfg.data.pose.convert_to_6d)
    print(f"dataset: {len(ds.clips)} clips")

    rep6d = cfg.data.pose.convert_to_6d
    scale = 2 if rep6d else 1
    token_encoder = None
    batch_keys = None   # per-stage: keys the step reads; rest never uploads
    if name == "s2g_body_vq":
        from talkshow_tpu.models.vqvae import VQVAE
        vq_body = VQVAE(in_dim=39 * scale, num_hiddens=cfg.model.vq_num_hiddens,
                        embedding_dim=cfg.model.vq_embedding_dim)
        vq_hand = VQVAE(in_dim=90 * scale, num_hiddens=cfg.model.vq_num_hiddens,
                        embedding_dim=cfg.model.vq_embedding_dim)
        init_state, step = tsteps.make_body_vq_step(
            vq_body, vq_hand, cfg.train.generator_learning_rate, rep6d=rep6d)
        needs_rng = False
        batch_keys = ("poses",)
    elif name == "s2g_body_pixel":
        from talkshow_tpu.models.pixelcnn import GatedPixelCNN
        from talkshow_tpu.models.vqvae import VQVAE, AudioEncoder
        vq_body = VQVAE(in_dim=39 * scale, num_hiddens=cfg.model.vq_num_hiddens)
        vq_hand = VQVAE(in_dim=90 * scale, num_hiddens=cfg.model.vq_num_hiddens)
        vq_ckpt_path = args.vq_ckpt or cfg.model.vq_path
        if not vq_ckpt_path:
            raise SystemExit("s2g_body_pixel requires --vq_ckpt")
        init_vq, _ = tsteps.make_body_vq_step(vq_body, vq_hand, rep6d=rep6d)
        like = init_vq(jax.random.PRNGKey(0),
                       window=cfg.data.pose.generate_length)
        restored = load_checkpoint(vq_ckpt_path, {"state": like, "epoch": 0,
                                                  "global_step": 0})["state"]
        frozen_vars = {
            "body": {"params": restored.params["body"],
                     "batch_stats": restored.batch_stats["body"]},
            "hand": {"params": restored.params["hand"],
                     "batch_stats": restored.batch_stats["hand"]},
        }
        frozen_states = restored.vq
        # 6d variant uses dim 512 / 10 layers (smplx_body_pixel.py:49-53)
        pix_dim = 512 if rep6d else cfg.model.pixelcnn_dim
        pix_layers = 10 if rep6d else cfg.model.pixelcnn_layers
        prior = GatedPixelCNN(input_dim=cfg.model.code_num,
                              dim=pix_dim, n_layers=pix_layers,
                              n_classes=cfg.model.num_speakers,
                              bh_model=cfg.model.bh_model,
                              dtype=jax.numpy.bfloat16 if args.bf16 else None)
        audio_enc = AudioEncoder(num_hiddens=256)
        init_state, step = tsteps.make_body_pixel_step(
            prior, audio_enc, vq_body, vq_hand, frozen_vars, frozen_states,
            cfg.train.generator_learning_rate, cfg.train.max_gradient_norm,
            rep6d=rep6d)
        if not args.no_token_cache:
            token_encoder = tsteps.make_token_encoder(
                vq_body, vq_hand, frozen_vars, frozen_states, rep6d=rep6d)
        needs_rng = True
        batch_keys = ("poses", "aud_feat", "speaker")
    elif name == "s2g_face":
        from talkshow_tpu.models.face import FaceGenerator
        from talkshow_tpu.models.wav2vec import Wav2Vec2Config
        from talkshow_tpu.train.steps import make_face_step
        face = FaceGenerator(wav2vec_cfg=Wav2Vec2Config(
            dtype=jax.numpy.bfloat16 if args.bf16 else None))
        init_state, step = make_face_step(
            face, max_grad_norm=cfg.train.max_gradient_norm,
            window=cfg.data.pose.generate_length)
        needs_rng = True
        batch_mode = "face_clips"  # whole clips @ batch 1 (config/face.json)
    elif name == "s2g_body_ae":
        from talkshow_tpu.models.vqvae import AE
        ae = AE(in_dim=129, num_hiddens=cfg.model.vq_num_hiddens)
        init_state, step = tsteps.make_body_ae_step(
            ae, cfg.train.generator_learning_rate)
        needs_rng = False
        batch_keys = ("poses",)
    elif name == "s2g_LS3DCG":
        from talkshow_tpu.models.ls3dcg import (LS3DCGDiscriminator,
                                                LS3DCGGenerator)
        gen, disc = LS3DCGGenerator(), LS3DCGDiscriminator()
        init_state, step = tsteps.make_ls3dcg_step(
            gen, disc, cfg.train.generator_learning_rate,
            cfg.train.keypoint_loss_weight, cfg.train.gan_loss_weight,
            window=cfg.data.pose.generate_length)
        needs_rng = False
        batch_keys = ("poses", "expression", "aud_feat")
    else:
        raise SystemExit(f"unknown stage {name}")

    trainer = Trainer(cfg, ds, init_state, step, needs_rng=needs_rng,
                      run_dir=run_dir, batch_mode=batch_mode,
                      face_bucket_frames=args.face_bucket,
                      face_batch_size=args.face_batch_size,
                      token_encoder=token_encoder,
                      batch_keys=batch_keys).setup()
    if args.resume:
        trainer.resume(args.resume)
    trainer.train(epochs=args.epochs)
    print(f"done; checkpoints in {run_dir}")


if __name__ == "__main__":
    main()
