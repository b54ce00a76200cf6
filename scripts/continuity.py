#!/usr/bin/env python
"""Chunked long-audio generation demo (mirror of scripts/continuity.py):
the first 2 s are generated, then the remainder continues autoregressively
from the first chunk's tokens (prefix continuation).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--audio_file", required=True)
    p.add_argument("--id", type=int, default=0)
    p.add_argument("--out_dir", default="visualise/video/continuity")
    p.add_argument("--face_ckpt", default=None)
    p.add_argument("--body_ckpt", default=None)
    p.add_argument("--vq_ckpt", default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny random models (CI smoke; no checkpoints)")
    args = p.parse_args()

    import numpy as np
    from talkshow_tpu.pipeline import Pipeline

    if args.body_ckpt:
        pipe = Pipeline.from_torch_checkpoints(
            face_ckpt=args.face_ckpt, body_ckpt=args.body_ckpt,
            vq_ckpt=args.vq_ckpt)
    elif args.tiny:
        print("NOTE: tiny random weights (smoke mode)")
        from talkshow_tpu.models.wav2vec import Wav2Vec2Config
        cfg = Wav2Vec2Config(hidden_size=32, num_layers=1, num_heads=4,
                             intermediate_size=64, conv_dim=(16, 16),
                             conv_kernel=(10, 3), conv_stride=(5, 2),
                             num_conv_pos_embeddings=16,
                             num_conv_pos_embedding_groups=4)
        pipe = Pipeline.create(0, wav2vec_cfg=cfg, num_hiddens=64,
                               pixel_dim=16, pixel_layers=3, code_num=64)
    else:
        print("NOTE: random weights")
        pipe = Pipeline.create(0)

    motion = pipe.generate(args.audio_file, speaker=args.id, num_samples=1,
                           continuity=True)
    os.makedirs(args.out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.audio_file))[0]
    out = os.path.join(args.out_dir, stem + "_continuity.npy")
    np.save(out, motion.reshape(-1, motion.shape[-1]))
    print(f"saved {motion.shape} -> {out}")


if __name__ == "__main__":
    main()
