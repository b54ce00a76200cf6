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
    args = p.parse_args()

    import numpy as np
    from talkshow_tpu.pipeline import Pipeline

    if args.body_ckpt:
        pipe = Pipeline.from_torch_checkpoints(
            face_ckpt=args.face_ckpt, body_ckpt=args.body_ckpt,
            vq_ckpt=args.vq_ckpt)
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
