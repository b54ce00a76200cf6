#!/usr/bin/env python
"""Diversity sampling demo: N samples x 4 speakers from one audio clip in a
single batched program (mirror of scripts/diversity.py), with optional
grid-video rendering — 4 speakers x 3 samples lands on the reference's
12-tile 4x3 layout (visualise/rendering.py:208-232).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--audio_file", required=True)
    p.add_argument("--num_sample", type=int, default=3)
    p.add_argument("--out_dir", default="visualise/video/diversity")
    p.add_argument("--face_ckpt", default=None)
    p.add_argument("--body_ckpt", default=None)
    p.add_argument("--vq_ckpt", default=None)
    p.add_argument("--render", action="store_true",
                   help="render the full 4 x num_sample grid video")
    p.add_argument("--smplx_npz", default=None)
    p.add_argument("--render_mode", default="whole_body",
                   choices=["default", "whole_body", "face"])
    p.add_argument("--tiny", action="store_true",
                   help="random-init TINY body models (CI smoke; CPU-fast)")
    args = p.parse_args()

    import numpy as np
    from talkshow_tpu.eval.metrics import diversity
    from talkshow_tpu.ops import audio as audio_ops
    from talkshow_tpu.pipeline import Pipeline

    if args.body_ckpt:
        pipe = Pipeline.from_torch_checkpoints(
            face_ckpt=args.face_ckpt, body_ckpt=args.body_ckpt,
            vq_ckpt=args.vq_ckpt)
    elif args.tiny:
        print("NOTE: tiny random weights (smoke mode)")
        from talkshow_tpu.models.wav2vec import Wav2Vec2Config
        tiny_w2v = Wav2Vec2Config(
            hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
            conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4)
        pipe = Pipeline.create(0, wav2vec_cfg=tiny_w2v, code_num=64,
                               embedding_dim=16, num_hiddens=32,
                               pixel_dim=32, pixel_layers=2)
    else:
        print("NOTE: random weights")
        pipe = Pipeline.create(0)

    feat = audio_ops.get_mfcc(args.audio_file, sr=22000, fps=30)
    all_motion = []
    scores = {}
    for speaker in range(4):
        conv = np.asarray(pipe.generate_body(feat, speaker,
                                             num_samples=args.num_sample,
                                             seed=speaker))
        scores[f"diversity_speaker{speaker}"] = diversity(conv)
        all_motion.append(conv)
    motion = np.stack(all_motion)          # (4, S, T, 129)

    os.makedirs(args.out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.audio_file))[0]
    np.save(os.path.join(args.out_dir, stem + "_diversity.npy"), motion)

    if args.render:
        from talkshow_tpu.render import render_motion_video
        # face is speaker-independent at demo time (zero one-hot id), so
        # one face pass + the conv poses already computed above suffice
        wav16, sr0 = audio_ops.load_wav(args.audio_file)
        if sr0 != 16000:
            import jax.numpy as jnp
            wav16 = np.asarray(audio_ops.resample(jnp.asarray(wav16),
                                                  sr0, 16000))
        face_out = np.asarray(pipe.generate_face(wav16))
        full = np.concatenate(
            [pipe.assemble_full(face_out, motion[speaker])
             for speaker in range(4)])       # (4*S, T, 265)
        render_motion_video(full, args.audio_file,
                            os.path.join(args.out_dir, stem + "_grid.mp4"),
                            smplx_npz=args.smplx_npz, mode=args.render_mode)
    print(json.dumps(scores))


if __name__ == "__main__":
    main()
