#!/usr/bin/env python
"""wav -> SMPL-X motion (+optional video) — mirror of the reference demo.

    python scripts/demo.py --audio_file demo_audio/1st-page.wav --id 0 \
        --num_sample 3 --out_dir visualise/video/demo

Loads reference .pth checkpoints when given (--face_ckpt/--body_ckpt,
converted on the fly via talkshow_tpu.convert), otherwise runs random
weights (pipeline smoke / latency measurement).  Saves the generated
(S, T, 265) array as .npy like scripts/demo.py:242-245; rendering is an
optional extra (see talkshow_tpu/render.py) kept off the TPU path.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--audio_file", required=True)
    p.add_argument("--id", type=int, default=0,
                   help="speaker id 0-3 (oliver/chemistry/seth/conan)")
    p.add_argument("--num_sample", type=int, default=1)
    p.add_argument("--only_face", action="store_true")
    p.add_argument("--stand", action="store_true")
    p.add_argument("--continuity", action="store_true",
                   help="chunked AR continuation for long audio")
    p.add_argument("--streaming", action="store_true",
                   help="sliding-window streaming generation (O(1)/chunk; "
                        "see talkshow_tpu/streaming.py)")
    p.add_argument("--face_ckpt", default=None, help="reference face .pth")
    p.add_argument("--body_ckpt", default=None, help="reference body-pixel .pth")
    p.add_argument("--vq_ckpt", default=None, help="reference body-vq .pth")
    p.add_argument("--out_dir", default="visualise/video/demo")
    p.add_argument("--render", action="store_true",
                   help="render a video if an SMPL-X npz + renderer deps exist")
    p.add_argument("--render_mode", default="whole_body",
                   choices=["default", "whole_body", "face"],
                   help="camera mode (reference demo renders whole_body, "
                        "scripts/demo.py:247)")
    p.add_argument("--smplx_npz", default=None)
    p.add_argument("--model", default="talkshow",
                   choices=["talkshow", "ls3dcg"],
                   help="generation model (demo.py s2g_LS3DCG branch)")
    p.add_argument("--ls3dcg_ckpt", default=None,
                   help="orbax run checkpoint from train.py --model s2g_LS3DCG")
    p.add_argument("--norm_stats", default=None,
                   help="norm_stats.npy for models trained with "
                        "Data.pose.normalization (demo.py:107-111)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--face_f32", action="store_true",
                   help="force f32 face/wav2vec compute (on TPU the face "
                        "stage defaults to bf16 matmuls; use this for "
                        "bit-parity runs)")
    return p.parse_args()


def main():
    args = parse_args()
    import numpy as np
    from talkshow_tpu.pipeline import Pipeline

    if args.model == "ls3dcg":
        import jax
        import jax.numpy as jnp
        from talkshow_tpu.models.ls3dcg import (LS3DCGDiscriminator,
                                                LS3DCGGenerator,
                                                infer_on_audio)
        gen = LS3DCGGenerator()
        if args.ls3dcg_ckpt:
            from talkshow_tpu.train import steps as tsteps
            from talkshow_tpu.train.trainer import load_checkpoint
            init_state, _ = tsteps.make_ls3dcg_step(gen, LS3DCGDiscriminator())
            like = init_state(jax.random.PRNGKey(0))
            st = load_checkpoint(args.ls3dcg_ckpt,
                                 {"state": like, "epoch": 0,
                                  "global_step": 0})["state"]
            gen_vars = {"params": st.g_params, "batch_stats": st.g_stats}
        else:
            print("NOTE: no --ls3dcg_ckpt; using random weights")
            v = gen.init(jax.random.PRNGKey(args.seed),
                         jnp.zeros((1, 8, 64)))
            gen_vars = {"params": v["params"], "batch_stats": v["batch_stats"]}
        norm_stats = None
        if args.norm_stats:
            arr = np.load(args.norm_stats, allow_pickle=True)
            norm_stats = (arr[0], arr[1])
        motion = infer_on_audio(gen, gen_vars, args.audio_file,
                                num_samples=args.num_sample,
                                stand=args.stand, norm_stats=norm_stats)
    else:
        if args.face_ckpt or args.body_ckpt:
            pipe = Pipeline.from_torch_checkpoints(
                face_ckpt=args.face_ckpt, body_ckpt=args.body_ckpt,
                vq_ckpt=args.vq_ckpt)
        else:
            print("NOTE: no checkpoints given; using random weights")
            pipe = Pipeline.create(args.seed)
        if args.norm_stats:
            pipe = pipe.with_norm_stats(args.norm_stats)
        if args.face_f32:
            pipe = pipe.with_face_dtype(None)

        if args.streaming:
            if args.only_face or args.continuity or args.num_sample != 1:
                raise SystemExit(
                    "--streaming generates one full-body stream; it is "
                    "incompatible with --only_face/--continuity/"
                    "--num_sample>1")
            from talkshow_tpu.ops.audio import load_wav
            from talkshow_tpu.streaming import StreamingSession
            sess = StreamingSession(pipe, speaker=args.id, stand=args.stand,
                                    seed=args.seed)
            wav, sr = load_wav(args.audio_file)
            if sr != 16000:
                import jax.numpy as jnp
                from talkshow_tpu.ops.audio import resample
                wav = np.asarray(resample(jnp.asarray(wav), sr, 16000))
            blocks = []
            for i in range(0, len(wav), 16000):   # 1 s feeds
                out = sess.feed(wav[i:i + 16000])
                if out is not None:
                    blocks.append(out)
            tail = sess.finish()
            if tail is not None:
                blocks.append(tail)
            motion = np.concatenate(blocks)[None]
        else:
            motion = pipe.generate(args.audio_file, speaker=args.id,
                                   num_samples=args.num_sample,
                                   only_face=args.only_face,
                                   stand=args.stand,
                                   continuity=args.continuity,
                                   seed=args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.audio_file))[0]
    out = os.path.join(args.out_dir, stem + ".npy")
    # reference saves the samples concatenated on time (demo.py:242-245)
    np.save(out, motion.reshape(-1, motion.shape[-1]))
    print(f"saved motion {motion.shape} -> {out}")

    if args.render:
        from talkshow_tpu.render import render_motion_video
        render_motion_video(motion, args.audio_file,
                            os.path.join(args.out_dir, stem + ".mp4"),
                            smplx_npz=args.smplx_npz,
                            mode=args.render_mode)


if __name__ == "__main__":
    main()
