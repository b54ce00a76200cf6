#!/usr/bin/env python
"""Face evaluation: jaw L1 / expression MSE (+ vertex LVD with SMPL-X) —
mirror of scripts/test_face.py.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default=None)
    p.add_argument("--speakers", nargs="+",
                   default=["oliver", "chemistry", "seth", "conan"])
    p.add_argument("--face_ckpt", default=None)
    p.add_argument("--smplx_npz", default=None)
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()

    from talkshow_tpu.data.dataset import ShowDataset, synthetic_dataset
    from talkshow_tpu.eval.runners import eval_face
    from talkshow_tpu.pipeline import Pipeline

    if args.face_ckpt:
        pipe = Pipeline.from_torch_checkpoints(face_ckpt=args.face_ckpt)
    else:
        print("NOTE: random weights")
        pipe = Pipeline.create(0)

    if args.synthetic or not args.data_root:
        import numpy as np
        ds = synthetic_dataset(num_clips=2, frames=90)
        for c in ds.clips:  # face eval consumes the raw-waveform feature
            c.aud_feat = np.random.default_rng(0).standard_normal(
                (c.poses.shape[0] * 16000 // 30, 1)).astype(np.float32)
    else:
        ds = ShowDataset.from_root(args.data_root, args.speakers, "test",
                                   feat="raw")

    smplx_model = None
    if args.smplx_npz:
        from talkshow_tpu.ops.smplx_lbs import load_smplx_npz
        smplx_model = load_smplx_npz(args.smplx_npz)

    res = eval_face(pipe.face_model, pipe.face_vars, ds, smplx_model)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
