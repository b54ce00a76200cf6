#!/usr/bin/env python
"""Convert reference PyTorch checkpoints -> orbax trees for this framework.

    # HF wav2vec2 (local snapshot; no downloads happen here)
    python scripts/convert_checkpoints.py wav2vec \
        --src /path/to/wav2vec2-base-960h --out weights/wav2vec2

    # TalkSHOW stage checkpoints (.pth from the reference release)
    python scripts/convert_checkpoints.py body_vq --src ckpt-body-vq.pth --out weights/vq
    python scripts/convert_checkpoints.py body_pixel --src ckpt-pixel.pth --out weights/pixel
    python scripts/convert_checkpoints.py face --src ckpt-face.pth --out weights/face
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def save_tree(path, tree):
    import jax
    import orbax.checkpoint as ocp
    ocp.PyTreeCheckpointer().save(os.path.abspath(path), jax.device_get(tree),
                                  force=True)
    print(f"saved -> {path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["wav2vec", "body_vq", "body_pixel", "face"])
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import torch
    from talkshow_tpu.convert import talkshow as ts

    if args.kind == "wav2vec":
        from transformers import Wav2Vec2Model
        from talkshow_tpu.convert.wav2vec import config_from_hf, convert_wav2vec2
        hf = Wav2Vec2Model.from_pretrained(args.src)  # local path
        cfg = config_from_hf(hf.config)
        params = convert_wav2vec2(hf.state_dict(), cfg)
        save_tree(args.out, {"params": params})
        return

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    if args.kind == "body_vq":
        conv = ts.convert_body_vq_checkpoint(ckpt)
        tree = {k: {"variables": v[0], "vq_state": v[1]._asdict()}
                for k, v in conv.items()}
    elif args.kind == "body_pixel":
        tree = ts.convert_body_pixel_checkpoint(ckpt)
    else:
        tree = ts.convert_face_checkpoint(ckpt)
    save_tree(args.out, tree)


if __name__ == "__main__":
    main()
