#!/usr/bin/env python
"""Quantitative body evaluation: FGD / feat-MAE / L2 / diversity (+ LVD/BC
with an SMPL-X npz) — mirror of scripts/test_body.py.

    python scripts/test_body.py --body_ckpt <pixel.pth-or-orbax> \
        --ae_ckpt <feature_extractor> --data_root <SHOW> [--smplx_npz ...]
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
    p.add_argument("--body_ckpt", default=None, help="reference .pth")
    p.add_argument("--vq_ckpt", default=None)
    p.add_argument("--ae_ckpt", default=None)
    p.add_argument("--smplx_npz", default=None)
    p.add_argument("--num_samples", type=int, default=2)
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from talkshow_tpu.data.dataset import ShowDataset, synthetic_dataset
    from talkshow_tpu.eval.runners import eval_body
    from talkshow_tpu.models.vqvae import AE
    from talkshow_tpu.pipeline import Pipeline

    if args.body_ckpt:
        pipe = Pipeline.from_torch_checkpoints(body_ckpt=args.body_ckpt,
                                               vq_ckpt=args.vq_ckpt)
    else:
        print("NOTE: random weights")
        pipe = Pipeline.create(0)

    ae = AE(in_dim=129)
    if args.ae_ckpt:
        if args.ae_ckpt.endswith((".pth", ".pt")):
            import torch
            from talkshow_tpu.convert.talkshow import convert_body_ae_checkpoint
            ckpt = torch.load(args.ae_ckpt, map_location="cpu",
                              weights_only=False)
            ae_vars = convert_body_ae_checkpoint(ckpt)
        else:  # orbax run dir from `train.py --model s2g_body_ae`
            from talkshow_tpu.train import steps as tsteps
            from talkshow_tpu.train.trainer import load_checkpoint
            init_state, _ = tsteps.make_body_ae_step(ae)
            like = init_state(jax.random.PRNGKey(1))
            restored = load_checkpoint(
                args.ae_ckpt,
                {"state": like, "epoch": 0, "global_step": 0})["state"]
            ae_vars = {"params": restored.params,
                       "batch_stats": restored.batch_stats}
    else:
        print("WARNING: --ae_ckpt not given; FGD uses a RANDOM-INIT "
              "feature extractor and is NOT comparable to the reference",
              file=sys.stderr)
        ae_vars = ae.init(jax.random.PRNGKey(1), jnp.zeros((1, 88, 129)))

    if args.synthetic or not args.data_root:
        ds = synthetic_dataset(num_clips=4, frames=240)
    else:
        ds = ShowDataset.from_root(args.data_root, args.speakers, "test")

    smplx_model = None
    if args.smplx_npz:
        from talkshow_tpu.ops.smplx_lbs import load_smplx_npz
        smplx_model = load_smplx_npz(args.smplx_npz)

    res = eval_body(pipe.body, ae, ae_vars, ds,
                    num_samples=args.num_samples, smplx_model=smplx_model)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
