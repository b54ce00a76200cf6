#!/usr/bin/env python
"""VQ reconstruction 'capacity' evaluation (mirror of scripts/test_vq.py).

    python scripts/test_vq.py --vq_ckpt experiments/body-vq/ckpt-99 \
        --data_root <SHOW> [--synthetic]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vq_ckpt", required=False, default=None)
    p.add_argument("--data_root", default=None)
    p.add_argument("--speakers", nargs="+",
                   default=["oliver", "chemistry", "seth", "conan"])
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()

    import jax
    from talkshow_tpu.data.dataset import ShowDataset, synthetic_dataset
    from talkshow_tpu.eval.runners import eval_vq_capacity
    from talkshow_tpu.models.vqvae import VQVAE
    from talkshow_tpu.train import steps as tsteps
    from talkshow_tpu.train.trainer import load_checkpoint

    vq_body = VQVAE(in_dim=39)
    vq_hand = VQVAE(in_dim=90)
    init_vq, _ = tsteps.make_body_vq_step(vq_body, vq_hand)
    like = init_vq(jax.random.PRNGKey(0))
    if args.vq_ckpt:
        state = load_checkpoint(args.vq_ckpt, {"state": like, "epoch": 0,
                                               "global_step": 0})["state"]
    else:
        print("NOTE: random weights (no --vq_ckpt)")
        state = like
    vq_vars = {k: {"params": state.params[k], "batch_stats": state.batch_stats[k]}
               for k in ("body", "hand")}

    if args.synthetic or not args.data_root:
        ds = synthetic_dataset(num_clips=4, frames=240)
    else:
        ds = ShowDataset.from_root(args.data_root, args.speakers, "test")
    res = eval_vq_capacity(vq_body, vq_hand, vq_vars, state.vq, ds)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
