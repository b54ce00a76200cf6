#!/usr/bin/env python
"""Write a deterministic synthetic SMPL-X-shaped npz.

The licensed SMPLX_NEUTRAL_2020.npz cannot be bundled, which previously kept
the reference's SMPL-X-space metrics (LVD over joints, beat consistency,
face vertex-LVD — /root/reference/scripts/test_body.py:157-174,
test_face.py:148-149) out of every published eval battery.  This generator
produces an npz in the OFFICIAL on-disk schema (the exact keys
`ops/smplx_lbs.py:load_smplx_npz` reads: v_template/shapedirs/posedirs/
J_regressor/kintree_table/weights/hands_meanl/hands_meanr/f) with the full
TalkSHOW coefficient budget (300 betas + 100 expression, 55 joints), so the
eval battery exercises the REAL `smplx_forward_talkshow` path end to end.
Swapping in the licensed asset later is a path change only.

The rig extends tests/test_smplx_lbs.py:synthetic_model (the numpy-reference
-validated chain rig) to the official coefficient counts.

    python scripts/make_synthetic_smplx.py --out experiments/smplx_synthetic.npz
"""
from __future__ import annotations

import argparse
import os

import numpy as np

NUM_JOINTS = 55
NUM_BETAS = 300
NUM_EXPRESSION = 100


def build_synthetic_smplx_arrays(verts_per_joint: int = 8, seed: int = 0):
    """Chain rig (joint j at (0, 0.1*j, 0), parent j-1) sized to the official
    SMPL-X coefficient counts; returns the npz key->array dict."""
    rng = np.random.default_rng(seed)
    J, S = NUM_JOINTS, NUM_BETAS + NUM_EXPRESSION
    V = J * verts_per_joint

    joints_rest = np.stack(
        [np.zeros(J), np.arange(J) * 0.1, np.zeros(J)], 1).astype(np.float64)
    v_template = np.repeat(joints_rest, verts_per_joint, axis=0)
    v_template = v_template + rng.standard_normal((V, 3)) * 0.02

    # regressor averages each joint's own vertex cluster
    j_reg = np.zeros((J, V))
    for j in range(J):
        j_reg[j, j * verts_per_joint:(j + 1) * verts_per_joint] = \
            1.0 / verts_per_joint

    # skinning: 80% own joint, 20% parent (smooth chain deformation)
    w = np.zeros((V, J))
    for j in range(J):
        sl = slice(j * verts_per_joint, (j + 1) * verts_per_joint)
        w[sl, j] = 0.8
        w[sl, max(j - 1, 0)] += 0.2

    parents = np.concatenate([[0], np.arange(J - 1)]).astype(np.uint32)
    kintree = np.stack([parents, np.arange(J, dtype=np.uint32)])

    # shape/expression dirs scaled so unit coefficients move mm-to-cm like
    # the real model; expression dirs concentrated near the head-end joints
    shapedirs = rng.standard_normal((V, 3, S)).astype(np.float64) * 0.002
    posedirs = rng.standard_normal((V, 3, (J - 1) * 9)).astype(np.float64) \
        * 0.0005

    # triangle fan over each joint's vertex ring (renderer-consumable)
    faces = []
    for j in range(J):
        b = j * verts_per_joint
        for k in range(verts_per_joint - 2):
            faces.append([b, b + k + 1, b + k + 2])
    faces = np.asarray(faces, np.uint32)

    return {
        "v_template": v_template,
        "shapedirs": shapedirs,
        "posedirs": posedirs,
        "J_regressor": j_reg,
        "kintree_table": kintree,
        "weights": w,
        "hands_meanl": rng.standard_normal(45) * 0.1,
        "hands_meanr": rng.standard_normal(45) * 0.1,
        "f": faces,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="experiments/smplx_synthetic.npz")
    ap.add_argument("--verts-per-joint", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    arrays = build_synthetic_smplx_arrays(args.verts_per_joint, args.seed)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **arrays)
    v = arrays["v_template"].shape[0]
    print(f"wrote {args.out}: {v} verts, {NUM_JOINTS} joints, "
          f"{NUM_BETAS}+{NUM_EXPRESSION} shape dirs, "
          f"{arrays['f'].shape[0]} faces")


if __name__ == "__main__":
    main()
