"""SMPL-X linear blend skinning, pure JAX (vmapped over frames/samples).

Replaces the external `smplx` package used by the reference at eval/visualise
time (scripts/demo.py:274-295, data_utils/get_j.py:20-51).  The computation
is the standard SMPL-X forward:

    v_shaped = v_template + shapedirs . [betas | expression]
    J        = J_regressor . v_shaped
    v_posed  = v_shaped + posedirs . vec(R_1..54 - I)
    verts    = LBS(v_posed, W, rigid transforms along the kinematic tree)

All heavy steps are matmuls over (V ~ 10475, 3) so the whole forward is a
handful of MXU ops; frames batch trivially (the reference loops python-side
at batch size 1, demo.py:122-152).

Pose-vector layout matches the TalkSHOW 265-D convention: this module's
`smplx_forward_talkshow` takes the (T, 265) vector and reorders it into the
model's joint order (global_orient, body 21, jaw, leye, reye, hands 15+15).
Model data loads from the official SMPLX_NEUTRAL_2020.npz (not bundled —
licensed); tests use a synthetic rig.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from talkshow_tpu.ops.rotation import axis_angle_to_matrix

NUM_JOINTS = 55            # pelvis-rooted kinematic tree
NUM_BODY_JOINTS = 21


class SmplxModel(NamedTuple):
    v_template: jnp.ndarray      # (V, 3)
    shapedirs: jnp.ndarray       # (V, 3, S)  shape (+expression) dirs
    posedirs: jnp.ndarray        # ((J-1)*9, V*3)
    j_regressor: jnp.ndarray     # (J, V)
    parents: np.ndarray          # (J,) int, host-side (static tree)
    lbs_weights: jnp.ndarray     # (V, J)
    hands_mean_l: jnp.ndarray    # (45,)
    hands_mean_r: jnp.ndarray    # (45,)
    num_betas: int
    num_expression: int
    faces: np.ndarray | None = None   # (F, 3) int, host-side (rendering)


def load_smplx_npz(path: str, num_betas: int = 300,
                   num_expression: int = 100) -> SmplxModel:
    """Load the official SMPL-X npz (e.g. SMPLX_NEUTRAL_2020.npz)."""
    d = np.load(path, allow_pickle=True)
    shapedirs = np.asarray(d["shapedirs"], np.float32)
    # layout: [0:300] betas, [300:400] expression (2020 model)
    total = num_betas + num_expression
    if shapedirs.shape[-1] < total:
        raise ValueError(
            f"model has {shapedirs.shape[-1]} shape dirs; need {total} "
            "(use the 300-beta SMPLX_NEUTRAL_2020.npz)")
    shapedirs = shapedirs[..., :total]
    posedirs = np.asarray(d["posedirs"], np.float32)
    v = posedirs.shape[0]
    posedirs = posedirs.reshape(v * 3, -1).T      # ((J-1)*9, V*3)
    return SmplxModel(
        v_template=jnp.asarray(d["v_template"], jnp.float32),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(d["J_regressor"], jnp.float32),
        parents=np.asarray(d["kintree_table"][0], np.int64),
        lbs_weights=jnp.asarray(d["weights"], jnp.float32),
        hands_mean_l=jnp.asarray(d["hands_meanl"], jnp.float32),
        hands_mean_r=jnp.asarray(d["hands_meanr"], jnp.float32),
        num_betas=num_betas,
        num_expression=num_expression,
        faces=np.asarray(d["f"], np.int32) if "f" in d else None,
    )


def _rigid_transform(rot: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], rot.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def batch_rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                          parents: np.ndarray):
    """Forward kinematics.

    rot_mats (B, J, 3, 3); joints (B, J, 3) rest positions.
    Returns (posed_joints (B, J, 3), rel_transforms (B, J, 4, 4)).
    The tree is static so the chain is an unrolled python loop over 55
    joints — XLA sees a fixed DAG of small matmuls.
    """
    rel_joints = joints.at[:, 1:].add(-joints[:, parents[1:]])
    transforms_mat = _rigid_transform(rot_mats, rel_joints)   # (B, J, 4, 4)

    chain = [transforms_mat[:, 0]]
    for j in range(1, len(parents)):
        chain.append(chain[parents[j]] @ transforms_mat[:, j])
    transforms = jnp.stack(chain, axis=1)                     # (B, J, 4, 4)

    posed_joints = transforms[..., :3, 3]
    # subtract the rest-pose-joint contribution (standard LBS correction)
    joints_hom = jnp.concatenate(
        [joints, jnp.zeros(joints.shape[:-1] + (1,), joints.dtype)], axis=-1)
    correction = (transforms @ joints_hom[..., None])[..., 0]
    rel = transforms - jnp.concatenate(
        [jnp.zeros(transforms.shape[:-1] + (3,), transforms.dtype),
         correction[..., None]], axis=-1)
    return posed_joints, rel


def lbs(model: SmplxModel, betas: jnp.ndarray, expression: jnp.ndarray,
        full_pose_aa: jnp.ndarray, return_verts: bool = True):
    """Core SMPL-X forward.

    betas (B, num_betas); expression (B, num_expression);
    full_pose_aa (B, 55, 3) in MODEL joint order
    (global, body*21, jaw, leye, reye, lhand*15, rhand*15).
    Returns (vertices (B, V, 3) | None, joints (B, 55, 3)).
    """
    shape_coeffs = jnp.concatenate([betas, expression], axis=-1)  # (B, S)
    v_shaped = model.v_template[None] + jnp.einsum(
        "vcs,bs->bvc", model.shapedirs, shape_coeffs)
    joints = jnp.einsum("jv,bvc->bjc", model.j_regressor, v_shaped)

    rot_mats = axis_angle_to_matrix(full_pose_aa)                # (B, 55, 3, 3)
    eye = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(rot_mats.shape[0], -1)
    pose_offsets = (pose_feature @ model.posedirs).reshape(v_shaped.shape)
    v_posed = v_shaped + pose_offsets

    posed_joints, rel_transforms = batch_rigid_transform(
        rot_mats, joints, model.parents)
    if not return_verts:
        return None, posed_joints

    t = jnp.einsum("vj,bjxy->bvxy", model.lbs_weights, rel_transforms)
    v_hom = jnp.concatenate(
        [v_posed, jnp.ones(v_posed.shape[:-1] + (1,), v_posed.dtype)], axis=-1)
    verts = (t @ v_hom[..., None])[..., :3, 0]
    return verts, posed_joints


def talkshow_pose_to_model_order(pred265: jnp.ndarray,
                                 model: SmplxModel,
                                 flat_hand_mean: bool = False):
    """(B, 265) TalkSHOW layout -> ((B, 55, 3) pose, (B, 100) expression).

    TalkSHOW 265 layout (ops/pose.py): [jaw, leye, reye, orient, body63,
    lhand45, rhand45, exp100]; the model order per data_utils/get_j.py:20-31.
    flat_hand_mean=False adds the MANO hand means (the reference smplx
    config, scripts/demo.py:285).
    """
    jaw = pred265[..., 0:3]
    leye = pred265[..., 3:6]
    reye = pred265[..., 6:9]
    orient = pred265[..., 9:12]
    body = pred265[..., 12:75]
    lhand = pred265[..., 75:120]
    rhand = pred265[..., 120:165]
    exp = pred265[..., 165:265]
    if not flat_hand_mean:
        lhand = lhand + model.hands_mean_l
        rhand = rhand + model.hands_mean_r
    pose = jnp.concatenate([orient, body, jaw, leye, reye, lhand, rhand], axis=-1)
    return pose.reshape(pose.shape[:-1] + (NUM_JOINTS, 3)), exp


def smplx_forward_talkshow(model: SmplxModel, betas: jnp.ndarray,
                           pred265: jnp.ndarray, return_verts: bool = True):
    """(T, 265) params + (num_betas,) betas -> vertices/joints per frame.

    Batched equivalent of the reference's frame loop
    (data_utils/get_j.py:20-51); float32 on TPU vs float64 in the
    reference (tolerance checked in tests).
    """
    pose, exp = talkshow_pose_to_model_order(pred265, model)
    b = jnp.broadcast_to(betas[None, :], (pred265.shape[0], betas.shape[0]))
    return lbs(model, b, exp, pose, return_verts)
