"""SMPL-X pose-vector layout, channel masks and composition helpers.

The TalkSHOW data pipeline packs SMPL-X parameters for one frame as a flat
vector.  The canonical ("full") axis-angle layout is 165-D:

    [ jaw(3) | leye(3) | reye(3) | global_orient(3) | body 21x3 (63) |
      left_hand 15x3 (45) | right_hand 15x3 (45) ]

(reference: data_utils/mesh_dataset.py:174-184).  With the 100-D expression
appended it becomes the 265-D vector consumed by SMPL-X at eval time
(data_utils/get_j.py:20-31).  The raw dataset stores hands as 12-D PCA
coefficients (99-D packed) which `hand_pca_to_full` expands
(mesh_dataset.py:22-26).

The body/hand generators operate on the 129 "conversational" channels
obtained by dropping a fixed set of lower-body/eye channels (`C_INDEX_3D`,
from data_utils/lower_body.py:44-56).  `part2full` re-inserts canned
lower-body poses into a [jaw | conv129 | expression] prediction
(lower_body.py:68-87).

NOTE on reference semantics we replicate exactly: the 3d channel mask drops
channels 45-50 (body joints 11,12) while `part2full` re-inserts the canned
lower body at channels 39-44 (body joints 9,10), shifting the tail of the
predicted channels up by one joint.  This asymmetry is load-bearing for
output parity with released checkpoints, so we reproduce it as-is.
"""
from __future__ import annotations

import json
import os
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Layout constants
# ---------------------------------------------------------------------------

FULL_POSE_DIM = 165          # axis-angle, 55 joints * 3
EXPRESSION_DIM = 100
FULL_DIM = FULL_POSE_DIM + EXPRESSION_DIM   # 265
CONV_DIM = 129               # "conversational" channels kept for body models
BODY_DIM = 39                # first 39 conv channels -> body VQ
HAND_DIM = 90                # last 90 conv channels -> hand VQ
JAW_DIM = 3
NUM_SPEAKERS = 4

# speaker name -> dataset id (data_utils/consts.py:3-28); models use id - 20.
SPEAKER_ID = {"oliver": 20, "chemistry": 21, "seth": 22, "conan": 23}
SPEAKER_OFFSET = 20

# Fixed (dropped) channels of the 165-D layout (lower_body.py:44-47).
_FIX_INDEX_3D = np.array(
    list(range(0, 18)) + list(range(21, 27)) + list(range(30, 36)) + list(range(45, 51))
)

_keep = np.ones(FULL_POSE_DIM, dtype=bool)
_keep[_FIX_INDEX_3D] = False
C_INDEX_3D = np.nonzero(_keep)[0]                     # (129,)
C_INDEX_6D = np.stack([2 * C_INDEX_3D, 2 * C_INDEX_3D + 1], -1).reshape(-1)  # (258,)

# Canned lower-body pose, 33 channels in insertion order (lower_body.py:4-8):
# [leye(3), reye(3), global_orient(3), body j0,j1 (6)] + [j3,j4] + [j6,j7] + [j9,j10]
LOWER_POSE = np.array(
    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 3.0747, -0.0158, -0.0152,
     -1.1826512813568115, 0.23866955935955048, 0.15146760642528534,
     -1.2604516744613647, -0.3160211145877838, -0.1603458970785141,
     1.1654603481292725, 0.0, 0.0,
     1.2521806955337524, 0.041598282754421234, -0.06312154978513718,
     0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    dtype=np.float32,
)

# Standing variant (lower_body.py:9-16), used by poses2pred(stand=True).
LOWER_POSE_STAND = np.array(
    [8.9759e-04, 7.1074e-04, -5.9163e-06, 8.9759e-04, 7.1074e-04, -5.9163e-06,
     3.0747, -0.0158, -0.0152,
     -3.6665e-01, -8.8455e-03, 1.6113e-01, -3.6665e-01, -8.8455e-03, 1.6113e-01,
     -3.9716e-01, -4.0229e-02, -1.2637e-01,
     7.9163e-01, 6.8519e-02, -1.5091e-01, 7.9163e-01, 6.8519e-02, -1.5091e-01,
     7.8632e-01, -4.3810e-02, 1.4375e-02,
     -1.0675e-01, 1.2635e-01, 1.6711e-02, -1.0675e-01, 1.2635e-01, 1.6711e-02],
    dtype=np.float32,
)

# Wrist-angle calibration constants for the beat-consistency metric
# (evaluation/FGD.py:14).
CHANGE_ANGLE = np.array([6.0181e-05, 5.1597e-05, 2.1344e-04, 2.1899e-04], dtype=np.float32)


# ---------------------------------------------------------------------------
# Hand PCA expansion
# ---------------------------------------------------------------------------

def _default_asset_dirs():
    env = os.environ.get("TALKSHOW_ASSETS")
    dirs = [env] if env else []
    dirs += [os.path.join(os.path.dirname(__file__), "..", "assets")]
    return [d for d in dirs if d and os.path.isdir(d)]


@lru_cache(maxsize=1)
def load_hand_components(path: str | None = None):
    """Load MANO hand PCA components (asset file `hand_component.json`).

    Returns (left, right), each (45, 45) float64 — row i is the i-th PCA
    component over the 45 axis-angle hand channels.
    """
    if path is None:
        for d in _default_asset_dirs():
            cand = os.path.join(d, "hand_component.json")
            if os.path.isfile(cand):
                path = cand
                break
    if path is None:
        raise FileNotFoundError(
            "hand_component.json not found; set TALKSHOW_ASSETS or pass a path"
        )
    with open(path) as f:
        comp = json.load(f)
    return np.asarray(comp["left"]), np.asarray(comp["right"])


def hand_pca_to_full(packed99: np.ndarray, components=None) -> np.ndarray:
    """Expand the packed 99-D pose (12+12 hand PCA) to the 165-D layout.

    packed99: (T, 99) = [jaw,eyes,orient,body63, lpca12, rpca12]
    (mesh_dataset.py:22-26: uses the first 12 PCA components.)
    """
    if components is None:
        components = load_hand_components()
    left_c, right_c = components
    left = packed99[:, 75:87] @ left_c[:12, :]
    right = packed99[:, 87:99] @ right_c[:12, :]
    return np.concatenate([packed99[:, :75], left, right], axis=-1)


# ---------------------------------------------------------------------------
# Channel extraction / recomposition (jnp, differentiable)
# ---------------------------------------------------------------------------

def full_to_conv(poses: jnp.ndarray, rep6d: bool = False) -> jnp.ndarray:
    """Slice conversational channels from (..., 165) [or (..., 330) for 6d]."""
    idx = C_INDEX_6D if rep6d else C_INDEX_3D
    return poses[..., idx]


def part2full(pred: jnp.ndarray, stand: bool = False) -> jnp.ndarray:
    """[jaw3 | conv129 | exp100] (T, 232) -> full (T, 265).

    Mirrors data_utils/lower_body.py:68-87 including the standing variant
    (zeros everywhere except the canned global orient).
    """
    if stand:
        lp = np.zeros_like(LOWER_POSE)
        lp[6:9] = [3.0747, -0.0158, -0.0152]
    else:
        lp = LOWER_POSE
    lp = jnp.broadcast_to(jnp.asarray(lp, pred.dtype), pred.shape[:-1] + (33,))
    return jnp.concatenate(
        [
            pred[..., 0:3],      # jaw
            lp[..., 0:15],       # leye, reye, orient, body j0,j1
            pred[..., 3:6],      # body j2
            lp[..., 15:21],      # body j3,j4
            pred[..., 6:9],      # body j5
            lp[..., 21:27],      # body j6,j7
            pred[..., 9:12],     # body j8
            lp[..., 27:33],      # body j9,j10
            pred[..., 12:],      # remaining channels + expression
        ],
        axis=-1,
    )


def poses2pred(full: jnp.ndarray, stand: bool = False) -> jnp.ndarray:
    """Replace lower-body channels of a FULL (T, 265) pose with the canned
    pose (lower_body.py:117-133); used to normalise GT for visual compare."""
    lp = LOWER_POSE_STAND if stand else LOWER_POSE
    lp = jnp.broadcast_to(jnp.asarray(lp, full.dtype), full.shape[:-1] + (33,))
    return jnp.concatenate(
        [
            full[..., 0:3],
            lp[..., 0:15],
            full[..., 18:21],
            lp[..., 15:21],
            full[..., 27:30],
            lp[..., 21:27],
            full[..., 36:39],
            lp[..., 27:33],
            full[..., 45:],
        ],
        axis=-1,
    )


def pred2poses(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Blend predicted channels with the first GT frame's lower body
    (lower_body.py:90-101)."""
    rep = lambda s, e: jnp.broadcast_to(gt[0:1, s:e], pred.shape[:-1] + (e - s,))
    return jnp.concatenate(
        [
            pred[..., 0:3], rep(3, 18),
            pred[..., 3:6], rep(21, 27),
            pred[..., 6:9], rep(30, 36),
            pred[..., 9:12], rep(39, 45),
            pred[..., 12:],
        ],
        axis=-1,
    )


def poses2poses(full: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Replace the lower-body channels of a FULL pose with the first GT
    frame's (lower_body.py:104-116; imported by demo/diversity/continuity
    upstream, live only in commented code — carried for C7 completeness)."""
    rep = lambda s, e: jnp.broadcast_to(gt[0:1, s:e], full.shape[:-1] + (e - s,))
    return jnp.concatenate(
        [
            full[..., 0:3], rep(3, 18),
            full[..., 18:21], rep(21, 27),
            full[..., 27:30], rep(30, 36),
            full[..., 36:39], rep(39, 45),
            full[..., 45:],
        ],
        axis=-1,
    )


def split_jaw_body_exp(face_out: jnp.ndarray):
    """Face-generator output (T, 103) -> (jaw (T,3), expression (T,100))."""
    return face_out[..., :3], face_out[..., 3:]


def assemble_full(jaw, conv_body, expression, stand=False):
    """Compose the demo-time full pose: scripts/demo.py:224-227."""
    pred = jnp.concatenate([jaw, conv_body, expression], axis=-1)
    return part2full(pred, stand)


# ---------------------------------------------------------------------------
# Alternative rotation representations of the pose vector
# ---------------------------------------------------------------------------

def axis_angle_poses_to_6d(poses165: jnp.ndarray) -> jnp.ndarray:
    """(T, 165) axis-angle -> (T, 330) rot6d (mesh_dataset.py:187-191)."""
    from talkshow_tpu.ops.rotation import axis_angle_to_rotation_6d
    aa = poses165.reshape(poses165.shape[0], 55, 3)
    return axis_angle_to_rotation_6d(aa).reshape(poses165.shape[0], 330)


def pose6d_to_axis_angle(poses330: jnp.ndarray) -> jnp.ndarray:
    """(T, 330) rot6d -> (T, 165) axis-angle (scripts/demo.py:216-219)."""
    from talkshow_tpu.ops.rotation import rotation_6d_to_axis_angle
    d6 = poses330.reshape(poses330.shape[0], -1, 6)
    return rotation_6d_to_axis_angle(d6).reshape(poses330.shape[0], -1)


def pose5d_to_axis_angle(poses: jnp.ndarray, expression: bool = True) -> jnp.ndarray:
    """Legacy '5d' layout (axis3 + sin + cos per joint) -> axis-angle;
    the eval-time to3d (data_utils/get_j.py:4-17).  Input (T, 275[+100])."""
    exp = None
    if expression:
        exp = poses[:, -100:]
        poses = poses[:, :-100]
    p = poses.reshape(poses.shape[0], -1, 5)
    angle = jnp.arctan2(p[:, :, 3], p[:, :, 4])
    aa = (p[:, :, :3] * angle[..., None]).reshape(poses.shape[0], -1)
    if exp is not None:
        aa = jnp.concatenate([aa, exp], axis=-1)
    return aa
