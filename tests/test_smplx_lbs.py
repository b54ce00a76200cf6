"""LBS correctness on a synthetic rig + independent numpy reference."""
import numpy as np
import jax.numpy as jnp
import pytest

from talkshow_tpu.ops import smplx_lbs as L
from talkshow_tpu.ops.rotation import axis_angle_to_matrix


def synthetic_model(num_joints=55, verts_per_joint=4, seed=0):
    """A chain rig: joint j at (0, j*0.1, 0), parent j-1; each joint owns a
    few nearby vertices with soft weights."""
    rng = np.random.default_rng(seed)
    J = num_joints
    V = J * verts_per_joint
    joints_rest = np.stack([np.zeros(J), np.arange(J) * 0.1, np.zeros(J)], 1)
    v_template = np.repeat(joints_rest, verts_per_joint, axis=0)
    v_template = v_template + rng.standard_normal((V, 3)) * 0.02

    # J_regressor: averages each joint's own vertices
    j_reg = np.zeros((J, V))
    for j in range(J):
        j_reg[j, j * verts_per_joint:(j + 1) * verts_per_joint] = 1.0 / verts_per_joint
    # make v_template consistent with the regressor target
    # lbs weights: 80% own joint, 20% parent
    w = np.zeros((V, J))
    for j in range(J):
        sl = slice(j * verts_per_joint, (j + 1) * verts_per_joint)
        w[sl, j] = 0.8
        w[sl, max(j - 1, 0)] += 0.2
    parents = np.concatenate([[0], np.arange(J - 1)])

    S = 16
    shapedirs = rng.standard_normal((V, 3, S)).astype(np.float32) * 0.01
    posedirs = rng.standard_normal(((J - 1) * 9, V * 3)).astype(np.float32) * 0.001
    return L.SmplxModel(
        v_template=jnp.asarray(v_template, jnp.float32),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(j_reg, jnp.float32),
        parents=parents.astype(np.int64),
        lbs_weights=jnp.asarray(w, jnp.float32),
        hands_mean_l=jnp.zeros(45), hands_mean_r=jnp.zeros(45),
        num_betas=8, num_expression=8,
    )


def numpy_lbs_reference(model, betas, expression, pose_aa):
    """Independent numpy implementation of the standard SMPL forward."""
    from scipy.spatial.transform import Rotation as R
    B = pose_aa.shape[0]
    J = len(model.parents)
    shape = np.concatenate([betas, expression], -1)
    v_shaped = np.asarray(model.v_template)[None] + np.einsum(
        "vcs,bs->bvc", np.asarray(model.shapedirs), shape)
    joints = np.einsum("jv,bvc->bjc", np.asarray(model.j_regressor), v_shaped)
    rots = R.from_rotvec(pose_aa.reshape(-1, 3)).as_matrix().reshape(B, J, 3, 3)
    pf = (rots[:, 1:] - np.eye(3)).reshape(B, -1)
    v_posed = v_shaped + (pf @ np.asarray(model.posedirs)).reshape(v_shaped.shape)

    verts_out = np.zeros_like(v_posed)
    joints_out = np.zeros_like(joints)
    for b in range(B):
        # world transforms
        Ts = np.zeros((J, 4, 4))
        for j in range(J):
            Tl = np.eye(4)
            Tl[:3, :3] = rots[b, j]
            rel = joints[b, j] - (joints[b, model.parents[j]] if j > 0 else 0)
            Tl[:3, 3] = rel
            Ts[j] = Ts[model.parents[j]] @ Tl if j > 0 else Tl
        joints_out[b] = Ts[:, :3, 3]
        # remove rest-pose contribution
        A = Ts.copy()
        for j in range(J):
            A[j, :3, 3] -= Ts[j, :3, :3] @ joints[b, j]
        Tv = np.einsum("vj,jxy->vxy", np.asarray(model.lbs_weights), A)
        vh = np.concatenate([v_posed[b], np.ones((v_posed.shape[1], 1))], -1)
        verts_out[b] = np.einsum("vxy,vy->vx", Tv, vh)[:, :3]
    return verts_out, joints_out


def test_rest_pose_identity():
    model = synthetic_model()
    B = 2
    betas = jnp.zeros((B, 8))
    exp = jnp.zeros((B, 8))
    pose = jnp.zeros((B, 55, 3))
    verts, joints = L.lbs(model, betas, exp, pose)
    # zero pose, zero shape -> template returned
    np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(model.v_template),
                               atol=1e-5)
    expect_j = np.einsum("jv,vc->jc", np.asarray(model.j_regressor),
                         np.asarray(model.v_template))
    np.testing.assert_allclose(np.asarray(joints[0]), expect_j, atol=1e-5)


def test_matches_numpy_reference(rng):
    model = synthetic_model()
    B = 3
    betas = rng.standard_normal((B, 8)).astype(np.float32)
    exp = rng.standard_normal((B, 8)).astype(np.float32)
    pose = (rng.standard_normal((B, 55, 3)) * 0.3).astype(np.float32)
    verts, joints = L.lbs(model, jnp.asarray(betas), jnp.asarray(exp),
                          jnp.asarray(pose))
    ref_v, ref_j = numpy_lbs_reference(model, betas, exp, pose)
    np.testing.assert_allclose(np.asarray(joints), ref_j, atol=1e-4)
    np.testing.assert_allclose(np.asarray(verts), ref_v, atol=1e-4)


def test_global_rotation_equivariance(rng):
    """Rotating the root rotates all joints rigidly."""
    model = synthetic_model()
    pose = np.zeros((1, 55, 3), np.float32)
    _, j0 = L.lbs(model, jnp.zeros((1, 8)), jnp.zeros((1, 8)), jnp.asarray(pose))
    aa = np.array([0.0, 0.0, np.pi / 2], np.float32)
    pose_rot = pose.copy()
    pose_rot[0, 0] = aa
    _, j1 = L.lbs(model, jnp.zeros((1, 8)), jnp.zeros((1, 8)), jnp.asarray(pose_rot))
    Rm = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
    root = np.asarray(j0[0, 0])
    expect = (np.asarray(j0[0]) - root) @ Rm.T + root
    np.testing.assert_allclose(np.asarray(j1[0]), expect, atol=1e-5)


def test_talkshow_layout_mapping():
    model = synthetic_model()
    pred = np.zeros((2, 265), np.float32)
    pred[:, 0:3] = [0.1, 0.2, 0.3]      # jaw
    pred[:, 9:12] = [0.4, 0.5, 0.6]     # global orient
    pose, exp = L.talkshow_pose_to_model_order(jnp.asarray(pred), model)
    assert pose.shape == (2, 55, 3)
    np.testing.assert_allclose(np.asarray(pose[0, 0]), [0.4, 0.5, 0.6])  # orient first
    np.testing.assert_allclose(np.asarray(pose[0, 22]), [0.1, 0.2, 0.3])  # jaw at 22
    assert exp.shape == (2, 100)
