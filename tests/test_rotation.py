import numpy as np
import jax.numpy as jnp
import pytest

from talkshow_tpu.ops import rotation as R


def random_rotmats(rng, n):
    """Random rotation matrices via QR of gaussians."""
    a = rng.standard_normal((n, 3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1
    return q


def test_quaternion_matrix_roundtrip(rng):
    m = random_rotmats(rng, 256)
    q = R.matrix_to_quaternion(jnp.asarray(m))
    m2 = R.quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(m2), m, atol=1e-5)


def test_axis_angle_matrix_roundtrip(rng):
    aa = rng.standard_normal((512, 3)) * 1.5
    m = R.axis_angle_to_matrix(jnp.asarray(aa))
    aa2 = R.matrix_to_axis_angle(m)
    m2 = R.axis_angle_to_matrix(aa2)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)


def test_axis_angle_small_angle_stable():
    aa = jnp.asarray([[0.0, 0.0, 0.0], [1e-8, 0.0, 0.0]])
    m = R.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(m[0]), np.eye(3), atol=1e-7)
    back = R.matrix_to_axis_angle(m)
    assert np.all(np.isfinite(np.asarray(back)))


def test_rotation_6d_roundtrip(rng):
    m = random_rotmats(rng, 256)
    d6 = R.matrix_to_rotation_6d(jnp.asarray(m))
    m2 = R.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(m2), m, atol=1e-5)


def test_rodrigues_known_values():
    # 90 deg about z
    aa = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    m = np.asarray(R.axis_angle_to_matrix(aa))[0]
    expect = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(m, expect, atol=1e-6)


@pytest.mark.parametrize("n", [64])
def test_matches_torch_reference_formulas(rng, n):
    """Cross-check against an independent scipy implementation."""
    from scipy.spatial.transform import Rotation as S

    aa = rng.standard_normal((n, 3))
    ours = np.asarray(R.axis_angle_to_matrix(jnp.asarray(aa)))
    theirs = S.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    m = random_rotmats(rng, n)
    ours_q = np.asarray(R.matrix_to_quaternion(jnp.asarray(m)))  # (w,x,y,z)
    theirs_q = S.from_matrix(m).as_quat()  # (x,y,z,w)
    theirs_q = np.concatenate([theirs_q[:, 3:], theirs_q[:, :3]], axis=1)
    sign = np.sign(np.sum(ours_q * theirs_q, axis=1, keepdims=True))
    np.testing.assert_allclose(ours_q, theirs_q * sign, atol=1e-5)
