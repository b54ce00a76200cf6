"""Rotation-representation conversions, pure-jnp and fully vmappable.

Provides the subset of conversions the TalkSHOW pipeline relies on
(reference: data_utils/rotation_conversion.py:37-551), re-derived from the
standard quaternion/Rodrigues identities so every function is a closed-form
jnp expression (no data-dependent control flow) and jit/vmap/grad-safe on TPU.

Conventions (identical to the reference / pytorch3d):
  - quaternions are (..., 4) with real part first (w, x, y, z)
  - matrices are (..., 3, 3), row-major, acting on column vectors
  - axis-angle is (..., 3): axis * angle (radians)
  - 6d representation is the first two ROWS of the rotation matrix,
    flattened (..., 6)  [Zhou et al. CVPR'19]
"""
from __future__ import annotations

import jax.numpy as jnp


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a subgradient of zero where x <= 0."""
    return jnp.sqrt(jnp.maximum(x, 0.0))


def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) (w,x,y,z) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.split(quaternions, 4, axis=-1)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1, keepdims=True)

    o = jnp.stack(
        [
            (1 - two_s * (y * y + z * z))[..., 0],
            (two_s * (x * y - z * w))[..., 0],
            (two_s * (x * z + y * w))[..., 0],
            (two_s * (x * y + z * w))[..., 0],
            (1 - two_s * (x * x + z * z))[..., 0],
            (two_s * (y * z - x * w))[..., 0],
            (two_s * (x * z - y * w))[..., 0],
            (two_s * (y * z + x * w))[..., 0],
            (1 - two_s * (x * x + y * y))[..., 0],
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) (w,x,y,z).

    Branch-free reformulation of the standard four-candidate extraction:
    all four candidate quaternions are computed and the numerically best
    one (largest denominator) is selected with a one-hot weighted sum.
    """
    batch = matrix.shape[:-2]
    m = matrix.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [m[..., i] for i in range(9)]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4, 4)

    flr = jnp.asarray(0.1, dtype=matrix.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax_one_hot(best, 4, dtype=matrix.dtype)
    out = jnp.sum(quat_candidates * onehot[..., None], axis=-2)
    # canonical sign: non-negative real part
    return jnp.where(out[..., :1] < 0, -out, out)


def jax_one_hot(idx: jnp.ndarray, num: int, dtype=jnp.float32) -> jnp.ndarray:
    iota = jnp.arange(num, dtype=idx.dtype)
    return (idx[..., None] == iota).astype(dtype)


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> quaternion (..., 4), smooth at angle=0."""
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    # sin(x/2)/x ~ 1/2 - x^2/48 near zero
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angles)
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) -> axis-angle (..., 3), smooth at angle=0."""
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, 1.0, angles),
    )
    return quaternions[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (via quaternion)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> 6d (first two rows flattened)."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6d (..., 6) -> rotation matrix (..., 3, 3) via Gram-Schmidt."""
    a1 = d6[..., :3]
    a2 = d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def axis_angle_to_rotation_6d(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_rotation_6d(axis_angle_to_matrix(axis_angle))


def rotation_6d_to_axis_angle(d6: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_axis_angle(rotation_6d_to_matrix(d6))


# ---------------------------------------------------------------------------
# Quaternion algebra (reference rotation_conversion.py:154-253)
# ---------------------------------------------------------------------------

def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Canonical sign: non-negative real part."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quaternion_raw_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = jnp.split(a, 4, -1)
    bw, bx, by, bz = jnp.split(b, 4, -1)
    return jnp.concatenate([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quaternion_apply(q: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Rotate points (..., 3) by quaternions (..., 4)."""
    zeros = jnp.zeros(point.shape[:-1] + (1,), point.dtype)
    p = jnp.concatenate([zeros, point], axis=-1)
    out = quaternion_raw_multiply(quaternion_raw_multiply(q, p),
                                  quaternion_invert(q))
    return out[..., 1:]


# ---------------------------------------------------------------------------
# Euler angles (reference rotation_conversion.py:97-151)
# ---------------------------------------------------------------------------

def _axis_angle_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        flat = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        flat = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(axis)
    return jnp.stack(flat, -1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jnp.ndarray, convention: str) -> jnp.ndarray:
    """(..., 3) angles + convention like 'XYZ' -> (..., 3, 3)."""
    ms = [
        _axis_angle_rotation(c, euler_angles[..., i])
        for i, c in enumerate(convention)
    ]
    return ms[0] @ ms[1] @ ms[2]


def _angle_from_tan(axis, other_axis, data, horizontal, tait_bryan):
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ("XY", "YZ", "ZX")
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) euler angles for the given convention."""
    i0 = "XYZ".index(convention[0])
    i2 = "XYZ".index(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(jnp.clip(
            matrix[..., i0, i2] * (-1.0 if i0 - i2 in (-1, 2) else 1.0),
            -1.0, 1.0))
    else:
        central = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1.0, 1.0))
    o = (
        _angle_from_tan(convention[0], convention[1], matrix[..., i2],
                        False, tait_bryan),
        central,
        _angle_from_tan(convention[2], convention[1], matrix[..., i0, :],
                        True, tait_bryan),
    )
    return jnp.stack(o, -1)
