"""Rotation representations and hand-mirroring transforms, pure JAX.

Capability parity with the reference's rotation stack
(ref: src/models/transform_utils.py:10-44 ``batch_rodrigues``;
 ref: src/utils/geometry_utils.py:32-49 ``flip_hand_pose`` /
 ``flip_hand_joints_3d`` and the vendored torchgeometry conversions;
 ref: src/utils/rotate_utils.py ``rotate_orient`` et al.), re-derived as
pure ``jnp`` functions that are ``vmap``/``jit`` friendly: no data-dependent
control flow, stable small-angle behaviour via Taylor branches selected with
``jnp.where`` on static shapes.

All functions operate on trailing dims and broadcast over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation matrix.

    Matches the reference's ``batch_rodrigues`` numerics (which adds 1e-8 to
    the vector before taking the norm; ref src/models/transform_utils.py:27),
    including its behaviour at theta ~= 0.
    """
    aa = jnp.asarray(aa)
    angle = jnp.linalg.norm(aa + _EPS, axis=-1, keepdims=True)  # (..., 1)
    axis = aa / angle
    cos = jnp.cos(angle)[..., None]  # (..., 1, 1)
    sin = jnp.sin(angle)[..., None]
    outer = axis[..., :, None] * axis[..., None, :]  # (..., 3, 3)
    eye = jnp.eye(3, dtype=aa.dtype)
    return cos * eye + (1.0 - cos) * outer + sin * skew(axis)


# Alias kept for parity with reference naming.
batch_rodrigues = axis_angle_to_matrix


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) quaternion (w, x, y, z), unit norm.

    Branchless Shepperd's method: compute all four candidate constructions and
    select the numerically best with ``where`` (TPU-friendly, no control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidates, each valid when its pivot is the largest
    qw = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    qw = jnp.sqrt(jnp.maximum(qw, _EPS))  # 2*|pivot component|

    c0 = jnp.stack([qw[..., 0], (m21 - m12) / qw[..., 0], (m02 - m20) / qw[..., 0], (m10 - m01) / qw[..., 0]], axis=-1)
    c1 = jnp.stack([(m21 - m12) / qw[..., 1], qw[..., 1], (m01 + m10) / qw[..., 1], (m02 + m20) / qw[..., 1]], axis=-1)
    c2 = jnp.stack([(m02 - m20) / qw[..., 2], (m01 + m10) / qw[..., 2], qw[..., 2], (m12 + m21) / qw[..., 2]], axis=-1)
    c3 = jnp.stack([(m10 - m01) / qw[..., 3], (m02 + m20) / qw[..., 3], (m12 + m21) / qw[..., 3], qw[..., 3]], axis=-1)

    best = jnp.argmax(qw, axis=-1)[..., None]  # which pivot is most stable
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None], axis=-2)[..., 0, :] * 0.5
    # canonicalize to w >= 0 so downstream axis-angle uses the short rotation
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) (w, x, y, z) -> (..., 3) axis-angle."""
    w = q[..., 0]
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1)
    half = jnp.arctan2(sin_half, w)
    scale = jnp.where(sin_half > 1e-7, 2.0 * half / jnp.maximum(sin_half, _EPS), 2.0)
    return xyz * scale[..., None]


def matrix_to_axis_angle(m: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(m))


def flip_hand_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """Mirror an axis-angle hand pose across the x=0 plane.

    Negates the y and z components of every 3-vector (ref:
    src/utils/geometry_utils.py:32-42). ``pose`` may be (..., 3*k) flat or
    (..., k, 3); returned with the same shape.
    """
    pose = jnp.asarray(pose)
    flat = pose.shape[-1] != 3 or pose.ndim == 1
    shape = pose.shape
    vecs = pose.reshape(shape[:-1] + (-1, 3)) if flat else pose
    vecs = vecs * jnp.asarray([1.0, -1.0, -1.0], dtype=pose.dtype)
    return vecs.reshape(shape) if flat else vecs


def flip_hand_joints_3d(joints: jnp.ndarray) -> jnp.ndarray:
    """Mirror 3D joints across the x=0 plane (ref geometry_utils.py:45-49)."""
    return joints * jnp.asarray([-1.0, 1.0, 1.0], dtype=joints.dtype)


def rotate_orient_z(orient: np.ndarray, angle_deg: float) -> np.ndarray:
    """Compose a z-axis image rotation into a global orient (host-side numpy).

    Used by the rotation augmentation: new_R = Rz(-angle) @ R(orient)
    (ref: src/utils/rotate_utils.py:15-24).
    """
    orient = np.asarray(orient, np.float32).reshape(3)
    rz = np.array([0.0, 0.0, -np.pi * angle_deg / 180.0], np.float32)
    m = np.asarray(axis_angle_to_matrix(jnp.asarray(rz))) @ np.asarray(
        axis_angle_to_matrix(jnp.asarray(orient))
    )
    return np.asarray(matrix_to_axis_angle(jnp.asarray(m))).reshape(3)


def rotate_joints_2d(joints: np.ndarray, origin: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate 2D points about ``origin`` by ``angle_deg`` in image convention
    (ref: src/utils/rotate_utils.py:27-40)."""
    a = -angle_deg / 180.0 * np.pi
    d = joints - origin
    c, s = np.cos(a), np.sin(a)
    x = origin[:, 0] + c * d[:, 0] - s * d[:, 1]
    y = origin[:, 1] + s * d[:, 0] + c * d[:, 1]
    return np.stack([x, y], axis=1)


def rotate_joints_3d(joints: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate 3D points about the camera z-axis (ref rotate_utils.py:50-54).

    ``joints`` is (N, 3); returns (N, 3).
    """
    rz = np.array([0.0, 0.0, -np.pi * angle_deg / 180.0], np.float32)
    m = np.asarray(axis_angle_to_matrix(jnp.asarray(rz)))
    return (m @ joints.T).T
