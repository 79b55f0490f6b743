"""Rotation representation conversions as pure JAX functions.

TPU-native re-design of the reference rotation math
(reference: utils/geometry.py:9-77 and the torchgeometry conversions used at
train/trainer.py:702-706, train/fits_dict.py:72-94).  All functions are
shape-polymorphic over a leading batch dimension, jit/vmap/grad-safe, and use
only static shapes so XLA can fuse them into surrounding graphs.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS_NORMALIZE = 1e-12  # matches torch.nn.functional.normalize clamping


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Convert (w, x, y, z) quaternions to rotation matrices.

    Args:
      quat: [..., 4] quaternion coefficients (not necessarily normalized).
    Returns:
      [..., 3, 3] rotation matrices.
    """
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q = quat / norm
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def batch_rodrigues(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrices [..., 3, 3].

    Follows the quaternion construction of the reference
    (utils/geometry.py:9-23) including its +1e-8 regularization of the norm
    so results agree bit-for-bit at theta == 0.
    """
    angle = jnp.linalg.norm(aa + 1e-8, axis=-1, keepdims=True)
    normalized = aa / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=-1)
    return quat_to_rotmat(quat)


def _normalize(v: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, _EPS_NORMALIZE)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation -> rotation matrices via Gram-Schmidt.

    Layout matches the reference (utils/geometry.py:47-61): the 6 numbers are
    reshaped to (3, 2) where column 0/1 are the raw first/second rotation
    columns.  Input [..., 6] (or [..., 24*6]) -> output [..., 3, 3] with the
    flattened trailing groups expanded, i.e. [B, 144] -> [B*24, 3, 3] like the
    reference's `.view(-1, 3, 2)`.
    """
    x = x.reshape(-1, 3, 2)
    a1 = x[:, :, 0]
    a2 = x[:, :, 1]
    b1 = _normalize(a1)
    b2 = _normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> 6D representation [..., 6].

    Drops the last row (reference: utils/geometry.py:64-77).  Note this is the
    reference's convention: it is *not* the inverse of `rot6d_to_rotmat` (the
    reference keeps the same asymmetry).
    """
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> unit quaternions [..., 4] (w,x,y,z).

    Branch-free Shepperd-style extraction: computes all four candidate
    quaternions and selects the numerically safest with `where`, which keeps
    the function jit-friendly and differentiable almost everywhere.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    trace = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Four candidates, one per dominant diagonal term.
    qw0 = safe_sqrt(1.0 + trace)
    q0 = jnp.stack([qw0, (m21 - m12) / qw0, (m02 - m20) / qw0, (m10 - m01) / qw0], -1) * 0.5

    qx1 = safe_sqrt(1.0 + m00 - m11 - m22)
    q1 = jnp.stack([(m21 - m12) / qx1, qx1, (m01 + m10) / qx1, (m02 + m20) / qx1], -1) * 0.5

    qy2 = safe_sqrt(1.0 - m00 + m11 - m22)
    q2 = jnp.stack([(m02 - m20) / qy2, (m01 + m10) / qy2, qy2, (m12 + m21) / qy2], -1) * 0.5

    qz3 = safe_sqrt(1.0 - m00 - m11 + m22)
    q3 = jnp.stack([(m10 - m01) / qz3, (m02 + m20) / qz3, (m12 + m21) / qz3, qz3], -1) * 0.5

    # Choose branch by the largest of (trace, m00, m11, m22).
    cond0 = trace > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotmat_to_aa(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] -> axis-angle [..., 3].

    Replaces torchgeometry.rotation_matrix_to_angle_axis (used at
    train/trainer.py:704) including the reference's NaN-at-identity hack
    (train/trainer.py:706): at zero rotation this returns exactly zero.
    """
    q = rotmat_to_quat(R)
    # Canonicalize to w >= 0 so the angle lands in [0, pi] (the same
    # representative cv2.Rodrigues / torchgeometry return).
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    # Near-zero rotation: sin(angle/2) ~ angle/2, so aa ~ 2*xyz.  Use the safe
    # formulation to avoid 0/0.
    scale = jnp.where(sin_half > 1e-7, angle / jnp.maximum(sin_half, 1e-12), 2.0)
    return xyz * scale[..., None]


def aa_rotate_z(aa: jnp.ndarray, rot_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate axis-angle global orientations by an in-plane (z) rotation.

    Device-side replacement for the per-sample cv2.Rodrigues logic of
    `rot_aa` (utils/imutils.py:108-119) and the FitsDict rotation
    (train/fits_dict.py:72-94): aa' = log(Rz(-rot) @ exp(aa)).

    Args:
      aa: [..., 3] axis-angle.
      rot_deg: [...] rotation in degrees (augmentation angle).
    """
    rad = -jnp.deg2rad(rot_deg)
    cs, sn = jnp.cos(rad), jnp.sin(rad)
    zeros = jnp.zeros_like(cs)
    ones = jnp.ones_like(cs)
    Rz = jnp.stack(
        [cs, -sn, zeros, sn, cs, zeros, zeros, zeros, ones], axis=-1
    ).reshape(rot_deg.shape + (3, 3))
    R = batch_rodrigues(aa)
    return rotmat_to_aa(Rz @ R)


def flip_pose(pose: jnp.ndarray, flip_perm: jnp.ndarray) -> jnp.ndarray:
    """Left/right mirror SMPL axis-angle pose vectors [..., 72].

    Device-side equivalent of utils/imutils.py:138-147.
    """
    flipped = jnp.take(pose, flip_perm, axis=-1)
    sign = jnp.ones((72,), dtype=pose.dtype).at[1::3].set(-1.0).at[2::3].set(-1.0)
    return flipped * sign
