"""Camera models: perspective projection, weak-perspective conversion, and a
fully batched on-device camera-translation least-squares solver.

Replaces the reference's utils/geometry.py:79-181.  The reference solves the
translation least-squares *per sample on the CPU* with numpy
(utils/geometry.py:159-181) causing two GPU->CPU round-trips per training
step; here the normal equations are assembled with einsums and solved as a
batched 3x3 linear system on device, so the whole training step stays inside
one XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_PREC = lax.Precision.HIGHEST

from ..constants import FOCAL_LENGTH, IMG_RES


def perspective_projection(
    points: jnp.ndarray,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
    focal_length,
    camera_center: jnp.ndarray,
    out_3d: bool = False,
) -> jnp.ndarray:
    """Pinhole projection of 3D points (reference: utils/geometry.py:79-114).

    Args:
      points: [B, N, 3].
      rotation: [B, 3, 3] camera rotation.
      translation: [B, 3].
      focal_length: scalar or [B].
      camera_center: [B, 2].
      out_3d: if True, returns [B, N, 3] with the third channel the *unscaled*
        camera-frame depth row of K @ p (matching the reference's out_3d path).
    Returns:
      [B, N, 2] pixel coordinates (or [B, N, 3] if out_3d).
    """
    f = jnp.asarray(focal_length, dtype=points.dtype)
    f = jnp.broadcast_to(f, (points.shape[0],))

    cam_points = jnp.einsum("bij,bkj->bki", rotation, points, precision=_PREC) + translation[:, None, :]
    projected = cam_points / cam_points[..., 2:3]
    uv = projected[..., :2] * f[:, None, None] + camera_center[:, None, :]
    if not out_3d:
        return uv
    # Third row of K is (0, 0, 1) so K@p third channel is just depth z.
    return jnp.concatenate([uv, cam_points[..., 2:3]], axis=-1)


def weak_perspective_to_cam_t(pred_camera: jnp.ndarray, focal_length=FOCAL_LENGTH, img_res=IMG_RES) -> jnp.ndarray:
    """[s, tx, ty] weak-perspective triple -> full-perspective translation.

    Matches train/trainer.py:187-189 exactly (incl. the 1e-9 guard).
    """
    s, tx, ty = pred_camera[:, 0], pred_camera[:, 1], pred_camera[:, 2]
    tz = 2.0 * focal_length / (img_res * s + 1e-9)
    return jnp.stack([tx, ty, tz], axis=-1)


def estimate_translation(
    S: jnp.ndarray,
    joints_2d: jnp.ndarray,
    focal_length=FOCAL_LENGTH,
    img_size=IMG_RES,
) -> jnp.ndarray:
    """Batched weighted least-squares camera translation.

    On-device replacement for the per-sample numpy solver at
    utils/geometry.py:118-181.  Uses only the 24 ground-truth joints
    (rows 25: of the 49-joint superset) exactly as the reference does.

    For each joint with 3D location (X, Y, Z), 2D target (u, v) and
    confidence c, the residual rows (weighted by sqrt(c)) are:
        [f, 0, cx - u] . t = (u - cx) Z - f X
        [0, f, cy - v] . t = (v - cy) Z - f Y
    Solved via 3x3 normal equations, batched over B with one
    jnp.linalg.solve.

    Args:
      S: [B, 49, 3] model joints (camera frame, translation-free).
      joints_2d: [B, 49, 3] pixel-space 2D joints with confidence in ch 2.
    Returns:
      [B, 3] translations.
    """
    S24 = S[:, 25:, :]
    j2d = joints_2d[:, 25:, :2]
    conf = joints_2d[:, 25:, 2]

    f = jnp.asarray(focal_length, dtype=S.dtype)
    c = img_size / 2.0

    X, Y, Z = S24[..., 0], S24[..., 1], S24[..., 2]
    u, v = j2d[..., 0], j2d[..., 1]
    w = jnp.sqrt(jnp.maximum(conf, 0.0))  # [B, 24]

    zeros = jnp.zeros_like(u)
    f_col = jnp.full_like(u, f)
    # Row pairs [B, 24, 2, 3] and targets [B, 24, 2].
    Q = jnp.stack(
        [
            jnp.stack([f_col, zeros, c - u], axis=-1),
            jnp.stack([zeros, f_col, c - v], axis=-1),
        ],
        axis=-2,
    )
    rhs = jnp.stack([(u - c) * Z - f * X, (v - c) * Z - f * Y], axis=-1)

    Wq = Q * w[..., None, None]
    Wrhs = rhs * w[..., None]
    # Normal equations over the 48 rows; tiny ridge keeps the solve finite
    # when a sample has no confident joints (the reference would crash).
    A = jnp.einsum("bjri,bjrk->bik", Wq, Wq, precision=_PREC)
    A = A + 1e-6 * jnp.eye(3, dtype=A.dtype)
    b = jnp.einsum("bjri,bjr->bi", Wq, Wrhs, precision=_PREC)
    return jnp.linalg.solve(A, b[..., None])[..., 0]
