"""SMPLify fitting losses (reference: smplify/losses.py:11-90), pure JAX."""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants
from ..geometry import perspective_projection
from .prior import GMMPrior, max_mixture_nll

# Joints used for the camera stage (smplify/losses.py:72-75).
_OP_JOINTS = ["OP RHip", "OP LHip", "OP RShoulder", "OP LShoulder"]
_GT_JOINTS = ["Right Hip", "Left Hip", "Right Shoulder", "Left Shoulder"]
OP_JOINTS_IND = [constants.JOINT_IDS[j] for j in _OP_JOINTS]
GT_JOINTS_IND = [constants.JOINT_IDS[j] for j in _GT_JOINTS]

# Joints ignored during body fitting (smplify/smplify.py:28-29).
_IGN_JOINTS = ["OP Neck", "OP RHip", "OP LHip", "Right Hip", "Left Hip"]
IGN_JOINTS_IND = [constants.JOINT_IDS[j] for j in _IGN_JOINTS]


def gmof(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Geman-McClure robust error (smplify/losses.py:11-17)."""
    x2 = x ** 2
    s2 = sigma ** 2
    return (s2 * x2) / (s2 + x2)


def angle_prior(body_pose: jnp.ndarray) -> jnp.ndarray:
    """Knee/elbow unnatural-bend penalty (smplify/losses.py:19-24).

    body_pose: [B, 69].  Indices 52, 55, 9, 12 with signs (+,-,-,-).
    """
    sel = body_pose[:, jnp.asarray([55 - 3, 58 - 3, 12 - 3, 15 - 3])]
    signs = jnp.asarray([1.0, -1.0, -1.0, -1.0])
    return jnp.exp(sel * signs) ** 2


def body_fitting_loss(
    body_pose: jnp.ndarray,
    betas: jnp.ndarray,
    model_joints: jnp.ndarray,
    camera_t: jnp.ndarray,
    camera_center: jnp.ndarray,
    joints_2d: jnp.ndarray,
    joints_conf: jnp.ndarray,
    pose_prior: GMMPrior,
    focal_length: float = 5000.0,
    sigma: float = 100.0,
    pose_prior_weight: float = 4.78,
    shape_prior_weight: float = 5.0,
    angle_prior_weight: float = 15.2,
    output: str = "sum",
):
    """smplify/losses.py:26-58."""
    B = body_pose.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=body_pose.dtype), (B, 3, 3))
    projected = perspective_projection(model_joints, eye, camera_t, focal_length, camera_center)

    reproj = gmof(projected - joints_2d, sigma)
    reproj_loss = (joints_conf ** 2) * reproj.sum(axis=-1)  # [B, 49]

    prior_loss = (pose_prior_weight ** 2) * max_mixture_nll(pose_prior, body_pose)
    angle_loss = (angle_prior_weight ** 2) * angle_prior(body_pose).sum(axis=-1)
    shape_loss = (shape_prior_weight ** 2) * jnp.sum(betas ** 2, axis=-1)

    total = reproj_loss.sum(axis=-1) + prior_loss + angle_loss + shape_loss
    if output == "sum":
        return total.sum()
    if output == "reprojection":
        return reproj_loss
    raise ValueError(output)


def camera_fitting_loss(
    model_joints: jnp.ndarray,
    camera_t: jnp.ndarray,
    camera_t_est: jnp.ndarray,
    camera_center: jnp.ndarray,
    joints_2d: jnp.ndarray,
    joints_conf: jnp.ndarray,
    focal_length: float = 5000.0,
    depth_loss_weight: float = 100.0,
) -> jnp.ndarray:
    """smplify/losses.py:60-90: torso reprojection + depth anchor."""
    B = model_joints.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=model_joints.dtype), (B, 3, 3))
    projected = perspective_projection(model_joints, eye, camera_t, focal_length, camera_center)

    op = jnp.asarray(OP_JOINTS_IND)
    gt = jnp.asarray(GT_JOINTS_IND)
    err_op = (joints_2d[:, op] - projected[:, op]) ** 2
    err_gt = (joints_2d[:, gt] - projected[:, gt]) ** 2
    is_valid = (jnp.min(joints_conf[:, op], axis=-1) > 0).astype(model_joints.dtype)[:, None, None]
    reproj = (is_valid * err_op + (1 - is_valid) * err_gt).sum(axis=(1, 2))

    depth_loss = (depth_loss_weight ** 2) * (camera_t[:, 2] - camera_t_est[:, 2]) ** 2
    return (reproj + depth_loss).sum()
