"""Training loss assembly, fixed-shape and jit-safe.

Re-design of the reference trainer's loss functions
(reference: train/trainer.py:89-178 and the cashmrV2 assembly at
train/trainer.py:918-941, 1000-1008).  The reference filters batches with
boolean indexing (`pred[has_smpl == 1]`), which produces dynamic shapes;
here every loss is a `where`-masked fixed-shape reduction with the same
normalization (mean over the *selected* rows), so the whole training step
stays one compiled XLA program (SURVEY.md §7.3).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import batch_rodrigues


def _masked_mean(values: jnp.ndarray, row_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of `values` over rows where row_mask == 1 (0 if no rows).

    values: [B, ...]; row_mask: [B].  Matches torch mean-over-filtered-rows.
    """
    B = values.shape[0]
    per_row = values.reshape(B, -1).mean(axis=1)
    n = jnp.sum(row_mask)
    return jnp.where(n > 0, jnp.sum(per_row * row_mask) / jnp.maximum(n, 1), 0.0)


def keypoint_loss(pred_kp2d, gt_kp2d, openpose_weight, gt_weight) -> jnp.ndarray:
    """Confidence-weighted 2D reprojection MSE (trainer.py:89-98)."""
    conf = gt_kp2d[:, :, 2:3]
    w = jnp.concatenate(
        [jnp.full((25, 1), openpose_weight), jnp.full((24, 1), gt_weight)], axis=0
    ).astype(conf.dtype)
    conf = conf * w[None]
    return (conf * (pred_kp2d - gt_kp2d[:, :, :2]) ** 2).mean()


def keypoint_3d_loss(pred_kp3d, gt_kp3d, has_pose_3d) -> jnp.ndarray:
    """Pelvis-centered 3D keypoint MSE over samples with 3D GT
    (trainer.py:100-117).  pred uses rows 25: of the 49-joint superset."""
    pred = pred_kp3d[:, 25:, :]
    conf = gt_kp3d[:, :, 3:4]
    gt = gt_kp3d[:, :, :3]
    gt_pelvis = (gt[:, 2, :] + gt[:, 3, :]) / 2
    gt = gt - gt_pelvis[:, None, :]
    pred_pelvis = (pred[:, 2, :] + pred[:, 3, :]) / 2
    pred = pred - pred_pelvis[:, None, :]
    per_elem = conf * (pred - gt) ** 2  # [B, 24, 3]
    return _masked_mean(per_elem, has_pose_3d.astype(per_elem.dtype))


def shape_loss(pred_vertices, gt_vertices, has_smpl) -> jnp.ndarray:
    """Per-vertex L1 over valid-fit samples (trainer.py:158-165)."""
    per_elem = jnp.abs(pred_vertices - gt_vertices)
    return _masked_mean(per_elem, has_smpl.astype(per_elem.dtype))


def smpl_losses(pred_rotmat, pred_betas, gt_pose_aa, gt_betas, has_smpl):
    """MSE on rotation matrices and betas over valid samples
    (trainer.py:167-178)."""
    gt_rotmat = batch_rodrigues(gt_pose_aa.reshape(-1, 3)).reshape(-1, 24, 3, 3)
    m = has_smpl.astype(pred_rotmat.dtype)
    loss_pose = _masked_mean((pred_rotmat - gt_rotmat) ** 2, m)
    loss_betas = _masked_mean((pred_betas - gt_betas) ** 2, m)
    return loss_pose, loss_betas


def recon_l1_loss(pred_img, gt_img, mask=None) -> jnp.ndarray:
    """Image-recovery L1 (trainer.py:119-156).  When masked, both images are
    gated but the mean still runs over ALL pixels — exactly the reference's
    normalization."""
    if mask is not None:
        pred_img = pred_img * mask
        gt_img = gt_img * mask
    return jnp.abs(pred_img - gt_img).mean()


def camera_scale_regularizer(pred_camera) -> jnp.ndarray:
    """Positive-depth forcing term ((exp(-10 s))^2).mean()
    (trainer.py:1006)."""
    return (jnp.exp(-pred_camera[:, 0] * 10.0) ** 2).mean()
