"""SMPLify: two-stage in-the-loop body fitting as lax.scan-compiled Adam.

TPU-native re-design of the reference's fitting driver
(reference: smplify/smplify.py:40-136): the reference runs 2x100 python-loop
Adam iterations, each building a fresh autograd graph and an SMPL forward —
the dominant cost of --run_smplify training (SURVEY.md §3.4).  Here each
stage is a jax.lax.scan over optax.adam updates with the SMPL LBS inside the
scanned step, so the whole 200-iteration optimization compiles once and runs
on-device with zero host round-trips, batched over the full training batch.

Stage 1 optimizes (global_orient, camera_t) under the torso-reprojection +
depth-anchor loss; stage 2 optimizes (body_pose, betas, global_orient) under
the GM-reprojection + GMM-prior + angle-prior + shape losses with hip/neck
joints ignored.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..smpl.model import SMPLModel, smpl_forward
from .losses import IGN_JOINTS_IND, body_fitting_loss, camera_fitting_loss
from .prior import GMMPrior


class SMPLifyResult(NamedTuple):
    vertices: jnp.ndarray          # [B, V, 3]
    joints: jnp.ndarray            # [B, 49, 3]
    pose: jnp.ndarray              # [B, 72] axis-angle
    betas: jnp.ndarray             # [B, 10]
    camera_translation: jnp.ndarray  # [B, 3]
    reprojection_loss: jnp.ndarray   # [B, 49] per-joint conf^2-weighted GM loss


def _zero_ignored(joints_conf: jnp.ndarray) -> jnp.ndarray:
    """Zero the confidence of fitting-ignored joints (smplify.py:104-105).

    Unlike the reference, the input is NOT mutated in place (the reference's
    get_fitting_loss clobbers its caller's tensor — smplify/smplify.py:156,
    flagged in SURVEY.md §7.3 as a bug not to replicate)."""
    return joints_conf.at[:, jnp.asarray(IGN_JOINTS_IND)].set(0.0)


def make_smplify(
    smpl_model: SMPLModel,
    pose_prior: GMMPrior,
    step_size: float = 1e-2,
    num_iters: int = 100,
    focal_length: float = 5000.0,
):
    """Build the jit-able smplify(init_pose, init_betas, init_cam_t,
    camera_center, keypoints_2d) -> SMPLifyResult function.

    All shapes static; call under jit (it is pure).
    """

    def smplify(init_pose, init_betas, init_cam_t, camera_center, keypoints_2d):
        joints_2d = keypoints_2d[:, :, :2]
        joints_conf = keypoints_2d[:, :, 2]

        body_pose0 = init_pose[:, 3:]
        global_orient0 = init_pose[:, :3]
        betas0 = init_betas

        # ---- Stage 1: camera translation + global orientation ----
        opt1 = optax.adam(step_size, b1=0.9, b2=0.999)
        params1 = {"global_orient": global_orient0, "camera_t": init_cam_t}

        def stage1_loss(p):
            pose = jnp.concatenate([p["global_orient"], body_pose0], axis=1)
            out = smpl_forward(smpl_model, betas0, pose_aa=pose)
            return camera_fitting_loss(
                out.joints, p["camera_t"], init_cam_t, camera_center,
                joints_2d, joints_conf, focal_length=focal_length,
            )

        def step1(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(stage1_loss)(params)
            updates, opt_state = opt1.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params1, _), _ = jax.lax.scan(
            step1, (params1, opt1.init(params1)), None, length=num_iters
        )
        camera_t = jax.lax.stop_gradient(params1["camera_t"])
        global_orient1 = jax.lax.stop_gradient(params1["global_orient"])

        # ---- Stage 2: body pose + betas + global orientation ----
        conf2 = _zero_ignored(joints_conf)
        opt2 = optax.adam(step_size, b1=0.9, b2=0.999)
        params2 = {
            "body_pose": body_pose0,
            "betas": betas0,
            "global_orient": global_orient1,
        }

        def stage2_loss(p):
            pose = jnp.concatenate([p["global_orient"], p["body_pose"]], axis=1)
            out = smpl_forward(smpl_model, p["betas"], pose_aa=pose)
            return body_fitting_loss(
                p["body_pose"], p["betas"], out.joints, camera_t, camera_center,
                joints_2d, conf2, pose_prior, focal_length=focal_length,
            )

        def step2(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(stage2_loss)(params)
            updates, opt_state = opt2.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params2, _), _ = jax.lax.scan(
            step2, (params2, opt2.init(params2)), None, length=num_iters
        )

        # ---- Final evaluation (no grad) ----
        pose = jnp.concatenate([params2["global_orient"], params2["body_pose"]], axis=1)
        pose = jax.lax.stop_gradient(pose)
        betas = jax.lax.stop_gradient(params2["betas"])
        out = smpl_forward(smpl_model, betas, pose_aa=pose)
        reproj = body_fitting_loss(
            params2["body_pose"], betas, out.joints, camera_t, camera_center,
            joints_2d, conf2, pose_prior, focal_length=focal_length,
            output="reprojection",
        )
        return SMPLifyResult(
            vertices=out.vertices,
            joints=out.joints,
            pose=pose,
            betas=betas,
            camera_translation=camera_t,
            reprojection_loss=reproj,
        )

    return smplify


def make_fitting_loss(
    smpl_model: SMPLModel,
    pose_prior: GMMPrior,
    focal_length: float = 5000.0,
):
    """get_fitting_loss parity (smplify/smplify.py:138-172): per-joint
    reprojection loss for current fits-dict parameters."""

    def fitting_loss(pose, betas, cam_t, camera_center, keypoints_2d):
        joints_2d = keypoints_2d[:, :, :2]
        joints_conf = _zero_ignored(keypoints_2d[:, :, 2])
        out = smpl_forward(smpl_model, betas, pose_aa=pose)
        return body_fitting_loss(
            pose[:, 3:], betas, out.joints, cam_t, camera_center,
            joints_2d, joints_conf, pose_prior, focal_length=focal_length,
            output="reprojection",
        )

    return fitting_loss
