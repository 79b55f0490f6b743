"""The flagship jit-compiled inference pipeline: modalities -> cascade ->
SMPL -> joints/metrics, as ONE XLA program.

Replaces the reference eval hot path (reference: eval.py:159-291 model
dispatch + smpl_neutral + per-batch host metrics): on TPU the cascade, the
SMPL LBS, the H36M joint regression, pelvis-centering, MPJPE and the batched
Procrustes alignment all fuse into a single compiled function; only final
scalar metrics come back to the host.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..geometry import perspective_projection, reconstruction_error
from ..models import cascade_apply
from ..models.hmr import HMROutput
from ..smpl.model import SMPLModel, lbs

_PREC = jax.lax.Precision.HIGHEST


def make_forward_fn(
    model,
    spec,
    num_cas_iters: int = 2,
    train: bool = False,
    final_recon: bool = True,
    smpl_model: Optional[SMPLModel] = None,
):
    """Build fn(variables, modality_tuple) -> HMROutput (final stage).

    Handles concat vs multi-trunk input plumbing and the cascade.
    """

    def forward(variables, inputs):
        if spec.input_mode == "concat":
            def apply_fn(mods, **kw):
                return model.apply(variables, jnp.concatenate(list(mods), axis=-1), **kw)
        elif spec.input_mode == "multi":
            def apply_fn(mods, **kw):
                return model.apply(variables, tuple(mods), **kw)
        elif spec.input_mode == "fusion":
            # Two-stage fusion eval (reference eval.py:200-226): the final
            # prediction is the stage-2 regression; recovered images surface
            # through `recon` for artifact dumps.
            def apply_fn(mods, **kw):
                fo = model.apply(variables, tuple(mods), smpl_model)
                out = fo.stage2
                return out._replace(recon=dict(fo.recovered, mask=fo.mask))
        elif spec.input_mode == "pm_contact":
            # Bodies-At-Rest eval (reference eval.py:230-288): modalities
            # stacked with the contact/edge channels, mode-"0" regression;
            # for the 4mod variant, a refinement pass splats the predicted
            # joints into an estimated body-map channel and re-regresses
            # with the mode-"2" stack (eval.py:238-288).  `inputs` carries
            # pm_contact as its last element.
            def apply_fn(mods, **kw):
                kw.pop("compute_recon", None)
                stacked = jnp.concatenate(list(mods), axis=-1)
                out0 = model.apply(variables, stacked, mode="0")
                if not (spec.name == "bodiesAtRest4mod" and smpl_model is not None):
                    return out0
                from ..constants import FOCAL_LENGTH, IMG_RES
                from ..geometry import weak_perspective_to_cam_t
                from ..ops.mask_raster import splat_points_to_mask
                from ..smpl.model import smpl_forward as _smpl_fwd

                res = stacked.shape[1]
                B = stacked.shape[0]
                sout = _smpl_fwd(smpl_model, out0.betas, rot_mats=out0.rotmat)
                cam_t = weak_perspective_to_cam_t(out0.cam, FOCAL_LENGTH, res)
                eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
                cc = jnp.zeros((B, 2), jnp.float32)
                uv = perspective_projection(sout.joints, eye, cam_t, FOCAL_LENGTH, cc)
                uv = uv + 0.5 * res  # pixel space (eval.py:257)
                est_map = splat_points_to_mask(uv, res, res, dilation=5)
                return model.apply(
                    variables, jnp.concatenate([stacked, est_map], axis=-1), mode="2"
                )
        else:
            raise ValueError(f"unsupported input mode {spec.input_mode}")

        if spec.cascade:
            outs = cascade_apply(
                apply_fn, inputs, num_cas_iters, feed_map=spec.cascade_feed_map,
                final_recon=final_recon,
            )
            return outs[-1]
        return apply_fn(inputs) if final_recon else apply_fn(inputs, compute_recon=False)

    return forward


def make_inference_fn(
    model,
    spec,
    smpl_model: SMPLModel,
    j_regressor_h36m: Optional[np.ndarray] = None,
    num_cas_iters: int = 2,
    final_recon: bool = True,
):
    """Build the full eval step: fn(variables, inputs) -> dict of predictions.

    Outputs: rotmat, betas, cam, vertices [B,6890,3], joints49, and (if a
    J_regressor is given) 17 pelvis-centered H36M-regressed joints
    (reference: eval.py:399-405).
    """
    forward = make_forward_fn(
        model, spec, num_cas_iters, final_recon=final_recon, smpl_model=smpl_model
    )
    jreg = None if j_regressor_h36m is None else jnp.asarray(j_regressor_h36m, jnp.float32)

    def infer(variables, inputs):
        out: HMROutput = forward(variables, inputs)
        verts, joints24 = lbs(smpl_model, out.betas, out.rotmat)
        result = {
            "rotmat": out.rotmat,
            "betas": out.betas,
            "cam": out.cam,
            "vertices": verts,
            "recon": out.recon,
        }
        if jreg is not None:
            k3d = jnp.einsum("jv,bvc->bjc", jreg, verts, precision=_PREC)
            pelvis = k3d[:, 0:1, :]
            k3d = k3d[:, jnp.asarray(constants.H36M_TO_J17), :] - pelvis
            result["keypoints_3d_17"] = k3d
        return result

    return infer


def eval_metrics(
    pred_joints17: jnp.ndarray,
    gt_joints17: jnp.ndarray,
) -> dict:
    """Per-sample MPJPE and PA-MPJPE (reference: eval.py:407-413), on device."""
    mpjpe = jnp.sqrt(jnp.sum((pred_joints17 - gt_joints17) ** 2, axis=-1)).mean(axis=-1)
    pa = reconstruction_error(pred_joints17, gt_joints17, reduction=None)
    return {"mpjpe": mpjpe, "pa_mpjpe": pa}
