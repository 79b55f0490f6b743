"""Training runtime: the pjit-compiled train step + the epoch driver.

TPU-native re-design of the reference training loop
(reference: train/trainer.py:204-1031 and utils/base_trainer.py:55-131).
What the reference does with ~10 separate CUDA phases and two CPU
round-trips per step (estimate_translation numpy solve, FitsDict host dict),
this builds as ONE compiled XLA program per step:

    gt SMPL LBS -> fits gather(+aug) -> opt SMPL LBS -> batched cam-t solve
    -> cascade of model forwards -> per-stage SMPL + projection ->
    [optional SMPLify lax.scan fitting] -> fits scatter -> masked losses ->
    grads -> Adam -> new state

Data parallelism: the step is jit-ed with the batch sharded over a 1-D
device mesh and the state replicated (SURVEY.md §2.3); gradient reduction
is XLA's inserted psum.  BatchNorm is sync-BN (global batch statistics via
GSPMD's cross-device reduction) — a deliberate choice over the reference's
per-replica DataParallel-BN so step numerics are identical at any device
count (pinned by tests/test_train_step.py).
"""

from __future__ import annotations

import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import constants
from ..geometry import estimate_translation, perspective_projection, rotmat_to_aa, weak_perspective_to_cam_t
from ..ops.mask_raster import render_body_mask
from ..parallel import batch_sharding, make_mesh, replicated
from ..smpl.model import SMPLModel, smpl_forward
from ..fitting import make_fitting_loss, make_smplify
from . import losses as L
from .fits_dict import FitsStore, fits_get, fits_set
from .checkpoint import (
    flatten_opt_state,
    latest_checkpoint,
    load_checkpoint,
    restore_opt_state,
    save_checkpoint,
)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    fits: jnp.ndarray      # [N, 82]
    rng: jnp.ndarray
    step: jnp.ndarray


# Batch keys consumed by the compiled step (numeric only — strings like
# imgname/dataset_name stay host-side).
STEP_KEYS = (
    "img", "ir_img", "depth_img", "pm_img",
    "depth_img_uncover", "ir_img_uncover", "pm_img_uncover",
    "mask_uncover", "pm_contact", "pixel_noise",
    "keypoints", "pose", "betas", "pose_3d", "has_smpl", "has_pose_3d",
    "is_flipped", "rot_angle", "sample_index",
)

_SCALAR_FEED_KEYS = (
    "keypoints", "pose", "betas", "pose_3d", "has_smpl", "has_pose_3d",
    "is_flipped", "rot_angle", "sample_index", "pixel_noise",
)


def step_feed_keys(spec) -> frozenset:
    """The exact batch keys the compiled step for this model family reads.

    jit dead-code-eliminates unused INPUTS, but the feed loop transfers
    whatever it is given first — at 224^2 the full item dict is ~3 MB of
    float32 per sample, most of it uncover channels only some families'
    losses consume.  Feeding only the consumed keys (and uint8 where the
    dataset's uint8 feed is on) is what keeps the H2D phase off the
    critical path.  Mirrors the conditional loss assembly in
    make_train_step (`if uncover_key.get(name) in batch`), which is keyed
    on presence, so the filter must match it exactly or a loss term would
    silently vanish.
    """
    unc = {"depth": "depth_img_uncover", "ir": "ir_img_uncover",
           "pm": "pm_img_uncover"}
    keys = set(spec.modalities) | set(_SCALAR_FEED_KEYS)
    for name in spec.recon_heads:
        keys.add(unc[name])
    if spec.input_mode == "fusion":
        # Mask supervision + mask-gated recovery of every input modality.
        keys.add("mask_uncover")
        for m in spec.modalities:
            short = {"ir_img": "ir", "depth_img": "depth", "pm_img": "pm"}.get(m)
            if short:
                keys.add(unc[short])
    if spec.input_mode == "pm_contact":
        keys.add("pm_contact")
        keys.add("mask_uncover")  # bar mode-0 mask loss
    return frozenset(keys)


def make_train_step(model, spec, smpl_model: SMPLModel, prior, options, bar_mode: str = "0"):
    """Build the jitted train step for the concat/cascade model family
    (hmr, hmr4mod, irhmr/depthhmr/pmhmr, mulhmr, rechmr, cashmr(V2),
    rec3hmr)."""

    img_res = float(options.img_res)
    focal = constants.FOCAL_LENGTH
    tx = optax.adam(options.lr)
    run_smplify = bool(options.run_smplify)
    # --remat / remat=True checkpoints whole cascade stages here;
    # --remat decoder is handled inside the model (build_model(remat_decoder=))
    # and needs nothing from the trainer.
    use_remat = getattr(options, "remat", False) in (True, "stage")
    num_cas = int(options.num_cas_iters) if spec.cascade else 1
    fitting_loss_fn = make_fitting_loss(smpl_model, prior, focal)
    smplify_fn = make_smplify(
        smpl_model, prior, step_size=1e-2,
        num_iters=int(options.num_smplify_iters), focal_length=focal,
    )

    def get_vertices(rotmat, betas, camera):
        """SMPL + weak-perspective projection, normalized to [-1, 1]
        (trainer.py:180-201)."""
        out = smpl_forward(smpl_model, betas, rot_mats=rotmat)
        cam_t = weak_perspective_to_cam_t(camera, focal, img_res)
        B = rotmat.shape[0]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
        cc = jnp.zeros((B, 2), jnp.float32)
        kp2d = perspective_projection(out.joints, eye, cam_t, focal, cc) / (img_res / 2.0)
        return out.vertices, out.joints, kp2d, cam_t

    def loss_fn(params, batch_stats, fits, batch, rng):
        B = batch["keypoints"].shape[0]  # always fed (batch["img"] is not for 1-mod families)
        gt_kp2d = batch["keypoints"]
        gt_pose = batch["pose"]
        gt_betas = batch["betas"]
        gt_joints3d = batch["pose_3d"]
        has_smpl = batch["has_smpl"]
        has_pose_3d = batch["has_pose_3d"]
        indices = batch["sample_index"].astype(jnp.int32)

        # GT and current-best-fit SMPL meshes.
        gt_out = smpl_forward(smpl_model, gt_betas, pose_aa=gt_pose)
        opt_pose, opt_betas = fits_get(fits, indices, batch["rot_angle"], batch["is_flipped"])
        opt_out = smpl_forward(smpl_model, opt_betas, pose_aa=opt_pose)
        opt_vertices, opt_joints = opt_out.vertices, opt_out.joints

        # Camera translation least squares (on-device; trainer.py:241-243).
        gt_kp2d_orig = gt_kp2d.at[:, :, :2].set(0.5 * img_res * (gt_kp2d[:, :, :2] + 1))
        gt_cam_t = estimate_translation(gt_out.joints, gt_kp2d_orig, focal, img_res)
        opt_cam_t = estimate_translation(opt_joints, gt_kp2d_orig, focal, img_res)

        camera_center = jnp.full((B, 2), 0.5 * img_res, jnp.float32)
        opt_joint_loss = fitting_loss_fn(
            opt_pose, opt_betas, opt_cam_t, camera_center, gt_kp2d_orig
        ).mean(axis=-1)

        # Cascade of model forwards (train mode: dropout + BN updates).
        inputs = tuple(batch[k] for k in spec.modalities)
        new_bs = {"batch_stats": batch_stats}
        stage_rngs = jax.random.split(rng, max(num_cas, 2))
        stage_outs = []
        fusion_out = None

        def stage_forward(p, bs, net_in, stage_rng):
            return model.apply(
                {"params": p, **bs},
                net_in,
                train=True,
                rngs={"dropout": stage_rng},
                mutable=["batch_stats"],
            )

        if use_remat:
            # Rematerialize each cascade stage on the backward pass: trades
            # ~2x stage FLOPs for O(1) activation memory across the cascade,
            # enabling batch-64 x num_cas_iters=3 training on one chip.
            stage_forward = jax.checkpoint(stage_forward)

        if spec.input_mode in ("concat", "multi"):
            current = list(inputs)
            for stage in range(num_cas):
                net_in = (
                    jnp.concatenate(current, axis=-1)
                    if spec.input_mode == "concat" else tuple(current)
                )
                out, mut = stage_forward(
                    params, new_bs, net_in, stage_rngs[stage]
                )
                new_bs = mut
                stage_outs.append(out)
                if spec.cascade:
                    for name, slot in spec.cascade_feed_map:
                        if name in out.recon:
                            current[slot] = out.recon[name]
        elif spec.input_mode == "fusion":
            # Two-stage self-refinement models (trainer.py:809-877): the
            # module itself runs stage1 -> mask -> recovery -> stage2.
            fusion_out, mut = model.apply(
                {"params": params, **new_bs},
                inputs,
                smpl_model,
                train=True,
                rngs={"dropout": stage_rngs[0]},
                mutable=["batch_stats"],
            )
            new_bs = mut
            stage_outs = [fusion_out.stage1, fusion_out.stage2]
        elif spec.input_mode == "pm_contact":
            # Bodies-At-Rest (trainer.py:576-588): pm (+ all modalities for
            # the 4mod variant) stacked with the contact/edge channels.
            # `bar_mode` implements the mod1_epoch schedule: "0" with mask
            # supervision before the switch, "1" (gradient-stopped direct
            # regression, no mask loss) after (trainer.py:578-581, 968-978).
            net_in = jnp.concatenate(list(inputs) + [batch["pm_contact"]], axis=-1)
            out, mut = model.apply(
                {"params": params, **new_bs},
                net_in,
                mode=bar_mode,
                train=True,
                rngs={"dropout": stage_rngs[0]},
                mutable=["batch_stats"],
            )
            new_bs = mut
            stage_outs = [out]
        else:
            raise AssertionError(spec.input_mode)

        final = stage_outs[-1]
        pred_vertices, pred_joints, pred_kp2d, pred_cam_t = get_vertices(
            final.rotmat, final.betas, final.cam
        )

        # --- SMPLify in the loop (trainer.py:699-748) ---
        if run_smplify:
            pred_aa = rotmat_to_aa(jax.lax.stop_gradient(final.rotmat)).reshape(B, 72)
            fit = smplify_fn(
                pred_aa,
                jax.lax.stop_gradient(final.betas),
                jax.lax.stop_gradient(pred_cam_t),
                camera_center,
                gt_kp2d_orig,
            )
            new_opt_joint_loss = fit.reprojection_loss.mean(axis=-1)
            update = (new_opt_joint_loss < opt_joint_loss).astype(jnp.float32)
            upd = update[:, None]
            opt_joint_loss = jnp.minimum(new_opt_joint_loss, opt_joint_loss)
            opt_vertices = jnp.where(upd[..., None], fit.vertices, opt_vertices)
            opt_joints = jnp.where(upd[..., None], fit.joints, opt_joints)
            opt_pose = jnp.where(upd, fit.pose, opt_pose)
            opt_betas = jnp.where(upd, fit.betas, opt_betas)
            opt_cam_t = jnp.where(upd, fit.camera_translation, opt_cam_t)
            fits = fits_set(
                fits, indices, batch["rot_angle"], batch["is_flipped"], update,
                opt_pose, opt_betas,
            )
        # Extreme-beta reset + GT substitution (trainer.py:736-743).
        extreme = (jnp.abs(opt_betas) > 3).any(axis=-1, keepdims=True)
        opt_betas = jnp.where(extreme, 0.0, opt_betas)
        hs = has_smpl[:, None]
        opt_vertices = jnp.where(hs[..., None] > 0, gt_out.vertices, opt_vertices)
        opt_joints = jnp.where(hs[..., None] > 0, gt_out.joints, opt_joints)
        opt_cam_t = jnp.where(hs > 0, gt_cam_t, opt_cam_t)
        opt_pose = jnp.where(hs > 0, gt_pose, opt_pose)
        opt_betas = jnp.where(hs > 0, gt_betas, opt_betas)

        valid_fit = jnp.logical_or(
            opt_joint_loss < options.smplify_threshold, has_smpl > 0
        ).astype(jnp.float32)

        # Optimization targets never carry gradients.
        opt_vertices = jax.lax.stop_gradient(opt_vertices)
        opt_pose = jax.lax.stop_gradient(opt_pose)
        opt_betas = jax.lax.stop_gradient(opt_betas)

        # --- Final-stage losses (trainer.py:760-772, 1000-1008) ---
        loss_regr_pose, loss_regr_betas = L.smpl_losses(
            final.rotmat, final.betas, opt_pose, opt_betas, valid_fit
        )
        loss_kp = L.keypoint_loss(
            pred_kp2d, gt_kp2d, options.openpose_train_weight, options.gt_train_weight
        )
        loss_kp3d = L.keypoint_3d_loss(pred_joints, gt_joints3d, has_pose_3d)
        loss_shape = L.shape_loss(pred_vertices, opt_vertices, valid_fit)

        total = (
            options.shape_loss_weight * loss_shape
            + options.keypoint_loss_weight * loss_kp
            + options.keypoint_loss_weight * loss_kp3d
            + loss_regr_pose
            + options.beta_loss_weight * loss_regr_betas
            + L.camera_scale_regularizer(final.cam)
        )

        # --- Auxiliary stage/recon losses ---
        def stage_aux_losses(out):
            """Earlier-stage supervision terms shared by the cascade and
            fusion paths (trainer.py:918-941 / 809-841)."""
            sv, sj, skp2d, _ = get_vertices(out.rotmat, out.betas, out.cam)
            lp, lb = L.smpl_losses(out.rotmat, out.betas, opt_pose, opt_betas, valid_fit)
            return (
                options.shape_loss_weight * L.shape_loss(sv, opt_vertices, valid_fit)
                + options.keypoint_loss_weight * L.keypoint_loss(
                    skp2d, gt_kp2d, options.openpose_train_weight, options.gt_train_weight
                )
                + options.keypoint_loss_weight * L.keypoint_3d_loss(sj, gt_joints3d, has_pose_3d)
                + lp
                + options.beta_loss_weight * lb
                + L.camera_scale_regularizer(final.cam)
            )

        loss_extra = 0.0
        uncover_key = {"depth": "depth_img_uncover", "ir": "ir_img_uncover",
                       "pm": "pm_img_uncover"}
        if spec.input_mode in ("concat", "multi"):
            for name, img in final.recon.items():
                if uncover_key.get(name) in batch:
                    loss_extra = loss_extra + L.recon_l1_loss(img, batch[uncover_key[name]])
            for out in stage_outs[:-1]:
                for name, img in out.recon.items():
                    if uncover_key.get(name) in batch:
                        loss_extra = loss_extra + L.recon_l1_loss(img, batch[uncover_key[name]])
                loss_extra = loss_extra + stage_aux_losses(out)
        elif spec.input_mode == "fusion":
            # Mask supervision + mask-gated recovery losses
            # (trainer.py:834-843).
            mask_gt = batch["mask_uncover"]
            loss_extra = loss_extra + 0.01 * L.recon_l1_loss(fusion_out.mask, mask_gt)
            for name, img in fusion_out.recovered.items():
                if uncover_key.get(name) in batch:
                    loss_extra = loss_extra + L.recon_l1_loss(
                        img, batch[uncover_key[name]], mask=mask_gt
                    )
            loss_extra = loss_extra + stage_aux_losses(fusion_out.stage1)
        elif spec.input_mode == "pm_contact" and bar_mode == "0":
            # Bodies-At-Rest mask supervision (trainer.py:968-978): splat
            # the predicted vertices to a body mask, compare to GT uncover.
            # Mode "1" (post-mod1_epoch) drops this term (trainer.py:977-978).
            pred_mask = render_body_mask(
                jax.lax.stop_gradient(pred_vertices),
                jax.lax.stop_gradient(final.cam),
                img_res=int(img_res),
            )
            loss_extra = loss_extra + 0.1 * L.recon_l1_loss(pred_mask, batch["mask_uncover"])

        total = (total + loss_extra) * 60.0

        metrics = {
            "loss": total,
            "loss_keypoints": loss_kp,
            "loss_keypoints_3d": loss_kp3d,
            "loss_regr_pose": loss_regr_pose,
            "loss_regr_betas": loss_regr_betas,
            "loss_shape": loss_shape,
        }
        aux = (new_bs["batch_stats"], fits, metrics)
        return total, aux

    def train_step(state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (batch_stats, fits, metrics)), grads = grad_fn(
            state.params, state.batch_stats, state.fits, batch, step_rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            fits=fits,
            rng=rng,
            step=state.step + 1,
        )
        return new_state, metrics

    # Exposed for tools/train_breakdown.py: timing loss_fn fwd-only and
    # value_and_grad(loss_fn) separately from the full step attributes the
    # measured step time to fwd / bwd / optimizer+state phases.
    train_step._loss_fn = loss_fn
    return train_step, tx


def _graft_adam_moments(opt_state, mu, nu, count):
    """Overwrite ScaleByAdamState.mu/.nu leaves with converted torch Adam
    exp_avg/exp_avg_sq trees (same-path, same-shape only) and set the step
    count.  Leaves without a converted counterpart keep their zero init."""
    inner = opt_state[0]
    new_inner = inner._replace(
        count=jnp.asarray(count, getattr(inner.count, "dtype", jnp.int32)),
        mu=_merge_tolerant(inner.mu, mu),
        nu=_merge_tolerant(inner.nu, nu),
    )
    return (new_inner,) + tuple(opt_state[1:])


# Re-exported from checkpoint.py so drivers (eval.py) share the same
# strict=False load semantics.
from .checkpoint import merge_tolerant as _merge_tolerant  # noqa: E402


class Trainer:
    """Epoch/step driver: resumable loader, graceful time-boxed exit,
    periodic checkpoint/summaries (utils/base_trainer.py:55-131)."""

    def __init__(self, options, model, spec, smpl_model, prior, train_ds, summary_writer=None):
        self.options = options
        self.model = model
        self.spec = spec
        self.train_ds = train_ds
        self.summary_writer = summary_writer

        # Mesh over the largest device count that evenly divides the batch
        # (a 1-chip host still gets a 1-device mesh; an 8-chip slice with
        # batch 64 uses all 8).
        all_devices = jax.devices()
        n = len(all_devices)
        while n > 1 and options.batch_size % n != 0:
            n -= 1
        self.mesh = make_mesh(all_devices[:n])
        self.n_devices = n

        step_fn, self.tx = make_train_step(model, spec, smpl_model, prior, options)

        # uint8-feed decode fused into the step program (no-op on float
        # batches, so tests/profilers feeding f32 share the same wrapper).
        from ..data.device_preprocess import decode_uint8_batch

        def wrap(fn):
            return jax.jit(lambda state, batch: fn(state, decode_uint8_batch(batch)),
                           donate_argnums=(0,))

        self.train_step = wrap(step_fn)
        self.feed_keys = step_feed_keys(spec)
        self._mode1_step = None
        if spec.input_mode == "pm_contact":
            # Bodies-At-Rest epoch schedule: pre-build the post-mod1_epoch
            # step so crossing the boundary is a cached swap, not a redesign.
            step1_fn, _ = make_train_step(
                model, spec, smpl_model, prior, options, bar_mode="1"
            )
            self._mode1_step = wrap(step1_fn)

        # Init or resume.  Init args mirror the model family's input mode.
        rng = jax.random.PRNGKey(options.seed)
        res = options.img_res
        mods = tuple(
            jnp.zeros((2, res, res, {"img": 3}.get(m, 1)), jnp.float32)
            for m in spec.modalities
        )
        if spec.input_mode == "concat":
            variables = model.init(rng, jnp.concatenate(mods, axis=-1))
        elif spec.input_mode == "multi":
            variables = model.init(rng, mods)
        elif spec.input_mode == "fusion":
            variables = model.init(rng, mods, smpl_model)
        elif spec.input_mode == "pm_contact":
            contact = jnp.zeros((2, res, res, 2), jnp.float32)
            variables = model.init(
                rng, jnp.concatenate(list(mods) + [contact], axis=-1), mode="0"
            )
        else:
            raise AssertionError(spec.input_mode)
        from .. import config as _config

        # Per-dataset fits blocks for mixtures (MixedDataset exposes the
        # layout + global indices); single datasets keep one block.
        fits_layout = getattr(train_ds, "fits_layout", None) or [
            (options.data_train, len(train_ds))
        ]
        fits_store = FitsStore(
            fits_layout, checkpoint_dir=options.checkpoint_dir,
            static_fits_dir=_config.STATIC_FITS_DIR,
        )
        self.fits_store = fits_store
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)

        # --pretrained_fusion_checkpoint: graft a converted ir_depth_fusion
        # tree under the FrozenGuidedFusion pipeline's "guide" submodule
        # (reference loads a hard-coded pretrained checkpoint for these
        # model names, train/trainer.py:30-36).
        guide_ckpt = getattr(options, "pretrained_fusion_checkpoint", None)
        if guide_ckpt:
            if guide_ckpt.endswith(".pt"):
                from .checkpoint import load_torch_checkpoint

                guide_vars, _ = load_torch_checkpoint(guide_ckpt)
            else:
                guide_vars, _, _ = load_checkpoint(guide_ckpt)
            params = _merge_tolerant(params, {"guide": guide_vars.get("params", {})})
            batch_stats = _merge_tolerant(
                batch_stats, {"guide": guide_vars.get("batch_stats", {})}
            )

        # --pretrained_checkpoint: weights-only tolerant load, strict=False
        # semantics (reference utils/base_trainer.py:44-53): keys present in
        # the checkpoint override matching paths; everything else keeps init.
        pretrained = getattr(options, "pretrained_checkpoint", None)
        if pretrained:
            if pretrained.endswith(".pt"):
                from .checkpoint import load_torch_checkpoint

                pre_vars, _ = load_torch_checkpoint(
                    pretrained, target_model=options.model)
            else:
                pre_vars, _, _ = load_checkpoint(pretrained)
            params = _merge_tolerant(params, pre_vars.get("params", {}))
            batch_stats = _merge_tolerant(batch_stats, pre_vars.get("batch_stats", {}))
            opt_state = self.tx.init(params)

        self.checkpoint_batch_idx = 0
        self.epoch0 = 0
        self.step_count = 0
        self.dataset_perm = None
        resume_rng = None
        if options.resume:
            # Explicit --checkpoint wins over latest-in-dir discovery
            # (reference utils/base_trainer.py:29).
            ck = getattr(options, "checkpoint", None) or latest_checkpoint(
                options.checkpoint_dir
            )
            if ck:
                if ck.endswith(".pt"):
                    # Resume directly from a reference torch checkpoint:
                    # weights + Adam moments + step metadata converted.
                    from .checkpoint import load_torch_checkpoint

                    variables_ck, moments, meta = load_torch_checkpoint(
                        ck, with_optimizer=True, target_model=options.model
                    )
                    opt_flat = {}
                else:
                    variables_ck, opt_flat, meta = load_checkpoint(ck)
                    moments = None
                params = _merge_tolerant(params, variables_ck.get("params", {}))
                batch_stats = _merge_tolerant(
                    batch_stats, variables_ck.get("batch_stats", {})
                )
                opt_state = self.tx.init(params)
                restored = restore_opt_state(opt_state, opt_flat)
                if restored is not None:
                    opt_state = restored
                elif moments is not None:
                    opt_state = _graft_adam_moments(opt_state, *moments)
                self.epoch0 = int(meta.get("epoch", 0))
                self.checkpoint_batch_idx = int(meta.get("batch_idx", 0))
                self.step_count = int(meta.get("total_step_count", 0))
                if "dataset_perm" in meta and meta["dataset_perm"] is not None:
                    self.dataset_perm = np.asarray(meta["dataset_perm"])
                if meta.get("rng") is not None:
                    resume_rng = np.asarray(meta["rng"], np.uint32)

        self.state = TrainState(
            params=jax.device_put(params, replicated(self.mesh)),
            batch_stats=jax.device_put(batch_stats, replicated(self.mesh)),
            opt_state=jax.device_put(opt_state, replicated(self.mesh)),
            fits=jax.device_put(fits_store.array, replicated(self.mesh)),
            rng=(jnp.asarray(resume_rng) if resume_rng is not None
                 else jax.random.PRNGKey(options.seed + 1)),
            step=jnp.asarray(self.step_count, jnp.int32),
        )

    def _save(self, epoch, batch_idx, perm):
        variables = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
        }
        self.fits_store.array = self.state.fits
        self.fits_store.save()
        save_checkpoint(
            self.options.checkpoint_dir, variables,
            opt_state_flat=flatten_opt_state(self.state.opt_state),
            metadata={
                "dataset_perm": np.asarray(perm),
                "total_step_count": self.step_count,
                "batch_size": self.options.batch_size,
                # PRNG key saved so a resumed run replays the exact dropout
                # stream — resume is bit-exact, not just statistically so.
                "rng": np.asarray(jax.device_get(self.state.rng)).tolist(),
            },
            epoch=epoch, batch_idx=batch_idx,
        )

    def train(self, eval_fn=None):
        from ..data.loader import CheckpointDataLoader
        from ..utils.profiling import StepTimer

        opts = self.options
        start = time.time()
        bsharding = batch_sharding(self.mesh)
        # Per-phase timing (SURVEY.md §5.1: the reference has no profiling;
        # here data-wait / dispatch / sync EMAs + honest wall-clock
        # throughput are reported every summary_steps).
        timer = StepTimer()
        window_t0, window_steps = time.time(), 0

        for epoch in range(self.epoch0, opts.num_epochs):
            if (self._mode1_step is not None
                    and epoch >= getattr(opts, "mod1_epoch", 10**9)):
                self.train_step = self._mode1_step
            ckpt = None
            if epoch == self.epoch0 and self.dataset_perm is not None:
                ckpt = {"dataset_perm": self.dataset_perm,
                        "batch_idx": self.checkpoint_batch_idx}
            loader = CheckpointDataLoader(
                self.train_ds, batch_size=opts.batch_size,
                shuffle=opts.shuffle_train, num_workers=opts.num_workers,
                checkpoint=ckpt, seed=opts.seed + epoch,
            )
            it = iter(loader)
            while True:
                with timer.phase("data"):
                    got = next(it, None)
                if got is None:
                    break
                batch_idx, batch = got
                with timer.phase("dispatch"):
                    num_batch = {k: jnp.asarray(batch[k]) for k in STEP_KEYS
                                 if k in batch and k in self.feed_keys}
                    num_batch = jax.device_put(num_batch, bsharding)
                    self.state, metrics = self.train_step(self.state, num_batch)
                self.step_count += 1
                window_steps += 1

                if self.step_count % opts.summary_steps == 0:
                    with timer.phase("sync"):
                        m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    wall = time.time() - window_t0
                    ips = opts.batch_size * window_steps / wall if wall > 0 else 0.0
                    if self.summary_writer is not None:
                        for k, v in m.items():
                            self.summary_writer.add_scalar(k, v, self.step_count)
                        self.summary_writer.add_scalar("perf/images_per_sec", ips, self.step_count)
                        self.summary_writer.add_scalar(
                            "perf/step_ms", 1000.0 * wall / window_steps, self.step_count)
                    print(f"epoch {epoch} step {self.step_count}: " +
                          " ".join(f"{k}={v:.4f}" for k, v in m.items()) +
                          f" | {timer.summary()} wall_step="
                          f"{1000.0 * wall / window_steps:.1f}ms ips={ips:.1f}")
                    timer.reset()  # window means, not a compile-seeded EMA
                    window_t0, window_steps = time.time(), 0

                if self.step_count % opts.checkpoint_steps == 0:
                    self._save(epoch, batch_idx + 1, loader.dataset_perm)

                if opts.test_steps and self.step_count % opts.test_steps == 0 and eval_fn:
                    eval_fn(self)

                if time.time() - start > opts.time_to_run:
                    self._save(epoch, batch_idx + 1, loader.dataset_perm)
                    print("Timeout reached: checkpoint saved, exiting cleanly")
                    return
            # End of epoch: checkpoint (+ optional eval).
            self._save(epoch + 1, 0, loader.dataset_perm)
            if eval_fn:
                eval_fn(self)
