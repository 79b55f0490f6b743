"""Evaluation driver: run_evaluation parity with the reference eval.py.

Re-design of reference eval.py:54-523.  Differences are all performance /
correctness re-design, not behavior:
  * the per-batch model dispatch + cascade + SMPL + 17-joint regression +
    pelvis centering + MPJPE + batched Procrustes run as ONE jit program
    (evaluation/pipeline.py) — the reference loops numpy SVDs per sample;
  * the eval-time body mask replacing neural_renderer comes from a
    filled-triangle z-buffer mesh rasterization (ops/tri_raster.py via
    render/part_renderer.py, matching the reference's eval mechanism
    part_utils.py:13-54) — mask accuracy/F1 computed after `uncrop`
    against GT uncover masks with the same filename rewriting
    (eval.py:428-443); the vertex splat (ops/mask_raster.py) remains the
    IN-MODEL mask mechanism of the fusion families (models/hmr.py:1697);
  * PVE (per-vertex error) is actually implemented — the reference allocates
    the accumulators but never fills them (eval.py:104-106, dead code).
"""

from __future__ import annotations

import datetime
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config, constants
from ..data.loader import CheckpointDataLoader
from ..geometry import reconstruction_error
from ..geometry.rotations import rotmat_to_aa
from ..smpl.model import SMPLModel, smpl_forward
from ..data.transforms import uncrop
from .pipeline import make_inference_fn

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def load_j_regressor_h36m(path: Optional[str] = None, num_vertices: int = constants.NUM_VERTICES):
    """data/J_regressor_h36m.npy [17, 6890] or a deterministic synthetic
    stand-in with the same shape/row-normalization."""
    path = path or config.JOINT_REGRESSOR_H36M
    if path and os.path.exists(path):
        return np.load(path).astype(np.float32)
    J = np.zeros((17, num_vertices), np.float32)
    centers = np.linspace(0.03, 0.97, 17)
    for j, cfrac in enumerate(centers):
        idx = int(cfrac * num_vertices)
        lo, hi = max(0, idx - 30), min(num_vertices, idx + 30)
        J[j, lo:hi] = 1.0 / (hi - lo)
    return J


def _rodrigues(aa: np.ndarray) -> np.ndarray:
    """cv2.Rodrigues work-alike (host, 3-vector -> 3x3)."""
    aa = np.asarray(aa, np.float64)
    theta = np.linalg.norm(aa)
    if theta < 1e-12:
        return np.eye(3)
    k = aa / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def _stretch_depth(depth_u8: np.ndarray, black: np.ndarray) -> np.ndarray:
    """The reference's bed/background contrast stretch (eval.py:362-367):
    uint8 pixels below 220 (the bed) get (v - 150) * 3 with uint8
    wraparound; background (>220) passes through; black-crop pixels -> 0."""
    out = depth_u8.copy()
    bed = out < 220
    out[bed] = ((out[bed].astype(np.int64) - 150) * 3).astype(np.uint8)
    out[black] = 0
    return out


def _save_artifacts(result_file, dataset_name, offset, batch, preds, smpl_model,
                    img_res, pred_masks=None):
    """Write recovered-modality images and mesh overlays for inspection
    (reference: eval.py:294-378): the mesh overlay, side/top rotated views,
    COLORMAP_HOT recovered IR, the raw + COLORMAP_OCEAN recovered depth with
    the bed/background contrast stretch, and the predicted mask png."""
    from .. import constants as C

    if "img" not in batch:  # raw-decode (device-preprocess) mode
        if not getattr(_save_artifacts, "_warned_raw", False):
            print("artifact dumps unavailable under --device_preprocess "
                  "(normalized images never materialize on the host)")
            _save_artifacts._warned_raw = True
        return
    from ..render.renderer import Renderer

    out_dir = os.path.join(result_file, dataset_name)
    os.makedirs(out_dir, exist_ok=True)
    renderer = Renderer(
        focal_length=C.FOCAL_LENGTH, img_res=img_res, faces=np.asarray(smpl_model.faces)
    )
    from ..geometry import weak_perspective_to_cam_t

    cam_t = np.asarray(
        weak_perspective_to_cam_t(preds["cam"], C.FOCAL_LENGTH, img_res)
    )
    verts = np.asarray(preds["vertices"])
    recon = {k: np.asarray(v) for k, v in preds.get("recon", {}).items()}
    masks = np.asarray(pred_masks) if pred_masks is not None else None
    imgs = np.asarray(batch["img"])
    mean = np.asarray(C.IMG_NORM_MEAN)
    std = np.asarray(C.IMG_NORM_STD)
    bs = imgs.shape[0]
    around_side = _rodrigues(np.array([0.0, np.radians(90.0), 0.0]))
    around_top = _rodrigues(np.array([-np.radians(90.0), 0.0, 0.0]))
    for i in range(min(bs, 8)):  # cap per batch to keep dumps small
        idx = offset + i
        rgb = np.clip(imgs[i] * std + mean, 0, 1)
        # Reference black-crop mask (eval.py:355): zero-padding from the crop.
        black = imgs[i][:, :, 0] * std[0] + mean[0] < 1e-4
        try:
            overlay = renderer(verts[i], cam_t[i], rgb)
            # Side/top views: vertices rotated +-90deg about the vertex
            # centroid, rendered on a blank background (eval.py:324-338).
            center = verts[i].mean(axis=0)
            side = renderer((verts[i] - center) @ around_side + center, cam_t[i])
            top = renderer((verts[i] - center) @ around_top + center, cam_t[i])
            if cv2 is not None:
                cv2.imwrite(
                    os.path.join(out_dir, f"{idx:06d}_shape.png"),
                    (overlay[:, :, ::-1] * 255).astype(np.uint8),
                )
                cv2.imwrite(
                    os.path.join(out_dir, f"{idx:06d}_shape_side.png"),
                    (side[:, :, ::-1] * 255).astype(np.uint8),
                )
                cv2.imwrite(
                    os.path.join(out_dir, f"{idx:06d}_shape_top.png"),
                    (top[:, :, ::-1] * 255).astype(np.uint8),
                )
        except Exception:
            pass  # rendering is best-effort, never fails the eval
        for name, img in recon.items():
            if cv2 is None:
                continue
            norm = {"depth": (C.DEPTH_NORM_MEAN, C.DEPTH_NORM_STD),
                    "ir": (C.IR_NORM_MEAN, C.IR_NORM_STD),
                    "pm": (C.PM_NORM_MEAN, C.PM_NORM_STD)}[name]
            rec = np.clip(img[i, :, :, 0] * norm[1][0] + norm[0][0], 0, 1)
            rec_u8 = (rec * 255).astype(np.uint8)
            cv2.imwrite(
                os.path.join(out_dir, f"{idx:06d}_{name}_recovered.png"),
                rec_u8,
            )
            if name == "ir":  # eval.py:356-360: HOT colormap, black crop -> 0
                ir_cm = cv2.applyColorMap(rec_u8, cv2.COLORMAP_HOT)
                ir_cm[black] = 0
                cv2.imwrite(os.path.join(out_dir, f"{idx:06d}_irout.png"), ir_cm)
            elif name == "depth":  # eval.py:361-375: stretch + OCEAN colormap
                d_st = _stretch_depth(rec_u8, black)
                cv2.imwrite(
                    os.path.join(out_dir, f"{idx:06d}_depthoutori.png"), d_st
                )
                d_cm = cv2.applyColorMap(d_st, cv2.COLORMAP_OCEAN)
                d_cm[black] = 0
                cv2.imwrite(os.path.join(out_dir, f"{idx:06d}_depthout.png"), d_cm)
        if masks is not None and cv2 is not None:  # eval.py:377-378
            cv2.imwrite(
                os.path.join(out_dir, f"{idx:06d}_mask.png"),
                (masks[i] > 0).astype(np.uint8) * 255,
            )


def run_evaluation(
    model,
    spec,
    variables,
    dataset_name: str,
    dataset,
    smpl_model: SMPLModel,
    smpl_gendered: Optional[tuple] = None,
    result_file: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    epoch: int = 0,
    batch_idx=None,
    batch_size: int = 32,
    img_res: int = constants.IMG_RES,
    num_workers: int = 8,
    shuffle: bool = False,
    log_freq: int = 50,
    num_cas_iters: int = 2,
    eval_masks_enabled: bool = True,
    device_preprocess: bool = False,
    devices=None,
) -> dict:
    """Evaluate MPJPE / PA-MPJPE / PVE (+ mask accuracy/F1) on a split.

    Inference is data-parallel over a 1-D device mesh (the reference
    evaluates under nn.DataParallel, eval.py:529): padded batches are
    sharded on dim 0 across the largest device count that divides
    batch_size, with the variables replicated.  All metric math is
    per-sample, so results match the single-chip run to float32 rounding
    (XLA's conv tiling depends on the per-shard batch shape; measured
    divergence ~1e-7 — pinned by tests/test_eval_sharded.py).

    Returns the metric dict and appends to <checkpoint_dir>/log.txt like
    eval.py:498-513.
    """
    from ..parallel import batch_sharding, make_mesh, replicated

    devs = list(devices) if devices is not None else jax.devices()
    n_use = max(k for k in range(1, len(devs) + 1) if batch_size % k == 0)
    mesh = make_mesh(devs[:n_use])
    bshard = batch_sharding(mesh)
    variables = jax.device_put(variables, replicated(mesh))

    n = len(dataset)
    jreg_np = load_j_regressor_h36m(num_vertices=smpl_model.v_template.shape[0])
    infer = jax.jit(
        make_inference_fn(
            model, spec, smpl_model,
            j_regressor_h36m=jreg_np,
            num_cas_iters=num_cas_iters,
            # The final cascade stage's image reconstructions only matter
            # for the artifact dumps — for metric-only eval the lazy heads
            # skip that decoder pass entirely (the reference always computes
            # and discards it, eval.py:171-178).
            final_recon=result_file is not None,
        )
    )

    mpjpe = np.zeros(n)
    recon_err = np.zeros(n)
    pve = np.zeros(n)
    # PVE is averaged over samples WITH GT SMPL only — zero-filling samples
    # without GT and dividing by n would deflate the metric on splits with
    # partial SMPL GT (the reference never populates PVE at all,
    # eval.py:104-106; this metric is our own claim, so it must be honest).
    pve_valid = np.zeros(n, dtype=bool)
    pending_pose = []  # parked device metrics; see the deferred-fetch note

    def drain_pose():
        for plo, phi, pbs, err_d, pa_d, pv_d, pvalid in pending_pose:
            mpjpe[plo:phi] = np.asarray(err_d)[:pbs]
            recon_err[plo:phi] = np.asarray(pa_d)[:pbs]
            if pv_d is not None:
                pve[plo:phi] = np.asarray(pv_d)[:pbs] * pvalid
                pve_valid[plo:phi] = pvalid
        pending_pose.clear()

    accuracy = 0.0
    pixel_count = 0
    tp = np.zeros(2)
    fp = np.zeros(2)
    fn = np.zeros(2)
    f1 = np.zeros(2)

    save_results = result_file is not None
    smpl_pose = np.zeros((n, 24, 3, 3)) if save_results else None
    smpl_betas = np.zeros((n, 10)) if save_results else None
    smpl_camera = np.zeros((n, 3)) if save_results else None
    pred_joints_out = np.zeros((n, 17, 3)) if save_results else None

    eval_pose = dataset_name.startswith("slp") or any(
        k in dataset_name for k in ("h36m", "3dpw", "mpi-inf")
    )
    # GT source (reference eval.py:385-396): slp/h36m/mpi-inf carry packed
    # 3D GT in pose_3d; 3dpw-style datasets get GT joints regressed from
    # GENDERED GT SMPL meshes (per-sample gender==1 selects female).
    packed_3d_gt = any(k in dataset_name for k in ("h36m", "mpi-inf", "slp"))
    gendered_gt_fn = None
    if eval_pose and not packed_3d_gt:
        if smpl_gendered is not None:
            smpl_male, smpl_female = smpl_gendered
        else:
            print("WARNING: no gendered SMPL models — gendered-GT eval "
                  "falls back to the neutral model for both genders "
                  "(reference loads male/female, eval.py:66-73)")
            smpl_male = smpl_female = smpl_model
        _jreg_j = jnp.asarray(jreg_np, jnp.float32)
        _h36m_map = jnp.asarray(constants.H36M_TO_J17)
        _prec = jax.lax.Precision.HIGHEST

        def _gendered_gt(betas, pose, gender):
            # reference eval.py:389-396
            vm = smpl_forward(smpl_male, betas, pose_aa=pose).vertices
            vf = smpl_forward(smpl_female, betas, pose_aa=pose).vertices
            gv = jnp.where((gender == 1)[:, None, None], vf, vm)
            k = jnp.einsum("jv,bvc->bjc", _jreg_j, gv, precision=_prec)
            pelvis = k[:, 0:1, :]
            k = k[:, _h36m_map, :] - pelvis
            return k, gv

        gendered_gt_fn = jax.jit(_gendered_gt)
    eval_masks = eval_masks_enabled and dataset_name.startswith("slp")
    eval_parts = eval_masks_enabled and dataset_name == "lsp"
    parts_tp = np.zeros(7)
    parts_fp = np.zeros(7)
    parts_fn = np.zeros(7)
    parts_f1 = np.zeros(7)
    parts_accuracy = 0.0
    parts_pixel_count = 0
    part_renderer = None
    if eval_masks or eval_parts:
        # ONE mesh rasterization serves both the mask and parts eval, like
        # the reference's single part_renderer call (eval.py:417-418).
        # Masks come from FILLED-TRIANGLE z-buffer rasterization of the
        # SMPL mesh (the reference's eval mechanism, part_utils.py:13-54)
        # — NOT the in-model vertex splat (models/hmr.py:1697-1739), which
        # remains the fusion models' mask source (ops/mask_raster.py).
        from ..render.part_renderer import PartRenderer

        part_renderer = PartRenderer(
            render_res=img_res,
            num_vertices=smpl_model.v_template.shape[0],
            template=np.asarray(smpl_model.v_template),
            faces=np.asarray(smpl_model.faces),
            # Mask-only splits (slp) skip the part-labeling pass entirely.
            render_labels=eval_parts,
        )
    jm_gt = np.asarray(constants.J24_TO_J17)

    # drop_last=False: every sample of the split is evaluated, like the
    # reference's plain DataLoader (eval.py:94).  The tail batch is padded
    # back up to batch_size (repeating the last sample) so the jitted
    # inference program never sees a new shape; padded rows are sliced off
    # before touching any accumulator.
    loader = CheckpointDataLoader(
        dataset, batch_size=batch_size, shuffle=shuffle, num_workers=num_workers,
        drop_last=False,
    )
    gt_vertices_fn = jax.jit(lambda betas, pose: smpl_forward(smpl_model, betas, pose_aa=pose).vertices)
    pa_fn = jax.jit(lambda a, b: reconstruction_error(a, b, reduction=None))

    # Fused on-device preprocessing (BASELINE north star): the dataset
    # emits raw uint8 modalities (BaseDataset.return_raw) and crop+resize+
    # normalize run as one jit program per batch instead of per-sample host
    # PIL work.  Only meaningful for the modality-image families.
    use_device_pre = device_preprocess and spec.input_mode in ("concat", "multi")
    pre_fn = None
    if use_device_pre:
        from ..data.device_preprocess import make_device_preprocess

        pre_fn = make_device_preprocess(res=img_res)

    for step, batch in loader:
        bs = batch["imgname"].__len__() if "imgname" in batch else batch[
            next(iter(batch))].shape[0]
        lo = step * batch_size
        hi = lo + bs
        feed_keys = list(spec.modalities)
        if spec.input_mode == "pm_contact":
            feed_keys.append("pm_contact")
        dev_batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        if bs < batch_size:
            from ..parallel import pad_to_multiple

            dev_batch, _ = pad_to_multiple(dev_batch, batch_size)
        put = lambda x, dt=None: jax.device_put(  # noqa: E731
            jnp.asarray(x, dt) if dt else jnp.asarray(x), bshard)
        if pre_fn is not None:
            pre_bs = next(iter(dev_batch.values())).shape[0]
            processed = pre_fn(
                {k: put(dev_batch["raw_" + k]) for k in spec.modalities
                 if "raw_" + k in dev_batch},
                put(dev_batch["center"], jnp.float32),
                put(dev_batch["scale"], jnp.float32),
                put(np.zeros(pre_bs, np.float32)),
                put(np.ones((pre_bs, 3), np.float32)),
            )
            dev_batch.update(processed)
        inputs = tuple(put(dev_batch[k]) for k in feed_keys)
        preds = infer(variables, inputs)

        if eval_pose:
            gt_verts_gendered = None
            if packed_3d_gt:
                gt_kp3d = dev_batch["pose_3d"][:, jm_gt, :3]
            else:
                gt_kp3d, gt_verts_gendered = gendered_gt_fn(
                    jnp.asarray(dev_batch["betas"], jnp.float32),
                    jnp.asarray(dev_batch["pose"], jnp.float32),
                    jnp.asarray(dev_batch["gender"]),
                )
            pred17 = preds["keypoints_3d_17"]
            err_dev = jnp.sqrt(jnp.sum((pred17 - gt_kp3d) ** 2, axis=-1)).mean(axis=-1)
            pa_dev = pa_fn(pred17, jnp.asarray(gt_kp3d))

            # PVE vs GT SMPL mesh when GT pose/shape exist (gendered mesh on
            # the gendered-GT path, neutral otherwise).
            pv_dev = None
            valid = np.zeros(bs, dtype=bool)
            if np.any(batch["has_smpl"] > 0):
                gt_verts = gt_verts_gendered if gt_verts_gendered is not None else gt_vertices_fn(
                    jnp.asarray(dev_batch["betas"]), jnp.asarray(dev_batch["pose"])
                )
                pv_dev = jnp.sqrt(
                    jnp.sum((preds["vertices"] - gt_verts) ** 2, axis=-1)
                ).mean(axis=-1)
                valid = np.asarray(batch["has_smpl"] > 0)
            # Deferred fetch: the device arrays are parked and materialized
            # at drain points (periodic log + end of loop), so back-to-back
            # batches keep multiple inference dispatches in flight instead
            # of paying a host round trip per batch (same pipelined-dispatch
            # pattern as bench.py; per-dispatch overhead on the remote
            # tunnel is ~40 ms — PARITY.md MFU section).
            pending_pose.append((lo, hi, bs, err_dev, pa_dev, pv_dev, valid))

        if (eval_masks or eval_parts) and part_renderer is not None:
            masks_dev, parts_dev = part_renderer(preds["vertices"], preds["cam"])

        if eval_masks:
            masks = np.asarray(masks_dev)
            for i in range(bs):
                pred_mask = (
                    uncrop(
                        (masks[i] > 0).astype(np.uint8),
                        batch["center"][i],
                        batch["scale"][i],
                        batch["orig_shape"][i],
                    )
                    > 0
                )
                maskname = (
                    batch["imgname"][i]
                    .replace("RGB", "masks")
                    .replace("cover1", "uncover")
                    .replace("cover2", "uncover")
                    .replace("image_", "")
                )
                gt_mask_img = cv2.imread(maskname, 0) if cv2 is not None else None
                if gt_mask_img is None:
                    continue
                gt_mask = gt_mask_img > 0
                accuracy += (gt_mask == pred_mask).sum()
                pixel_count += int(np.prod(gt_mask.shape))
                for c in range(2):
                    cgt = gt_mask == c
                    cpred = pred_mask == c
                    tp[c] += (cgt & cpred).sum()
                    fp[c] += (~cgt & cpred).sum()
                    fn[c] += (cgt & ~cpred).sum()
                f1 = 2 * tp / np.maximum(2 * tp + fp + fn, 1)

        # LSP 6-part segmentation F1 (reference: eval.py:445-467).
        if eval_parts and part_renderer is not None:
            parts_pred = np.asarray(parts_dev)
            for i in range(bs):
                pp = uncrop(
                    parts_pred[i].astype(np.uint8),
                    batch["center"][i], batch["scale"][i], batch["orig_shape"][i],
                )
                partname = batch.get("partname", [""] * bs)[i]
                gt_parts = cv2.imread(partname, 0) if (cv2 is not None and partname) else None
                if gt_parts is None:
                    continue
                for c in range(7):
                    cgt = gt_parts == c
                    cpred = pp == c
                    cpred[gt_parts == 255] = 0
                    parts_tp[c] += (cgt & cpred).sum()
                    parts_fp[c] += (~cgt & cpred).sum()
                    parts_fn[c] += (cgt & ~cpred).sum()
                gt_parts = gt_parts.copy()
                gt_parts[gt_parts == 255] = 0
                pp[pp == 255] = 0
                parts_f1 = 2 * parts_tp / np.maximum(2 * parts_tp + parts_fp + parts_fn, 1)
                parts_accuracy += (gt_parts == pp).sum()
                parts_pixel_count += int(np.prod(gt_parts.shape))

        if save_results:
            smpl_pose[lo:hi] = np.asarray(preds["rotmat"])[:bs]
            smpl_betas[lo:hi] = np.asarray(preds["betas"])[:bs]
            smpl_camera[lo:hi] = np.asarray(preds["cam"])[:bs]
            pred_joints_out[lo:hi] = np.asarray(preds["keypoints_3d_17"])[:bs]
            # Artifact dumps for manual inspection (reference eval.py:294-378):
            # recovered modality images, mesh overlay + side/top views,
            # colormapped IR/depth, predicted mask.
            _save_artifacts(
                result_file, dataset_name, lo, batch, preds, smpl_model, img_res,
                pred_masks=(masks_dev if (eval_masks or eval_parts)
                            and part_renderer is not None else None),
            )

        if log_freq and step % log_freq == log_freq - 1 and eval_pose:
            drain_pose()
            print(f"MPJPE: {1000 * mpjpe[:hi].mean()}")
            print(f"Reconstruction Error: {1000 * recon_err[:hi].mean()}")

    drain_pose()
    results = {
        "mpjpe": 1000 * mpjpe.mean() if eval_pose else None,
        "pa_mpjpe": 1000 * recon_err.mean() if eval_pose else None,
        "pve": (1000 * pve[pve_valid].mean() if pve_valid.any() else None) if eval_pose else None,
        "mask_accuracy": (accuracy / pixel_count) if pixel_count else None,
        "mask_f1": float(f1.mean()) if pixel_count else None,
        "parts_accuracy": (parts_accuracy / parts_pixel_count) if parts_pixel_count else None,
        "parts_f1": float(parts_f1.mean()) if parts_pixel_count else None,
    }

    if save_results:
        os.makedirs(result_file, exist_ok=True)
        out_dir = os.path.join(result_file, "smpl_fits")
        os.makedirs(out_dir, exist_ok=True)
        # Match the reference export schema (eval.py:124,305-308,490): `pose`
        # is [N, 72] axis-angle so downstream consumers of <ds>_fits.npz
        # (e.g. seeding static fits from eval dumps) read ours unchanged.
        # The raw rotation matrices are kept under an extra key.
        pose_aa = np.asarray(
            rotmat_to_aa(jnp.asarray(smpl_pose)), np.float64
        ).reshape(n, 72)
        np.savez(
            os.path.join(out_dir, f"{dataset_name}_fits.npz"),
            pred_joints=pred_joints_out, pose=pose_aa, betas=smpl_betas,
            camera=smpl_camera, rotmat=smpl_pose,
        )

    if eval_pose:
        print(f"{dataset_name}: MPJPE: {results['mpjpe']}")
        print(f"\tReconstruction Error: {results['pa_mpjpe']}")
        if checkpoint_dir:
            log_path = os.path.join(checkpoint_dir, "log.txt")
            with open(log_path, "a") as f:
                f.write(
                    datetime.datetime.now().strftime("%Y-%m-%d-%H:%M:%S")
                    + f"\t[epoch: {epoch}], batch_idx: {batch_idx}\n"
                )
                f.write(f"{dataset_name}\tMPJPE: {results['mpjpe']}")
                f.write(f"\tReconstruction Error: {results['pa_mpjpe']}")
                if results["mask_accuracy"] is not None:
                    f.write(f"\tFB Accuracy: {results['mask_accuracy']}")
                    f.write(f"\tFB F1: {results['mask_f1']}")
                f.write("\n")
    if results["mask_accuracy"] is not None:
        print("Accuracy: ", results["mask_accuracy"])
        print("F1: ", results["mask_f1"])
    return results
