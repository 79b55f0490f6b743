"""END-TO-END eval-number parity: the reference's eval math, executed with
the GENUINE reference model classes + the genuine reference metric block
(eval.py:380-413 re-executed with reference constants + the real
utils/pose_utils.reconstruction_error), against OUR run_evaluation — same
synthetic SLP split, same converted weights — asserting the FINAL
MPJPE / PA-MPJPE numbers match.

This is the accuracy-target closer: it fails if ANY link in
dataset -> crop -> normalize -> model (incl. the cascade feedback
protocol) -> SMPL -> J_regressor -> H36M_TO_J17 mapping -> pelvis
centering -> Procrustes -> accumulator drifts between the two stacks.

Scope note: SMPL vertices on the torch side come from the same LBS module
as ours (SMPLStub over smpl.model.lbs, the pattern of
test_reference_parity.py) because the real smplx is not installed; LBS
itself is pinned independently in tests/test_smpl.py. Every other link is
computed by reference code or verbatim reference math.

Reference lines mirrored here: eval.py:149-199 (batch feed + model
protocols), eval.py:290-291 (neutral SMPL on predictions),
eval.py:380-413 (metric block), eval.py:493-494 (final numbers).
"""

import importlib
import os
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.ref_import import (
    import_reference_file,
    import_reference_models_hmr,
    import_reference_pose_utils,
    reference_present,
)

pytestmark = pytest.mark.skipif(
    not reference_present(), reason="reference checkout not present"
)

RES = 224  # the reference decoders hard-code AvgPool2d(7) -> 224 inputs only


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from inbed_pose_estimation_tpu.data.synthetic import write_synthetic_environment

    base = tmp_path_factory.mktemp("e2e_parity")
    env = write_synthetic_environment(str(base), num_subjects=1, samples_per_subject=3)
    os.environ["INBED_DATA_ROOT"] = env["data_root"]
    os.environ["INBED_NPZ_PATH"] = env["npz_path"]
    from inbed_pose_estimation_tpu import config

    importlib.reload(config)
    import inbed_pose_estimation_tpu.data.dataset as ds_mod

    importlib.reload(ds_mod)
    return env, ds_mod


@pytest.fixture(scope="module")
def ref_hmr():
    return import_reference_models_hmr()


@pytest.fixture(scope="module")
def ref_constants():
    return import_reference_file("constants.py", "reference_constants")


@pytest.fixture(scope="module")
def ref_pose_utils():
    return import_reference_pose_utils()


@pytest.fixture(scope="module")
def mean_params_npz(tmp_path_factory):
    from inbed_pose_estimation_tpu.smpl.assets import mean_params

    mp = mean_params(None)
    path = str(tmp_path_factory.mktemp("mp") / "smpl_mean_params.npz")
    np.savez(path, pose=np.asarray(mp["pose"], np.float32),
             shape=np.asarray(mp["shape"], np.float32),
             cam=np.asarray(mp["cam"], np.float32))
    return path


def _smpl_stub(smpl_model):
    """Torch-callable SMPL over our LBS (see module docstring).  Handles
    both calling conventions the reference eval uses: rotmat inputs
    (pose2rot=False, eval.py:290) and axis-angle GT poses (eval.py:390-391,
    global_orient [B,3] / body_pose [B,69])."""
    from inbed_pose_estimation_tpu.smpl.model import lbs, smpl_forward

    class SMPLStub(torch.nn.Module):
        def forward(self, betas=None, body_pose=None, global_orient=None,
                    pose2rot=True):
            if body_pose.dim() == 2:  # axis-angle
                pose = jnp.concatenate(
                    [jnp.asarray(global_orient.detach().numpy()),
                     jnp.asarray(body_pose.detach().numpy())], axis=1)
                out = smpl_forward(
                    smpl_model, jnp.asarray(betas.detach().numpy()), pose_aa=pose)
                return types.SimpleNamespace(
                    vertices=torch.from_numpy(np.asarray(out.vertices)))
            rotmat = torch.cat([global_orient, body_pose], dim=1)
            verts, _ = lbs(smpl_model, jnp.asarray(betas.detach().numpy()),
                           jnp.asarray(rotmat.detach().numpy()))
            return types.SimpleNamespace(
                vertices=torch.from_numpy(np.asarray(verts)))

    return SMPLStub()


def _nchw(x):
    return torch.from_numpy(np.transpose(np.asarray(x, np.float32), (0, 3, 1, 2)))


def _reference_eval_numbers(ref_model, model_name, dataset, smpl_neutral,
                            J_regressor, ref_constants, ref_pose_utils,
                            batch_size=2, num_cas_iters=2,
                            dataset_name="slp-4mod-uncover",
                            smpl_male=None, smpl_female=None):
    """The reference run_evaluation pose path (eval.py:93-101, 148-199,
    290-291, 380-413, 492-494), fed from OUR dataset's batches."""
    from inbed_pose_estimation_tpu.data.loader import CheckpointDataLoader

    n = len(dataset)
    mpjpe = np.zeros(n)
    recon_err = np.zeros(n)
    joint_mapper_h36m = ref_constants.H36M_TO_J17
    joint_mapper_gt = ref_constants.J24_TO_J17
    J_regressor = torch.from_numpy(np.asarray(J_regressor)).float()

    loader = CheckpointDataLoader(dataset, batch_size=batch_size,
                                  shuffle=False, num_workers=1, drop_last=False)
    for step, batch in loader:
        images = _nchw(batch["img"])
        curr_batch_size = images.shape[0]

        with torch.no_grad():
            if model_name == "cashmrV2":
                ir_img = _nchw(batch["ir_img"])
                depth_img = _nchw(batch["depth_img"])
                pm_img = _nchw(batch["pm_img"])
                # eval.py:171-178
                (pred_rotmat_temp, pred_betas_temp, pred_camera_temp,
                 pred_depth_temp) = ref_model([images, ir_img, depth_img, pm_img])
                for _ in range(num_cas_iters - 1):
                    pred_rotmat, pred_betas, pred_camera, pred_depth = ref_model(
                        [images, ir_img, pred_depth_temp, pm_img])
                    pred_depth_temp = pred_depth
            elif model_name == "hmr":
                pred_rotmat, pred_betas, pred_camera = ref_model(images)
            else:
                raise ValueError(model_name)

            # eval.py:290-291
            pred_output = smpl_neutral(
                betas=pred_betas, body_pose=pred_rotmat[:, 1:],
                global_orient=pred_rotmat[:, 0].unsqueeze(1), pose2rot=False)
            pred_vertices = pred_output.vertices

        # eval.py:380-413 (device-free)
        J_regressor_batch = J_regressor[None, :].expand(
            pred_vertices.shape[0], -1, -1)
        if ("h36m" in dataset_name or "mpi-inf" in dataset_name
                or "slp" in dataset_name):
            gt_keypoints_3d = torch.from_numpy(np.asarray(batch["pose_3d"], np.float32))
            gt_keypoints_3d = gt_keypoints_3d[:, joint_mapper_gt, :-1]
        else:
            # eval.py:389-396: gendered GT meshes
            gt_pose = torch.from_numpy(np.asarray(batch["pose"], np.float32))
            gt_betas = torch.from_numpy(np.asarray(batch["betas"], np.float32))
            gender = torch.from_numpy(np.asarray(batch["gender"]))
            gt_vertices = smpl_male(global_orient=gt_pose[:, :3],
                                    body_pose=gt_pose[:, 3:],
                                    betas=gt_betas).vertices
            gt_vertices_female = smpl_female(global_orient=gt_pose[:, :3],
                                             body_pose=gt_pose[:, 3:],
                                             betas=gt_betas).vertices
            gt_vertices[gender == 1, :, :] = gt_vertices_female[gender == 1, :, :]
            gt_keypoints_3d = torch.matmul(J_regressor_batch, gt_vertices)
            gt_pelvis = gt_keypoints_3d[:, [0], :].clone()
            gt_keypoints_3d = gt_keypoints_3d[:, joint_mapper_h36m, :]
            gt_keypoints_3d = gt_keypoints_3d - gt_pelvis

        pred_keypoints_3d = torch.matmul(J_regressor_batch, pred_vertices)
        pred_pelvis = pred_keypoints_3d[:, [0], :].clone()
        pred_keypoints_3d = pred_keypoints_3d[:, joint_mapper_h36m, :]
        pred_keypoints_3d = pred_keypoints_3d - pred_pelvis

        error = torch.sqrt(
            ((pred_keypoints_3d - gt_keypoints_3d) ** 2).sum(dim=-1)
        ).mean(dim=-1).cpu().numpy()
        mpjpe[step * batch_size:step * batch_size + curr_batch_size] = error

        r_error = ref_pose_utils.reconstruction_error(
            pred_keypoints_3d.cpu().numpy(), gt_keypoints_3d.cpu().numpy(),
            reduction=None)
        recon_err[step * batch_size:step * batch_size + curr_batch_size] = r_error

    # eval.py:493-494
    return 1000 * mpjpe.mean(), 1000 * recon_err.mean()


def _our_eval_numbers(model_name, variables, dataset, smpl_model, batch_size=2,
                      dataset_name="slp-4mod-uncover", smpl_gendered=None):
    from inbed_pose_estimation_tpu.evaluation.evaluate import run_evaluation
    from inbed_pose_estimation_tpu.models import build_model

    model, spec = build_model(model_name)
    results = run_evaluation(
        model, spec, variables, dataset_name, dataset, smpl_model,
        smpl_gendered=smpl_gendered,
        batch_size=batch_size, img_res=RES, num_workers=1, log_freq=0,
        eval_masks_enabled=False,
    )
    return results["mpjpe"], results["pa_mpjpe"]


def _run_parity(env, ref_hmr, ref_constants, ref_pose_utils, mean_params_npz,
                model_name, build_ref, dataset_name="slp-4mod-uncover",
                gendered=False):
    from inbed_pose_estimation_tpu.evaluation.evaluate import load_j_regressor_h36m
    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model
    from inbed_pose_estimation_tpu.train.checkpoint import convert_torch_state_dict

    _, ds_mod = env

    class Opt:
        img_res = RES

    dataset = ds_mod.BaseDataset(Opt(), dataset_name, is_train=False)
    smpl_model = synthetic_smpl_model(seed=0)
    jreg = load_j_regressor_h36m(num_vertices=smpl_model.v_template.shape[0])

    smpl_gendered = None
    stub_kw = {}
    if gendered:
        male = synthetic_smpl_model(seed=1)
        female = synthetic_smpl_model(seed=2)
        smpl_gendered = (male, female)
        stub_kw = dict(smpl_male=_smpl_stub(male), smpl_female=_smpl_stub(female))

    torch.manual_seed(0)
    ref_model = build_ref()
    ref_model.eval()
    variables = convert_torch_state_dict(ref_model.state_dict())

    ref_mpjpe, ref_pa = _reference_eval_numbers(
        ref_model, model_name, dataset, _smpl_stub(smpl_model), jreg,
        ref_constants, ref_pose_utils, dataset_name=dataset_name, **stub_kw)
    our_mpjpe, our_pa = _our_eval_numbers(
        model_name, variables, dataset, smpl_model,
        dataset_name=dataset_name, smpl_gendered=smpl_gendered)

    print(f"{model_name}: MPJPE ours={our_mpjpe:.6f} ref={ref_mpjpe:.6f} "
          f"delta={abs(our_mpjpe - ref_mpjpe):.6f}mm | PA ours={our_pa:.6f} "
          f"ref={ref_pa:.6f} delta={abs(our_pa - ref_pa):.6f}mm")
    # Untrained weights on synthetic data: the numbers are large, so equal
    # values can't be a trivial zero-vs-zero match.
    assert ref_mpjpe > 10.0 and ref_pa > 1.0
    # On identical converted weights and identical inputs the two stacks
    # agree to float tolerance — measured deltas are <= 0.00034mm (MPJPE)
    # and <= 0.0003mm (PA) across hmr/cashmrV2/3dpw-gendered.  Assert at
    # 0.01mm (~30x headroom for backend ulp jitter): a drift anywhere near
    # the 0.5mm BASELINE budget is a real cross-stack bug, not noise.
    assert abs(our_mpjpe - ref_mpjpe) < 0.01, (our_mpjpe, ref_mpjpe)
    assert abs(our_pa - ref_pa) < 0.01, (our_pa, ref_pa)


@pytest.mark.slow
def test_e2e_eval_number_parity_hmr(env, ref_hmr, ref_constants,
                                    ref_pose_utils, mean_params_npz):
    _run_parity(
        env, ref_hmr, ref_constants, ref_pose_utils, mean_params_npz,
        "hmr",
        lambda: ref_hmr.HMR(ref_hmr.Bottleneck, [3, 4, 6, 3],
                            mean_params_npz, input_dim=3),
    )


@pytest.mark.slow
def test_e2e_eval_number_parity_cashmrV2(env, ref_hmr, ref_constants,
                                         ref_pose_utils, mean_params_npz):
    """Flagship: full cascade protocol end-to-end (eval.py:171-178)."""
    _run_parity(
        env, ref_hmr, ref_constants, ref_pose_utils, mean_params_npz,
        "cashmrV2",
        lambda: ref_hmr.CASHMR(ref_hmr.Bottleneck, [3, 4, 6, 3], mean_params_npz),
    )


@pytest.mark.slow
def test_e2e_eval_number_parity_3dpw_gendered(env, ref_hmr, ref_constants,
                                              ref_pose_utils, mean_params_npz):
    """3dpw-style eval: GT joints from GENDERED GT meshes on both sides
    (reference eval.py:389-396 vs our gendered_gt_fn)."""
    _run_parity(
        env, ref_hmr, ref_constants, ref_pose_utils, mean_params_npz,
        "hmr",
        lambda: ref_hmr.HMR(ref_hmr.Bottleneck, [3, 4, 6, 3],
                            mean_params_npz, input_dim=3),
        dataset_name="3dpw", gendered=True,
    )


@pytest.mark.slow
def test_e2e_mask_number_parity(env, ref_constants, monkeypatch):
    """Mask-METRIC plumbing parity: inject IDENTICAL rendered masks into
    both stacks' uncrop -> filename rewrite -> accuracy/F1 accumulation
    (reference eval.py:420-443 with the GENUINE utils/imutils.uncrop running
    the genuine scipy-1.2 imresize) and assert the final mask numbers match.

    This pins every link the pose-parity tests don't: crop-box inversion,
    nearest-neighbor un-resize, the RGB->masks/cover->uncover imgname
    rewrite, gt mask loading, and the UP-3D accuracy/F1 counter math —
    independent of any rasterizer (the rasterizer itself is pinned by
    tests/test_tri_raster.py)."""
    import sys

    import cv2

    from tests.oracles import scipy_pilutil

    _, ds_mod = env

    # --- genuine reference utils/imutils.py, with its scipy-1.2 imresize
    # dependency satisfied by the vendored BSD scipy-1.2 source.
    import scipy.misc as _scipy_misc

    monkeypatch.setattr(_scipy_misc, "imresize", scipy_pilutil.imresize,
                        raising=False)
    had_constants = sys.modules.get("constants")
    sys.modules["constants"] = ref_constants
    try:
        ref_imutils = import_reference_file("utils/imutils.py",
                                            "reference_imutils")
    finally:
        if had_constants is not None:
            sys.modules["constants"] = had_constants
        else:
            sys.modules.pop("constants", None)

    RES_M = 64

    class Opt:
        img_res = RES_M

    dataset = ds_mod.BaseDataset(Opt(), "slp-4mod-uncover", is_train=False)
    n = len(dataset)
    batch_size = 2

    # Deterministic injected "rendered" masks, one per sample (+1 spare for
    # tail padding), at crop resolution — exactly what a rasterizer returns.
    rng = np.random.default_rng(7)
    injected = (rng.random((n + 1, RES_M, RES_M)) > 0.6).astype(np.float32)

    # --- reference-side accumulation (eval.py:420-443, verbatim math).
    from inbed_pose_estimation_tpu.data.loader import CheckpointDataLoader

    accuracy = 0.0
    pixel_count = 0
    tp = np.zeros(2)
    fp = np.zeros(2)
    fn = np.zeros(2)
    f1 = np.zeros(2)
    loader = CheckpointDataLoader(dataset, batch_size=batch_size,
                                  shuffle=False, num_workers=1, drop_last=False)
    for step, batch in loader:
        curr_batch_size = len(batch["imgname"])
        center = np.asarray(batch["center"])
        scale = np.asarray(batch["scale"])
        orig_shape = np.asarray(batch["orig_shape"])
        for i in range(curr_batch_size):
            mask_i = injected[step * batch_size + i]
            pred_mask = ref_imutils.uncrop(
                mask_i, center[i], scale[i], orig_shape[i]) > 0
            maskname = (batch["imgname"][i].replace("RGB", "masks")
                        .replace("cover1", "uncover")
                        .replace("cover2", "uncover")
                        .replace("image_", ""))
            gt_mask = cv2.imread(maskname, 0) > 0
            accuracy += (gt_mask == pred_mask).sum()
            pixel_count += np.prod(np.array(gt_mask.shape))
            for c in range(2):
                cgt = gt_mask == c
                cpred = pred_mask == c
                tp[c] += (cgt & cpred).sum()
                fp[c] += (~cgt & cpred).sum()
                fn[c] += (cgt & ~cpred).sum()
            f1 = 2 * tp / (2 * tp + fp + fn)
    ref_acc = accuracy / pixel_count
    ref_f1 = float(f1.mean())

    # --- our stack end-to-end, with the rasterizer swapped for a stub that
    # returns the SAME injected masks batch-by-batch (shuffle=False eval
    # order; tail batch padded to batch_size like the real renderer output).
    class InjectingRenderer:
        def __init__(self, *a, **k):
            self.calls = 0

        def __call__(self, vertices, cam):
            k = self.calls
            self.calls += 1
            out = injected[k * batch_size:(k + 1) * batch_size]
            if out.shape[0] < batch_size:
                pad = np.repeat(out[-1:], batch_size - out.shape[0], axis=0)
                out = np.concatenate([out, pad], axis=0)
            return jnp.asarray(out), None

    import inbed_pose_estimation_tpu.render.part_renderer as pr_mod

    monkeypatch.setattr(pr_mod, "PartRenderer", InjectingRenderer)

    import jax

    from inbed_pose_estimation_tpu.evaluation.evaluate import run_evaluation
    from inbed_pose_estimation_tpu.models import build_model
    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model

    model, spec = build_model("hmr")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, RES_M, RES_M, 3)))
    smpl = synthetic_smpl_model(seed=0)
    results = run_evaluation(
        model, spec, variables, "slp-4mod-uncover", dataset, smpl,
        batch_size=batch_size, img_res=RES_M, num_workers=1, log_freq=0,
        eval_masks_enabled=True,
    )

    print(f"mask parity: acc ours={results['mask_accuracy']} ref={ref_acc} "
          f"| f1 ours={results['mask_f1']} ref={ref_f1}")
    # Integer pixel counters through identical math: exact agreement.
    assert results["mask_accuracy"] == pytest.approx(ref_acc, abs=0)
    assert results["mask_f1"] == pytest.approx(ref_f1, abs=1e-12)
    # Guard against a trivially-empty comparison.
    assert 0.05 < ref_acc < 0.999
