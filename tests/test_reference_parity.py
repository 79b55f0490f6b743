"""Golden parity against the ACTUAL reference model code (VERDICT next-round
#3): import /root/reference/models/hmr.py directly (its only torchvision use
is a commented-out line, hmr.py:3,2878 — a module stub suffices), push
identical converted weights through the real torch classes and our flax
modules at the reference's native 224 resolution, and compare outputs.

This retires the self-authored twin (tools/torch_ref.py) as the parity
oracle; the twin remains only as the CPU baseline-timing harness.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from inbed_pose_estimation_tpu.models import build_model
from inbed_pose_estimation_tpu.smpl.assets import mean_params
from inbed_pose_estimation_tpu.train.checkpoint import convert_torch_state_dict

REFERENCE_ROOT = "/root/reference"
RES = 224  # the reference decoders hard-code AvgPool2d(7) -> 224 inputs only

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def ref_hmr():
    """Import the genuine reference models/hmr.py (tests/ref_import.py)."""
    from tests.ref_import import import_reference_models_hmr

    return import_reference_models_hmr()


@pytest.fixture(scope="module")
def mean_params_npz(tmp_path_factory):
    mp = mean_params(None)
    path = str(tmp_path_factory.mktemp("mp") / "smpl_mean_params.npz")
    np.savez(path, pose=np.asarray(mp["pose"], np.float32),
             shape=np.asarray(mp["shape"], np.float32),
             cam=np.asarray(mp["cam"], np.float32))
    return path


def _layers():
    return [3, 4, 6, 3]


def _inputs_4mod(seed, batch=2):
    rng = np.random.default_rng(seed)
    return [rng.normal(0, 1, (batch, c, RES, RES)).astype(np.float32)
            for c in (3, 1, 1, 1)]


def _flax_concat_input(mods):
    return jnp.asarray(
        np.transpose(np.concatenate(mods, axis=1), (0, 2, 3, 1))
    )


def _assert_close(got, want, atol, name):
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, err_msg=name)


@pytest.mark.slow
def test_reference_cashmr_parity(ref_hmr, mean_params_npz):
    """Flagship cashmrV2 (reference class CASHMR, models/hmr.py:723-837)."""
    ref = ref_hmr.CASHMR(ref_hmr.Bottleneck, _layers(), mean_params_npz)
    ref.eval()
    model, _ = build_model("cashmrV2")
    variables = convert_torch_state_dict(ref.state_dict())

    mods = _inputs_4mod(0)
    with torch.no_grad():
        t_rot, t_shape, t_cam, t_depth = ref([torch.from_numpy(m) for m in mods])

    out = model.apply(variables, _flax_concat_input(mods))
    _assert_close(out.betas, t_shape.numpy(), 3e-4, "betas")
    _assert_close(out.cam, t_cam.numpy(), 3e-4, "cam")
    _assert_close(out.rotmat, t_rot.numpy(), 1e-3, "rotmat")
    _assert_close(out.recon["depth"][..., 0], t_depth.numpy()[:, 0], 2e-3, "depth")


@pytest.mark.slow
def test_reference_hmr_parity(ref_hmr, mean_params_npz):
    """Base IEF regressor (reference class HMR, models/hmr.py:138-243)."""
    ref = ref_hmr.HMR(ref_hmr.Bottleneck, _layers(), mean_params_npz, input_dim=3)
    ref.eval()
    model, _ = build_model("hmr")
    variables = convert_torch_state_dict(ref.state_dict())

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 3, RES, RES)).astype(np.float32)
    with torch.no_grad():
        t_rot, t_shape, t_cam = ref(torch.from_numpy(x))
    out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    _assert_close(out.betas, t_shape.numpy(), 3e-4, "betas")
    _assert_close(out.cam, t_cam.numpy(), 3e-4, "cam")
    _assert_close(out.rotmat, t_rot.numpy(), 1e-3, "rotmat")


@pytest.mark.slow
def test_reference_rechmr_parity(ref_hmr, mean_params_npz):
    """RECHMR (models/hmr.py:461-606) — its decoder is INLINED as top-level
    decDepth* attributes, exercising that converter mapping."""
    ref = ref_hmr.RECHMR(ref_hmr.Bottleneck, _layers(), mean_params_npz)
    ref.eval()
    model, _ = build_model("rechmr")
    variables = convert_torch_state_dict(ref.state_dict())

    mods = _inputs_4mod(2)
    with torch.no_grad():
        t_rot, t_shape, t_cam, t_depth = ref([torch.from_numpy(m) for m in mods])
    out = model.apply(variables, _flax_concat_input(mods))
    _assert_close(out.betas, t_shape.numpy(), 3e-4, "betas")
    _assert_close(out.rotmat, t_rot.numpy(), 1e-3, "rotmat")
    _assert_close(out.recon["depth"][..., 0], t_depth.numpy()[:, 0], 2e-3, "depth")


@pytest.mark.slow
def test_reference_rec3hmr_parity(ref_hmr, mean_params_npz):
    """REC3HMR (models/hmr.py:607-720) — three Reconstruct heads."""
    ref = ref_hmr.REC3HMR(ref_hmr.Bottleneck, _layers(), mean_params_npz)
    ref.eval()
    model, _ = build_model("rec3hmr")
    variables = convert_torch_state_dict(ref.state_dict())

    mods = _inputs_4mod(3)
    with torch.no_grad():
        t_rot, t_shape, t_cam, t_depth, t_ir, t_pm = ref(
            [torch.from_numpy(m) for m in mods]
        )
    out = model.apply(variables, _flax_concat_input(mods))
    _assert_close(out.rotmat, t_rot.numpy(), 1e-3, "rotmat")
    for name, want in (("depth", t_depth), ("ir", t_ir), ("pm", t_pm)):
        _assert_close(out.recon[name][..., 0], want.numpy()[:, 0], 2e-3, name)


@pytest.mark.slow
def test_reference_mulhmr_featcat_parity(ref_hmr, mean_params_npz):
    """featcat (reference class MULHMRFeatCat, models/hmr.py:884-962).

    The reference class cannot execute its own forward: it builds BOTH
    trunks with the default input_dim=3 (:904-905) yet feeds the 1-channel
    ir_img, and then `torch.cat`s the trunks' pyramid TUPLES (:931-937) —
    two latent defects.  So this test pins the converter + our module
    against the evident intent composed from the REAL submodules: x4
    feature concat -> avgpool -> the real fc1/fc2/dec* IEF loop.  Every
    state-dict key converts (on_unmapped='raise'); both sides get 3-channel
    inputs so the real trunks are exercised as built.
    """
    ref = ref_hmr.MULHMRFeatCat(ref_hmr.Bottleneck, _layers(), mean_params_npz)
    ref.eval()

    rng = np.random.default_rng(4)
    a = rng.normal(0, 1, (2, 3, RES, RES)).astype(np.float32)
    b = rng.normal(0, 1, (2, 3, RES, RES)).astype(np.float32)

    with torch.no_grad():
        x4_a = ref.feat_extraction_rgb(torch.from_numpy(a))[4]
        x4_b = ref.feat_extraction_ir(torch.from_numpy(b))[4]
        xf = ref.avgpool(torch.cat([x4_a, x4_b], 1)).view(2, -1)
        pose = ref.init_pose.expand(2, -1)
        shape = ref.init_shape.expand(2, -1)
        cam = ref.init_cam.expand(2, -1)
        for _ in range(3):
            xc = ref.fc2(ref.fc1(torch.cat([xf, pose, shape, cam], 1)))
            pose = ref.decpose(xc) + pose
            shape = ref.decshape(xc) + shape
            cam = ref.deccam(xc) + cam
        t_rot = ref_hmr.rot6d_to_rotmat(pose).view(2, 24, 3, 3)

    from inbed_pose_estimation_tpu.models.hmr import MultiTrunkCore
    from inbed_pose_estimation_tpu.smpl.assets import mean_params as _mp

    mp = _mp(None)
    model = MultiTrunkCore(
        mean_pose=tuple(float(v) for v in mp["pose"]),
        mean_shape=tuple(float(v) for v in mp["shape"]),
        mean_cam=tuple(float(v) for v in mp["cam"]),
        num_trunks=2,
    )
    variables = convert_torch_state_dict(ref.state_dict(), on_unmapped="raise")
    fx = (jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
          jnp.asarray(np.transpose(b, (0, 2, 3, 1))))
    out = model.apply(variables, fx)
    _assert_close(out.betas, shape.numpy(), 3e-4, "betas")
    _assert_close(out.cam, cam.numpy(), 3e-4, "cam")
    _assert_close(out.rotmat, t_rot.numpy(), 1e-3, "rotmat")


@pytest.mark.slow
def test_reference_ir_depth_fusion_parity(ref_hmr, mean_params_npz):
    """ir_depth_fusion (reference class IR_DEPTH_Fusion, models/hmr.py:
    1628-1786): FULL two-stage forward parity — stage-1 HMR, SMPL-vertex
    body-mask scatter + 5x5 dilation + bilinear upsample (our vectorized
    rasterizer vs the reference's per-sample python loop), mask-gated
    ir/depth recovery decoders, and the stage-2 re-regression.  The SMPL
    module argument is stubbed with OUR synthetic SMPL pytree on both sides
    so the vertex inputs are identical."""
    import types as _types

    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model
    from inbed_pose_estimation_tpu.smpl.model import lbs

    smpl_model = synthetic_smpl_model(seed=0)

    class SMPLStub(torch.nn.Module):
        def forward(self, betas=None, body_pose=None, global_orient=None,
                    pose2rot=False):
            rotmat = torch.cat([global_orient, body_pose], dim=1)
            verts, _ = lbs(smpl_model, jnp.asarray(betas.detach().numpy()),
                           jnp.asarray(rotmat.detach().numpy()))
            return _types.SimpleNamespace(
                vertices=torch.from_numpy(np.asarray(verts)))

    ref = ref_hmr.IR_DEPTH_Fusion(ref_hmr.Bottleneck, _layers(),
                                  mean_params_npz, input_dim=2)
    ref.eval()
    rng = np.random.default_rng(5)
    ir = rng.normal(0, 1, (2, 1, RES, RES)).astype(np.float32)
    depth = rng.normal(0, 1, (2, 1, RES, RES)).astype(np.float32)
    with torch.no_grad():
        (t_rot, t_shape, t_cam, t_rot1, t_shape1, t_cam1,
         t_ir, t_depth, t_mask) = ref(
            [torch.from_numpy(ir), torch.from_numpy(depth)], SMPLStub())

    model, _ = build_model("ir_depth_fusion")
    variables = convert_torch_state_dict(ref.state_dict(), on_unmapped="raise")
    fx = (jnp.asarray(np.transpose(ir, (0, 2, 3, 1))),
          jnp.asarray(np.transpose(depth, (0, 2, 3, 1))))
    out = model.apply(variables, fx, smpl_model)

    _assert_close(out.stage1.betas, t_shape.numpy(), 3e-4, "stage1 betas")
    _assert_close(out.stage1.cam, t_cam.numpy(), 3e-4, "stage1 cam")
    _assert_close(out.stage1.rotmat, t_rot.numpy(), 1e-3, "stage1 rotmat")
    # The splatted body mask matches the reference scatter loop exactly.
    np.testing.assert_array_equal(
        np.asarray(out.mask)[..., 0], t_mask.numpy()[:, 0])
    _assert_close(out.recovered["ir"][..., 0], t_ir.numpy()[:, 0], 2e-3, "ir_out")
    _assert_close(out.recovered["depth"][..., 0], t_depth.numpy()[:, 0], 2e-3, "depth_out")
    _assert_close(out.stage2.rotmat, t_rot1.numpy(), 1e-3, "stage2 rotmat")
    _assert_close(out.stage2.betas, t_shape1.numpy(), 3e-4, "stage2 betas")
