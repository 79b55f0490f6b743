"""Golden parity against the ACTUAL reference model code (VERDICT next-round
#3): import /root/reference/models/hmr.py directly (its only torchvision use
is a commented-out line, hmr.py:3,2878 — a module stub suffices), push
identical converted weights through the real torch classes and our flax
modules at the reference's native 224 resolution, and compare outputs.

This retires the self-authored twin (tools/torch_ref.py) as the parity
oracle; the twin remains only as the CPU baseline-timing harness.
"""

import importlib.util
import os
import sys
import types

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
    """Import the genuine reference models/hmr.py with a torchvision stub.

    A bare `utils` package module (with __path__ into the reference tree)
    lets `from utils.geometry import ...` resolve WITHOUT executing the
    reference utils/__init__.py, which drags in its full trainer stack.
    """
    stubbed = []
    for name in ("torchvision", "torchvision.models", "torchvision.models.resnet"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            stubbed.append(name)
    utils_pkg = types.ModuleType("utils")
    utils_pkg.__path__ = [os.path.join(REFERENCE_ROOT, "utils")]
    had_utils = sys.modules.get("utils")
    sys.modules["utils"] = utils_pkg
    stubbed_utils = [k for k in list(sys.modules) if k.startswith("utils.")]
    saved_submodules = {k: sys.modules.pop(k) for k in stubbed_utils}
    try:
        spec = importlib.util.spec_from_file_location(
            "reference_models_hmr", os.path.join(REFERENCE_ROOT, "models", "hmr.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for name in stubbed:
            del sys.modules[name]
        for k in [k for k in list(sys.modules) if k == "utils" or k.startswith("utils.")]:
            del sys.modules[k]
        if had_utils is not None:
            sys.modules["utils"] = had_utils
        sys.modules.update(saved_submodules)
    return mod


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
