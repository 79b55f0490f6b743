"""Golden numerical parity: torch twin (reference-named cashmrV2 graph) vs
our flax model with converted weights (SURVEY.md §4(b)).

This exercises the .pt->flax converter end-to-end: identical weights must
produce matching rotmat/betas/cam/depth outputs in eval mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from inbed_pose_estimation_tpu.models import build_model
from inbed_pose_estimation_tpu.smpl.assets import mean_params
from inbed_pose_estimation_tpu.tools.torch_ref import CASHMRTorch
from inbed_pose_estimation_tpu.train.checkpoint import convert_torch_state_dict

RES = 64


@pytest.fixture(scope="module")
def twin_and_flax():
    mp = mean_params(None)
    tw = CASHMRTorch(mp["pose"], mp["shape"], mp["cam"], input_dim=6)
    tw.eval()
    model, spec = build_model("cashmrV2")
    variables = convert_torch_state_dict(tw.state_dict())
    return tw, model, variables


def test_converted_tree_matches_init_structure(twin_and_flax):
    tw, model, variables = twin_and_flax
    x = jnp.zeros((1, RES, RES, 6))
    ref_vars = model.init(jax.random.PRNGKey(0), x)
    ref_flat = jax.tree_util.tree_flatten_with_path(ref_vars)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in ref_flat}
    got_paths = {jax.tree_util.keystr(p): v.shape for p, v in got_flat}
    missing = set(ref_paths) - set(got_paths)
    extra = set(got_paths) - set(ref_paths)
    assert not missing, f"converter missing {sorted(missing)[:8]}"
    assert not extra, f"converter extra {sorted(extra)[:8]}"
    mismatched = {k for k in ref_paths if ref_paths[k] != got_paths[k]}
    assert not mismatched, {k: (ref_paths[k], got_paths[k]) for k in sorted(mismatched)[:8]}


def test_forward_outputs_match(twin_and_flax):
    tw, model, variables = twin_and_flax
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 6, RES, RES)).astype(np.float32)

    with torch.no_grad():
        t_rot, t_shape, t_cam, t_depth = tw(torch.from_numpy(x))

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = model.apply(variables, x_nhwc)

    np.testing.assert_allclose(np.asarray(out.betas), t_shape.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.cam), t_cam.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.rotmat), t_rot.numpy(), atol=5e-4)
    depth_flax = np.asarray(out.recon["depth"])[..., 0]
    np.testing.assert_allclose(depth_flax, t_depth.numpy()[:, 0], atol=5e-4)


def test_hmr_no_decoder_parity():
    """Converter + forward parity for the plain HMR family (no decoder):
    covers hmr/hmr4mod/irhmr/depthhmr/pmhmr structurally."""
    mp = mean_params(None)
    tw = CASHMRTorch(mp["pose"], mp["shape"], mp["cam"], input_dim=3, with_decoder=False)
    tw.eval()
    model, spec = build_model("hmr")
    variables = convert_torch_state_dict(tw.state_dict())

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 3, RES, RES)).astype(np.float32)
    with torch.no_grad():
        t_rot, t_shape, t_cam, _ = tw(torch.from_numpy(x))
    out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out.betas), t_shape.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.cam), t_cam.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.rotmat), t_rot.numpy(), atol=5e-4)
