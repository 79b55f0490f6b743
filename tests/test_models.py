"""Model zoo construction/forward tests on small inputs (SURVEY.md §4).

Uses 64x64 inputs to keep single-core CPU compile times reasonable; all
architectures are resolution-agnostic (GAP head, fully-conv decoders).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inbed_pose_estimation_tpu.models import build_model, cascade_apply, get_spec
from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model

RES = 64
B = 2


def _modality_batch(keys, rng):
    ch = {"img": 3, "ir_img": 1, "depth_img": 1, "pm_img": 1}
    return tuple(jnp.asarray(rng.normal(0, 1, (B, RES, RES, ch[k])).astype(np.float32)) for k in keys)


def test_cashmrV2_forward_shapes_and_cascade():
    model, spec = build_model("cashmrV2")
    rng = np.random.default_rng(0)
    inputs = _modality_batch(spec.modalities, rng)
    x = jnp.concatenate(inputs, axis=-1)
    variables = model.init(jax.random.PRNGKey(0), x)

    def apply_fn(mods):
        return model.apply(variables, jnp.concatenate(mods, axis=-1))

    outs = cascade_apply(apply_fn, inputs, num_cas_iters=3, feed_map=spec.cascade_feed_map)
    assert len(outs) == 3
    final = outs[-1]
    assert final.rotmat.shape == (B, 24, 3, 3)
    assert final.betas.shape == (B, 10)
    assert final.cam.shape == (B, 3)
    assert final.recon["depth"].shape == (B, RES, RES, 1)
    # Rotations orthonormal.
    RtR = np.einsum("bjmn,bjmk->bjnk", np.asarray(final.rotmat), np.asarray(final.rotmat))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (B, 24, 3, 3)), atol=1e-4)
    # Cascade actually changed the prediction (depth input differs stage 1+).
    assert not np.allclose(np.asarray(outs[0].pose6d), np.asarray(outs[1].pose6d))


def test_hmr_rgb_only_forward():
    model, spec = build_model("hmr")
    rng = np.random.default_rng(1)
    (img,) = _modality_batch(spec.modalities, rng)
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert out.rotmat.shape == (B, 24, 3, 3)
    assert out.recon == {}


def test_rec3hmr_three_decoders():
    model, spec = build_model("rec3hmr")
    rng = np.random.default_rng(2)
    inputs = _modality_batch(spec.modalities, rng)
    x = jnp.concatenate(inputs, axis=-1)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert set(out.recon) == {"depth", "ir", "pm"}
    for v in out.recon.values():
        assert v.shape == (B, RES, RES, 1)


def test_featcat_multitrunk():
    model, spec = build_model("featcat")
    rng = np.random.default_rng(3)
    inputs = _modality_batch(spec.modalities, rng)
    variables = model.init(jax.random.PRNGKey(0), inputs)
    out = model.apply(variables, inputs)
    assert out.rotmat.shape == (B, 24, 3, 3)


def test_featatt_cashmr_cross_attention():
    model, spec = build_model("featatt_cashmr")
    rng = np.random.default_rng(4)
    inputs = _modality_batch(spec.modalities, rng)
    variables = model.init(jax.random.PRNGKey(0), inputs)
    out = model.apply(variables, inputs)
    assert out.rotmat.shape == (B, 24, 3, 3)
    assert out.recon["depth"].shape == (B, RES, RES, 1)


def test_ir_depth_fusion_two_stage():
    model, spec = build_model("ir_depth_fusion")
    smpl = synthetic_smpl_model(seed=0)
    rng = np.random.default_rng(5)
    inputs = _modality_batch(spec.modalities, rng)
    variables = model.init(jax.random.PRNGKey(0), inputs, smpl)
    out = model.apply(variables, inputs, smpl)
    assert out.stage1.rotmat.shape == (B, 24, 3, 3)
    assert out.stage2.rotmat.shape == (B, 24, 3, 3)
    assert set(out.recovered) == {"ir", "depth"}
    assert out.mask.shape == (B, RES, RES, 1)
    m = np.asarray(out.mask)
    assert ((m == 0) | (m >= 0)).all() and m.max() <= 1.0


def test_bodies_at_rest_modes():
    model, spec = build_model("bodiesAtRest")
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 1, (B, RES, RES, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, mode="0")
    out0 = model.apply(variables, x, mode="0")
    assert out0.rotmat.shape == (B, 24, 3, 3)
    # mode 2 uses a separate stack with one extra channel.
    x2 = jnp.asarray(rng.normal(0, 1, (B, RES, RES, 4)).astype(np.float32))
    variables2 = model.init(jax.random.PRNGKey(0), x2, mode="2")
    out2 = model.apply(variables2, x2, mode="2")
    assert out2.rotmat.shape == (B, 24, 3, 3)


def test_mean_params_initialize_ief():
    """With zero features the first IEF input is the mean estimate; the
    output must stay finite and close to a valid rotation."""
    model, spec = build_model("hmr")
    img = jnp.zeros((1, RES, RES, 3))
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert np.isfinite(np.asarray(out.pose6d)).all()
    det = np.linalg.det(np.asarray(out.rotmat).reshape(-1, 3, 3))
    np.testing.assert_allclose(det, 1.0, atol=1e-4)


def test_rgb_depth_fusion_slot_substitution():
    """Single-recovery fusion keeps the stage-2 channel layout identical to
    stage 1 (rgb passes through, recovered depth replaces slot 1)."""
    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model

    model, spec = build_model("rgb_depth_fusion")
    smpl = synthetic_smpl_model(seed=0)
    rng = np.random.default_rng(7)
    inputs = _modality_batch(spec.modalities, rng)
    variables = model.init(jax.random.PRNGKey(0), inputs, smpl)
    out = model.apply(variables, inputs, smpl)
    assert set(out.recovered) == {"depth"}
    assert out.stage2.rotmat.shape == (B, 24, 3, 3)


def test_ir_depth_featatt_cashmrV2_dual_cascade():
    """2-trunk attention model cascading both recovered modalities."""
    model, spec = build_model("ir_depth_featatt_cashmrV2")
    rng = np.random.default_rng(8)
    inputs = _modality_batch(spec.modalities, rng)
    variables = model.init(jax.random.PRNGKey(0), inputs)

    def apply_fn(mods):
        return model.apply(variables, tuple(mods))

    outs = cascade_apply(apply_fn, inputs, num_cas_iters=2, feed_map=spec.cascade_feed_map)
    assert set(outs[-1].recon) == {"depth", "ir"}
    assert not np.allclose(np.asarray(outs[0].pose6d), np.asarray(outs[1].pose6d))


def test_final_recon_skip_preserves_pose_outputs():
    """Skipping the last-stage decoder must not change pose predictions."""
    from inbed_pose_estimation_tpu.evaluation.pipeline import make_forward_fn

    model, spec = build_model("cashmrV2")
    rng = np.random.default_rng(9)
    inputs = _modality_batch(spec.modalities, rng)
    variables = model.init(jax.random.PRNGKey(0), jnp.concatenate(inputs, axis=-1))

    full = make_forward_fn(model, spec, num_cas_iters=2, final_recon=True)(variables, inputs)
    lazy = make_forward_fn(model, spec, num_cas_iters=2, final_recon=False)(variables, inputs)
    np.testing.assert_allclose(np.asarray(lazy.pose6d), np.asarray(full.pose6d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lazy.cam), np.asarray(full.cam), atol=1e-6)
    assert lazy.recon == {}
    assert "depth" in full.recon
