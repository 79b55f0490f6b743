"""SMPLify fitting tests: loss primitives + the scanned optimizer actually
reduces reprojection error on a synthetic problem."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inbed_pose_estimation_tpu.fitting import (
    body_fitting_loss,
    camera_fitting_loss,
    gmof,
    make_fitting_loss,
    make_smplify,
    max_mixture_nll,
    synthetic_gmm_prior,
)
from inbed_pose_estimation_tpu.geometry import perspective_projection
from inbed_pose_estimation_tpu.smpl import smpl_forward, synthetic_smpl_model


def test_gmof_limits():
    x = jnp.array([0.0, 1.0, 1e6])
    y = np.asarray(gmof(x, 100.0))
    assert y[0] == 0.0
    assert y[1] == pytest.approx(1e4 * 1 / (1e4 + 1), rel=1e-5)
    assert y[2] == pytest.approx(1e4, rel=1e-2)  # saturates at sigma^2


def test_max_mixture_nll_prefers_means():
    prior = synthetic_gmm_prior()
    at_mean = np.asarray(max_mixture_nll(prior, prior.means[:1]))
    off_mean = np.asarray(max_mixture_nll(prior, prior.means[:1] + 3.0))
    assert at_mean[0] < off_mean[0]


def test_camera_fitting_loss_zero_at_solution():
    """If projections already match the 2D joints and depth matches the
    estimate, the loss is ~0."""
    rng = np.random.default_rng(0)
    B = 2
    joints = jnp.asarray(rng.normal(0, 0.3, (B, 49, 3)).astype(np.float32))
    cam_t = jnp.asarray(np.tile([0, 0, 5.0], (B, 1)).astype(np.float32))
    cc = jnp.full((B, 2), 112.0)
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    j2d = perspective_projection(joints, eye, cam_t, 5000.0, cc)
    conf = jnp.ones((B, 49))
    loss = float(camera_fitting_loss(joints, cam_t, cam_t, cc, j2d, conf))
    assert loss < 1e-4


@pytest.mark.slow
def test_smplify_improves_reprojection():
    """Fit to keypoints rendered from a known pose: the optimizer must
    substantially reduce the reprojection loss vs. the perturbed init."""
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    rng = np.random.default_rng(3)
    B = 2

    true_pose = jnp.asarray(rng.normal(0, 0.2, (B, 72)).astype(np.float32))
    true_betas = jnp.zeros((B, 10), jnp.float32)
    cam_t = jnp.asarray(np.tile([0.0, 0.0, 5.0], (B, 1)).astype(np.float32))
    cc = jnp.full((B, 2), 112.0)
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    out_true = smpl_forward(smpl, true_betas, pose_aa=true_pose)
    j2d = perspective_projection(out_true.joints, eye, cam_t, 5000.0, cc)
    kp2d = jnp.concatenate([j2d, jnp.ones((B, 49, 1))], axis=-1)

    init_pose = true_pose + jnp.asarray(rng.normal(0, 0.15, (B, 72)).astype(np.float32))
    init_betas = true_betas

    fitting_loss = make_fitting_loss(smpl, prior)
    before = np.asarray(fitting_loss(init_pose, init_betas, cam_t, cc, kp2d)).mean()

    smplify = jax.jit(make_smplify(smpl, prior, step_size=1e-2, num_iters=30))
    res = smplify(init_pose, init_betas, cam_t, cc, kp2d)
    after = np.asarray(res.reprojection_loss).mean()

    assert np.isfinite(after)
    assert after < before * 0.8, (before, after)
    assert res.pose.shape == (B, 72)
    assert res.vertices.shape[1] == smpl.v_template.shape[0]


def test_fitting_loss_does_not_mutate_confidence():
    """Regression guard for the reference's in-place joints_conf mutation
    (smplify/smplify.py:156)."""
    smpl = synthetic_smpl_model(seed=0)
    prior = synthetic_gmm_prior()
    B = 1
    kp2d = jnp.ones((B, 49, 3))
    pose = jnp.zeros((B, 72))
    betas = jnp.zeros((B, 10))
    cam_t = jnp.asarray([[0.0, 0.0, 5.0]])
    cc = jnp.full((B, 2), 112.0)
    fitting_loss = make_fitting_loss(smpl, prior)
    _ = fitting_loss(pose, betas, cam_t, cc, kp2d)
    np.testing.assert_array_equal(np.asarray(kp2d[:, :, 2]), 1.0)
