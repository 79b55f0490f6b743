"""Geometry primitive tests: round-trips, closed-form cases, and independent
numpy cross-checks (SURVEY.md §4(a))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inbed_pose_estimation_tpu.geometry import (
    aa_rotate_z,
    batch_rodrigues,
    estimate_translation,
    flip_pose,
    perspective_projection,
    quat_to_rotmat,
    reconstruction_error,
    rot6d_to_rotmat,
    rotmat_to_aa,
    rotmat_to_rot6d,
    weak_perspective_to_cam_t,
)
from inbed_pose_estimation_tpu import constants


def _np_rodrigues(aa):
    """Independent axis-angle -> rotmat via the classic Rodrigues formula."""
    theta = np.linalg.norm(aa)
    if theta < 1e-10:
        return np.eye(3)
    k = aa / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def test_batch_rodrigues_matches_closed_form():
    rng = np.random.default_rng(0)
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
    for i in range(32):
        np.testing.assert_allclose(R[i], _np_rodrigues(aa[i]), atol=2e-5)


def test_batch_rodrigues_zero_rotation_is_identity():
    R = np.asarray(batch_rodrigues(jnp.zeros((4, 3))))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)


def test_rotation_matrices_are_orthonormal():
    rng = np.random.default_rng(1)
    aa = rng.normal(size=(16, 3)).astype(np.float32) * 2
    R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)


def test_rot6d_identity_convention():
    x = jnp.tile(jnp.array([1.0, 0, 0, 1, 0, 0]), (5, 1))
    R = np.asarray(rot6d_to_rotmat(x))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-6)


def test_rot6d_recovers_rotations():
    """Columns-convention: feeding the first two columns reproduces R."""
    rng = np.random.default_rng(2)
    aa = rng.normal(size=(8, 3)).astype(np.float32)
    R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
    six = np.stack([R[:, :, 0], R[:, :, 1]], axis=-1).reshape(8, 6)
    R2 = np.asarray(rot6d_to_rotmat(jnp.asarray(six)))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_rot6d_flat_144_reshape():
    x = jnp.tile(jnp.array([1.0, 0, 0, 1, 0, 0]), (2, 24))
    assert x.shape == (2, 144)
    R = rot6d_to_rotmat(x).reshape(2, 24, 3, 3)
    np.testing.assert_allclose(np.asarray(R[1, 7]), np.eye(3), atol=1e-6)


def test_rotmat_to_rot6d_drops_last_row():
    rng = np.random.default_rng(3)
    aa = rng.normal(size=(4, 3)).astype(np.float32)
    R = batch_rodrigues(jnp.asarray(aa))
    six = np.asarray(rotmat_to_rot6d(R))
    np.testing.assert_allclose(six, np.asarray(R)[:, :2, :].reshape(4, 6), atol=0)


def test_rotmat_to_aa_roundtrip():
    rng = np.random.default_rng(4)
    aa = rng.normal(size=(64, 3)).astype(np.float32)
    # Keep |theta| < pi for a unique representative.
    aa = aa / np.linalg.norm(aa, axis=1, keepdims=True) * rng.uniform(0.01, 3.0, (64, 1))
    R = batch_rodrigues(jnp.asarray(aa.astype(np.float32)))
    aa2 = np.asarray(rotmat_to_aa(R))
    np.testing.assert_allclose(aa2, aa, atol=3e-4)


def test_rotmat_to_aa_identity_is_zero():
    aa = np.asarray(rotmat_to_aa(jnp.broadcast_to(jnp.eye(3), (3, 3, 3))))
    assert np.all(np.isfinite(aa))
    np.testing.assert_allclose(aa, 0.0, atol=1e-6)


def test_perspective_projection_pinhole():
    # A point at (0.1, -0.2, 5) with f=5000, center (112,112).
    pts = jnp.array([[[0.1, -0.2, 0.0]]])
    rot = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    t = jnp.array([[0.0, 0.0, 5.0]])
    cc = jnp.array([[112.0, 112.0]])
    uv = np.asarray(perspective_projection(pts, rot, t, 5000.0, cc))
    np.testing.assert_allclose(uv[0, 0], [112 + 5000 * 0.1 / 5, 112 - 5000 * 0.2 / 5], rtol=1e-5)


def test_perspective_projection_out_3d_depth():
    pts = jnp.array([[[0.0, 0.0, 0.0], [0.1, 0.1, 0.5]]])
    rot = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    t = jnp.array([[0.0, 0.0, 4.0]])
    cc = jnp.zeros((1, 2))
    out = np.asarray(perspective_projection(pts, rot, t, 5000.0, cc, out_3d=True))
    np.testing.assert_allclose(out[0, :, 2], [4.0, 4.5], rtol=1e-6)


def test_weak_perspective_to_cam_t():
    cam = jnp.array([[1.0, 0.5, -0.5]])
    t = np.asarray(weak_perspective_to_cam_t(cam, 5000.0, 224))
    np.testing.assert_allclose(t[0], [0.5, -0.5, 2 * 5000 / 224], rtol=1e-5)


def _np_estimate_translation_single(S, joints_2d, conf, f=5000.0, img=224.0):
    """Independent per-sample reimplementation of the weighted LSQ."""
    num = S.shape[0]
    c = img / 2.0
    rows, rhs = [], []
    for j in range(num):
        X, Y, Z = S[j]
        u, v = joints_2d[j]
        w = np.sqrt(max(conf[j], 0.0))
        rows.append(w * np.array([f, 0, c - u]))
        rhs.append(w * ((u - c) * Z - f * X))
        rows.append(w * np.array([0, f, c - v]))
        rhs.append(w * ((v - c) * Z - f * Y))
    Q = np.stack(rows)
    r = np.array(rhs)
    return np.linalg.solve(Q.T @ Q, Q.T @ r)


def test_estimate_translation_recovers_ground_truth():
    """Project synthetic joints with a known translation; solver recovers it."""
    rng = np.random.default_rng(5)
    B = 4
    S = np.zeros((B, 49, 3), np.float32)
    S[:, 25:, :] = rng.normal(0, 0.3, (B, 24, 3))
    t_true = np.array([[0.1, -0.2, 4.0], [0.0, 0.3, 6.0], [-0.2, 0.1, 5.0], [0.05, 0.0, 3.0]], np.float32)
    f, img = 5000.0, 224.0
    c = img / 2.0
    uv = np.zeros((B, 49, 3), np.float32)
    for b in range(B):
        p = S[b, 25:] + t_true[b]
        uv[b, 25:, 0] = f * p[:, 0] / p[:, 2] + c
        uv[b, 25:, 1] = f * p[:, 1] / p[:, 2] + c
        uv[b, 25:, 2] = 1.0
    # Perspective projection is not exactly the linear model, but with these
    # depths the LSQ recovers t to high accuracy.
    t = np.asarray(estimate_translation(jnp.asarray(S), jnp.asarray(uv), f, img))
    np.testing.assert_allclose(t, t_true, atol=2e-2)


def test_estimate_translation_matches_numpy_reference():
    rng = np.random.default_rng(6)
    B = 3
    S = np.zeros((B, 49, 3), np.float32)
    S[:, 25:, :] = rng.normal(0, 0.5, (B, 24, 3)).astype(np.float32)
    uv = np.zeros((B, 49, 3), np.float32)
    uv[:, 25:, :2] = rng.uniform(0, 224, (B, 24, 2)).astype(np.float32)
    uv[:, 25:, 2] = rng.uniform(0.2, 1.0, (B, 24)).astype(np.float32)
    t = np.asarray(estimate_translation(jnp.asarray(S), jnp.asarray(uv)))
    for b in range(B):
        expected = _np_estimate_translation_single(
            S[b, 25:].astype(np.float64), uv[b, 25:, :2].astype(np.float64), uv[b, 25:, 2].astype(np.float64)
        )
        np.testing.assert_allclose(t[b], expected, rtol=2e-3, atol=2e-3)


def test_reconstruction_error_zero_for_similar_sets():
    """PA error of a scaled+rotated+translated copy is ~0."""
    rng = np.random.default_rng(7)
    S2 = rng.normal(size=(5, 17, 3)).astype(np.float32)
    R = _np_rodrigues(np.array([0.3, -0.2, 0.5]))
    S1 = 1.7 * S2 @ R.T + np.array([0.3, 0.1, -0.2])
    err = float(reconstruction_error(jnp.asarray(S1.astype(np.float32)), jnp.asarray(S2)))
    assert err < 1e-4


def test_reconstruction_error_positive_for_noise():
    rng = np.random.default_rng(8)
    S2 = rng.normal(size=(2, 17, 3)).astype(np.float32)
    S1 = S2 + rng.normal(0, 0.1, S2.shape).astype(np.float32)
    err = np.asarray(reconstruction_error(jnp.asarray(S1), jnp.asarray(S2), reduction=None))
    assert err.shape == (2,)
    assert np.all(err > 0.01)


def test_aa_rotate_z_matches_host_formula():
    """aa' = log(Rz(-rot) exp(aa)) — cross-check against numpy."""
    rng = np.random.default_rng(9)
    aa = rng.normal(size=(6, 3)).astype(np.float32) * 0.8
    rot = rng.uniform(-30, 30, size=(6,)).astype(np.float32)
    out = np.asarray(aa_rotate_z(jnp.asarray(aa), jnp.asarray(rot)))
    for i in range(6):
        rad = np.deg2rad(-rot[i])
        Rz = np.array([
            [np.cos(rad), -np.sin(rad), 0],
            [np.sin(rad), np.cos(rad), 0],
            [0, 0, 1],
        ])
        Rexp = Rz @ _np_rodrigues(aa[i])
        # Recover axis-angle from Rexp via scipy-free quaternion math.
        w = np.sqrt(max(1 + np.trace(Rexp), 1e-12)) / 2
        xyz = np.array([
            Rexp[2, 1] - Rexp[1, 2], Rexp[0, 2] - Rexp[2, 0], Rexp[1, 0] - Rexp[0, 1]
        ]) / (4 * w)
        angle = 2 * np.arctan2(np.linalg.norm(xyz), w)
        axis = xyz / max(np.linalg.norm(xyz), 1e-12)
        np.testing.assert_allclose(out[i], axis * angle, atol=2e-3)


def test_flip_pose_involution_on_perm():
    """Flipping twice returns the original pose."""
    rng = np.random.default_rng(10)
    pose = rng.normal(size=(72,)).astype(np.float32)
    perm = jnp.asarray(np.array(constants.SMPL_POSE_FLIP_PERM))
    once = flip_pose(jnp.asarray(pose), perm)
    twice = np.asarray(flip_pose(once, perm))
    np.testing.assert_allclose(twice, pose, atol=1e-6)
