"""SMPL LBS tests: independent numpy LBS cross-check, kinematic-chain sanity,
joint superset layout (SURVEY.md §4(a,b))."""

import numpy as np
import jax.numpy as jnp

from inbed_pose_estimation_tpu import constants
from inbed_pose_estimation_tpu.geometry import batch_rodrigues
from inbed_pose_estimation_tpu.smpl import (
    SMPL_PARENTS,
    smpl_forward,
    synthetic_smpl_model,
)
from inbed_pose_estimation_tpu.smpl.model import lbs, vertex_joint_ids


def _np_lbs(model, betas, rot_mats):
    """Independent numpy implementation of SMPL LBS (single sample)."""
    v_shaped = np.asarray(model.v_template) + np.einsum(
        "vck,k->vc", np.asarray(model.shapedirs), betas
    )
    J = np.asarray(model.J_regressor) @ v_shaped  # [24, 3]
    pose_feature = (rot_mats[1:] - np.eye(3)).reshape(-1)  # [207]
    v_posed = v_shaped + (pose_feature @ np.asarray(model.posedirs)).reshape(-1, 3)

    parents = np.asarray(SMPL_PARENTS)
    G = np.zeros((24, 4, 4))
    G[0] = np.eye(4)
    G[0][:3, :3] = rot_mats[0]
    G[0][:3, 3] = J[0]
    for j in range(1, 24):
        local = np.eye(4)
        local[:3, :3] = rot_mats[j]
        local[:3, 3] = J[j] - J[parents[j]]
        G[j] = G[parents[j]] @ local
    joints = G[:, :3, 3].copy()
    # Subtract rest joint contribution.
    A = G.copy()
    for j in range(24):
        A[j][:3, 3] = G[j][:3, 3] - G[j][:3, :3] @ J[j]
    W = np.asarray(model.lbs_weights)  # [V, 24]
    T = np.einsum("vj,jmn->vmn", W, A)  # [V, 4, 4]
    vh = np.concatenate([v_posed, np.ones((v_posed.shape[0], 1))], axis=1)
    verts = np.einsum("vmn,vn->vm", T, vh)[:, :3]
    return verts, joints


def test_lbs_matches_numpy_reference():
    model = synthetic_smpl_model(seed=0)
    rng = np.random.default_rng(1)
    betas = rng.normal(0, 1, (2, 10)).astype(np.float32)
    aa = rng.normal(0, 0.3, (2, 24, 3)).astype(np.float32)
    R = np.asarray(batch_rodrigues(jnp.asarray(aa.reshape(-1, 3)))).reshape(2, 24, 3, 3)

    verts, joints = lbs(model, jnp.asarray(betas), jnp.asarray(R))
    verts, joints = np.asarray(verts), np.asarray(joints)
    for b in range(2):
        v_ref, j_ref = _np_lbs(model, betas[b], R[b])
        np.testing.assert_allclose(verts[b], v_ref, atol=1e-4)
        np.testing.assert_allclose(joints[b], j_ref, atol=1e-5)


def test_identity_pose_zero_betas_is_template_joints():
    model = synthetic_smpl_model(seed=0)
    R = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
    verts, joints = lbs(model, jnp.zeros((1, 10)), R)
    rest_joints = np.asarray(model.J_regressor) @ np.asarray(model.v_template)
    np.testing.assert_allclose(np.asarray(joints[0]), rest_joints, atol=1e-5)
    np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(model.v_template), atol=1e-5)


def test_global_rotation_rotates_everything():
    model = synthetic_smpl_model(seed=0)
    aa = np.zeros((1, 24, 3), np.float32)
    aa[0, 0] = [0, 0, np.pi / 2]
    R = batch_rodrigues(jnp.asarray(aa.reshape(-1, 3))).reshape(1, 24, 3, 3)
    verts_rot, _ = lbs(model, jnp.zeros((1, 10)), R)
    verts_id, _ = lbs(model, jnp.zeros((1, 10)), jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3)))
    # Rotation about root joint: v' = Rz (v - j0) + j0.
    j0 = (np.asarray(model.J_regressor) @ np.asarray(model.v_template))[0]
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    expected = (np.asarray(verts_id[0]) - j0) @ Rz.T + j0
    np.testing.assert_allclose(np.asarray(verts_rot[0]), expected, atol=1e-4)


def test_smpl_forward_joint_superset_shape_and_layout():
    model = synthetic_smpl_model(seed=0)
    out = smpl_forward(model, jnp.zeros((3, 10)), pose_aa=jnp.zeros((3, 72)))
    assert out.vertices.shape == (3, constants.NUM_VERTICES, 3)
    assert out.joints.shape == (3, 49, 3)
    assert out.smpl_joints.shape == (3, 24, 3)
    # 'OP MidHip' maps to extended index 0 == kinematic joint 0.
    np.testing.assert_allclose(
        np.asarray(out.joints[:, constants.JOINT_IDS["OP MidHip"]]),
        np.asarray(out.smpl_joints[:, 0]),
        atol=1e-6,
    )
    # 'OP Nose' maps to extended index 24 == first vertex joint.
    vj = vertex_joint_ids()
    np.testing.assert_allclose(
        np.asarray(out.joints[:, constants.JOINT_IDS["OP Nose"]]),
        np.asarray(out.vertices[:, vj[0]]),
        atol=1e-6,
    )


def test_smpl_forward_accepts_rotmats_and_aa_consistently():
    model = synthetic_smpl_model(seed=0)
    rng = np.random.default_rng(2)
    aa = rng.normal(0, 0.2, (2, 72)).astype(np.float32)
    R = batch_rodrigues(jnp.asarray(aa.reshape(-1, 3))).reshape(2, 24, 3, 3)
    out_aa = smpl_forward(model, jnp.zeros((2, 10)), pose_aa=jnp.asarray(aa))
    out_R = smpl_forward(model, jnp.zeros((2, 10)), rot_mats=R)
    np.testing.assert_allclose(np.asarray(out_aa.vertices), np.asarray(out_R.vertices), atol=1e-5)
