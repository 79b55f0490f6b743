"""Native JAX SMPL body model (linear blend skinning).

TPU-first replacement for the reference's smplx dependency
(reference: models/smpl.py:1-33, which wraps smplx.SMPL and appends 9 extra
regressed joints, then gathers the 49-joint superset).  Instead of an object
with buffers, the model is a pytree of arrays (`SMPLModel`) plus pure
functions, so it can live inside jit/pjit graphs, be donated, replicated or
sharded like any other parameter tree.

The math follows the SMPL formulation:
  1. shaped template  v = v_template + shapedirs . betas
  2. joints           J = J_regressor . v
  3. pose blendshapes v += posedirs . vec(R_1..R_23 - I)
  4. kinematic chain  world transforms via a scan over the 24-joint tree
  5. skinning         v' = sum_j w_{vj} (G_j v)

Everything is batched einsums + one `lax.scan` over 24 joints, which XLA maps
onto the MXU; there are no data-dependent shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

# Parity-critical math must not silently drop to the TPU default bf16
# matmul precision (MPJPE target is 0.5 mm; bf16 introduces ~1e-3 relative
# error).  All LBS contractions therefore pin f32 MXU passes.
_PREC = lax.Precision.HIGHEST

from ..geometry import batch_rodrigues


class SMPLModel(NamedTuple):
    """SMPL template assets as a pytree of device arrays."""

    v_template: jnp.ndarray      # [V, 3]
    shapedirs: jnp.ndarray       # [V, 3, 10]
    posedirs: jnp.ndarray        # [207, V*3]   (23*9 pose-corrective basis)
    J_regressor: jnp.ndarray     # [24, V]
    lbs_weights: jnp.ndarray     # [V, 24]
    parents: jnp.ndarray         # [24] int32, parents[0] == -1 (stored as 0)
    J_regressor_extra: jnp.ndarray  # [9, V]  extra joints (reference models/smpl.py:17)
    joint_map: jnp.ndarray       # [49] gather indices into the 54-joint set
    faces: jnp.ndarray           # [F, 3] int32 triangle indices (render only)


class SMPLOutput(NamedTuple):
    vertices: jnp.ndarray   # [B, V, 3]
    joints: jnp.ndarray     # [B, 49, 3]
    smpl_joints: jnp.ndarray  # [B, 24, 3] raw kinematic joints


# The first 45 rows of the extended joint set: 24 kinematic SMPL joints
# followed by 21 face/hand/foot "vertex joints" picked from the mesh, matching
# smplx's VERTEX_IDS ordering used by the reference wrapper.  Indices are the
# standard SMPL vertex ids.
_SMPLX_VERTEX_JOINT_IDS = np.array(
    [
        332,    # nose
        6260,   # right eye
        2800,   # left eye
        4071,   # right ear
        583,    # left ear
        3216,   # left big toe
        3226,   # left small toe
        3387,   # left heel
        6617,   # right big toe
        6624,   # right small toe
        6787,   # right heel
        2746,   # left thumb
        2319,   # left index
        2445,   # left middle
        2556,   # left ring
        2673,   # left pinky
        6191,   # right thumb
        5782,   # right index
        5905,   # right middle
        6016,   # right ring
        6133,   # right pinky
    ],
    dtype=np.int32,
)


def vertex_joint_ids() -> np.ndarray:
    return _SMPLX_VERTEX_JOINT_IDS.copy()


def _rigid_transform(rot: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build [..., 4, 4] homogeneous transforms from [..., 3, 3] and [..., 3]."""
    top = jnp.concatenate([rot, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def _kinematic_chain(rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: np.ndarray) -> jnp.ndarray:
    """Compose world transforms along the SMPL kinematic tree.

    Args:
      rot_mats: [B, 24, 3, 3] local joint rotations.
      joints: [B, 24, 3] rest-pose joint locations.
      parents: [24] static numpy parent indices (parents[0] ignored).
    Returns:
      [B, 24, 4, 4] world transforms of each joint.

    The tree is only 24 nodes deep so we unroll the loop in Python — XLA sees
    a static chain of 23 batched 4x4 matmuls, which it fuses aggressively.
    (A lax.scan is possible but gains nothing at this size.)
    """
    parents = np.asarray(parents)
    rel_joints = jnp.concatenate(
        [joints[:, :1], joints[:, 1:] - joints[:, parents[1:]]], axis=1
    )
    local = _rigid_transform(rot_mats, rel_joints)  # [B, 24, 4, 4]
    world = [local[:, 0]]
    for j in range(1, rot_mats.shape[1]):
        world.append(jnp.matmul(world[parents[j]], local[:, j], precision=_PREC))
    return jnp.stack(world, axis=1)


def lbs(
    model: SMPLModel,
    betas: jnp.ndarray,
    rot_mats: jnp.ndarray,
    skin_impl: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Linear blend skinning.

    Args:
      model: SMPL assets.
      betas: [B, 10].
      rot_mats: [B, 24, 3, 3] (global orientation at index 0).
      skin_impl: "auto" | "pallas" | "einsum" — skinning backend.
    Returns:
      (vertices [B, V, 3], joints24 [B, 24, 3]).
    """
    dtype = betas.dtype
    B = betas.shape[0]
    V = model.v_template.shape[0]

    # 1. Shape blendshapes: [B, V, 3].
    v_shaped = model.v_template[None] + jnp.einsum("vck,bk->bvc", model.shapedirs, betas, precision=_PREC)

    # 2. Rest joints: [B, 24, 3].
    J = jnp.einsum("jv,bvc->bjc", model.J_regressor, v_shaped, precision=_PREC)

    # 3. Pose-corrective blendshapes from vec(R_1..23 - I): [B, 207].
    ident = jnp.eye(3, dtype=dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
    v_posed = v_shaped + jnp.einsum("pn,bp->bn", model.posedirs, pose_feature, precision=_PREC).reshape(B, V, 3)

    # 4. Kinematic chain.
    parents = np.asarray(jax.device_get(model.parents))
    world = _kinematic_chain(rot_mats, J, parents)  # [B, 24, 4, 4]
    joints24 = world[:, :, :3, 3]

    # Remove the rest-pose joint locations from the transforms
    # (G_j <- G_j . [I | -J_j]).
    correction = jnp.einsum("bjmn,bjn->bjm", world[:, :, :3, :3], J, precision=_PREC)
    A_rot = world[:, :, :3, :3]
    A_t = world[:, :, :3, 3] - correction

    # 5. Skinning: per-vertex blended rotation + translation.  On TPU this
    # dispatches to the fused Pallas kernel (ops/pallas_lbs.py) which keeps
    # the blended affines in VMEM; elsewhere (CPU tests) the einsum path,
    # which XLA lowers to MXU matmuls of shape [B*V, 24] x [24, 12].
    W = model.lbs_weights  # [V, 24]
    if skin_impl == "auto":
        skin_impl = "pallas" if jax.default_backend() == "tpu" else "einsum"
    if skin_impl == "pallas":
        from ..ops.pallas_lbs import skinning

        verts = skinning(v_posed, W, A_rot, A_t)
    else:
        R_blend = jnp.einsum("vj,bjmn->bvmn", W, A_rot, precision=_PREC)
        t_blend = jnp.einsum("vj,bjm->bvm", W, A_t, precision=_PREC)
        verts = jnp.einsum("bvmn,bvn->bvm", R_blend, v_posed, precision=_PREC) + t_blend
    return verts, joints24


def smpl_forward(
    model: SMPLModel,
    betas: jnp.ndarray,
    rot_mats: jnp.ndarray = None,
    pose_aa: jnp.ndarray = None,
) -> SMPLOutput:
    """Full SMPL forward emitting the 49-joint superset.

    Mirrors the reference wrapper's forward (models/smpl.py:21-33):
    45 base joints (24 kinematic + 21 vertex joints) + 9 extra regressed
    joints appended at indices 45..53, then gathered via JOINT_MAP.

    Exactly one of `rot_mats` [B, 24, 3, 3] or `pose_aa` [B, 72] must be
    given (`pose_aa` plays the role of the reference's pose2rot=True path).
    """
    if rot_mats is None:
        rot_mats = batch_rodrigues(pose_aa.reshape(-1, 24, 3))
    verts, joints24 = lbs(model, betas, rot_mats)

    vertex_joints = verts[:, jnp.asarray(_SMPLX_VERTEX_JOINT_IDS), :]  # [B, 21, 3]
    extra = jnp.einsum("jv,bvc->bjc", model.J_regressor_extra, verts, precision=_PREC)  # [B, 9, 3]
    joints54 = jnp.concatenate([joints24, vertex_joints, extra], axis=1)
    joints49 = joints54[:, model.joint_map, :]
    return SMPLOutput(vertices=verts, joints=joints49, smpl_joints=joints24)
