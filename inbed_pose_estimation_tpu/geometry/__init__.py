from .rotations import (
    aa_rotate_z,
    batch_rodrigues,
    flip_pose,
    quat_to_rotmat,
    rot6d_to_rotmat,
    rotmat_to_aa,
    rotmat_to_quat,
    rotmat_to_rot6d,
)
from .camera import (
    estimate_translation,
    perspective_projection,
    weak_perspective_to_cam_t,
)
from .procrustes import compute_similarity_transform, reconstruction_error

__all__ = [
    "aa_rotate_z",
    "batch_rodrigues",
    "flip_pose",
    "quat_to_rotmat",
    "rot6d_to_rotmat",
    "rotmat_to_aa",
    "rotmat_to_quat",
    "rotmat_to_rot6d",
    "estimate_translation",
    "perspective_projection",
    "weak_perspective_to_cam_t",
    "compute_similarity_transform",
    "reconstruction_error",
]
