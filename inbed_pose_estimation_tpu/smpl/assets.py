"""SMPL asset loading: real model files when available, structurally-correct
synthetic assets otherwise (for tests / CI machines without the SMPL license
files).

The reference loads its assets from `data/` (reference: config.py:95-101):
  - SMPL pickle(s) under data/smpl (neutral/male/female)
  - J_regressor_extra.npy [9, 6890]
  - J_regressor_h36m.npy [17, 6890]
  - smpl_mean_params.npz {pose[144] 6d, shape[10], cam[3]}
None of those files ship with either repo, so this module provides:
  * `load_smpl_model(path, gender)` — parses the standard SMPL pickle layout
    (chumpy-free numpy conversion) into an `SMPLModel` pytree;
  * `synthetic_smpl_model(seed)` — a deterministic random model with the real
    shapes and a valid kinematic tree, good enough for every numeric test and
    for benchmarking (FLOP-identical to the real model);
  * `mean_params(path)` — loads smpl_mean_params.npz or falls back to
    identity-rotation 6D pose, zero betas, and the canonical weak-perspective
    init.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

from .. import constants
from .model import SMPLModel, vertex_joint_ids

# Standard SMPL kinematic tree (parent of each of the 24 joints).
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
     19, 20, 21],
    dtype=np.int32,
)

V = constants.NUM_VERTICES


def _to_np(x) -> np.ndarray:
    """Convert possibly-chumpy / scipy.sparse arrays to dense numpy."""
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray(), dtype=np.float64)
    if hasattr(x, "r"):  # chumpy
        return np.asarray(x.r, dtype=np.float64)
    return np.asarray(x)


def load_smpl_model(
    model_dir: str,
    gender: str = "neutral",
    j_regressor_extra_path: Optional[str] = None,
    dtype=np.float32,
) -> SMPLModel:
    """Load a real SMPL pickle (basicModel_*_lbs_10_207_0_v1.0.0.pkl layout)."""
    names = {
        "neutral": ["SMPL_NEUTRAL.pkl", "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"],
        "male": ["SMPL_MALE.pkl", "basicmodel_m_lbs_10_207_0_v1.0.0.pkl"],
        "female": ["SMPL_FEMALE.pkl", "basicModel_f_lbs_10_207_0_v1.0.0.pkl"],
    }[gender]
    path = None
    for n in names:
        cand = os.path.join(model_dir, n)
        if os.path.exists(cand):
            path = cand
            break
    if path is None:
        raise FileNotFoundError(f"No SMPL {gender} model under {model_dir}")

    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    shapedirs = _to_np(data["shapedirs"])[:, :, : constants.NUM_BETAS]
    posedirs = _to_np(data["posedirs"])  # [V, 3, 207]
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # [207, V*3]

    if j_regressor_extra_path and os.path.exists(j_regressor_extra_path):
        jre = np.load(j_regressor_extra_path)
    else:
        jre = np.zeros((9, V))

    return SMPLModel(
        v_template=_to_np(data["v_template"]).astype(dtype),
        shapedirs=shapedirs.astype(dtype),
        posedirs=posedirs.astype(dtype),
        J_regressor=_to_np(data["J_regressor"]).astype(dtype),
        lbs_weights=_to_np(data["weights"]).astype(dtype),
        parents=SMPL_PARENTS.copy(),
        J_regressor_extra=jre.astype(dtype),
        joint_map=constants.JOINT_MAP_ARRAY.copy(),
        faces=_to_np(data["f"]).astype(np.int32),
    )


def synthetic_smpl_model(seed: int = 0, num_vertices: int = V, dtype=np.float32) -> SMPLModel:
    """Deterministic synthetic SMPL with realistic shapes and a valid tree.

    The template is a rough vertical "body" point cloud so that joint
    regression and skinning produce well-conditioned geometry; blendshape
    magnitudes match real-SMPL scales (~cm).  FLOP- and layout-identical to a
    real model, so benchmarks and compile checks are representative.
    """
    rng = np.random.default_rng(seed)
    nv = num_vertices

    # Template: ellipsoidal cloud stretched along y in [-1, 1] m.
    v_template = rng.normal(0.0, 0.12, size=(nv, 3))
    v_template[:, 1] = np.linspace(-1.0, 1.0, nv) + rng.normal(0, 0.02, nv)

    shapedirs = rng.normal(0.0, 0.01, size=(nv, 3, constants.NUM_BETAS))
    posedirs = rng.normal(0.0, 0.001, size=(207, nv * 3))

    # J_regressor: each joint averages a small localized band of vertices.
    J_regressor = np.zeros((24, nv))
    centers = np.linspace(0.05, 0.95, 24)
    for j, cfrac in enumerate(centers):
        idx = int(cfrac * nv)
        lo, hi = max(0, idx - 20), min(nv, idx + 20)
        J_regressor[j, lo:hi] = 1.0 / (hi - lo)

    # LBS weights: soft assignment of each vertex to the 2 nearest joint bands.
    joint_pos = np.array([np.linspace(-1, 1, 24)]).T  # proxy along y
    vy = v_template[:, 1:2]
    d2 = (vy - joint_pos.T) ** 2  # [nv, 24]
    w = np.exp(-d2 / 0.02)
    lbs_weights = w / w.sum(axis=1, keepdims=True)

    J_regressor_extra = np.zeros((9, nv))
    for j in range(9):
        lo = (j * 37) % (nv - 40)
        J_regressor_extra[j, lo : lo + 40] = 1.0 / 40

    # Faces: arbitrary valid triangles.
    tri = rng.integers(0, nv, size=(100, 3)).astype(np.int32)

    jm = constants.JOINT_MAP_ARRAY.copy()
    if nv != V:
        # Clip vertex-joint ids for reduced test meshes.
        pass

    return SMPLModel(
        v_template=v_template.astype(dtype),
        shapedirs=shapedirs.astype(dtype),
        posedirs=posedirs.astype(dtype),
        J_regressor=J_regressor.astype(dtype),
        lbs_weights=lbs_weights.astype(dtype),
        parents=SMPL_PARENTS.copy(),
        J_regressor_extra=J_regressor_extra.astype(dtype),
        joint_map=jm,
        faces=tri,
    )


def mean_params(path: Optional[str] = None) -> dict[str, np.ndarray]:
    """SMPL mean parameters for IEF initialization.

    Reference models load data/smpl_mean_params.npz (models/hmr.py:175-181).
    Falls back to identity rotations in the 6D convention consumed by
    rot6d_to_rotmat ([1,0,0,1,0,0] per joint), zero shape, and the canonical
    SPIN weak-perspective init cam=[0.9, 0, 0].
    """
    if path and os.path.exists(path):
        d = np.load(path)
        return {
            "pose": d["pose"].astype(np.float32).reshape(-1),
            "shape": d["shape"].astype(np.float32).reshape(-1),
            "cam": d["cam"].astype(np.float32).reshape(-1),
        }
    pose = np.tile(np.array([1, 0, 0, 1, 0, 0], np.float32), 24)
    return {
        "pose": pose,
        "shape": np.zeros(10, np.float32),
        "cam": np.array([0.9, 0.0, 0.0], np.float32),
    }


def load_or_synthesize(model_dir: Optional[str], gender: str = "neutral", seed: int = 0) -> SMPLModel:
    """Prefer real assets; fall back to the synthetic model."""
    if model_dir:
        try:
            return load_smpl_model(model_dir, gender)
        except (FileNotFoundError, OSError, KeyError):
            pass
    return synthetic_smpl_model(seed)
