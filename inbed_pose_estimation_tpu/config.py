"""Dataset paths and asset locations.

Mirrors the reference's path-config surface (reference: config.py:1-101):
per-dataset npz index files for train/test splits, dataset image roots, and
asset paths.  `DATA_ROOT` is overridable via the INBED_DATA_ROOT env var so
tests can point everything at a synthetic tree; asset locations via
INBED_ASSET_DIR.
"""

from __future__ import annotations

import os
from os.path import join

DATA_ROOT = os.environ.get("INBED_DATA_ROOT", "../../Dataset/pose/")

_DATASET_DIRS = {
    "slp": "SLP/SLP/danaLab",
    "h36m": "human36m",
    "lsp": "lsp",
    "lsp_original": "lsp_original",
    "lspet": "lspextend_hr",
    "mpii": "mpii",
    "coco": "coco",
    "mpi_inf_3dhp": "mpi_inf_3dhp",
    "3dpw": "3DPW",
    "upi_s1h": "upi_s1h",
}
_ROOTS = {k: join(DATA_ROOT, v) for k, v in _DATASET_DIRS.items()}

SLP_ROOT = _ROOTS["slp"]
H36M_ROOT = _ROOTS["h36m"]
LSP_ROOT = _ROOTS["lsp"]
LSP_ORIGINAL_ROOT = _ROOTS["lsp_original"]
LSPET_ROOT = _ROOTS["lspet"]
MPII_ROOT = _ROOTS["mpii"]
COCO_ROOT = _ROOTS["coco"]
MPI_INF_3DHP_ROOT = _ROOTS["mpi_inf_3dhp"]
PW3D_ROOT = _ROOTS["3dpw"]
UPI_S1H_ROOT = _ROOTS["upi_s1h"]

DATASET_NPZ_PATH = os.environ.get("INBED_NPZ_PATH", "data/dataset_extras")


def _npz(name: str) -> str:
    return join(DATASET_NPZ_PATH, name)


# SLP splits share a naming scheme: <prefix>_<cover>_{test,train}.npz.
_SLP_EVAL_SPLITS = {
    f"slp-{mod}-{cover}": f"slp_{mod}_{cover}_test.npz"
    for mod in ("rgb", "ir")
    for cover in ("uncover", "cover1", "cover2")
}
_SLP_MULTI_EVAL = {
    f"slp-{cover}": f"slp_multi_mod_{cover}_test.npz"
    for cover in ("uncover", "cover1", "cover2")
}
_SLP_4MOD_EVAL = {
    f"slp-4mod-{cover}": f"slp_4mod_{cover}.npz"
    for cover in ("uncover", "cover1", "cover2")
}

# Index npz per dataset name; [0] = eval splits, [1] = train splits
# (reference: config.py:28-63).
DATASET_FILES = [
    {
        **{k: _npz(v) for k, v in _SLP_EVAL_SPLITS.items()},
        **{k: _npz(v) for k, v in _SLP_MULTI_EVAL.items()},
        **{k: _npz(v) for k, v in _SLP_4MOD_EVAL.items()},
        "slp-4mod-train": _npz("slp_4mod_train.npz"),
        "h36m-p1": _npz("h36m_valid_protocol1.npz"),
        "h36m-p2": _npz("h36m_valid_protocol2.npz"),
        "lsp": _npz("lsp_dataset_test.npz"),
        "mpi-inf-3dhp": _npz("mpi_inf_3dhp_valid.npz"),
        "3dpw": _npz("3dpw_test.npz"),
    },
    {
        "slp": _npz("slp_rgb_uncover_train.npz"),
        "slp-rgb": _npz("slp_rgb_train.npz"),
        "slp-ir": _npz("slp_ir_train.npz"),
        "slp-multi": _npz("slp_multi_mod_train.npz"),
        "slp-4mod-train": _npz("slp_4mod_train.npz"),
        "h36m": _npz("h36m_train.npz"),
        "lsp-orig": _npz("lsp_dataset_original_train.npz"),
        "mpii": _npz("mpii_train.npz"),
        "coco": _npz("coco_2014_train.npz"),
        "lspet": _npz("hr-lspet_train.npz"),
        "mpi-inf-3dhp": _npz("mpi_inf_3dhp_train.npz"),
    },
]

# Image roots per dataset name.  Every slp-* split lives under SLP_ROOT.
DATASET_FOLDERS = {
    "h36m": H36M_ROOT, "h36m-p1": H36M_ROOT, "h36m-p2": H36M_ROOT,
    "lsp-orig": LSP_ORIGINAL_ROOT, "lsp": LSP_ROOT, "lspet": LSPET_ROOT,
    "mpi-inf-3dhp": MPI_INF_3DHP_ROOT, "mpii": MPII_ROOT, "coco": COCO_ROOT,
    "3dpw": PW3D_ROOT, "upi-s1h": UPI_S1H_ROOT,
}
for _split_table in DATASET_FILES:
    for _name in _split_table:
        if _name.startswith("slp"):
            DATASET_FOLDERS[_name] = SLP_ROOT

# Assets (reference: config.py:95-101).
ASSET_DIR = os.environ.get("INBED_ASSET_DIR", "data")
CUBE_PARTS_FILE = join(ASSET_DIR, "cube_parts.npy")
JOINT_REGRESSOR_TRAIN_EXTRA = join(ASSET_DIR, "J_regressor_extra.npy")
JOINT_REGRESSOR_H36M = join(ASSET_DIR, "J_regressor_h36m.npy")
VERTEX_TEXTURE_FILE = join(ASSET_DIR, "vertex_texture.npy")
STATIC_FITS_DIR = join(ASSET_DIR, "static_fits")
SMPL_MEAN_PARAMS = join(ASSET_DIR, "smpl_mean_params.npz")
SMPL_MODEL_DIR = join(ASSET_DIR, "smpl")
GMM_PRIOR_FILE = join(ASSET_DIR, "gmm_08.pkl")
