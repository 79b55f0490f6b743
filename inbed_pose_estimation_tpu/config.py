"""Dataset paths and asset locations.

Mirrors the reference's path-config surface (reference: config.py:1-101):
per-dataset npz index files for train/test splits, dataset image roots, and
asset paths.  `DATA_ROOT` is overridable via the INBED_DATA_ROOT env var so
tests can point everything at a synthetic tree.
"""

from __future__ import annotations

import os
from os.path import join

DATA_ROOT = os.environ.get("INBED_DATA_ROOT", "../../Dataset/pose/")
SLP_ROOT = join(DATA_ROOT, "SLP/SLP/danaLab")
H36M_ROOT = join(DATA_ROOT, "human36m")
LSP_ROOT = join(DATA_ROOT, "lsp")
LSP_ORIGINAL_ROOT = join(DATA_ROOT, "lsp_original")
LSPET_ROOT = join(DATA_ROOT, "lspextend_hr")
MPII_ROOT = join(DATA_ROOT, "mpii")
COCO_ROOT = join(DATA_ROOT, "coco")
MPI_INF_3DHP_ROOT = join(DATA_ROOT, "mpi_inf_3dhp")
PW3D_ROOT = join(DATA_ROOT, "3DPW")
UPI_S1H_ROOT = join(DATA_ROOT, "upi_s1h")

DATASET_NPZ_PATH = os.environ.get("INBED_NPZ_PATH", "data/dataset_extras")

# Index npz per dataset name; [0] = eval splits, [1] = train splits
# (reference: config.py:28-63).
DATASET_FILES = [
    {
        "h36m-p1": join(DATASET_NPZ_PATH, "h36m_valid_protocol1.npz"),
        "h36m-p2": join(DATASET_NPZ_PATH, "h36m_valid_protocol2.npz"),
        "lsp": join(DATASET_NPZ_PATH, "lsp_dataset_test.npz"),
        "mpi-inf-3dhp": join(DATASET_NPZ_PATH, "mpi_inf_3dhp_valid.npz"),
        "3dpw": join(DATASET_NPZ_PATH, "3dpw_test.npz"),
        "slp-rgb-uncover": join(DATASET_NPZ_PATH, "slp_rgb_uncover_test.npz"),
        "slp-rgb-cover1": join(DATASET_NPZ_PATH, "slp_rgb_cover1_test.npz"),
        "slp-rgb-cover2": join(DATASET_NPZ_PATH, "slp_rgb_cover2_test.npz"),
        "slp-ir-uncover": join(DATASET_NPZ_PATH, "slp_ir_uncover_test.npz"),
        "slp-ir-cover1": join(DATASET_NPZ_PATH, "slp_ir_cover1_test.npz"),
        "slp-ir-cover2": join(DATASET_NPZ_PATH, "slp_ir_cover2_test.npz"),
        "slp-uncover": join(DATASET_NPZ_PATH, "slp_multi_mod_uncover_test.npz"),
        "slp-cover1": join(DATASET_NPZ_PATH, "slp_multi_mod_cover1_test.npz"),
        "slp-cover2": join(DATASET_NPZ_PATH, "slp_multi_mod_cover2_test.npz"),
        "slp-4mod-uncover": join(DATASET_NPZ_PATH, "slp_4mod_uncover.npz"),
        "slp-4mod-cover1": join(DATASET_NPZ_PATH, "slp_4mod_cover1.npz"),
        "slp-4mod-cover2": join(DATASET_NPZ_PATH, "slp_4mod_cover2.npz"),
        "slp-4mod-train": join(DATASET_NPZ_PATH, "slp_4mod_train.npz"),
    },
    {
        "h36m": join(DATASET_NPZ_PATH, "h36m_train.npz"),
        "lsp-orig": join(DATASET_NPZ_PATH, "lsp_dataset_original_train.npz"),
        "mpii": join(DATASET_NPZ_PATH, "mpii_train.npz"),
        "coco": join(DATASET_NPZ_PATH, "coco_2014_train.npz"),
        "lspet": join(DATASET_NPZ_PATH, "hr-lspet_train.npz"),
        "mpi-inf-3dhp": join(DATASET_NPZ_PATH, "mpi_inf_3dhp_train.npz"),
        "slp": join(DATASET_NPZ_PATH, "slp_rgb_uncover_train.npz"),
        "slp-rgb": join(DATASET_NPZ_PATH, "slp_rgb_train.npz"),
        "slp-ir": join(DATASET_NPZ_PATH, "slp_ir_train.npz"),
        "slp-multi": join(DATASET_NPZ_PATH, "slp_multi_mod_train.npz"),
        "slp-4mod-train": join(DATASET_NPZ_PATH, "slp_4mod_train.npz"),
    },
]

DATASET_FOLDERS = {
    "h36m": H36M_ROOT, "h36m-p1": H36M_ROOT, "h36m-p2": H36M_ROOT,
    "lsp-orig": LSP_ORIGINAL_ROOT, "lsp": LSP_ROOT, "lspet": LSPET_ROOT,
    "mpi-inf-3dhp": MPI_INF_3DHP_ROOT, "mpii": MPII_ROOT, "coco": COCO_ROOT,
    "3dpw": PW3D_ROOT, "upi-s1h": UPI_S1H_ROOT,
}
for _name in (
    "slp", "slp-rgb", "slp-ir", "slp-multi",
    "slp-rgb-uncover", "slp-rgb-cover1", "slp-rgb-cover2",
    "slp-ir-uncover", "slp-ir-cover1", "slp-ir-cover2",
    "slp-uncover", "slp-cover1", "slp-cover2",
    "slp-4mod-train", "slp-4mod-uncover", "slp-4mod-cover1", "slp-4mod-cover2",
):
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
