from .model import SMPLModel, SMPLOutput, lbs, smpl_forward
from .assets import (
    SMPL_PARENTS,
    load_or_synthesize,
    load_smpl_model,
    mean_params,
    synthetic_smpl_model,
)

__all__ = [
    "SMPLModel",
    "SMPLOutput",
    "lbs",
    "smpl_forward",
    "SMPL_PARENTS",
    "load_or_synthesize",
    "load_smpl_model",
    "mean_params",
    "synthetic_smpl_model",
]
