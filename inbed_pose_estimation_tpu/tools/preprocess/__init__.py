from .slp import TEST_SUBJECTS, TRAIN_SUBJECTS, slp_multi_mod, slp_single_mod
from .read_openpose import read_openpose

__all__ = [
    "TEST_SUBJECTS",
    "TRAIN_SUBJECTS",
    "slp_multi_mod",
    "slp_single_mod",
    "read_openpose",
]
