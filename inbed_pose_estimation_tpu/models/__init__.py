from .hmr import HMRCore, HMROutput, MultiTrunkCore, concat_modalities
from .bodies_at_rest import BodiesAtRest
from .fusion import FrozenGuidedFusion, FusionOutput, TwoStageFusion
from .cascade import cascade_apply
from .factory import ModelSpec, build_model, get_spec, model_names

__all__ = [
    "HMRCore",
    "HMROutput",
    "MultiTrunkCore",
    "concat_modalities",
    "BodiesAtRest",
    "FrozenGuidedFusion",
    "FusionOutput",
    "TwoStageFusion",
    "cascade_apply",
    "ModelSpec",
    "build_model",
    "get_spec",
    "model_names",
]
