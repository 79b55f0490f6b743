from .losses import angle_prior, body_fitting_loss, camera_fitting_loss, gmof
from .prior import GMMPrior, load_gmm_prior, max_mixture_nll, synthetic_gmm_prior
from .smplify import SMPLifyResult, make_fitting_loss, make_smplify

__all__ = [
    "angle_prior",
    "body_fitting_loss",
    "camera_fitting_loss",
    "gmof",
    "GMMPrior",
    "load_gmm_prior",
    "max_mixture_nll",
    "synthetic_gmm_prior",
    "SMPLifyResult",
    "make_fitting_loss",
    "make_smplify",
]
