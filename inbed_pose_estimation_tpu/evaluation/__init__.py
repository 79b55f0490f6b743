from .pipeline import eval_metrics, make_forward_fn, make_inference_fn
from .evaluate import load_j_regressor_h36m, run_evaluation

__all__ = [
    "eval_metrics",
    "make_forward_fn",
    "make_inference_fn",
    "load_j_regressor_h36m",
    "run_evaluation",
]
