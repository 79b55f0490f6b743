from .profiling import StepTimer, annotate, trace

__all__ = ["StepTimer", "annotate", "trace"]
