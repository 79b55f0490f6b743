"""Persistent XLA compilation cache for the CLIs.

The flagship graphs take minutes to compile (remote-TPU compile on this
class of machine); tests already use a persistent cache via conftest — the
production entry points (train.py / eval.py / bench.py) get the same via
this helper.  Override the location with INBED_JAX_CACHE; disable with
INBED_JAX_CACHE=0.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> str | None:
    loc = os.environ.get(
        "INBED_JAX_CACHE",
        os.path.expanduser("~/.cache/inbed_pose_estimation_tpu/jax"),
    )
    if loc in ("0", "off", ""):
        return None
    try:
        import jax

        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        return loc
    except Exception:  # cache is an optimization, never a failure
        return None
