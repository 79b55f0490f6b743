"""Test configuration: force JAX onto CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count) per SURVEY.md §4(c) so no real TPUs
are needed; numeric tests are also deterministic on CPU.

Note: this machine's sitecustomize registers a remote-TPU ("axon") PJRT
plugin at interpreter startup and pins jax_platforms, so the JAX_PLATFORMS
env var alone is not enough — we must override via jax.config *before* any
backend is initialized.
"""

import os

# XLA:CPU AOT-cache ERROR-spam suppression lives in tests/early_env.py
# (a `-p` plugin — it must run BEFORE pytest's capture plugin; see its
# docstring).  By the time this conftest imports, TF_CPP_MIN_LOG_LEVEL=3
# is already in the environment via that plugin's one-shot re-exec.

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual devices share ONE core here: a collective's rendezvous
    # threads can be starved past XLA's default stuck-thread terminate
    # timeout, which SIGABRTs the whole pytest process (observed
    # intermittently on the full cashmrV2 fwd+bwd mesh tests — always a
    # false positive; XLA itself logs "Thread is unstuck!" when it
    # survives).  Raise the kill threshold; keep a short warn.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=60"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the train-step/model graphs take minutes to
# compile on this 1-core host; caching makes repeated suite runs fast.
# The cache dir is keyed by a host CPU fingerprint — XLA:CPU AOT artifacts
# embed machine features (AVX512 etc.), and reusing another host's cache
# sprays "could lead to SIGILL" feature-mismatch errors through every run.
import hashlib  # noqa: E402
import platform  # noqa: E402

def _host_fingerprint() -> str:
    material = platform.machine() + platform.processor()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # Accumulate until BOTH the model name and the feature
                # flags are in — cloud VMs often share a generic masked
                # model string while exposing different feature sets, and
                # the AOT cache is keyed by those features (stopping at
                # the first match would omit them).
                if line.startswith(("flags", "Features", "model name")):
                    material += line
                    if line.startswith(("flags", "Features")):
                        break
    except OSError:
        pass
    return hashlib.md5(material.encode()).hexdigest()[:10]

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache", _host_fingerprint())
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
