"""Helpers to import GENUINE reference modules for parity oracles.

The reference tree (/root/reference) is torch/CUDA code with heavy package
imports; these loaders bring in single modules with the minimal stubs they
need so tests can compare against the real reference math, not a re-typed
twin.
"""

import importlib.util
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_present() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def import_reference_file(relpath: str, module_name: str):
    """Import a single reference file with no package context."""
    spec = importlib.util.spec_from_file_location(
        module_name, os.path.join(REFERENCE_ROOT, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def import_reference_models_hmr():
    """Import the genuine reference models/hmr.py with a torchvision stub.

    Its only torchvision use is a commented-out line (models/hmr.py:3,2878)
    so a bare module stub suffices; a bare `utils` package module (with
    __path__ into the reference tree) lets `from utils.geometry import ...`
    resolve WITHOUT executing the reference utils/__init__.py, which drags
    in its full trainer stack.
    """
    stubbed = []
    for name in ("torchvision", "torchvision.models", "torchvision.models.resnet"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            stubbed.append(name)
    utils_pkg = types.ModuleType("utils")
    utils_pkg.__path__ = [os.path.join(REFERENCE_ROOT, "utils")]
    had_utils = sys.modules.get("utils")
    sys.modules["utils"] = utils_pkg
    stubbed_utils = [k for k in list(sys.modules) if k.startswith("utils.")]
    saved_submodules = {k: sys.modules.pop(k) for k in stubbed_utils}
    try:
        return import_reference_file(
            os.path.join("models", "hmr.py"), "reference_models_hmr"
        )
    finally:
        for name in stubbed:
            del sys.modules[name]
        for k in [k for k in list(sys.modules) if k == "utils" or k.startswith("utils.")]:
            del sys.modules[k]
        if had_utils is not None:
            sys.modules["utils"] = had_utils
        sys.modules.update(saved_submodules)


def import_reference_pose_utils():
    """utils/pose_utils.py: numpy+torch only — imports clean."""
    return import_reference_file(
        os.path.join("utils", "pose_utils.py"), "reference_pose_utils"
    )


def import_reference_smplify():
    """Import the genuine reference smplify package (smplify/smplify.py with
    its real .losses and .prior siblings).

    Needed stubs: `constants` -> the real reference constants.py;
    `config` -> bare module (only touched inside SMPLify.__init__, which
    oracle tests bypass via __new__); `models.smpl` -> bare SMPL symbol
    (same reason); `utils` -> namespace package over the reference tree so
    `from utils.geometry import perspective_projection` is the REAL one.
    """
    import importlib

    saved = {}

    def _stash(name, module):
        if name in sys.modules:
            saved[name] = sys.modules[name]
        sys.modules[name] = module

    ref_constants = import_reference_file("constants.py", "reference_constants_smplify")
    _stash("constants", ref_constants)

    config_stub = types.ModuleType("config")
    config_stub.SMPL_MODEL_DIR = ""
    _stash("config", config_stub)

    models_stub = types.ModuleType("models")
    models_stub.__path__ = []
    models_smpl_stub = types.ModuleType("models.smpl")
    models_smpl_stub.SMPL = object
    _stash("models", models_stub)
    _stash("models.smpl", models_smpl_stub)

    utils_pkg = types.ModuleType("utils")
    utils_pkg.__path__ = [os.path.join(REFERENCE_ROOT, "utils")]
    _stash("utils", utils_pkg)
    stashed_utils = {
        k: sys.modules.pop(k) for k in list(sys.modules) if k.startswith("utils.")
    }

    pkg = types.ModuleType("ref_smplify")
    pkg.__path__ = [os.path.join(REFERENCE_ROOT, "smplify")]
    _stash("ref_smplify", pkg)

    try:
        return importlib.import_module("ref_smplify.smplify")
    finally:
        for name in ("constants", "config", "models", "models.smpl",
                     "ref_smplify", "ref_smplify.smplify", "ref_smplify.losses",
                     "ref_smplify.prior", "utils"):
            sys.modules.pop(name, None)
        for k in [k for k in list(sys.modules) if k.startswith("utils.")]:
            del sys.modules[k]
        sys.modules.update(saved)
        sys.modules.update(stashed_utils)
