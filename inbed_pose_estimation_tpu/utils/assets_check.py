"""Parity-critical asset validation for the production CLIs.

The library keeps deterministic synthetic fallbacks for every asset (SMPL
pkl, mean params, J_regressor_h36m, gmm_08.pkl) so tests run hermetically —
but a production `train.py` / `eval.py` run with a missing or mistyped asset
directory must NOT silently print confident, meaningless metrics.  The CLIs
call `check_assets` up front and hard-fail with the full missing list unless
`--allow_synthetic_assets` is passed (the explicit escape hatch).

Reference counterparts: the reference simply crashes on missing assets
(smplx model load, np.load of data/smpl_mean_params.npz at models/hmr.py:175,
pickle load of data/gmm_08.pkl at smplify/prior.py:100).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional


def _smpl_ok(model_dir: Optional[str]) -> bool:
    if not model_dir:
        return False
    try:
        from ..smpl.assets import load_smpl_model

        load_smpl_model(model_dir, "neutral")
        return True
    except (FileNotFoundError, OSError, KeyError, ValueError):
        return False


def asset_status(
    smpl_model_dir: Optional[str],
    smpl_mean_params: Optional[str] = None,
    j_regressor_h36m: Optional[str] = None,
    gmm_prior_file: Optional[str] = None,
) -> Dict[str, bool]:
    """Which parity-critical assets are actually loadable (True) vs would
    fall back to a synthetic stand-in (False).  Pass None to skip a check."""
    status = {"smpl_model": _smpl_ok(smpl_model_dir)}
    for name, path in (
        ("smpl_mean_params", smpl_mean_params),
        ("j_regressor_h36m", j_regressor_h36m),
        ("gmm_prior", gmm_prior_file),
    ):
        if path is not None:
            status[name] = bool(path) and os.path.exists(path)
    return status


def check_assets(allow_synthetic: bool = False, **paths) -> Dict[str, bool]:
    """Validate assets; raise unless everything loads or the caller opted
    into synthetic stand-ins.

    Raises SystemExit with the full missing list and the escape-hatch hint —
    metrics computed on synthetic assets are meaningless for parity.
    """
    status = asset_status(**paths)
    missing: List[str] = [k for k, ok in status.items() if not ok]
    if missing and not allow_synthetic:
        detail = ", ".join(missing)
        raise SystemExit(
            f"Missing/unloadable parity-critical assets: {detail}. "
            "Metrics computed on synthetic stand-ins are meaningless — fix "
            "the asset paths (config.py / INBED_* env vars) or pass "
            "--allow_synthetic_assets to run with synthetic assets anyway."
        )
    if missing:
        print(
            f"WARNING: running with SYNTHETIC stand-ins for: {', '.join(missing)} "
            "(--allow_synthetic_assets). Metrics are NOT comparable to the reference."
        )
    return status
