"""Asset-gating of the production CLIs (VERDICT Weak #2) and the fused
device-preprocess eval path (VERDICT Weak #3 wiring)."""

import importlib
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_check_assets_strict_and_waived(tmp_path, capsys):
    from inbed_pose_estimation_tpu.utils.assets_check import asset_status, check_assets

    missing_dir = str(tmp_path / "nope")
    status = asset_status(
        smpl_model_dir=missing_dir,
        smpl_mean_params=str(tmp_path / "mp.npz"),
        j_regressor_h36m=str(tmp_path / "jr.npy"),
    )
    assert status == {"smpl_model": False, "smpl_mean_params": False,
                      "j_regressor_h36m": False}

    with pytest.raises(SystemExit, match="parity-critical"):
        check_assets(smpl_model_dir=missing_dir)

    # Escape hatch: proceeds with a loud warning.
    out = check_assets(allow_synthetic=True, smpl_model_dir=missing_dir)
    assert out["smpl_model"] is False
    assert "SYNTHETIC" in capsys.readouterr().out


def test_eval_cli_hard_fails_without_assets(tmp_path):
    """`python eval.py` against a missing asset dir exits nonzero with the
    missing-asset message BEFORE computing any metrics (reference users get
    a hard failure, not confident nonsense)."""
    env = dict(os.environ)
    env["INBED_ASSET_DIR"] = str(tmp_path / "no_assets")
    env["INBED_DATA_ROOT"] = str(tmp_path / "no_data")
    env["INBED_NPZ_PATH"] = str(tmp_path / "no_npz")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "eval.py"), "--model", "hmr",
         "--img_res", "64"],
        capture_output=True, text=True, env=env, timeout=300, cwd=REPO,
    )
    assert proc.returncode != 0
    assert "parity-critical" in (proc.stderr + proc.stdout)


@pytest.fixture(scope="module")
def env2(tmp_path_factory):
    from inbed_pose_estimation_tpu.data.synthetic import write_synthetic_environment

    base = tmp_path_factory.mktemp("dev_pre")
    env = write_synthetic_environment(str(base), num_subjects=1, samples_per_subject=2)
    os.environ["INBED_DATA_ROOT"] = env["data_root"]
    os.environ["INBED_NPZ_PATH"] = env["npz_path"]
    from inbed_pose_estimation_tpu import config

    importlib.reload(config)
    import inbed_pose_estimation_tpu.data.dataset as ds_mod

    importlib.reload(ds_mod)
    return env, ds_mod


def test_device_preprocess_matches_host_path(env2):
    """The fused device preprocess reproduces the host crop+normalize path
    (both bilinear; PIL's uint8 rounding bounds the gap)."""
    import jax.numpy as jnp

    from inbed_pose_estimation_tpu.data.device_preprocess import make_device_preprocess

    _, ds_mod = env2
    RES = 64

    class Host:
        img_res = RES

    class Raw:
        img_res = RES
        device_preprocess = True

    ds_host = ds_mod.BaseDataset(Host(), "slp-4mod-uncover", is_train=False)
    ds_raw = ds_mod.BaseDataset(Raw(), "slp-4mod-uncover", is_train=False)
    assert ds_raw.return_raw

    host = ds_host[0]
    raw = ds_raw[0]
    assert "img" not in raw and raw["raw_img"].dtype == np.uint8

    pre = make_device_preprocess(res=RES)
    out = pre(
        {k: jnp.asarray(raw["raw_" + k])[None] for k in ("img", "ir_img", "depth_img", "pm_img")},
        jnp.asarray(raw["center"])[None],
        jnp.asarray([raw["scale"]]),
        jnp.zeros(1),
        jnp.ones((1, 3)),
    )
    for key in ("img", "ir_img", "depth_img", "pm_img"):
        got = np.asarray(out[key][0])
        assert got.shape == host[key].shape and np.isfinite(got).all()

    # Numerical agreement on a SMOOTH image (the real-imagery regime; the
    # synthetic dataset's pure-noise pixels are the adversarial case for
    # comparing two differently-antialiased resamplers).  An exact-scale
    # box must match the host crop bit-for-bit up to float/255 rounding.
    from inbed_pose_estimation_tpu.data.device_preprocess import crop_resize
    from inbed_pose_estimation_tpu.data.transforms import crop

    H, W = 120, 160
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    smooth = (127 + 80 * np.sin(xx / 9.0) * np.cos(yy / 11.0)).astype(np.uint8)
    center = np.array([80.0, 60.0])
    for scale, tol in ((0.35, 0.02), (0.32, 1e-6)):  # fractional vs exact box
        h = crop(smooth, center, scale, [RES, RES]).astype(np.float32) / 255.0
        d = np.asarray(crop_resize(
            jnp.asarray(smooth[:, :, None], jnp.float32) / 255.0,
            jnp.asarray(center), jnp.asarray(scale), RES,
        ))[:, :, 0]
        assert np.abs(d - h).mean() < tol, (scale, np.abs(d - h).mean())


def test_run_evaluation_device_preprocess_end_to_end(env2):
    _, ds_mod = env2
    import jax
    import jax.numpy as jnp

    from inbed_pose_estimation_tpu.evaluation.evaluate import run_evaluation
    from inbed_pose_estimation_tpu.models import build_model
    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model

    RES = 64

    class Opt:
        img_res = RES
        device_preprocess = True

    ds = ds_mod.BaseDataset(Opt(), "slp-4mod-uncover", is_train=False)
    model, spec = build_model("cashmrV2")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 6)))
    smpl = synthetic_smpl_model(seed=0)

    results = run_evaluation(
        model, spec, variables, "slp-4mod-uncover", ds, smpl,
        batch_size=2, img_res=RES, num_workers=1, log_freq=0,
        num_cas_iters=2, eval_masks_enabled=False, device_preprocess=True,
    )
    assert np.isfinite(results["mpjpe"])
    assert np.isfinite(results["pa_mpjpe"])
