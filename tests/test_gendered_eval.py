"""Gendered-SMPL ground-truth evaluation (3dpw-style, reference
eval.py:66-73, 389-396): datasets without packed 3D GT score against joints
regressed from GENDERED GT meshes, with per-sample gender==1 selecting the
female model."""

import importlib
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from inbed_pose_estimation_tpu.data.synthetic import write_synthetic_environment

    base = tmp_path_factory.mktemp("pw3d")
    env = write_synthetic_environment(str(base), num_subjects=1, samples_per_subject=3)
    os.environ["INBED_DATA_ROOT"] = env["data_root"]
    os.environ["INBED_NPZ_PATH"] = env["npz_path"]
    from inbed_pose_estimation_tpu import config

    importlib.reload(config)
    import inbed_pose_estimation_tpu.data.dataset as ds_mod

    importlib.reload(ds_mod)
    return env, ds_mod


RES = 64


def _eval(ds_mod, smpl_gendered, variables=None):
    import jax
    import jax.numpy as jnp

    from inbed_pose_estimation_tpu.evaluation.evaluate import run_evaluation
    from inbed_pose_estimation_tpu.models import build_model
    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model

    class Opt:
        img_res = RES

    ds = ds_mod.BaseDataset(Opt(), "3dpw", is_train=False)
    model, spec = build_model("hmr")
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3)))
    smpl = synthetic_smpl_model(seed=0)
    results = run_evaluation(
        model, spec, variables, "3dpw", ds, smpl,
        smpl_gendered=smpl_gendered,
        batch_size=2, img_res=RES, num_workers=1, log_freq=0,
        eval_masks_enabled=False,
    )
    return results, variables


def test_3dpw_eval_gendered_gt(env):
    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model

    _, ds_mod = env
    male = synthetic_smpl_model(seed=1)
    female = synthetic_smpl_model(seed=2)

    results, variables = _eval(ds_mod, (male, female))
    assert results["mpjpe"] is not None and np.isfinite(results["mpjpe"])
    assert results["mpjpe"] > 1.0  # nonzero: GT came from real meshes
    assert np.isfinite(results["pa_mpjpe"])
    assert results["pa_mpjpe"] <= results["mpjpe"] + 1e-6
    # has_smpl=1 everywhere -> PVE populated from the gendered meshes.
    assert results["pve"] is not None and np.isfinite(results["pve"])

    # The gender switch is live: swapping the male/female models changes
    # the GT meshes for the mixed-gender split, hence the numbers.
    swapped, _ = _eval(ds_mod, (female, male), variables=variables)
    assert abs(swapped["mpjpe"] - results["mpjpe"]) > 1e-6

    # And an all-one-gender check: gender==1 rows use exactly the female
    # model, so (female, female) equals swapping in female for male rows
    # changes nothing on rows already female.
    both_female, _ = _eval(ds_mod, (female, female), variables=variables)
    assert abs(both_female["mpjpe"] - results["mpjpe"]) > 1e-6


def test_3dpw_eval_without_gendered_models_warns_and_runs(env, capsys):
    _, ds_mod = env
    results, _ = _eval(ds_mod, None)
    assert np.isfinite(results["mpjpe"])
    assert "no gendered SMPL models" in capsys.readouterr().out
