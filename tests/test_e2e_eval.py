"""End-to-end smoke test: synthetic SLP tree -> dataset -> jit inference
pipeline -> metrics (SURVEY.md §4(d)), at reduced resolution."""

import importlib
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from inbed_pose_estimation_tpu.data.synthetic import write_synthetic_environment

    base = tmp_path_factory.mktemp("e2e")
    env = write_synthetic_environment(str(base), num_subjects=1, samples_per_subject=2)
    os.environ["INBED_DATA_ROOT"] = env["data_root"]
    os.environ["INBED_NPZ_PATH"] = env["npz_path"]
    from inbed_pose_estimation_tpu import config

    importlib.reload(config)
    import inbed_pose_estimation_tpu.data.dataset as ds_mod

    importlib.reload(ds_mod)
    return env, ds_mod


def test_run_evaluation_end_to_end(env):
    _, ds_mod = env
    import jax
    import jax.numpy as jnp

    from inbed_pose_estimation_tpu.evaluation.evaluate import run_evaluation
    from inbed_pose_estimation_tpu.models import build_model
    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model

    RES = 64

    class Opt:
        img_res = RES

    ds = ds_mod.BaseDataset(Opt(), "slp-4mod-uncover", is_train=False)
    model, spec = build_model("cashmrV2")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 6)))
    smpl = synthetic_smpl_model(seed=0)

    results = run_evaluation(
        model, spec, variables, "slp-4mod-uncover", ds, smpl,
        batch_size=2, img_res=RES, num_workers=1, log_freq=0,
        num_cas_iters=2,
    )
    assert results["mpjpe"] is not None and np.isfinite(results["mpjpe"])
    assert results["pa_mpjpe"] is not None and np.isfinite(results["pa_mpjpe"])
    assert results["pa_mpjpe"] <= results["mpjpe"] + 1e-6
    # Synthetic GT masks exist, so mask metrics must be populated.
    assert results["mask_accuracy"] is not None
    assert 0.0 <= results["mask_f1"] <= 1.0


def test_run_evaluation_bodies_at_rest(env):
    """Bodies-At-Rest eval path (pm+contact stacking, mode-0 regression)."""
    _, ds_mod = env
    import jax
    import jax.numpy as jnp

    from inbed_pose_estimation_tpu.evaluation.evaluate import run_evaluation
    from inbed_pose_estimation_tpu.models import build_model
    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model

    RES = 64

    class Opt:
        img_res = RES

    ds = ds_mod.BaseDataset(Opt(), "slp-4mod-uncover", is_train=False)
    model, spec = build_model("bodiesAtRest")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3)), mode="0")
    smpl = synthetic_smpl_model(seed=0)

    results = run_evaluation(
        model, spec, variables, "slp-4mod-uncover", ds, smpl,
        batch_size=2, img_res=RES, num_workers=1, log_freq=0,
        eval_masks_enabled=False,
    )
    import numpy as np
    assert np.isfinite(results["mpjpe"])


def test_run_evaluation_fusion(env):
    """Two-stage fusion eval path (stage-2 prediction, recovered images
    exposed through recon)."""
    _, ds_mod = env
    import jax
    import jax.numpy as jnp
    import numpy as np

    from inbed_pose_estimation_tpu.evaluation.evaluate import run_evaluation
    from inbed_pose_estimation_tpu.models import build_model
    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model

    RES = 64

    class Opt:
        img_res = RES

    ds = ds_mod.BaseDataset(Opt(), "slp-4mod-uncover", is_train=False)
    model, spec = build_model("ir_depth_fusion")
    smpl = synthetic_smpl_model(seed=0)
    mods = tuple(jnp.zeros((1, RES, RES, 1)) for _ in spec.modalities)
    variables = model.init(jax.random.PRNGKey(0), mods, smpl)

    results = run_evaluation(
        model, spec, variables, "slp-4mod-uncover", ds, smpl,
        batch_size=2, img_res=RES, num_workers=1, log_freq=0,
        eval_masks_enabled=False,
    )
    assert np.isfinite(results["mpjpe"])


def test_run_evaluation_bodies_at_rest_4mod_refine(env):
    """bodiesAtRest4mod eval runs the mode-2 refinement (estimated-map
    channel from splatted predicted joints, reference eval.py:238-288)."""
    _, ds_mod = env
    import jax
    import jax.numpy as jnp
    import numpy as np

    from inbed_pose_estimation_tpu.evaluation.evaluate import run_evaluation
    from inbed_pose_estimation_tpu.models import build_model
    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model

    RES = 64

    class Opt:
        img_res = RES

    ds = ds_mod.BaseDataset(Opt(), "slp-4mod-uncover", is_train=False)
    model, spec = build_model("bodiesAtRest4mod")
    smpl = synthetic_smpl_model(seed=0)
    # Init BOTH mode stacks and merge the param trees.
    v0 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 8)), mode="0")
    v2 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 9)), mode="2")
    variables = {"params": {**v0["params"], **v2["params"]}}

    results = run_evaluation(
        model, spec, variables, "slp-4mod-uncover", ds, smpl,
        batch_size=2, img_res=RES, num_workers=1, log_freq=0,
        eval_masks_enabled=False,
    )
    assert np.isfinite(results["mpjpe"])


def test_result_file_schema_and_artifacts(env, tmp_path):
    """--result_file export matches the reference schema (eval.py:124,
    305-308,490): `pose` is [N, 72] axis-angle (rotmat kept as an extra key),
    plus pred_joints/betas/camera; the artifact directory contains the mesh
    overlay, side/top rotated views (eval.py:324-338), the stretched +
    OCEAN-colormapped recovered depth (eval.py:361-375), and the predicted
    mask png (eval.py:377-378)."""
    _, ds_mod = env
    import jax
    import jax.numpy as jnp

    from inbed_pose_estimation_tpu.evaluation.evaluate import run_evaluation
    from inbed_pose_estimation_tpu.geometry.rotations import batch_rodrigues
    from inbed_pose_estimation_tpu.models import build_model
    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model

    RES = 64

    class Opt:
        img_res = RES

    ds = ds_mod.BaseDataset(Opt(), "slp-4mod-uncover", is_train=False)
    model, spec = build_model("cashmrV2")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 6)))
    smpl = synthetic_smpl_model(seed=0)

    out = tmp_path / "results"
    run_evaluation(
        model, spec, variables, "slp-4mod-uncover", ds, smpl,
        batch_size=2, img_res=RES, num_workers=1, log_freq=0,
        num_cas_iters=2, result_file=str(out),
    )

    n = len(ds)
    fits = np.load(out / "smpl_fits" / "slp-4mod-uncover_fits.npz")
    # Reference field shapes (eval.py:124-127).
    assert fits["pose"].shape == (n, 72)
    assert fits["betas"].shape == (n, 10)
    assert fits["camera"].shape == (n, 3)
    assert fits["pred_joints"].shape == (n, 17, 3)
    # Extra key: the raw rotation matrices the axis-angle came from.
    assert fits["rotmat"].shape == (n, 24, 3, 3)
    # Round trip: aa -> rotmat reproduces the stored rotmats.
    rt = np.asarray(batch_rodrigues(jnp.asarray(
        fits["pose"].reshape(n * 24, 3), jnp.float32))).reshape(n, 24, 3, 3)
    np.testing.assert_allclose(rt, fits["rotmat"], atol=2e-5)

    art = out / "slp-4mod-uncover"
    files = {p.name for p in art.iterdir()}
    for idx in range(n):
        for suffix in ("shape", "shape_side", "shape_top",
                       "depth_recovered", "depthout", "depthoutori", "mask"):
            assert f"{idx:06d}_{suffix}.png" in files, (suffix, sorted(files))


def test_depth_stretch_matches_reference_uint8_semantics():
    """_stretch_depth reproduces the reference's uint8 wraparound arithmetic
    (eval.py:362-367: bed pixels `(v - 150) * 3` computed IN uint8)."""
    from inbed_pose_estimation_tpu.evaluation.evaluate import _stretch_depth

    v = np.arange(256, dtype=np.uint8).reshape(16, 16)
    black = np.zeros_like(v, dtype=bool)
    black[0, :3] = True
    got = _stretch_depth(v, black)

    # Oracle: numpy uint8 arithmetic is itself the wraparound semantics.
    exp = v.copy()
    bed = exp < 220
    exp[bed] = (exp[bed] - np.uint8(150)) * np.uint8(3)
    exp[black] = 0
    np.testing.assert_array_equal(got, exp)
