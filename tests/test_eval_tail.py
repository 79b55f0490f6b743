"""Full-split evaluation coverage: with n % batch_size != 0 the tail batch
must still be evaluated and contribute to the metrics (VERDICT Missing #3;
the reference evaluates every sample — plain DataLoader, no drop_last,
eval.py:94)."""

import importlib
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def env3(tmp_path_factory):
    from inbed_pose_estimation_tpu.data.synthetic import write_synthetic_environment

    base = tmp_path_factory.mktemp("eval_tail")
    env = write_synthetic_environment(str(base), num_subjects=1, samples_per_subject=3)
    os.environ["INBED_DATA_ROOT"] = env["data_root"]
    os.environ["INBED_NPZ_PATH"] = env["npz_path"]
    from inbed_pose_estimation_tpu import config

    importlib.reload(config)
    import inbed_pose_estimation_tpu.data.dataset as ds_mod

    importlib.reload(ds_mod)
    return env, ds_mod


def test_loader_drop_last_false_covers_tail():
    from inbed_pose_estimation_tpu.data.loader import CheckpointDataLoader

    class ToyDS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    ds = ToyDS()
    full = CheckpointDataLoader(ds, batch_size=3, shuffle=False, num_workers=1,
                                drop_last=False)
    assert len(full) == 3
    sizes = []
    seen = []
    for b, batch in full:
        sizes.append(batch["x"].shape[0])
        seen.extend(batch["x"][:, 0].tolist())
    assert sizes == [3, 3, 1]
    assert sorted(seen) == list(range(7))

    dropped = CheckpointDataLoader(ds, batch_size=3, shuffle=False, num_workers=1)
    assert len(dropped) == 2  # training keeps reference drop_last semantics


def test_eval_tail_batch_contributes(env3):
    """MPJPE over 3 samples at batch_size=2 (2+1 tail) must equal the
    single-full-batch run — the tail sample is evaluated, not zero-averaged."""
    _, ds_mod = env3
    import jax
    import jax.numpy as jnp

    from inbed_pose_estimation_tpu.evaluation.evaluate import run_evaluation
    from inbed_pose_estimation_tpu.models import build_model
    from inbed_pose_estimation_tpu.smpl import synthetic_smpl_model

    RES = 64

    class Opt:
        img_res = RES

    ds = ds_mod.BaseDataset(Opt(), "slp-4mod-uncover", is_train=False)
    assert len(ds) == 3
    model, spec = build_model("cashmrV2")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 6)))
    smpl = synthetic_smpl_model(seed=0)

    kwargs = dict(img_res=RES, num_workers=1, log_freq=0, num_cas_iters=2,
                  eval_masks_enabled=False)
    with_tail = run_evaluation(
        model, spec, variables, "slp-4mod-uncover", ds, smpl, batch_size=2, **kwargs
    )
    full_batch = run_evaluation(
        model, spec, variables, "slp-4mod-uncover", ds, smpl, batch_size=3, **kwargs
    )
    assert np.isfinite(with_tail["mpjpe"])
    np.testing.assert_allclose(with_tail["mpjpe"], full_batch["mpjpe"], rtol=1e-5)
    np.testing.assert_allclose(with_tail["pa_mpjpe"], full_batch["pa_mpjpe"], rtol=1e-4)
